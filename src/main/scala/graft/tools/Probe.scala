package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for optimization work; not wired into
  * any harness. */
object Probe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$dir/events.parquet")
    // warm
    graft.streaming.StreamPipeline.replaySessions(
      events, "user_id", "ts", "event_id", "value", gapSec = 21600)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      t(s"replaySessions $i") {
        graft.streaming.StreamPipeline.replaySessions(
          events, "user_id", "ts", "event_id", "value", gapSec = 21600)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // manual phase split of the same replay
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val micros = floor(graft.ops.Sessions.asNanos(events, "ts")
      .cast("decimal(38,0)") / lit(1000L)).cast("long")
    val rows = t("collect") {
      events.select(col("user_id").cast("long"), micros.as("us"),
          col("value").cast("double"), col("event_id").cast("long"))
        .as[(Long, Long, Double, Long)].collect()
        .sortBy(r => (r._2, r._4))
    }
    def mkTs(us: Long) = {
      val ts = new java.sql.Timestamp((us / 1000000L) * 1000L)
      ts.setNanos(((us % 1000000L) * 1000L).toInt); ts
    }
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = graft.streaming.StreamPipeline.sessionStream(
      in.toDF().toDF("user_id", "ts", "value"), "user_id", "ts",
      21600, "10 minutes", "value")
    val q = t("start") {
      sessions.writeStream.format("memory").queryName("probe_sess")
        .option("checkpointLocation", "/dev/shm/graft_probe_ck")
        .outputMode("append").start()
    }
    val per = math.max(1, math.ceil(rows.length / 3.0).toInt)
    rows.grouped(per).zipWithIndex.foreach { case (b, i) =>
      t(s"batch $i") {
        in.addData(b.toSeq.map { case (u, us, v, _) => (u, mkTs(us), v) })
        q.processAllAvailable()
      }
    }
    val maxUs = rows.last._2
    (0 to 1).foreach { i =>
      t(s"flush $i") {
        in.addData(Seq((-1L,
          mkTs(maxUs + (21600L + 1200L) * 1000000L * (i + 1)), 0.0)))
        q.processAllAvailable()
      }
    }
    t("read+stop") {
      s2.table("probe_sess").filter(col("user_id") =!= -1L)
        .orderBy("user_id", "start_us").localCheckpoint(true)
      q.stop()
    }
    def rm(f: java.io.File): Unit = {
      val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete()
    }
    rm(new java.io.File("/dev/shm/graft_probe_ck"))
    spark.stop()
  }
}
