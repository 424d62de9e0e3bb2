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
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // warm
    graft.ops.Profiler.profile(df, cols, Seq(25, 50, 75, 95))
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      t(s"profile run $i") {
        graft.ops.Profiler.profile(df, cols, Seq(25, 50, 75, 95))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val qdf = df.selectExpr(cols.map(c =>
      s"cast(floor(cast($c as double) * 1048576.0 + 0.5) as long) as __q_$c"): _*)
    (1 to 2).foreach { i =>
      t(s"persist+count $i") {
        val p = qdf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        t(s"agg $i") {
          val aggExprs = count(lit(1)).as("total") +:
            cols.zipWithIndex.flatMap { case (c, j) =>
              val q = col(s"__q_$c")
              Seq(count(q).as(s"n_$j"), min(q).as(s"mn_$j"),
                max(q).as(s"mx_$j"),
                sum(q.cast("decimal(38,0)")).as(s"sm_$j"))
            }
          p.agg(aggExprs.head, aggExprs.tail: _*).head()
        }
        t(s"rdd pass $i") {
          p.rdd.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).count()
        }
        t(s"rdd repart pass $i") {
          p.rdd.repartition(32).map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).count()
        }
        p.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
