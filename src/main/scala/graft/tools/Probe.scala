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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warm
    graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      t(s"ngramJaccard $i") {
        graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8)
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("components on ngram pairs") {
      val pairs = graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text",
        3, 0.8)
      graft.ops.Dedup.components(pairs, "keep_id", "dup_id")
        .write.format("noop").mode("overwrite").save()
    }
    // phase split: grams persist+force, posting agg, rest
    val grams = docs.select(col("doc_id").cast("long").as("id"),
      graft.ops.Dedup.wordGramHashes(3)(col("text")).as("grams"))
      .filter(size(col("grams")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("grams force") { grams.count() }
    t("grams count again") { grams.count() }
    val prefixLen = (size(col("grams")).cast("double") * 0.2)
      .cast("int") + 1
    val posting = grams.select(
      (col("id") * 1048576 + least(size(col("grams")), lit(1048575)))
        .as("pid"),
      explode(slice(col("grams"), lit(1), prefixLen)).as("gram"))
    t("posting groupBy count") {
      posting.groupBy("gram").agg(count(lit(1)).as("n"))
        .agg(sum("n")).head()
    }
    grams.unpersist(blocking = true)
    spark.stop()
  }
}
