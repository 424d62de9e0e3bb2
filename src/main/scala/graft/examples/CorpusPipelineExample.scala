package graft.examples

import graft.ops.{CorpusPipeline, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end LLM training-data pipeline on the documents table — the
 * composed workflow a corpus-curation user runs, each stage one of the
 * library's first-class operators:
 *
 *   1. clean        — exact dedup + C4/Gopher quality gate + near-dup
 *   2. decontaminate — drop docs sharing 8-grams with an eval set
 *   3. unigramLogProbs — CCNet-style LM scoring, drop the most
 *                       surprising tail
 *   4. assignSplit  — deterministic train/val/test intervals
 *   5. packSequences — next-fit token bins for batch prep
 *
 *   sbt "runMain graft.examples.CorpusPipelineExample"
 */
object CorpusPipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-corpus-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    println(s"ingested=${docs.count()}")

    // 1. dedup + quality gate + near-dup removal
    val cleaned = CorpusPipeline.clean(docs, "doc_id", "text")
    println(s"cleaned=${cleaned.count()}")

    // 2. eval-set decontamination (here: a held-out sample plays the
    //    benchmark; production passes the real eval corpus)
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    val contaminated = CorpusPipeline.decontaminate(
      cleaned, evalSet, "doc_id", "text", n = 8)
    val decontamed = cleaned.join(
      contaminated.select(col("train_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    println(s"decontaminated=${decontamed.count()}")

    // 3. LM-score filter: drop the 10% most surprising docs
    val scored = TextOps.unigramLogProbs(decontamed, "doc_id", "text",
      vocabSize = 1000)
    val quantiles = scored.stat.approxQuantile("mean_logprob",
      Array(0.1), 0.001)
    val kept = quantiles.headOption match {
      case Some(cut) =>
        println(s"lm_cut=$cut")
        decontamed.join(
          scored.filter(col("mean_logprob") >= cut).select("doc_id"),
          Seq("doc_id"))
      case None => decontamed // everything filtered upstream
    }
    println(s"lm_filtered=${kept.count()}")

    // 4. deterministic split — stable under corpus growth and retries
    val split = CorpusPipeline.assignSplit(kept, "doc_id",
      Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    split.groupBy("split").count().orderBy("split").show()

    // 5. pack the train split into fixed-capacity token bins
    val train = split.filter(col("split") === "train")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = CorpusPipeline.packSequences(train, "doc_id",
      "n_tokens", capacity = 256, shards = 4)
    val bins = packed.select(countDistinct(concat_ws(":",
      col("shard"), col("bin"))).as("bins")).head().getLong(0)
    val toksRow = packed.agg(sum("tokens_packed")).head()
    val toks = if (toksRow.isNullAt(0)) 0L else toksRow.getLong(0)
    if (bins > 0)
      println(s"packed bins=$bins tokens=$toks " +
        s"fill=${toks.toDouble / (bins * 256)}")
    else println("packed bins=0 (empty train split)")
    spark.stop()
  }
}
