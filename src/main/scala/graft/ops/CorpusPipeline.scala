package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus cleaning — the standard LLM-training-data prep
 * recipe composed from this package's primitives:
 *
 *   1. exact dedup (normalized-text fingerprint, keep smallest id)
 *   2. quality gate (token count / punctuation ratio / mean word
 *      length — the C4/Gopher-style rule family)
 *   3. near-dup removal (exact word-n-gram Jaccard over the survivors;
 *      every doc that is the larger side of a qualifying pair drops)
 *
 * Scale shape: stage 1 is one hash-partitioned window, stage 2 is a
 * pure codegen scan, stage 3 is the prefix-filtered inverted index of
 * `Dedup.ngramJaccard` — no cross joins anywhere, so the pipeline keeps
 * the same 100 TB posture as its parts.
 */
object CorpusPipeline {

  /**
   * @return surviving rows of `df` with appended quality columns
   *         (`token_count`, `punct_ratio`, `mean_word_len`)
   */
  def clean(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, maxPunct: Double = 0.1,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
      ngramN: Int = 3, jaccardThreshold: Double = 0.8): DataFrame = {
    val keepers = Dedup.exactKeepers(df, idCol, textCol)
    val quality = keepers
      .withColumn("token_count",
        TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("punct_ratio",
        round(TextOps.punctRatio(col(textCol)), 6))
      .withColumn("mean_word_len",
        round(TextOps.meanWordLen(col(textCol)), 6))
      .filter(col("token_count") >= minTokens &&
        col("punct_ratio") <= maxPunct &&
        col("mean_word_len").between(minMeanLen, maxMeanLen))
    val dups = Dedup.ngramJaccard(quality, idCol, textCol, ngramN,
      jaccardThreshold).select(col("dup_id"))
    quality.join(dups, quality(idCol) === dups("dup_id"), "left_anti")
  }
}
