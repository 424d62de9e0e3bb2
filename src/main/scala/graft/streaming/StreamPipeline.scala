package graft.streaming

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.GraftModel
import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Structured-Streaming face of the pipeline ops. The batch reference
 * (xgboost_ray) has no streaming surface; this is the Spark-native
 * extension a continuously-ingesting training-data pipeline needs:
 * the text/quality/langid operators are stateless Catalyst expressions
 * and the model scorer is a broadcast row-local UDF, so all of them run
 * unchanged on a streaming DataFrame — only the stateful pieces
 * (dedup, windowed aggregation) need watermarks.
 *
 * Scale notes: stateless stages keep the micro-batch plan identical to
 * the batch plan (same codegen, same pushdown); `dedupStream` bounds
 * its state store by the watermark horizon; `qualityByWindow` is a
 * standard watermark + tumbling-window agg with map-side partials.
 */
object StreamPipeline {

  /** Text analysis on a stream — token/quality/langid/fingerprint
    * columns appended (stateless, works on batch too). */
  def scoreText(stream: DataFrame, textCol: String): DataFrame =
    TextOps.analyze(stream, textCol)

  /** Streaming model scoring: the broadcast-model predict UDF is
    * row-local, so it applies to a stream as-is. */
  def scoreModel(model: GraftModel, stream: DataFrame,
      spec: DMatrixSpec): DataFrame =
    GraftBoost.predict(model, stream, spec)

  /**
   * Streaming exact dedup: drop rows whose normalized-text fingerprint
   * was already seen within the watermark horizon. State is bounded by
   * the horizon (`delayThreshold`), the streaming analog of
   * `Dedup.exact`.
   */
  def dedupStream(stream: DataFrame, tsCol: String, textCol: String,
      delayThreshold: String): DataFrame =
    stream
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /**
   * Tumbling-window corpus-quality monitor: per (window, language)
   * document counts and mean quality score — the "is my ingest healthy"
   * aggregation a data pipeline runs continuously.
   */
  def qualityByWindow(stream: DataFrame, tsCol: String, textCol: String,
      windowDuration: String, delayThreshold: String): DataFrame =
    stream
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration).as("win"),
        TextOps.langId(col(textCol)).as("lang_id"))
      .agg(count(lit(1)).as("n_docs"),
        avg(TextOps.qualityScore(col(textCol))).as("mean_quality"))
}
