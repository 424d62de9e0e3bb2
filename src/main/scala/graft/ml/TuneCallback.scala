package graft.ml

import graft.learner.{GraftModel, ModelAwareCallback}
import org.apache.spark.sql.SparkSession

/**
 * Per-round trial reporting + checkpointing — analog of the reference's
 * `TuneReportCheckpointCallback` (xgboost_ray/tune.py:26-104), which
 * streams each completed round's metrics (and, on a cadence, a model
 * checkpoint) from the distributed trainer to the search-side consumer
 * so a scheduler can rank, early-terminate, or resume trials mid-run.
 *
 * @param report          invoked after each reported round with
 *                        (round, metrics) — the `tune.report` analog
 * @param frequency       report every N rounds (reference default 1)
 * @param checkpointEvery save the partial model every N rounds
 *                        (0 = never) under `checkpointPath/round=<r>`
 *                        via the parquet model sink, so any checkpoint
 *                        loads with `GraftModel.load` independently
 */
final class TuneReportCallback(
    report: (Int, Map[String, Double]) => Unit,
    frequency: Int = 1,
    checkpointEvery: Int = 0,
    checkpointPath: Option[String] = None,
    spark: Option[SparkSession] = None) extends ModelAwareCallback {

  override def afterIterationWithModel(round: Int,
      metrics: Map[String, Double], model: () => GraftModel): Boolean = {
    if (frequency > 0 && (round + 1) % frequency == 0)
      report(round, metrics)
    if (checkpointEvery > 0 && (round + 1) % checkpointEvery == 0)
      for (p <- checkpointPath; s <- spark)
        model().save(s, s"$p/round=$round")
    false
  }
}
