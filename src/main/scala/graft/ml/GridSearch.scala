package graft.ml

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.{Metrics, Objectives, TrainParams, TrainResult}
import org.apache.spark.sql.DataFrame

/**
 * Hyperparameter grid search — the Tune-analog recipe (C11; reference:
 * xgboost_ray/tune.py:26-104, where each Tune trial runs one distributed
 * `train()`). On Spark the cluster is shared, so trials run
 * sequentially, each using the full parallelism (the MLlib
 * CrossValidator idiom); the winner is the candidate with the best
 * last-round metric on the validation set.
 */
object GraftGridSearch {

  final case class Trial(params: TrainParams, metric: String,
      score: Double)
  final case class Result(bestResult: TrainResult,
      bestTrial: Trial, trials: Seq[Trial]) {
    def bestParams: TrainParams = bestTrial.params
    def bestScore: Double = bestTrial.score
  }

  /** Metric used for ranking: last of evalMetric ++ customMetrics, else
    * the objective's default (the xgboost early-stopping rule). */
  private def rankingMetric(p: TrainParams): String =
    (p.evalMetric ++ p.customMetrics.map(_.name)).lastOption
      .getOrElse(Metrics.defaultMetric(Objectives.resolve(p).name, p))

  /** Cartesian expansion helper over the most-tuned knobs; any other
    * knob can be varied by passing explicit `TrainParams` copies. */
  def expand(base: TrainParams,
      eta: Seq[Double] = Nil,
      maxDepth: Seq[Int] = Nil,
      subsample: Seq[Double] = Nil,
      numRounds: Seq[Int] = Nil): Seq[TrainParams] = {
    val es = if (eta.isEmpty) Seq(base.eta) else eta
    val ds = if (maxDepth.isEmpty) Seq(base.maxDepth) else maxDepth
    val ss = if (subsample.isEmpty) Seq(base.subsample) else subsample
    val rs = if (numRounds.isEmpty) Seq(base.numRounds) else numRounds
    for (e <- es; d <- ds; s <- ss; r <- rs)
      yield base.copy(eta = e, maxDepth = d, subsample = s, numRounds = r)
  }

  /**
   * Train every candidate, score on `valDf`, return the best.
   * Each candidate's training is fully distributed; the search loop is
   * driver-side (tune.py's trial loop analog). `parallelism > 1` runs
   * that many trials as concurrent Spark job groups (the MLlib
   * CrossValidator parallelism idiom) — useful when single trials
   * cannot saturate the cluster.
   */
  def fit(df: DataFrame, spec: DMatrixSpec, grid: Seq[TrainParams],
      valDf: DataFrame, numWorkers: Int = 0,
      parallelism: Int = 1,
      /** Per-round trial stream (the tune.report analog): invoked with
        * (trial params, round, metrics) as each round of each trial
        * completes — lets a search-side consumer monitor or log
        * mid-trial instead of waiting for the final ranking. */
      onRound: (TrainParams, Int, Map[String, Double]) => Unit =
        (_, _, _) => ()): Result = {
    require(grid.nonEmpty, "empty parameter grid")
    def trial(p: TrainParams): (Trial, TrainResult) = {
      val metric = rankingMetric(p)
      val res = GraftBoost.train(df, spec, p,
        evals = Seq(("val", valDf)), numWorkers = numWorkers,
        callbacks = Seq(new TuneReportCallback(
          (r, m) => onRound(p, r, m))))
      // with early stopping active, rank on the best iteration's score
      // (the xgboost/Tune convention), not the possibly-degraded final
      // round (advisor r2)
      val value =
        if (p.earlyStoppingRounds > 0 && !res.bestScore.isNaN) res.bestScore
        else res.evalsResult("val")(metric).last
      (Trial(p, metric, value), res)
    }
    val scored: Seq[(Trial, TrainResult)] =
      if (parallelism <= 1) grid.map(trial)
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(parallelism, grid.size))
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(grid.map(p =>
          Future(trial(p)))), Duration.Inf)
        finally pool.shutdown()
      }
    val customByName = grid.head.customMetrics.map(m => m.name -> m).toMap
    val best = scored.minBy { case (t, _) =>
      if (Metrics.maximize(t.metric, customByName)) -t.score else t.score
    }
    Result(best._2, best._1, scored.map(_._1))
  }
}
