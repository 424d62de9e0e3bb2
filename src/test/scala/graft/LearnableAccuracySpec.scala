package graft

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.TrainParams
import org.apache.spark.sql.functions._

/**
 * Model-quality threshold on the reference's LEARNABLE benchmark
 * fixture at test scale (verdict r19 #1, the `test_sklearn.py`
 * accuracy idiom): `BenchLarge.generateDF(mode = "learnable")` is the
 * `create_learnable_data.py` make_classification analog — 2 of 4
 * informative gaussian features, flip_y = 0.2 ⇒ target accuracy 0.8 —
 * and this spec trains the SAME generator the 1e7-row bench gate
 * runs, so a silent regression in split finding / gain arithmetic
 * that still converges (the failure every logloss-TREND pin would
 * miss) fails here in seconds, not only in the stress bench.
 *
 * Two thresholds, mirroring the BenchLarge gate exactly:
 *  - labeled train error ≤ 0.205: the 0.2 Bayes floor (the realized
 *    flip fraction) + slack — a healthy trainer converges TO the
 *    floor and cannot go measurably below it without memorizing;
 *  - clean-boundary error ≤ 0.05: accuracy against the PRE-FLIP
 *    planted class, which flip noise cannot blur — the sharp gate.
 */
class LearnableAccuracySpec extends SparkTestBase {

  test("learnable fixture at test scale: error_last <= 0.205 and " +
      "clean-boundary error <= 0.05 (reference target accuracy 0.8)") {
    val df = BenchLarge.generateDF(spark, rows = 100000L, parts = 10,
      mode = "learnable").cache()
    val spec = DMatrixSpec(labelCol = Seq("labels"),
      ignore = Seq("partition", "label_clean"))
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "binary:logistic", numRounds = 10,
        maxDepth = 6, eta = 0.3, evalMetric = Seq("logloss", "error"),
        seed = 1234),
      evals = Seq(("train", df)), numWorkers = 4)

    val ll = res.evalsResult("train")("logloss")
    val err = res.evalsResult("train")("error")
    assert(ll.last < ll.head,
      s"logloss did not decrease: ${ll.head} -> ${ll.last}")
    assert(err.last <= 0.205,
      s"train error ${err.last} > 0.205 — the trainer no longer " +
        "reaches the reference's 0.8 target accuracy on the planted " +
        "signal")

    val cleanErr = GraftBoost.predict(res.model, df, spec)
      .agg(avg(when((col("prediction") > 0.5).cast("int") =!=
        col("label_clean").cast("int"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(cleanErr <= 0.05,
      s"clean-boundary error $cleanErr > 0.05 — the model did not " +
        "recover the planted class boundary")
    df.unpersist(blocking = false)
  }
}
