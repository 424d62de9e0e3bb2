package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * Adaptive leaf refresh (xgboost UpdateTreeLeaf) for the L1 family:
 * after a tree is built, reg:absoluteerror / reg:quantileerror leaves
 * are RESET to η·Q_α(label − margin) over the rows routed to each leaf
 * (α = 0.5 / quantile_alpha), via the exact distributed lower-quantile
 * (batched histogram refinement, no row shuffle). Without it the
 * constant-hessian L1 leaves are bounded by ±η and cannot fit labels at
 * scale — this is what makes xgboost's MAE actually converge.
 */
class AdaptiveLeafSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed median refresh: a depth-1 MAE stump's leaves are " +
      "exactly eta * lower-median of per-leaf residuals") {
    // residual SIGNS must differ across the split or the sign gradients
    // are constant and no cut has positive gain: leaf x<=0 sits below
    // the 0.5 base (y in {-1, 0, 0.4}, median residual 0.0f - 0.5f),
    // leaf x>0 above it (y in {10,20,20,30}, lower median 20)
    val rows = Seq((0.0, -1.0), (0.0, 0.0), (0.0, 0.4),
      (1.0, 10.0), (1.0, 20.0), (1.0, 20.0), (1.0, 30.0))
    val df = rows.toDF("x", "y").repartition(3)
    val m = GraftBoost.train(df, DMatrixSpec("y"), TrainParams(
      objective = "reg:absoluteerror", numRounds = 1, maxDepth = 1,
      eta = 0.3, minChildWeight = 0.0, lambda = 0.0, seed = 1)).model
    val t = m.trees.head
    assert(t.feature(0) === 0, "root must split on x")
    val lv = t.value(t.left(0)); val rv = t.value(t.right(0))
    assert(lv === (0.3 * (0.0f - 0.5f).toDouble).toFloat,
      s"left leaf = eta * median({-1.5,-0.5,-0.1}) = 0.3*(-0.5), got $lv")
    assert(rv === (0.3 * (20.0f - 0.5f).toDouble).toFloat,
      s"right leaf = eta * lowerMedian({9.5,19.5,19.5,29.5}), got $rv")
  }

  test("weighted lower quantile: row weights shift the selected value") {
    // one leaf (no split possible: single x value ⇒ no candidate cut).
    // values {1(w=1), 2(w=1), 3(w=6)}: W=8, target=4 ⇒ cum at 1 is 1,
    // at 2 is 2, at 3 is 8 ⇒ weighted lower median = 3 (unweighted = 2)
    val rows = Seq((1.0, 1.0, 1.0), (1.0, 2.0, 1.0), (1.0, 3.0, 6.0))
    val df = rows.toDF("x", "y", "w")
    val m = GraftBoost.train(df,
      DMatrixSpec(labelCol = Seq("y"), weightCol = Some("w")),
      TrainParams(objective = "reg:absoluteerror", numRounds = 1,
        maxDepth = 1, eta = 1.0, minChildWeight = 0.0, seed = 1)).model
    val t = m.trees.head
    assert(t.feature(0) === -1, "single-value feature cannot split")
    assert(t.value(0) === (1.0 * (3.0f - 0.5f).toDouble).toFloat,
      s"weighted median must pick 3 (residual 2.5), got ${t.value(0)}")
  }

  test("golden equality: 1-partition MAE model == 8-partition " +
      "(refinement quantile is partition-invariant)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 3000).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a - 2 * b + rng.nextGaussian())
    }
    val df = rows.toDF("a", "b", "y")
    val p = TrainParams(objective = "reg:absoluteerror", numRounds = 5,
      maxDepth = 3, seed = 11)
    val m1 = GraftBoost.train(df.repartition(1), DMatrixSpec("y"), p).model
    val m8 = GraftBoost.train(df.repartition(8), DMatrixSpec("y"), p).model
    assert(m1.dump() === m8.dump())
  }

  test("MAE converges to the conditional median under asymmetric " +
      "noise (the refresh is what makes L1 actually fit)") {
    // y = 5 + Exp(1) noise: conditional median = 5 + ln 2 ≈ 5.69,
    // mean = 6.0 — an L1 fit must land near the median, which the
    // ±eta-bounded gradient-only leaves could never reach in 30 rounds
    val rng = new scala.util.Random(3)
    val rows = (1 to 4000).map { _ =>
      val a = rng.nextDouble()
      (a, 5.0 + (-math.log(1.0 - rng.nextDouble())))
    }
    val df = rows.toDF("a", "y").repartition(4)
    val res = GraftBoost.train(df, DMatrixSpec("y"), TrainParams(
      objective = "reg:absoluteerror", numRounds = 30, maxDepth = 2,
      eta = 0.3, seed = 5, evalMetric = Seq("mae")),
      evals = Seq(("train", df)))
    val preds = GraftBoost.predict(res.model, df, DMatrixSpec("y"))
      .select("prediction").as[Double].collect()
    val mean = preds.sum / preds.length
    assert(math.abs(mean - (5.0 + math.log(2.0))) < 0.15,
      s"predictions must center on the conditional median ~5.69, " +
        s"got $mean")
    val hist = res.evalsResult("train")("mae")
    assert(hist.last < hist.head * 0.5,
      "train mae must improve substantially")
  }

  test("refresh composes with lossguide and dart (partition-invariant)") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 2000).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 2 * a + b + rng.nextGaussian() * 0.2)
    }
    val df = rows.toDF("a", "b", "y")
    val p = TrainParams(objective = "reg:quantileerror",
      quantileAlpha = 0.9, numRounds = 4, booster = "dart",
      rateDrop = 0.5, growPolicy = "lossguide", maxDepth = 0,
      maxLeaves = 6, seed = 17)
    val m1 = GraftBoost.train(df.repartition(1), DMatrixSpec("y"), p).model
    val m8 = GraftBoost.train(df.repartition(8), DMatrixSpec("y"), p).model
    assert(m1.dump() === m8.dump())
  }
}
