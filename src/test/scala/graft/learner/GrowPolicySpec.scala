package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.ml.{GraftRegressor, GraftXGBRegressor}

/**
 * `grow_policy=lossguide` + `max_leaves` (xgboost tree_method=hist knobs
 * the reference forwards verbatim with the rest of the params,
 * main.py:1341-1398). Semantics under test:
 *  - depthwise expands the whole frontier level by level (the default,
 *    bit-compatible with the pre-grow-policy trainer when maxLeaves=0);
 *  - lossguide expands the single highest-gain leaf first (best-first);
 *  - maxLeaves caps leaves per tree under BOTH policies;
 *  - with no caps the two policies learn the same FUNCTION, because a
 *    node's best split depends only on its own rows — expansion order
 *    cannot change any individual decision.
 */
class GrowPolicySpec extends SparkTestBase {
  import spark.implicits._

  private val spec = DMatrixSpec("y")

  private def regDf(n: Int = 2000, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a - 2 * b + 0.3 * rng.nextGaussian())
    }.toDF("a", "b", "y")
  }

  private def leavesOf(t: RegTree): Int = t.feature.count(_ == -1)
  private def depthOf(t: RegTree): Int = {
    def rec(i: Int, d: Int): Int =
      if (t.feature(i) < 0) d
      else math.max(rec(t.left(i), d + 1), rec(t.right(i), d + 1))
    rec(0, 0)
  }

  test("uncapped lossguide learns the same function as depthwise " +
      "(same split set, different node order) — predictions bit-equal") {
    val df = regDf(3000).repartition(4)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 3, maxDepth = 4, seed = 11)
    val dw = GraftBoost.train(df, spec, base).model
    val lg = GraftBoost.train(df, spec,
      base.copy(growPolicy = "lossguide")).model
    val rows = df.select("a", "b").collect()
      .map(r => Array(r.getDouble(0).toFloat, r.getDouble(1).toFloat))
    rows.foreach { x =>
      assert(dw.predict(x)(0) === lg.predict(x)(0),
        "per-node split decisions are order-independent — the learned " +
          "function must match exactly")
    }
    // same number of leaves too (same split set)
    assert(dw.trees.map(leavesOf).sum === lg.trees.map(leavesOf).sum)
  }

  test("golden equality: 1-partition lossguide model == 8-partition") {
    val df = regDf(3000)
    val p = TrainParams(objective = "reg:squarederror",
      growPolicy = "lossguide", maxLeaves = 8, maxDepth = 0,
      numRounds = 4, eta = 0.4, seed = 5)
    val m1 = GraftBoost.train(df.repartition(1), spec, p).model
    val m8 = GraftBoost.train(df.repartition(8), spec, p).model
    assert(m1.dump() === m8.dump(),
      "expansion order is driver-chosen and histograms allreduced — " +
        "the lossguide model must be partition-count invariant")
  }

  test("maxLeaves caps leaves per tree (lossguide, unbounded depth)") {
    val df = regDf(4000).repartition(4)
    for (cap <- Seq(2, 4, 7)) {
      val m = GraftBoost.train(df, spec, TrainParams(
        objective = "reg:squarederror", growPolicy = "lossguide",
        maxDepth = 0, maxLeaves = cap, numRounds = 3, seed = 3)).model
      m.trees.foreach(t => assert(leavesOf(t) <= cap,
        s"cap $cap violated: ${leavesOf(t)} leaves"))
      // enough signal to exhaust a small budget exactly
      if (cap <= 4) m.trees.foreach(t => assert(leavesOf(t) === cap))
    }
  }

  test("lossguide grows past maxDepth-equivalent when depth is " +
      "unbounded: a nested staircase needs a chain deeper than " +
      "log2(leaves)") {
    // y is a 5-step staircase in `a` whose steps grow by 10× toward
    // a=1: the optimal greedy cut always peels off the extreme tail, so
    // best-first growth produces a pure left-leaning chain — 5 leaves at
    // depth 4, impossible for depthwise under maxDepth<=3
    // 64 distinct `a` values (64 rows each) so every step boundary is
    // bin-exact under maxBins=256 — a quantile cut straddling a step
    // would otherwise leak a stray splittable mixture into the tail
    val rows = (0 until 4096).map { i =>
      val a = (i / 64) / 64.0
      val y = if (a < 0.5) 0.0 else if (a < 0.75) 1.0
        else if (a < 0.875) 10.0 else if (a < 0.9375) 100.0 else 1000.0
      (a, y)
    }
    val df = rows.toDF("a", "y").repartition(4)
    val m = GraftBoost.train(df, DMatrixSpec("y"), TrainParams(
      objective = "reg:squarederror", growPolicy = "lossguide",
      maxDepth = 0, maxLeaves = 5, eta = 1.0, lambda = 0.0,
      numRounds = 1, seed = 1)).model
    val t = m.trees.head
    assert(leavesOf(t) === 5)
    assert(depthOf(t) === 4,
      "nested staircase must grow a depth-4 chain — impossible under " +
        "depthwise maxDepth<=3 with 5 leaves")
  }

  test("best-first spends the budget on the high-gain side: flat side " +
      "stays a single leaf") {
    // y steps 0 → 10 → 30: the optimal root cut is at 0.75 (peeling the
    // far 30-group wins the gain race), leaving ALL remaining signal in
    // the left {0,10} mixture. With maxLeaves=3 the one remaining split
    // must go there; the flat right side stays a leaf.
    val rows = (0 until 4000).map { i =>
      val a = i / 4000.0
      val y = if (a < 0.5) 0.0 else if (a < 0.75) 10.0 else 30.0
      (a, y)
    }
    val df = rows.toDF("a", "y").repartition(4)
    val m = GraftBoost.train(df, DMatrixSpec("y"), TrainParams(
      objective = "reg:squarederror", growPolicy = "lossguide",
      maxDepth = 0, maxLeaves = 3, eta = 1.0, lambda = 0.0,
      numRounds = 1, seed = 1)).model
    val t = m.trees.head
    assert(t.feature(0) === 0, "root splits on the only feature")
    assert(t.threshold(0) > 0.7 && t.threshold(0) < 0.8,
      s"optimal root cut is at 0.75, got ${t.threshold(0)}")
    val (l, r) = (t.left(0), t.right(0))
    assert(t.feature(l) >= 0, "mixture side must receive the budget")
    assert(t.feature(r) === -1, "flat side must stay a leaf")
  }

  test("depthwise + maxLeaves spends each level's budget " +
      "best-gain-first") {
    val rows = (0 until 4000).map { i =>
      val a = i / 4000.0
      val y = if (a < 0.5) 0.0 else if (a < 0.75) 10.0 else 30.0
      (a, y)
    }
    val df = rows.toDF("a", "y").repartition(4)
    val m = GraftBoost.train(df, DMatrixSpec("y"), TrainParams(
      objective = "reg:squarederror", growPolicy = "depthwise",
      maxDepth = 4, maxLeaves = 3, eta = 1.0, lambda = 0.0,
      numRounds = 1, seed = 1)).model
    val t = m.trees.head
    assert(leavesOf(t) === 3)
    // root cuts at 0.75 (see the lossguide sibling test): the left
    // {0,10} mixture is the only child with remaining gain, so it must
    // win the level's last budget slot; the flat right stays a leaf
    assert(t.feature(t.left(0)) >= 0 && t.feature(t.right(0)) === -1,
      "the mixture-side split must win the last budget slot")
  }

  test("lossguide composes with multiclass softprob (per-class-tree " +
      "leaf caps) and with dart") {
    val rng = new scala.util.Random(53)
    val rows = (1 to 1500).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, if (a > 0.6) 2.0 else if (b > 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("a", "b", "y").repartition(4)
    val sm = GraftBoost.train(df, spec, TrainParams(
      objective = "multi:softprob", numClass = 3, numRounds = 2,
      growPolicy = "lossguide", maxDepth = 0, maxLeaves = 4,
      seed = 7)).model
    assert(sm.trees.length === 6)
    sm.trees.foreach(t => assert(leavesOf(t) <= 4))
    val da = GraftBoost.train(df, spec, TrainParams(
      objective = "multi:softprob", numClass = 3, numRounds = 3,
      booster = "dart", rateDrop = 0.5, growPolicy = "lossguide",
      maxDepth = 0, maxLeaves = 4, seed = 7)).model
    assert(da.trees.length === 9)
    da.trees.foreach(t => assert(leavesOf(t) <= 4))
  }

  test("validation fail-fasts: unknown policy, negative maxLeaves, " +
      "unbounded depth without a leaf budget") {
    val df = regDf(100)
    def boom(p: TrainParams): Unit =
      intercept[IllegalArgumentException] {
        GraftBoost.train(df, spec, p)
      }
    val base = TrainParams(objective = "reg:squarederror", numRounds = 1)
    boom(base.copy(growPolicy = "bestfirst"))
    boom(base.copy(maxLeaves = -1))
    boom(base.copy(maxDepth = 0)) // depthwise, unbounded: no budget
    boom(base.copy(maxDepth = 0, growPolicy = "lossguide")) // still none
  }

  test("facades forward growPolicy/maxLeaves (native setters + MLlib " +
      "Params)") {
    val df = regDf(800).repartition(2)
    val p = TrainParams(objective = "reg:squarederror",
      growPolicy = "lossguide", maxLeaves = 4, maxDepth = 0,
      numRounds = 3, seed = 23)
    val direct = GraftBoost.train(df, spec, p).model
    val est = new GraftRegressor().setLabelCol("y")
      .setGrowPolicy("lossguide").setMaxLeaves(4).setMaxDepth(0)
      .setNumRounds(3).setSeed(23)
    assert(est.fit(df).model.dump() === direct.dump(),
      "native facade must forward growPolicy/maxLeaves")
    val xgb = new GraftXGBRegressor().setLabelCol("y")
      .setGrowPolicy("lossguide").setMaxLeaves(4).setMaxDepth(0)
      .setNumRounds(3).setSeed(23)
    assert(xgb.getGrowPolicy === "lossguide" && xgb.getMaxLeaves === 4)
    assert(xgb.fit(df).graftModel.dump() === direct.dump(),
      "MLlib facade must forward growPolicy/maxLeaves")
  }
}
