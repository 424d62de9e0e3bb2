package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * xgboost `process_type=update` + `updater=refresh`: structure-
 * preserving re-fit of an existing model's leaf values and node stats
 * against the current data (the reference forwards both params
 * verbatim, main.py:1341-1398).
 */
class RefreshSpec extends SparkTestBase {
  import spark.implicits._

  private def regDf(n: Int = 1500, seed: Int = 7, shift: Double = 0.0) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a - 2 * b + 0.3 * rng.nextGaussian() + shift)
    }.toDF("a", "b", "y")
  }

  private val spec = DMatrixSpec("y")

  test("golden idempotence: refreshing on the SAME data reproduces " +
      "the trained model bit-for-bit (squared error)") {
    val df = regDf().repartition(3)
    val p = TrainParams(objective = "reg:squarederror", numRounds = 4,
      maxDepth = 3, seed = 11)
    val m = GraftBoost.train(df, spec, p).model
    val r = GraftBoost.train(df, spec,
      p.copy(processType = "update"), initModel = Some(m)).model
    // identical data → identical gradients at each round's margin →
    // identical −η·G/(H+λ) leaves; structure is shared by construction
    assert(r.dump() === m.dump())
    assert(r.trees.length === m.trees.length)
  }

  test("closed form: refreshing a stump on shifted labels moves each " +
      "leaf by exactly the shifted-gradient weight") {
    // depth-1 stump on a binary feature, squared error, base 0.5:
    // leaf = −η(0.5n − Σy)/(n + 1). Refresh on y+10 replays the same
    // formula with Σy' = Σy + 10n — exact double arithmetic both sides
    val rows = Seq((0.0, 1.0), (0.0, 3.0), (1.0, 10.0), (1.0, 14.0))
    val df = rows.toDF("x", "y").repartition(2)
    val p = TrainParams(numRounds = 1, maxDepth = 1, seed = 1,
      minChildWeight = 0.0)
    val m = GraftBoost.train(df, spec.copy(labelCol = Seq("y")), p).model
    val shifted = rows.map { case (x, y) => (x, y + 10.0) }
      .toDF("x", "y").repartition(2)
    val r = GraftBoost.train(shifted, spec.copy(labelCol = Seq("y")),
      p.copy(processType = "update"), initModel = Some(m)).model
    val t0 = m.trees.head; val t1 = r.trees.head
    assert(t1.feature.sameElements(t0.feature), "structure preserved")
    assert(t1.threshold.sameElements(t0.threshold))
    // left leaf (x=0): y {1,3} → refreshed on {11,13}:
    // −0.3·(0.5·2 − 24)/(2+1); right (x=1): {20,24} → −0.3·(1 − 44)/3
    val lv = (-0.3 * (0.5 * 2 - 24.0) / 3.0).toFloat
    val rv = (-0.3 * (0.5 * 2 - 44.0) / 3.0).toFloat
    assert(t1.value(t0.left(0)) === lv,
      s"left leaf ${t1.value(t0.left(0))} != $lv")
    assert(t1.value(t0.right(0)) === rv,
      s"right leaf ${t1.value(t0.right(0))} != $rv")
    // stats refreshed too: root cover = 4 rows (unit hessian)
    assert(t1.cover(0) === 4f)
  }

  test("L1-family parity: same-data refresh of an MAE model is " +
      "bit-identical (the adaptive quantile UpdateTreeLeaf hook runs " +
      "in update mode too)") {
    val df = regDf(2000, seed = 23).repartition(3)
    val p = TrainParams(objective = "reg:absoluteerror", numRounds = 3,
      maxDepth = 3, seed = 29)
    val m = GraftBoost.train(df, spec, p).model
    val r = GraftBoost.train(df, spec,
      p.copy(processType = "update"), initModel = Some(m)).model
    // MAE leaves are η·Q_0.5 of per-leaf residuals — refresh replays
    // the exact distributed-quantile machinery at identical margins
    assert(r.dump() === m.dump())
    // and the vector-quantile form refreshes per-output
    val pq = TrainParams(objective = "reg:quantileerror",
      quantileAlphas = Seq(0.25, 0.75), numRounds = 2, maxDepth = 2,
      seed = 31)
    val mq = GraftBoost.train(df, spec, pq).model
    val rq = GraftBoost.train(df, spec,
      pq.copy(processType = "update"), initModel = Some(mq)).model
    assert(rq.dump() === mq.dump())
  }

  test("refresh_leaf=false recomputes stats but keeps trained leaf " +
      "values") {
    val df = regDf().repartition(2)
    val p = TrainParams(numRounds = 3, maxDepth = 3, seed = 13)
    val m = GraftBoost.train(df, spec, p).model
    val shifted = regDf(seed = 7, shift = 5.0).repartition(2)
    val r = GraftBoost.train(shifted, spec,
      p.copy(processType = "update", refreshLeaf = false),
      initModel = Some(m)).model
    r.trees.zip(m.trees).foreach { case (t1, t0) =>
      assert(t1.value.sameElements(t0.value), "leaf values untouched")
    }
  }

  test("refresh is partition-invariant and reduces error on shifted " +
      "data (the recalibration use case)") {
    val df = regDf(3000).repartition(3)
    val p = TrainParams(numRounds = 5, maxDepth = 3, seed = 17)
    val m = GraftBoost.train(df, spec, p).model
    val shifted = regDf(3000, seed = 7, shift = 4.0)
    def rmse(model: GraftModel): Double = {
      val errs = GraftBoost.predict(model, shifted, spec)
        .select((org.apache.spark.sql.functions.col("prediction") -
          org.apache.spark.sql.functions.col("y")) *
          (org.apache.spark.sql.functions.col("prediction") -
            org.apache.spark.sql.functions.col("y")))
        .as[Double].collect()
      math.sqrt(errs.sum / errs.length)
    }
    val before = rmse(m)
    val r1 = GraftBoost.train(shifted.repartition(1), spec,
      p.copy(processType = "update"), initModel = Some(m)).model
    val r8 = GraftBoost.train(shifted.repartition(8), spec,
      p.copy(processType = "update"), initModel = Some(m)).model
    assert(r1.dump() === r8.dump(),
      "refresh must be partition-count invariant")
    val after = rmse(r1)
    assert(after < before * 0.5,
      s"refresh must recalibrate to the shifted data: $before -> $after")
  }

  test("refresh idempotence across layouts: multiclass softprob " +
      "(per-class margins), forests (numParallelTree shrinkage), and " +
      "categorical partition splits (catBits path-walk routing)") {
    val rng = new scala.util.Random(61)
    // multiclass: 3 classes, k trees per round
    val mc = (1 to 900).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, if (a > 0.6) 2.0 else if (b > 0.5) 1.0 else 0.0)
    }.toDF("a", "b", "y").repartition(3)
    val pm = TrainParams(objective = "multi:softprob", numClass = 3,
      numRounds = 2, maxDepth = 2, seed = 67)
    val m1 = GraftBoost.train(mc, spec, pm).model
    val r1 = GraftBoost.train(mc, spec, pm.copy(processType = "update"),
      initModel = Some(m1)).model
    assert(r1.dump() === m1.dump(), "multiclass refresh idempotence")

    // forest: numParallelTree = 2 divides eta per tree
    val pf = TrainParams(numRounds = 2, maxDepth = 2, seed = 71,
      numParallelTree = 2, subsample = 1.0)
    val df2 = regDf(1200, seed = 73).repartition(2)
    val m2 = GraftBoost.train(df2, spec, pf).model
    val r2 = GraftBoost.train(df2, spec, pf.copy(processType = "update"),
      initModel = Some(m2)).model
    assert(r2.dump() === m2.dump(), "forest refresh idempotence")

    // categorical: 6 codes with planted lift forces an
    // optimal-partition (catBits) split; the refresh path-walk must
    // route through the bitmap identically
    val cat = (1 to 1200).map { _ =>
      val c = rng.nextInt(6)
      (c.toDouble, (if (Set(1, 2, 5)(c)) 50.0 else 0.0) +
        rng.nextDouble())
    }.toDF("cat", "y").repartition(2)
    val cspec = DMatrixSpec(labelCol = Seq("y"),
      categoricalCols = Seq("cat"))
    val pc = TrainParams(numRounds = 2, maxDepth = 2, seed = 79,
      maxCatToOnehot = 4)
    val m3 = GraftBoost.train(cat, cspec, pc).model
    assert(m3.trees.exists(t => (0 until t.numNodes)
      .exists(t.isPartitionNode)), "fixture must produce a partition split")
    val r3 = GraftBoost.train(cat, cspec, pc.copy(processType = "update"),
      initModel = Some(m3)).model
    assert(r3.dump() === m3.dump(), "categorical refresh idempotence")
  }

  test("updater=prune: a huge gamma collapses every tree to its root " +
      "weight; gamma=0 is a no-op; unknown updater fails fast") {
    val df = regDf(1000, seed = 37).repartition(2)
    val p = TrainParams(numRounds = 3, maxDepth = 3, seed = 41)
    val m = GraftBoost.train(df, spec, p).model
    // no-op prune: every kept split's gain cleared gamma=0 at training
    val same = GraftBoost.train(df, spec, p.copy(processType = "update",
      updater = "prune"), initModel = Some(m)).model
    assert(same.dump() === m.dump())
    // total prune: root-only trees predicting base + sum(root weights)
    val stumped = GraftBoost.train(df, spec,
      p.copy(processType = "update", updater = "prune", gamma = 1e18),
      initModel = Some(m)).model
    assert(stumped.trees.forall(_.numNodes === 1),
      "every tree must collapse to its root")
    val expected = (0.5f +: m.trees.map(_.value(0)))
      .reduce((a, b) => a + b) // float left-fold, the predict order
    val got = GraftBoost.predict(stumped, df.limit(1), spec)
      .select("prediction").as[Double].head()
    assert(got === expected.toDouble,
      s"root-collapsed prediction $got != $expected")
    val e = intercept[IllegalArgumentException] {
      GraftBoost.train(df, spec, p.copy(processType = "update",
        updater = "bogus"), initModel = Some(m))
    }
    assert(e.getMessage.contains("updater"))
  }

  test("updater=refresh,prune: re-fit gains on shifted data drive the " +
      "prune (recursive collapse keeps a consistent compact tree)") {
    // labels become CONSTANT on the shifted data → every split's
    // re-fit gain is ~0 < gamma → full collapse onto refreshed
    // root weights (prune consumes the refresh pass's stats)
    val df = regDf(800, seed = 43).repartition(2)
    val p = TrainParams(numRounds = 2, maxDepth = 3, seed = 47)
    val m = GraftBoost.train(df, spec, p).model
    assert(m.trees.exists(_.numNodes > 1))
    val const = df.withColumn("y", org.apache.spark.sql.functions.lit(5.0))
    val r = GraftBoost.train(const, spec, p.copy(processType = "update",
      updater = "refresh,prune", gamma = 1e-6), initModel = Some(m)).model
    assert(r.trees.forall(_.numNodes === 1),
      s"constant labels must prune to roots, got " +
        s"${r.trees.map(_.numNodes).toSeq}")
    // round-1 root weight: squared error on constant 5.0 at base 0.5:
    // -0.3 * (0.5 - 5.0) * n / (n + 1)
    val n = 800.0
    val w0 = (-0.3 * ((0.5 - 5.0) * n) / (n + 1.0)).toFloat
    assert(r.trees.head.value(0) === w0,
      s"refreshed root weight ${r.trees.head.value(0)} != $w0")
  }

  test("pruned and refreshed models keep exact-TreeSHAP local " +
      "accuracy (compacted covers stay walk-consistent)") {
    val df = regDf(900, seed = 83).repartition(2)
    val p = TrainParams(numRounds = 3, maxDepth = 3, seed = 89)
    val m = GraftBoost.train(df, spec, p).model
    // refresh on shifted data, then prune: pick gamma just above the
    // smallest RE-FIT gain among leaf-parent nodes, so the prune is
    // guaranteed partial and deterministic
    val shifted = regDf(900, seed = 91, shift = 2.0).repartition(2)
    val r0 = GraftBoost.train(shifted, spec, p.copy(
      processType = "update"), initModel = Some(m)).model
    val prunableGains = r0.trees.flatMap(t =>
      (0 until t.numNodes).filter { i =>
        t.feature(i) >= 0 && t.feature(t.left(i)) < 0 &&
          t.feature(t.right(i)) < 0
      }.map(t.gain(_).toDouble))
    val gamma = prunableGains.min + 1e-6
    val r = GraftBoost.train(shifted, spec, p.copy(
      processType = "update", updater = "refresh,prune", gamma = gamma),
      initModel = Some(m)).model
    assert(r.trees.map(_.numNodes).sum < m.trees.map(_.numNodes).sum,
      s"gamma=$gamma sits above the min prunable re-fit gain and " +
        "must prune at least one node")
    val rng = new scala.util.Random(97)
    (1 to 20).foreach { _ =>
      val x = Array(rng.nextFloat(), rng.nextFloat())
      val margin = r.margins(x)(0).toDouble
      var sum = r.initMargin.toDouble
      r.trees.foreach { t =>
        val phi = new Array[Double](2)
        sum += t.shapWalk(x, phi) + phi.sum
        // shapWalk returns the expected value E[f]; contributions sum
        // with it to the tree's raw output
      }
      assert(math.abs(sum - margin) < 1e-4,
        s"SHAP local accuracy broke on the pruned model: $sum vs $margin")
    }
  }

  test("prefix refresh commits ONLY the refreshed rounds (xgboost " +
      "moves all trees to trees_to_update and keeps num_boost_round " +
      "of them): same-data prefix == truncate, bit-for-bit") {
    val df = regDf(1200, seed = 101).repartition(2)
    val p = TrainParams(numRounds = 4, maxDepth = 3, seed = 103)
    val m = GraftBoost.train(df, spec, p).model
    val r = GraftBoost.train(df, spec,
      p.copy(processType = "update", numRounds = 2),
      initModel = Some(m)).model
    assert(r.numRounds === 2,
      "the un-refreshed tail must be dropped, not returned stale")
    assert(r.dump() === m.truncate(2).dump(),
      "same-data prefix refresh == truncated original")
  }

  test("dart refresh: rateDrop=0 dart refreshes bit-identically to " +
      "gbtree and the result stays a dart model (weights carried)") {
    val df = regDf(1000, seed = 107).repartition(2)
    val p = TrainParams(numRounds = 3, maxDepth = 3, seed = 109)
    val mG = GraftBoost.train(df, spec, p).model
    val mD = GraftBoost.train(df, spec,
      p.copy(booster = "dart", rateDrop = 0.0)).model
    val shifted = regDf(1000, seed = 113, shift = 3.0).repartition(2)
    val rG = GraftBoost.train(shifted, spec,
      p.copy(processType = "update"), initModel = Some(mG)).model
    val rD = GraftBoost.train(shifted, spec,
      p.copy(processType = "update", booster = "dart"),
      initModel = Some(mD)).model
    assert(rD.dump() === rG.dump(),
      "all-1.0 weights must make dart refresh == gbtree refresh")
    assert(rD.dartWeights.length === rD.trees.length &&
      rD.dartWeights.forall(_ == 1.0),
      "refresh must keep the dart bookkeeping on the output model")
  }

  test("dart refresh re-applies the stored cumulative weight: the " +
      "round-0 re-fit scales by w_0 vs a weight-stripped clone") {
    val df = regDf(1000, seed = 127).repartition(2)
    val p = TrainParams(numRounds = 3, maxDepth = 2, seed = 131)
    // rateDrop=1 drops every prior tree each round → non-unit weights
    val mD = GraftBoost.train(df, spec, p.copy(booster = "dart",
      rateDrop = 1.0, skipDrop = 0.0)).model
    val w0 = mD.dartWeights(0)
    assert(math.abs(w0 - 1.0) > 1e-9,
      "fixture must produce a non-unit weight on tree 0")
    // same trees, no dart bookkeeping → the refresh refits RAW values
    val stripped = new GraftModel(mD.trees, mD.objective, mD.numClass,
      mD.baseScore, mD.missingBin, mD.numFeatures, mD.numParallelTree)
    def prefix1(init: GraftModel) = GraftBoost.train(df, spec,
      p.copy(processType = "update", numRounds = 1,
        booster = if (init.dartWeights.nonEmpty) "dart" else "gbtree"),
      initModel = Some(init)).model
    val rD = prefix1(mD); val rS = prefix1(stripped)
    assert(rD.dartWeights.toSeq === Seq(w0),
      "prefix refresh must truncate the weight vector with the trees")
    val t1 = rD.trees.head; val t0 = rS.trees.head
    (0 until t0.numNodes).foreach { i =>
      val want = t0.value(i) * w0
      assert(math.abs(t1.value(i) - want) <=
        1e-6 * math.max(1.0, math.abs(want)),
        s"node $i: ${t1.value(i)} != ${t0.value(i)} * $w0")
    }
  }

  test("fail-fasts: no init model, too many rounds, " +
      "eval sets, unknown processType") {
    val df = regDf(200)
    val p = TrainParams(numRounds = 2, maxDepth = 2, seed = 1)
    val m = GraftBoost.train(df, spec, p).model
    def msg(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    assert(msg(GraftBoost.train(df, spec,
      p.copy(processType = "update"))).contains("initModel"))
    assert(msg(GraftBoost.train(df, spec,
      p.copy(processType = "update", numRounds = 5),
      initModel = Some(m))).contains("rounds"))
    assert(msg(GraftBoost.train(df, spec,
      p.copy(processType = "update"), initModel = Some(m),
      evals = Seq(("e", df)))).contains("eval"))
    assert(msg(GraftBoost.train(df, spec,
      p.copy(processType = "bogus")))
      .contains("processType"))
  }
}
