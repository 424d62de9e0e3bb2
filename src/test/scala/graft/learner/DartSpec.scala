package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.ml.{GraftRegressor, GraftXGBRegressor}

/**
 * DART booster (X37 / E1 `booster="dart"`): dropout-regularized
 * boosting per Rashmi & Gilad-Bachrach 2015. Reference hook: the
 * reference forwards `booster` verbatim with the xgboost params
 * (main.py:1341-1398) and its sklearn suite switches boosters
 * (tests/test_sklearn.py:484-510).
 *
 * Closed forms used below (normalize_type semantics, xgboost
 * convention, lr = eta / treesPerRound, k = |drop set|):
 *   "tree":   new trees weighted 1/(k+lr), dropped rescaled by k/(k+lr)
 *   "forest": both weighted/rescaled by 1/(1+lr)
 * With rateDrop=1 every round retrains from the base margins, so every
 * round's tree is bit-identical and the weights follow the closed-form
 * recurrences checked here.
 */
class DartSpec extends SparkTestBase {
  import spark.implicits._

  private def regDf(n: Int = 2000, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a - 2 * b + 0.3 * rng.nextGaussian())
    }.toDF("a", "b", "y")
  }

  private val spec = DMatrixSpec("y")

  test("rateDrop=0 dart is bit-identical to gbtree (golden)") {
    val df = regDf().repartition(4)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 6, maxDepth = 3, seed = 11)
    val gb = GraftBoost.train(df, spec, base).model
    val da = GraftBoost.train(df, spec,
      base.copy(booster = "dart", rateDrop = 0.0)).model
    assert(gb.dump() === da.dump(),
      "dart with no dropout must reproduce gbtree exactly")
  }

  test("skipDrop=1.0 dart is bit-identical to gbtree (every round " +
      "skips the dropout)") {
    val df = regDf().repartition(3)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 5, maxDepth = 3, seed = 3)
    val gb = GraftBoost.train(df, spec, base).model
    val da = GraftBoost.train(df, spec,
      base.copy(booster = "dart", rateDrop = 0.7, skipDrop = 1.0)).model
    assert(gb.dump() === da.dump())
  }

  test("golden equality: 1-partition dart model == 8-partition") {
    val df = regDf(3000)
    val p = TrainParams(objective = "reg:squarederror", booster = "dart",
      numRounds = 6, maxDepth = 3, eta = 0.4, rateDrop = 0.5, seed = 5)
    val m1 = GraftBoost.train(df.repartition(1), spec, p).model
    val m8 = GraftBoost.train(df.repartition(8), spec, p).model
    assert(m1.dump() === m8.dump(),
      "drop sets are driver-chosen and histograms allreduced — the " +
        "dart model must be partition-count invariant")
  }

  test("two-round rateDrop=1 'tree' normalization closed form: both " +
      "trees carry the round-1 leaves scaled by 1/(1+eta)") {
    val df = regDf().repartition(4)
    // eta = 1 ⇒ the 1/(1+eta) = 0.5 rescale is float-exact
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 1, maxDepth = 2, eta = 1.0, seed = 9)
    val one = GraftBoost.train(df, spec, base).model
    val dart = GraftBoost.train(df, spec, base.copy(booster = "dart",
      numRounds = 2, rateDrop = 1.0)).model
    assert(dart.trees.length === 2)
    // round 2 drops the only tree ⇒ identical gradients ⇒ T1 ≡ T0;
    // commit rescales both by kd/(kd+lr) = 1/(1+lr) = 0.5
    val expected = one.trees.head.value.map(v => (v * 0.5).toFloat)
    dart.trees.foreach { t =>
      assert(t.feature.sameElements(one.trees.head.feature))
      assert(t.value.sameElements(expected),
        "leaf values must be the round-1 leaves × 0.5 exactly")
    }
  }

  test("three-round rateDrop=1 closed form separates 'tree' from " +
      "'forest' normalization") {
    val df = regDf().repartition(2)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 1, maxDepth = 2, eta = 1.0, seed = 21)
    val v = GraftBoost.train(df, spec, base).model.trees.head.value
    def weightsOf(m: GraftModel): Seq[Array[Float]] =
      m.trees.map(_.value).toSeq
    // replicate the trainer's float-rounding sequence exactly:
    // each rescale is ((stored float) * s).toFloat
    def scale(a: Array[Float], s: Double): Array[Float] =
      a.map(x => (x * s).toFloat)
    val tree3 = GraftBoost.train(df, spec, base.copy(booster = "dart",
      numRounds = 3, rateDrop = 1.0, normalizeType = "tree")).model
    // rounds: w=[1] → kd=1,lr=1: [1/2, 1/2] → kd=2,lr=1: scale by 2/3,
    // new 1/3 ⇒ [1/3, 1/3, 1/3] (with per-step float rounding)
    val halves = scale(v, 0.5)
    val expTree = Seq(scale(halves, 2.0 / 3), scale(halves, 2.0 / 3),
      scale(v, 1.0 / 3))
    assert(weightsOf(tree3).zip(expTree).forall {
      case (g, e) => g.sameElements(e)
    }, "tree-normalized 3-round weights must follow [1/3,1/3,1/3]")
    val forest3 = GraftBoost.train(df, spec, base.copy(booster = "dart",
      numRounds = 3, rateDrop = 1.0, normalizeType = "forest")).model
    // forest: every commit scales dropped AND new by 1/(1+lr) = 1/2
    // ⇒ [1/4, 1/4, 1/2]
    val expForest = Seq(scale(halves, 0.5), scale(halves, 0.5), halves)
    assert(weightsOf(forest3).zip(expForest).forall {
      case (g, e) => g.sameElements(e)
    }, "forest-normalized 3-round weights must follow [1/4,1/4,1/2]")
  }

  test("oneDrop forces a drop when rateDrop=0 (uniform and weighted)") {
    val df = regDf().repartition(2)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 2, maxDepth = 2, eta = 1.0, seed = 13,
      booster = "dart", oneDrop = true)
    for (st <- Seq("uniform", "weighted")) {
      val m = GraftBoost.train(df, spec,
        base.copy(sampleType = st)).model
      val one = GraftBoost.train(df, spec, base.copy(booster = "gbtree",
        numRounds = 1, oneDrop = false)).model
      // round 2 must have dropped the single existing tree: both trees
      // end up at the round-1 leaves × 0.5 (same closed form as
      // rateDrop=1), NOT the gbtree residual-fit second tree
      val expected = one.trees.head.value.map(x => (x * 0.5).toFloat)
      assert(m.trees.length === 2)
      m.trees.foreach(t => assert(t.value.sameElements(expected),
        s"sampleType=$st: oneDrop must drop the only tree"))
    }
  }

  test("dart drop sets are deterministic in seed: same seed same " +
      "model, different seed different drops") {
    val df = regDf().repartition(4)
    val p = TrainParams(objective = "reg:squarederror", booster = "dart",
      numRounds = 8, maxDepth = 2, rateDrop = 0.4, seed = 17)
    val a = GraftBoost.train(df, spec, p).model
    val b = GraftBoost.train(df, spec, p).model
    assert(a.dump() === b.dump())
  }

  test("hard StopEvent mid-round rolls dart back to the last " +
      "completed round (rescales undone, C6 + dartPreRound)") {
    val rng = new scala.util.Random(101)
    val rows = (1 to 60000).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 2 * a + b)
    }
    val df = rows.toDF("a", "b", "y").repartition(8)
    val stop = new StopEvent
    val stopper = new Thread(() => {
      Thread.sleep(1500)
      stop.set(hard = true)
    })
    stopper.start()
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "reg:squarederror", booster = "dart",
        numRounds = 200, maxDepth = 6, rateDrop = 0.5, seed = 1),
      callbacks = Seq(stop))
    stopper.join()
    assert(stop.isSet)
    assert(res.roundsCompleted < 200,
      s"hard stop did not interrupt (${res.roundsCompleted} rounds)")
    assert(res.model.trees.length === res.roundsCompleted,
      s"${res.model.trees.length} trees vs ${res.roundsCompleted} " +
        "completed rounds — partial dart round must be rolled back")
    val pred = GraftBoost.predict(res.model, df.limit(10), spec)
    assert(pred.count() === 10)
  }

  test("facades forward the dart params (native setters + MLlib " +
      "Params)") {
    val df = regDf(800).repartition(2)
    val p = TrainParams(objective = "reg:squarederror", booster = "dart",
      numRounds = 4, maxDepth = 2, rateDrop = 0.5, skipDrop = 0.25,
      sampleType = "weighted", normalizeType = "forest", oneDrop = true,
      seed = 23)
    val direct = GraftBoost.train(df, spec, p).model
    val est = new GraftRegressor().setLabelCol("y")
      .setBooster("dart").setRateDrop(0.5).setSkipDrop(0.25)
      .setSampleType("weighted").setNormalizeType("forest")
      .setOneDrop(true)
      .setNumRounds(4).setMaxDepth(2).setSeed(23)
    assert(est.fit(df).model.dump() === direct.dump(),
      "native facade must forward every dart knob")
    val xgb = new GraftXGBRegressor()
      .setLabelCol("y").setBooster("dart").setRateDrop(0.5)
      .setSkipDrop(0.25).setSampleType("weighted")
      .setNormalizeType("forest").setOneDrop(true)
      .setNumRounds(4).setMaxDepth(2).setSeed(23)
    assert(xgb.getBooster === "dart" && xgb.getRateDrop === 0.5 &&
      xgb.getSkipDrop === 0.25 && xgb.getSampleType === "weighted" &&
      xgb.getNormalizeType === "forest" && xgb.getOneDrop)
    val fitted = xgb.fit(df)
    assert(fitted.graftModel.dump() === direct.dump(),
      "MLlib facade must forward every dart knob")
  }

  test("multiclass dart with rateDrop=0 matches gbtree bit-exactly " +
      "INCLUDING eval histories (class-slot routing through the " +
      "(classIdx, tree)-paired margin rebuild)") {
    // the dart rebuild walks a (possibly gappy) kept SUBSET of the
    // ensemble — routing by `t % k` over the filtered array would
    // misroute classes; with rateDrop=0 the kept set is the full
    // ensemble every round, so any routing defect shows up as a
    // divergence from gbtree's carried margins
    val rng = new scala.util.Random(53)
    val rows = (1 to 1500).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, if (a > 0.6) 2.0 else if (b > 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("a", "b", "y").repartition(4)
    val base = TrainParams(objective = "multi:softprob", numClass = 3,
      numRounds = 4, maxDepth = 3, seed = 7)
    val ev = Seq(("val", df))
    val gb = GraftBoost.train(df, spec, base, ev)
    val da = GraftBoost.train(df, spec, base.copy(booster = "dart"), ev)
    assert(gb.model.dump() === da.model.dump())
    // eval margins go through the OTHER dart rebuild (full post-rescale
    // ensemble); per-row margins are float-identical and the eval
    // partitioning is shared, so with the partition-ordered
    // deterministic metric sum (Metrics.detSum2) the per-round history
    // must be BIT-identical — this once flaked by one ulp under
    // treeReduce's completion-order partial merge
    assert(gb.evalsResult("val").view.mapValues(_.toSeq).toMap ===
      da.evalsResult("val").view.mapValues(_.toSeq).toMap)
  }

  test("dart composes with numParallelTree (RF forests): golden " +
      "1-vs-8 partitions and per-round tree accounting") {
    val df = regDf(2000)
    val p = TrainParams(objective = "reg:squarederror", booster = "dart",
      numRounds = 4, maxDepth = 2, rateDrop = 0.5,
      numParallelTree = 2, seed = 41)
    val m1 = GraftBoost.train(df.repartition(1), spec, p).model
    val m8 = GraftBoost.train(df.repartition(8), spec, p).model
    assert(m1.dump() === m8.dump())
    assert(m1.trees.length === 8, "4 rounds x 2 parallel trees")
  }

  test("dart checkpoint-resume (C4): uniform-sampling resume is " +
      "bit-golden; 'weighted' resume seeds the stored cumulative " +
      "weights (r10 — xgboost's DART resume semantics)") {
    val df = regDf(1500).repartition(3)
    val p = TrainParams(objective = "reg:squarederror", booster = "dart",
      numRounds = 6, maxDepth = 3, rateDrop = 0.4, seed = 31)
    // uniform: drop sets depend only on (seed, round) and stored leaf
    // values carry every past rescale, so 3+3 must equal 6 exactly —
    // dartWeights is pure "weighted"-sampling bookkeeping
    val full = GraftBoost.train(df, spec, p).model
    val first = GraftBoost.train(df, spec, p.copy(numRounds = 3)).model
    val resumed = GraftBoost.train(df, spec, p.copy(numRounds = 3),
      initModel = Some(first)).model
    assert(resumed.dump() === full.dump(),
      "uniform dart resume must be bit-identical to uninterrupted")
    // weighted: the resumed run seeds the init model's STORED weight
    // vector (values still carry the rescales; the weights drive only
    // the drop-probability distribution), so the resumed weights must
    // continue the cumulative product, not restart at 1.0
    val pw = p.copy(sampleType = "weighted")
    val fw = GraftBoost.train(df, spec,
      pw.copy(numRounds = 3)).model
    val rw = GraftBoost.train(df, spec, pw.copy(numRounds = 3),
      initModel = Some(fw)).model
    assert(rw.trees.length === 6)
    assert(rw.dartWeights.length === 6)
    // every seeded tree's weight can only shrink or hold from its
    // stored value (rescales multiply by factors <= 1)
    fw.dartWeights.zip(rw.dartWeights.take(3)).foreach { case (w0, w1) =>
      assert(w1 <= w0 + 1e-15,
        s"resumed weight $w1 must continue from stored $w0")
    }
  }

  test("dart validation fail-fasts: bad rateDrop / sampleType / " +
      "normalizeType / booster") {
    val df = regDf(100)
    def boom(p: TrainParams): Unit =
      intercept[IllegalArgumentException] {
        GraftBoost.train(df, spec, p)
      }
    val d = TrainParams(objective = "reg:squarederror", booster = "dart",
      numRounds = 1, maxDepth = 2)
    boom(d.copy(rateDrop = 1.5))
    boom(d.copy(skipDrop = -0.1))
    boom(d.copy(sampleType = "gaussian"))
    boom(d.copy(normalizeType = "shrub"))
    boom(d.copy(booster = "gblinear"))
  }
}
