package graft.api

import graft.SparkTestBase
import graft.data.DMatrixSpec
import graft.learner.{GraftModel, TrainParams}
import org.apache.spark.storage.StorageLevel

/**
 * BinnedMatrix "load once, train many" semantics (the RayDMatrix
 * memoized-loading analog, reference matrix.py:703-716): the cached
 * blocks survive a training run, repeated trains are deterministic and
 * bit-identical to the one-shot DataFrame path, and the handle fails
 * fast on binning-parameter drift.
 */
class BinnedMatrixSpec extends SparkTestBase {
  import spark.implicits._

  private def df(n: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble() * 4; val b = rng.nextDouble() * 4
      (a, b, if (1.3 * a - b + rng.nextGaussian() > 1.0) 1.0 else 0.0)
    }.toDF("a", "b", "y").repartition(3)
  }

  private def modelHash(m: GraftModel): Int = modelStructureHash(m)

  private val params = TrainParams(objective = "binary:logistic",
    numRounds = 4, maxDepth = 3, eta = 0.4, subsample = 0.8, seed = 77,
    evalMetric = Seq("logloss"))

  test("matrix path == DataFrame path bit-for-bit, blocks survive " +
      "and retrain identically") {
    val train = df(400, 1)
    val heldOut = df(150, 2)
    val spec = DMatrixSpec("y")
    val oneShot = GraftBoost.train(train, spec, params,
      evals = Seq(("train", train), ("held", heldOut)))

    val mx = GraftBoost.materialize(train, spec, params)
    val ev = GraftBoost.materializeEval(heldOut, mx, spec, params)
    val viaMatrix = mx.train(params,
      evals = Seq(("train", mx), ("held", ev)))

    assert(modelHash(viaMatrix.model) === modelHash(oneShot.model))
    assert(viaMatrix.evalsResult("held")("logloss").toSeq ===
      oneShot.evalsResult("held")("logloss").toSeq)
    assert(viaMatrix.evalsResult("train")("logloss").toSeq ===
      oneShot.evalsResult("train")("logloss").toSeq)
    assert(viaMatrix.model.featureNames === oneShot.model.featureNames)

    // the caller-owned caches survived the run (the whole point)
    assert(mx.blocks.getStorageLevel !== StorageLevel.NONE)
    assert(ev.blocks.getStorageLevel !== StorageLevel.NONE)
    assert(mx.numRows === 400L)

    // a second train off the same handle reproduces the model exactly
    val again = mx.train(params, evals = Seq(("held", ev)))
    assert(modelHash(again.model) === modelHash(oneShot.model))

    // a different-eta trial reuses the same cache and differs
    val other = mx.train(params.copy(eta = 0.1))
    assert(modelHash(other.model) !== modelHash(oneShot.model))
    assert(mx.blocks.getStorageLevel !== StorageLevel.NONE)
    mx.unpersist(); ev.unpersist()
  }

  test("binning-parameter drift fails fast; eval handles are " +
      "train-rejected and bins-checked") {
    val spec = DMatrixSpec("y")
    val mx = GraftBoost.materialize(df(200, 3), spec, params)
    // seed shapes the binner sample and the subsample salts
    val e1 = intercept[IllegalArgumentException] {
      mx.train(params.copy(seed = 78))
    }
    assert(e1.getMessage.contains("re-materialize"))
    val e2 = intercept[IllegalArgumentException] {
      mx.train(params.copy(maxBins = 64))
    }
    assert(e2.getMessage.contains("re-materialize"))
    // an eval-materialized handle must not train (tolerant binning)
    val ev = GraftBoost.materializeEval(df(100, 4), mx, spec, params)
    val e3 = intercept[IllegalArgumentException] { ev.train(params) }
    assert(e3.getMessage.contains("EVAL"))
    // an eval bound to a DIFFERENT matrix's bins is rejected
    val mx2 = GraftBoost.materialize(df(200, 5), spec, params)
    val e4 = intercept[IllegalArgumentException] {
      mx.train(params, evals = Seq(("bad", GraftBoost
        .materializeEval(df(100, 6), mx2, spec, params))))
    }
    assert(e4.getMessage.contains("materializeEval"))
    mx.unpersist(); mx2.unpersist(); ev.unpersist()
  }

  private def mcDf(n: Int, k: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble() * 4; val b = rng.nextDouble() * 4
      (a, b, ((a + b).toInt % k).toDouble)
    }.toDF("a", "b", "y").repartition(3)
  }

  test("numClass drift fails fast: the objective NAME alone does not " +
      "pin the packed margin stride") {
    val spec = DMatrixSpec("y")
    val p3 = params.copy(objective = "multi:softmax", numClass = 3,
      evalMetric = Seq("merror"))
    val mx = GraftBoost.materialize(mcDf(300, 3, 7), spec, p3)
    // same objective name, wider stride: must be rejected up front,
    // not read k=3 margins at stride 5 on the executors
    val e = intercept[IllegalArgumentException] {
      mx.train(p3.copy(numClass = 5))
    }
    assert(e.getMessage.contains("re-materialize"))
    // an eval bound at a different numClass is rejected the same way
    val e2 = intercept[IllegalArgumentException] {
      GraftBoost.materializeEval(mcDf(100, 3, 8), mx, spec,
        p3.copy(numClass = 5))
    }
    assert(e2.getMessage.contains("×3"))
    mx.unpersist()
  }

  test("a grid sweeping numClass does not share one packed matrix") {
    val spec = DMatrixSpec("y")
    val base = params.copy(objective = "multi:softmax",
      evalMetric = Seq("merror"), numRounds = 2)
    val train = mcDf(300, 4, 9)
    // k=3 folds label 3 into an out-of-range class; use labels <3 only
    // for that candidate's data to keep both trials well-formed — the
    // point is that the search must NOT bind both to one matrix.
    val grid = Seq(base.copy(numClass = 4), base.copy(numClass = 5))
    val res = graft.ml.GraftGridSearch.fit(train, spec, grid, train)
    assert(res.trials.size === 2)
    // each trial trained at its own stride: the models disagree on
    // numClass and both carry finite scores (corrupt margins would
    // blow up merror or the trees)
    assert(res.trials.forall(t => !t.score.isNaN))
    assert(res.bestResult.model.numClass >= 4)
  }
}
