package graft.ml

import graft.SparkTestBase
import graft.data.DMatrixSpec
import graft.learner.TrainParams
import org.apache.spark.sql.functions._

/**
 * `GraftCV.cv` — the xgb.cv analog: deterministic content-hashed
 * folds, per-round mean±std curves in xgb.cv's column convention,
 * ragged early-stopped histories, and bestRound selection.
 */
class CrossValidationSpec extends SparkTestBase {
  import spark.implicits._

  private def data(n: Int = 600) = {
    val rng = new scala.util.Random(13)
    (1 to n).map { i =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (i.toLong, a, b, 3 * a + 2 * b + 0.05 * rng.nextGaussian())
    }.toDF("id", "a", "b", "y").repartition(4)
  }

  test("curves follow xgb.cv conventions and test error improves") {
    val df = data()
    val res = GraftCV.cv(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 10,
        maxDepth = 3, seed = 2), nfold = 3, seed = 7)
    assert(res.curves.keySet === Set("train-rmse", "test-rmse"))
    val test = res.curves("test-rmse")
    assert(test.mean.size === 10 && test.std.size === 10)
    assert(test.mean.last < test.mean.head,
      s"test rmse ${test.mean.head} -> ${test.mean.last}")
    assert(test.std.forall(_ >= 0.0))
    // train error must not exceed test error badly in reverse —
    // just sanity that both curves populated and finite
    assert(res.curves("train-rmse").mean.forall(v => !v.isNaN))
    assert(res.foldRounds === Seq(10, 10, 10))
    assert(res.bestRound("rmse") === test.mean.zipWithIndex.minBy(_._1)._2)
  }

  test("folds are deterministic in (seed, content) and change with " +
      "the seed") {
    val df = data(200)
    val r1 = GraftCV.cv(df, DMatrixSpec("y"),
      TrainParams(numRounds = 3, maxDepth = 2, seed = 1),
      nfold = 3, seed = 11)
    val r2 = GraftCV.cv(df.repartition(7), DMatrixSpec("y"),
      TrainParams(numRounds = 3, maxDepth = 2, seed = 1),
      nfold = 3, seed = 11)
    assert(r1.curves("test-rmse").mean === r2.curves("test-rmse").mean,
      "same seed + content must replay identical folds and curves " +
        "under any partitioning")
    val r3 = GraftCV.cv(df, DMatrixSpec("y"),
      TrainParams(numRounds = 3, maxDepth = 2, seed = 1),
      nfold = 3, seed = 12)
    assert(r3.curves("test-rmse").mean !=
      r1.curves("test-rmse").mean, "a new seed reshuffles folds")
  }

  test("early stopping inside folds yields ragged histories that " +
      "aggregate over surviving folds") {
    val df = data()
    val res = GraftCV.cv(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 60,
        maxDepth = 3, seed = 2, earlyStoppingRounds = 3),
      nfold = 3, seed = 5)
    val test = res.curves("test-rmse")
    assert(res.foldRounds.max === test.mean.size)
    assert(res.foldRounds.forall(_ <= 60))
    // std at rounds where only one fold survives is 0 by construction
    assert(test.std.forall(s => s >= 0 && !s.isNaN))
  }

  test("fold-column collision and tiny nfold fail fast") {
    val df = data(50).withColumn("__graft_fold", lit(1))
    val e = intercept[IllegalArgumentException] {
      GraftCV.cv(df, DMatrixSpec("y"), TrainParams(numRounds = 2))
    }
    assert(e.getMessage.contains("__graft_fold"))
    val e2 = intercept[IllegalArgumentException] {
      GraftCV.cv(data(50), DMatrixSpec("y"), TrainParams(numRounds = 2),
        nfold = 1)
    }
    assert(e2.getMessage.contains("nfold"))
  }
}
