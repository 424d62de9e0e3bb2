package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.ml.GraftRegressor

/**
 * Per-round learning-rate schedules — the xgboost LearningRateScheduler
 * callback / `learning_rates` list the reference forwards with the
 * other callbacks (compat/__init__.py:6-44 wraps xgboost callbacks).
 */
class EtaScheduleSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = DMatrixSpec("y")

  private def regDf(n: Int = 2000, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a - 2 * b + 0.3 * rng.nextGaussian())
    }.toDF("a", "b", "y")
  }

  test("a constant schedule is bit-identical to the plain eta (golden)") {
    val df = regDf().repartition(4)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 5, maxDepth = 3, eta = 0.17, seed = 11)
    val plain = GraftBoost.train(df, spec, base).model
    val sched = GraftBoost.train(df, spec,
      base.copy(eta = 99.0, etaSchedule = Some(_ => 0.17))).model
    assert(plain.dump() === sched.dump(),
      "the schedule must fully override eta per round")
  }

  test("schedule is indexed by GLOBAL round: 2+3 resumed == 5 full " +
      "under a decaying schedule") {
    val df = regDf().repartition(3)
    val decay: Int => Double = r => 0.5 / (1 + r)
    val p = TrainParams(objective = "reg:squarederror", numRounds = 5,
      maxDepth = 3, seed = 3, etaSchedule = Some(decay))
    val full = GraftBoost.train(df, spec, p).model
    val first = GraftBoost.train(df, spec, p.copy(numRounds = 2)).model
    val resumed = GraftBoost.train(df, spec, p.copy(numRounds = 3),
      initModel = Some(first)).model
    assert(resumed.dump() === full.dump(),
      "a resumed run must continue the schedule where the init model " +
        "left off")
  }

  test("decaying schedule changes the model; non-positive rates fail " +
      "fast; native facade forwards the schedule") {
    val df = regDf(800).repartition(2)
    val base = TrainParams(objective = "reg:squarederror",
      numRounds = 3, maxDepth = 2, eta = 0.3, seed = 5)
    val plain = GraftBoost.train(df, spec, base).model
    val decayed = GraftBoost.train(df, spec,
      base.copy(etaSchedule = Some(r => 0.3 / (1 + r)))).model
    assert(plain.dump() !== decayed.dump())
    intercept[IllegalArgumentException] {
      GraftBoost.train(df, spec,
        base.copy(etaSchedule = Some(_ => 0.0)))
    }
    val viaFacade = new GraftRegressor().setLabelCol("y")
      .setNumRounds(3).setMaxDepth(2).setSeed(5)
      .setEtaSchedule(r => 0.3 / (1 + r)).fit(df)
    assert(viaFacade.model.dump() === decayed.dump())
  }
}
