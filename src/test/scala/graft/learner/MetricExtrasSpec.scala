package graft.learner

import graft.SparkTestBase

/** error@t and gamma-deviance eval metrics (xgboost eval_metric values
  * the reference forwards verbatim). */
class MetricExtrasSpec extends SparkTestBase {

  private val obj = new Objectives.SquaredError

  private def rowsOf(data: Seq[(Float, Float)]) =
    spark.sparkContext.parallelize(
      data.map { case (p, y) => (Array(p), y, 1.0f) }, 3)

  test("error@t classifies positive strictly above t") {
    // preds 0.2/0.6/0.7 vs labels 0/1/0 at t=0.65: errors = row 2 only
    // (0.6 <= 0.65 classifies 0, label 1 -> error; 0.7 > 0.65 -> 1 vs 0
    // -> error; 0.2 -> 0 vs 0 ok) => 2/3
    val rows = rowsOf(Seq((0.2f, 0f), (0.6f, 1f), (0.7f, 0f)))
    assert(Metrics.compute("error@0.65", obj, rows) === 2.0 / 3.0)
    // at the default 0.5 threshold: 0.6 and 0.7 classify 1 -> one error
    assert(Metrics.compute("error@0.5", obj, rows) === 1.0 / 3.0)
  }

  test("gamma-deviance matches the hand formula 2*mean(ln(p/y)+y/p-1)") {
    val data = Seq((2.0f, 1.0f), (1.0f, 3.0f))
    val rows = rowsOf(data)
    val expect = 2.0 * data.map { case (p, y) =>
      val pe = p.toDouble + 1e-16; val ye = y.toDouble + 1e-16
      math.log(pe / ye) + ye / pe - 1.0
    }.sum / 2
    assert(math.abs(Metrics.compute("gamma-deviance", obj, rows)
      - expect) < 1e-12)
    // perfect predictions give zero deviance
    val perfect = rowsOf(Seq((2.0f, 2.0f), (5.0f, 5.0f)))
    assert(math.abs(Metrics.compute("gamma-deviance", obj, perfect))
      < 1e-12)
  }
}
