package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.Objectives.CoxPh

/**
 * survival:cox — Breslow partial-likelihood gradients via the
 * per-round global pass (distinct-time reduce + driver prefix tables).
 * Pins: hand-derived closed forms on a 2-event micro-case, censoring
 * semantics, numeric-differentiation agreement of grad AND the
 * cox-nloglik metric on a random dataset, partition invariance, and
 * end-to-end training that ranks hazards correctly.
 */
class CoxSpec extends SparkTestBase {
  import spark.implicits._

  private def tables(rows: Seq[(Float, Float, Float)], parts: Int = 2) = {
    val cox = new CoxPh
    cox.riskTables(spark.sparkContext.parallelize(
      rows.map { case (m, y, w) => (Array(m), y, w) }, parts))
  }

  private def gradOf(tab: Objectives.CoxTables, m: Float, y: Float)
      : (Double, Double) = {
    val cox = new CoxPh
    val g = new Array[Float](1); val h = new Array[Float](1)
    cox.gradHessGlobal(tab, Array(m), y, g, h)
    (g(0).toDouble, h(0).toDouble)
  }

  test("closed form on two events at m=0: grads ±0.5, hess 0.25") {
    // times 1 < 2, both events, unit weights, margins 0:
    // S(1)=2, S(2)=1; A(1)=1/2, A(2)=3/2; B(1)=1/4, B(2)=5/4
    val tab = tables(Seq((0f, 1f, 1f), (0f, 2f, 1f)))
    assert(tab.times.toSeq === Seq(1.0, 2.0))
    assert(tab.a.toSeq === Seq(0.5, 1.5))
    assert(tab.b.toSeq === Seq(0.25, 1.25))
    val (g1, h1) = gradOf(tab, 0f, 1f)
    assert(math.abs(g1 - (-0.5)) < 1e-9 && math.abs(h1 - 0.25) < 1e-9)
    val (g2, h2) = gradOf(tab, 0f, 2f)
    assert(math.abs(g2 - 0.5) < 1e-9 && math.abs(h2 - 0.25) < 1e-9)
  }

  test("censored rows join risk sets but contribute no event term") {
    // event at 1, censored at 2 (label -2): S(1)=2, only one event
    val tab = tables(Seq((0f, 1f, 1f), (0f, -2f, 1f)))
    val (ge, _) = gradOf(tab, 0f, 1f)
    assert(math.abs(ge - (-0.5)) < 1e-9) // −1 + 1/S(1)
    val (gc, hc) = gradOf(tab, 0f, -2f)
    assert(math.abs(gc - 0.5) < 1e-9, "censored: +r·A, no −δ")
    assert(hc > 0)
    // a row whose time precedes every event gets zero gradient
    val (g0, _) = gradOf(tab, 0f, -0.5f)
    assert(g0 === 0.0)
  }

  test("gradients and cox-nloglik agree with numeric differentiation " +
      "of the Breslow partial likelihood") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 40).map { i =>
      val m = (rng.nextDouble() * 2 - 1).toFloat
      val t = (rng.nextInt(15) + 1).toFloat // ties included
      val ev = rng.nextBoolean()
      (m, if (ev) t else -t, 1.0f)
    }
    def nll(ms: Seq[Float]): Double = {
      // direct driver-side Breslow partial NLL
      val data = rows.zip(ms).map { case ((_, y, _), m) => (m, y) }
      data.filter(_._2 > 0).map { case (_, _) => 0.0 } // placeholder
      val events = data.filter(_._2 > 0)
      events.map { case (mi, ti) =>
        val s = data.filter { case (_, yj) => math.abs(yj) >= ti }
          .map { case (mj, _) => math.exp(mj.toDouble) }.sum
        math.log(s) - mi
      }.sum
    }
    val baseMs = rows.map(_._1)
    val tab = tables(rows, parts = 4)
    val eps = 1e-4
    for (k <- Seq(0, 7, 19, 39)) {
      val up = baseMs.updated(k, (baseMs(k) + eps).toFloat)
      val dn = baseMs.updated(k, (baseMs(k) - eps).toFloat)
      val numeric = (nll(up) - nll(dn)) / (2 * eps)
      // analytic grad must come from tables built at the SAME margins
      val (g, h) = gradOf(tab, baseMs(k), rows(k)._2)
      assert(math.abs(g - numeric) < 1e-3,
        s"row $k: analytic $g vs numeric $numeric")
      assert(h > 0)
    }
    // the metric equals the direct NLL over event weight
    val cox = new CoxPh
    val metric = cox.nloglik(spark.sparkContext.parallelize(
      rows.map { case (m, y, w) => (Array(m), y, w) }, 4))
    val direct = nll(baseMs) / rows.count(_._2 > 0)
    assert(math.abs(metric - direct) < 1e-9,
      s"cox-nloglik $metric vs direct $direct")
  }

  test("risk tables are partition-invariant") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 200).map { _ =>
      ((rng.nextDouble() * 2 - 1).toFloat,
        (if (rng.nextBoolean()) 1 else -1) * (rng.nextInt(20) + 1).toFloat,
        1.0f)
    }
    val t1 = tables(rows, parts = 1)
    val t8 = tables(rows, parts = 8)
    assert(t1.times.toSeq === t8.times.toSeq)
    // per-time sums combine in partition order (the same documented
    // float-order caveat as the histogram treeAggregate), so tables
    // agree to ulps, not bits
    def close(a: Seq[Double], b: Seq[Double]): Unit =
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(x)),
          s"$x vs $y") }
    close(t1.a.toSeq, t8.a.toSeq)
    close(t1.b.toSeq, t8.b.toSeq)
  }

  test("training ranks hazards: the risky feature earns a higher " +
      "hazard ratio, and cox-nloglik improves") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 500).map { _ =>
      val x = rng.nextDouble() // higher x → earlier events
      val t = (0.2 + 5 * math.exp(-2 * x) *
        (0.5 + rng.nextDouble())).toFloat
      val censored = rng.nextDouble() < 0.2
      (x, 1.0 - x, if (censored) -t else t)
    }
    val df = rows.toDF("x", "z", "y").repartition(4)
    val res = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "survival:cox", numRounds = 20,
        maxDepth = 3, eta = 0.1, seed = 2),
      evals = Seq(("train", df)))
    val hist = res.evalsResult("train")("cox-nloglik")
    assert(hist.last < hist.head, s"nll ${hist.head} -> ${hist.last}")
    val preds = GraftBoost.predict(res.model, df, DMatrixSpec("y"))
      .select("x", "prediction").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val hiRisk = preds.filter(_._1 > 0.7).map(_._2)
    val loRisk = preds.filter(_._1 < 0.3).map(_._2)
    assert(hiRisk.sum / hiRisk.length > 1.5 * loRisk.sum / loRisk.length,
      "high-x rows must carry clearly higher hazard ratios")
  }

  test("zero labels fail fast") {
    val df = Seq((1.0, 0.0), (2.0, 3.0)).toDF("x", "y")
    val e = intercept[Exception] {
      GraftBoost.train(df, DMatrixSpec("y"),
        TrainParams(objective = "survival:cox", numRounds = 1,
          maxDepth = 1))
    }
    assert(e.getMessage.contains("non-zero") ||
      Option(e.getCause).exists(_.getMessage.contains("non-zero")))
  }
}
