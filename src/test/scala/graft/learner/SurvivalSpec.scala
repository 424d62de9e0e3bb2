package graft.learner

import graft.SparkTestBase
import graft.api.{GraftBoost, GraftConf}
import graft.data.DMatrixSpec

/** survival:aft objective (bounds plumbing from matrix.py:333-343) and
  * the spark.graft.* conf surface (C13). */
class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  private def timesDf = {
    val rng = new scala.util.Random(53)
    (1 to 400).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      val t = math.exp(1.0 + 2.0 * a - b) // log-time linear in features
      (a, b, t)
    }.toDF("a", "b", "t")
  }

  test("AFT uncensored at sigma=1 tracks squared error on ln(y)") {
    val df = timesDf.withColumn("lnt",
      org.apache.spark.sql.functions.log($"t")).coalesce(2)
    val p = TrainParams(numRounds = 20, maxDepth = 3, seed = 5)
    val aft = GraftBoost.train(df.drop("lnt"),
      DMatrixSpec(labelCol = Seq("t"), ignore = Nil),
      p.copy(objective = "survival:aft"))
    val se = GraftBoost.train(df.drop("t"),
      DMatrixSpec(labelCol = Seq("lnt")),
      p.copy(objective = "reg:squarederror"))
    // same gradients analytically; compare predictions in log space
    val featDf = timesDf.coalesce(2)
    val aftPred = GraftBoost.predict(aft.model, featDf,
      DMatrixSpec(labelCol = Seq("t")))
      .select("prediction").collect().map(r => math.log(r.getDouble(0)))
    val sePred = GraftBoost.predict(se.model,
      featDf.withColumnRenamed("t", "lnt"),
      DMatrixSpec(labelCol = Seq("lnt")))
      .select("prediction").collect().map(_.getDouble(0))
    val maxDiff = aftPred.zip(sePred).map { case (x, y) =>
      math.abs(x - y) }.max
    assert(maxDiff < 1e-2, s"AFT vs log-SE max diff $maxDiff")
  }

  test("AFT learns from interval-censored bounds") {
    val df = timesDf
      .withColumn("lo", $"t" * 0.8)
      .withColumn("hi", $"t" * 1.25)
      .drop("t").coalesce(2)
    val spec = DMatrixSpec(labelLowerCol = Some("lo"),
      labelUpperCol = Some("hi"))
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "survival:aft", numRounds = 30,
        maxDepth = 3, seed = 5))
    val pred = GraftBoost.predict(res.model, df, spec)
      .select("prediction", "lo", "hi").collect()
    // predictions should land near the interval in log space
    val logRmse = math.sqrt(pred.map { r =>
      val mid = math.sqrt(r.getDouble(1) * r.getDouble(2)) // geo mean
      val d = math.log(r.getDouble(0)) - math.log(mid)
      d * d
    }.sum / pred.length)
    assert(logRmse < 0.25, s"log-RMSE to interval midpoint: $logRmse")
  }

  test("right-censored rows (NULL upper) push predictions above lower") {
    val rng = new scala.util.Random(59)
    val rows = (1 to 300).map { _ =>
      val a = rng.nextDouble()
      val t = math.exp(1.0 + 2.0 * a)
      // censor every row at half its true time, upper unknown
      (a, t / 2.0, null.asInstanceOf[java.lang.Double])
    }
    val df = rows.toDF("a", "lo", "hi").coalesce(2)
    val spec = DMatrixSpec(labelLowerCol = Some("lo"),
      labelUpperCol = Some("hi"))
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "survival:aft", numRounds = 20,
        maxDepth = 3, seed = 5))
    val pred = GraftBoost.predict(res.model, df, spec)
      .select("prediction", "lo").collect()
    val above = pred.count(r => r.getDouble(0) > r.getDouble(1))
    assert(above > pred.length * 0.9,
      s"only $above/${pred.length} predictions above the lower bound")
  }

  test("GraftRegressor trains AFT through the estimator surface") {
    import graft.ml.GraftRegressor
    val df = timesDf
      .withColumn("lo", $"t" * 0.9)
      .withColumn("hi", $"t" * 1.1)
      .drop("t").coalesce(2)
    val m = new GraftRegressor()
      .setObjective("survival:aft")
      .setLabelBoundsCols("lo", "hi")
      .setNumRounds(20).setMaxDepth(3).setSeed(5)
      .fit(df)
    val pred = m.transform(df).select("prediction", "lo", "hi").collect()
    val inLogBand = pred.count { r =>
      val p = math.log(r.getDouble(0))
      val mid = math.log(math.sqrt(r.getDouble(1) * r.getDouble(2)))
      math.abs(p - mid) < 0.5
    }
    assert(inLogBand > pred.length * 0.9,
      s"only $inLogBand/${pred.length} predictions near the interval")
  }

  test("AFT logistic/extreme distributions: closed-form grad/hess " +
      "(aft_loss_distribution analog)") {
    import graft.learner.Objectives.Aft
    val g = new Array[Float](1); val h = new Array[Float](1)
    // logistic, uncensored, z = 0 (m = ln y): grad = 1−2s = 0,
    // hess = 2·s(1−s)/σ² = 0.5
    val lo = new Aft("logistic", 1.0)
    lo.gradHessBounds(Array(0f), 1f, 1f, g, h)
    assert(math.abs(g(0)) < 1e-7 && math.abs(h(0) - 0.5) < 1e-6)
    // logistic, RIGHT-censored (upper = ∞): grad = −s(zL)/σ exactly
    lo.gradHessBounds(Array(0f), math.E.toFloat, Float.NaN, g, h)
    val s1 = 1.0 / (1.0 + math.exp(-1.0)) // zL = ln(e) − 0 = 1
    assert(math.abs(g(0) + s1) < 1e-6, s"logistic right-censored ${g(0)}")
    // extreme, uncensored, z = 0: grad = (1−e⁰)/σ = 0, hess = 1/σ²
    val ex = new Aft("extreme", 1.0)
    ex.gradHessBounds(Array(0f), 1f, 1f, g, h)
    assert(math.abs(g(0)) < 1e-7 && math.abs(h(0) - 1.0) < 1e-6)
    // extreme, RIGHT-censored: grad = −e^{zL}/σ exactly
    ex.gradHessBounds(Array(0f), math.E.toFloat, Float.NaN, g, h)
    assert(math.abs(g(0) + math.E) < 1e-5, s"extreme right-censored ${g(0)}")
    // hessians stay positive/finite even for wildly mispredicted rows
    ex.gradHessBounds(Array(-50f), 100f, 100f, g, h)
    assert(h(0) > 0 && !h(0).isInfinite && !g(0).isNaN)
    // unknown distribution fails fast
    val e = intercept[IllegalArgumentException] { new Aft("weibull") }
    assert(e.getMessage.contains("normal|logistic|extreme"))
  }

  test("AFT trains under each distribution and converges on " +
      "uncensored data (aftDistribution param)") {
    val rng = new scala.util.Random(17)
    val rows = (1 to 300).map { _ =>
      val x = rng.nextDouble() * 5
      val t = math.exp(0.5 * x + 0.1 * rng.nextGaussian())
      (x, t, t)
    }
    val df = rows.toDF("x", "lo", "hi").repartition(3)
    val spec = DMatrixSpec(labelCol = Nil, labelLowerCol = Some("lo"),
      labelUpperCol = Some("hi"))
    for (dist <- Seq("normal", "logistic", "extreme")) {
      val res = GraftBoost.train(df, spec,
        TrainParams(objective = "survival:aft", numRounds = 20,
          maxDepth = 3, seed = 4, aftDistribution = dist,
          evalMetric = Seq("rmse")))
      // margins are log-time; compare exp(margin) to true median time
      val preds = GraftBoost.predict(res.model, df, spec)
        .select("x", "prediction").collect()
      val sse = preds.map { r =>
        val want = math.exp(0.5 * r.getDouble(0))
        val got = r.getDouble(1)
        val d = math.log(got) - math.log(want); d * d
      }.sum / preds.length
      assert(sse < 0.1, s"$dist: mean sq log error $sse")
    }
  }

  test("aft-nloglik and interval-regression-accuracy survival " +
      "metrics (xgboost's survival eval surface)") {
    import graft.learner.Objectives.Aft
    // closed form: uncensored z=0, sigma=1, t=1 -> 0.5·ln(2π)
    val aft = new Aft()
    assert(math.abs(aft.nloglik(0f, 1f, 1f) -
      0.5 * math.log(2 * math.Pi)) < 1e-9)
    // right-censored: -ln(1 - Phi(zL)); zL = 0 -> ln 2
    assert(math.abs(aft.nloglik(0f, 1f, Float.NaN) - math.log(2.0)) < 1e-9)
    assert(Metrics.isBoundsMetric("aft-nloglik"))
    assert(Metrics.defaultMetric("survival:aft") === "aft-nloglik")
    assert(Metrics.maximize("interval-regression-accuracy"))
    assert(!Metrics.maximize("aft-nloglik"))

    // end-to-end: the default metric records per round and improves,
    // and interval accuracy lands in (0, 1]
    val rng = new scala.util.Random(71)
    val rows = (1 to 300).map { _ =>
      val x = rng.nextDouble() * 5
      val t = math.exp(0.5 * x + 0.1 * rng.nextGaussian())
      (x, t * 0.8, t * 1.25) // interval-censored around the true time
    }
    val df = rows.toDF("x", "lo", "hi").repartition(3)
    val spec = DMatrixSpec(labelCol = Nil, labelLowerCol = Some("lo"),
      labelUpperCol = Some("hi"))
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "survival:aft", numRounds = 15,
        maxDepth = 3, seed = 6,
        evalMetric = Seq("aft-nloglik", "interval-regression-accuracy")),
      evals = Seq(("train", df)))
    val nll = res.evalsResult("train")("aft-nloglik")
    assert(nll.last < nll.head, s"nll ${nll.head} -> ${nll.last}")
    val acc = res.evalsResult("train")("interval-regression-accuracy")
    assert(acc.last > 0.5 && acc.last <= 1.0, s"acc ${acc.last}")
    assert(acc.last >= acc.head, s"acc ${acc.head} -> ${acc.last}")
  }

  test("spark.graft.* conf overlays TrainParams (C13)") {
    val keys = Seq("numRounds" -> "17", "eta" -> "0.05",
      "objective" -> "binary:logistic", "evalMetric" -> "auc,logloss",
      "checkpointPath" -> "/tmp/ck",
      "tweedieVariancePower" -> "1.2",
      "monotoneConstraints" -> "(1,0,-1)",
      "quantileAlphas" -> "[0.1, 0.5, 0.9]",
      "cacheLevel" -> "MEMORY_AND_DISK_SER",
      "pairCap" -> "4",
      "interactionConstraints" -> "[[0,1],[2,3,4]]")
    try {
      keys.foreach { case (k, v) => spark.conf.set(s"spark.graft.$k", v) }
      val p = GraftConf.overlay(spark, TrainParams(maxDepth = 9))
      assert(p.quantileAlphas === Seq(0.1, 0.5, 0.9))
      assert(p.tweedieVariancePower === 1.2)
      assert(p.monotoneConstraints === Seq(1, 0, -1))
      assert(p.interactionConstraints === Seq(Seq(0, 1), Seq(2, 3, 4)))
      assert(p.pairCap === 4)
      assert(p.numRounds === 17)
      assert(p.eta === 0.05)
      assert(p.objective === "binary:logistic")
      assert(p.evalMetric === Seq("auc", "logloss"))
      assert(p.checkpointPath === Some("/tmp/ck"))
      assert(p.cacheLevel === "MEMORY_AND_DISK_SER" &&
        p.storageLevel === org.apache.spark.storage.StorageLevel
          .MEMORY_AND_DISK_SER)
      assert(p.maxDepth === 9) // base value survives
    } finally {
      keys.foreach { case (k, _) => spark.conf.unset(s"spark.graft.$k") }
    }
  }
}
