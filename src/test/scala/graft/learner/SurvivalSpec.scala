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

  test("spark.graft.* conf overlays TrainParams (C13)") {
    val keys = Seq("numRounds" -> "17", "eta" -> "0.05",
      "objective" -> "binary:logistic", "evalMetric" -> "auc,logloss",
      "checkpointPath" -> "/tmp/ck",
      "tweedieVariancePower" -> "1.2",
      "monotoneConstraints" -> "(1,0,-1)",
      "interactionConstraints" -> "[[0,1],[2,3,4]]")
    try {
      keys.foreach { case (k, v) => spark.conf.set(s"spark.graft.$k", v) }
      val p = GraftConf.overlay(spark, TrainParams(maxDepth = 9))
      assert(p.tweedieVariancePower === 1.2)
      assert(p.monotoneConstraints === Seq(1, 0, -1))
      assert(p.interactionConstraints === Seq(Seq(0, 1), Seq(2, 3, 4)))
      assert(p.numRounds === 17)
      assert(p.eta === 0.05)
      assert(p.objective === "binary:logistic")
      assert(p.evalMetric === Seq("auc", "logloss"))
      assert(p.checkpointPath === Some("/tmp/ck"))
      assert(p.maxDepth === 9) // base value survives
    } finally {
      keys.foreach { case (k, _) => spark.conf.unset(s"spark.graft.$k") }
    }
  }
}
