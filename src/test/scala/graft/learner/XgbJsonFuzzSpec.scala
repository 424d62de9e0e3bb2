package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * Randomized xgboost-JSON interchange round-trip: random deep models
 * (varying objective, depth, rounds, categorical features, DART)
 * must survive export → parse → import with BIT-IDENTICAL
 * predictions on their training rows — the interchange contract a
 * model store depends on. The fixed-fixture round-trip suites pin
 * known shapes; this walks random ones.
 */
class XgbJsonFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: export → import reproduces predictions bit-for-bit on " +
      "random model shapes") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(6600 + trial)
      val n = 120 + rng.nextInt(120)
      val rows = Seq.tabulate(n) { i =>
        val f0 = rng.nextInt(64).toDouble / 8.0
        val cat = rng.nextInt(5).toDouble
        val y = (f0 + cat * 2 + rng.nextInt(3)).floor
        (i.toLong, f0, cat, y)
      }
      val df = rows.toDF("id", "f0", "cat", "y")
        .repartition(1 + trial % 3)
      val (objective, extra) = trial % 3 match {
        case 0 => ("reg:squarederror", identity[TrainParams] _)
        case 1 => ("binary:logistic",
          (p: TrainParams) => p.copy(booster = "dart", rateDrop = 0.4))
        case _ => ("count:poisson", identity[TrainParams] _)
      }
      val label = if (objective == "binary:logistic")
        df.withColumn("y",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("y") > 6, 1.0)
            .otherwise(0.0))
      else df
      // the JSON sink covers numeric trees only (categorical models
      // fail loudly by design — asserted below)
      val spec = DMatrixSpec(labelCol = Seq("y"),
        featureCols = Some(Seq("f0", "cat")))
      val params = extra(TrainParams(objective = objective,
        numRounds = 2 + rng.nextInt(3), maxDepth = 2 + rng.nextInt(3),
        seed = trial))
      val res = GraftBoost.train(label, spec, params, numWorkers = 4)

      val json = res.model.toXgbJson
      val back = GraftModel.fromXgbJson(json)
      val before = GraftBoost.predict(res.model, label, spec)
        .select("id", "prediction").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val after = GraftBoost.predict(back, label, spec)
        .select("id", "prediction").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(before === after,
        s"trial $trial obj=$objective params=$params")

      if (trial == 0) {
        // categorical splits have no JSON encoding in this sink —
        // must fail loudly, never silently mis-encode
        val catSpec = spec.copy(categoricalCols = Seq("cat"))
        val catModel = GraftBoost.train(label, catSpec,
          TrainParams(numRounds = 1, maxDepth = 2, seed = 1),
          numWorkers = 4)
        val e = intercept[IllegalArgumentException] {
          catModel.model.toXgbJson
        }
        assert(e.getMessage.contains("categorical"))
      }
    }
  }
}
