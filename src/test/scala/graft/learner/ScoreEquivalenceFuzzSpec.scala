package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import org.apache.spark.sql.functions._

/**
 * Randomized equivalence pin between the batch scoring path (the
 * codegen EnsembleScore expression) and the scalar model path
 * (GraftModel.predict) on random multi-round depth-3 ensembles —
 * including NaN features, whose missing-direction (defaultLeft)
 * routing is the branchiest part of both implementations. Bit-exact:
 * both paths fold the same floats.
 */
class ScoreEquivalenceFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: codegen batch scoring equals scalar model predict " +
      "bit-for-bit on random ensembles with missing values") {
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(8800 + trial)
      val n = 150 + rng.nextInt(100)
      val rows = Seq.tabulate(n) { i =>
        val f0 = rng.nextInt(40).toDouble / 4.0
        val f1 = if (rng.nextInt(10) == 0) Double.NaN
          else (rng.nextInt(80) - 40).toDouble / 8.0
        val f2 = rng.nextInt(5).toDouble
        val y = (2.0 * f0 + (if (f1.isNaN) 3.0 else f1) +
          rng.nextInt(4)).floor
        (i.toLong, f0, f1, f2, y)
      }
      val df = rows.toDF("id", "f0", "f1", "f2", "y")
        .repartition(1 + trial % 4)
      val spec = DMatrixSpec(labelCol = Seq("y"),
        featureCols = Some(Seq("f0", "f1", "f2")))
      val res = GraftBoost.train(df, spec,
        TrainParams(numRounds = 3, maxDepth = 3, seed = 5),
        numWorkers = 4)
      val batch = GraftBoost.predict(res.model, df, spec)
        .select("id", "prediction").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, f0, f1, f2, _) <- rows) {
        val scalar = res.model
          .predict(Array(f0.toFloat, f1.toFloat, f2.toFloat))(0)
        assert(batch(id) === scalar.toDouble,
          s"trial $trial id=$id f=($f0,$f1,$f2): batch=${batch(id)} " +
            s"scalar=$scalar")
      }
    }
  }
}
