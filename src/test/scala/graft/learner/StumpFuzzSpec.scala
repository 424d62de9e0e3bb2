package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import org.apache.spark.sql.functions._

/**
 * Randomized cross-check of the distributed depth-1 trainer against a
 * closed-form reference: small-cardinality feature values (each gets
 * its own bin), integral labels (exact-half gradients), random
 * partitionings — verifying the cumulative gain scan, the
 * earliest-strict-improvement tie-break, the min_child_weight guard,
 * the no-positive-gain leaf-only root, and the REAL leaf arithmetic
 * on shapes the fixed lineitem fixtures never produce.
 */
class StumpFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: 1-round depth-1 predictions equal the closed-form gain " +
      "scan on random small-cardinality data") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(3300 + trial)
      val kx = 2 + rng.nextInt(4) // distinct feature values
      val n = 25 + rng.nextInt(150)
      val rows = Seq.tabulate(n) { _ =>
        val x = rng.nextInt(kx).toDouble
        // mostly x-correlated labels; occasionally constant (trial 3)
        val y = if (trial == 3) 7.0
          else (rng.nextInt(10) + x * rng.nextInt(5)).floor
        (x, y)
      }
      val df = rows.toDF("x", "y").repartition(1 + trial % 4)
      val res = GraftBoost.train(df, DMatrixSpec("y"),
        TrainParams(numRounds = 1, maxDepth = 1, seed = 1),
        numWorkers = 4)
      val got = GraftBoost.predict(res.model, df, DMatrixSpec("y"))
        .groupBy("x").agg(max("prediction").as("p"),
          min("prediction").as("pmin"))
        .collect()
        .map { r =>
          assert(r.getDouble(1) === r.getDouble(2)) // constant per x
          r.getDouble(0) -> r.getDouble(1)
        }.toMap

      // closed form: per distinct x ascending, G = Σ(0.5 − y), H = n;
      // cumulative cuts, gain = ((gl²/(hl+1) + gr²/(hr+1)) − g²/(h+1))/2,
      // earliest strict improvement wins; children need H ≥ 1;
      // no positive gain → single root leaf
      val byX = rows.groupBy(_._1).toSeq.sortBy(_._1)
      val gs = byX.map { case (_, g) => g.map(0.5 - _._2).sum }
      val hs = byX.map { case (_, g) => g.size.toDouble }
      val gT = gs.sum; val hT = hs.sum
      val parent = gT * gT / (hT + 1.0)
      var bestGain = 0.0
      var bestCut = -1
      var gl = 0.0; var hl = 0.0
      for (c <- 0 until byX.size - 1) {
        gl += gs(c); hl += hs(c)
        val gr = gT - gl; val hr = hT - hl
        if (hl >= 1.0 && hr >= 1.0) {
          val gain = 0.5 * (gl * gl / (hl + 1.0) +
            gr * gr / (hr + 1.0) - parent)
          if (gain > bestGain) { bestGain = gain; bestCut = c }
        }
      }
      def leaf(g: Double, h: Double): Float =
        ((-0.3 * g) / (h + 1.0)).toFloat
      val expected: Map[Double, Double] =
        if (bestCut < 0) {
          val l = 0.5f + leaf(gT, hT)
          byX.map { case (x, _) => x -> l.toDouble }.toMap
        } else {
          var cgl = 0.0; var chl = 0.0
          for (c <- 0 to bestCut) { cgl += gs(c); chl += hs(c) }
          val ll = 0.5f + leaf(cgl, chl)
          val lr = 0.5f + leaf(gT - cgl, hT - chl)
          byX.zipWithIndex.map { case ((x, _), i) =>
            x -> (if (i <= bestCut) ll.toDouble else lr.toDouble)
          }.toMap
        }
      assert(got === expected,
        s"trial $trial kx=$kx n=$n bestCut=$bestCut gain=$bestGain\n" +
          s"byX=${byX.map { case (x, g) => (x, g.size) }}")
    }
  }
}
