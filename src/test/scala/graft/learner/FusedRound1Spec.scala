package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * The fused round-1 path (`TrainParams.fuseRound1`: one prepare-lineage
 * pass packing FloatBlocks, binner fit + byte-bin conversion from the
 * cache) must be BIT-IDENTICAL to the default two-pass path — same
 * block boundaries, same binner sample selection, same packed arrays —
 * on every representation-shaping feature: plain pointwise training,
 * ranking's qid-sorted groups, and weight/base-margin columns. The
 * path choice is a pure performance trade (BENCHLARGE.md r15 measures
 * it); this spec pins that it can never become a semantic one.
 */
class FusedRound1Spec extends SparkTestBase {
  import spark.implicits._

  private def fp(res: TrainResult): (Int, Map[String, Map[String, Seq[Double]]]) =
    (modelStructureHash(res.model),
      res.evalsResult.map { case (k, v) =>
        k -> v.map { case (m, s) => m -> s.toSeq }
      })

  test("binary + weights + base margin: fused == two-pass bit-for-bit") {
    val rng = new scala.util.Random(31)
    val df = (1 to 3000).map { _ =>
      val a = rng.nextDouble() * 4; val b = rng.nextDouble() * 4
      val y = if (1.1 * a - b + rng.nextGaussian() > 0) 1.0 else 0.0
      (a, b, y, 0.5 + rng.nextInt(3) * 0.25, rng.nextGaussian() * 0.1)
    }.toDF("a", "b", "y", "w", "m").repartition(5)
    val spec = DMatrixSpec(labelCol = Seq("y"), weightCol = Some("w"),
      baseMarginCol = Some("m"))
    def run(fuse: Boolean) = GraftBoost.train(df, spec,
      TrainParams(objective = "binary:logistic", numRounds = 5,
        maxDepth = 4, seed = 7, subsample = 0.8,
        evalMetric = Seq("logloss"), fuseRound1 = fuse),
      evals = Seq(("train", df)))
    assert(fp(run(true)) === fp(run(false)))
  }

  test("survival:aft interval bounds (the anyBound/null-uppers block " +
      "column): fused == two-pass bit-for-bit") {
    val rng = new scala.util.Random(23)
    val df = (1 to 1500).map { i =>
      val a = rng.nextDouble() * 3; val b = rng.nextDouble() * 3
      val lo = math.exp(0.8 * a - 0.3 * b + rng.nextGaussian() * 0.2)
      // every third row right-censored (upper = +inf), rest interval
      val hi = if (i % 3 == 0) Double.PositiveInfinity
        else lo * (1.0 + rng.nextDouble())
      (a, b, lo, hi)
    }.toDF("a", "b", "lo", "hi").repartition(4)
    val spec = DMatrixSpec(labelLowerCol = Some("lo"),
      labelUpperCol = Some("hi"))
    def run(fuse: Boolean) = GraftBoost.train(df, spec,
      TrainParams(objective = "survival:aft", numRounds = 4,
        maxDepth = 3, seed = 17, evalMetric = Seq("aft-nloglik"),
        fuseRound1 = fuse),
      evals = Seq(("train", df)))
    assert(fp(run(true)) === fp(run(false)))
  }

  test("rank:ndcg qid groups: fused == two-pass bit-for-bit " +
      "(group-keeping block boundaries included)") {
    val rng = new scala.util.Random(13)
    val df = (1 to 1200).map { i =>
      val q = (i % 40).toLong
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, (rng.nextInt(3)).toDouble, q)
    }.toDF("a", "b", "y", "qid").repartition(7)
    val spec = DMatrixSpec(labelCol = Seq("y"), qidCol = Some("qid"))
    def run(fuse: Boolean) = GraftBoost.train(df, spec,
      TrainParams(objective = "rank:ndcg", numRounds = 4, maxDepth = 3,
        seed = 5, evalMetric = Seq("ndcg"), fuseRound1 = fuse),
      evals = Seq(("train", df)))
    assert(fp(run(true)) === fp(run(false)))
  }
}
