package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec
import org.apache.spark.sql.functions._

/**
 * TrainParams.pairCap (the xgboost `lambdarank_num_pair_per_sample`
 * analog): capped pair sampling must (a) leave the default path
 * BIT-IDENTICAL (cap 0 = all pairs — every rank oracle pins that),
 * (b) equal all-pairs exactly when the cap covers every discordant
 * partner, (c) be partition-invariant (sampling is (seed, round,
 * qid)-seeded, never partition-derived), and (d) still learn the
 * separable relevance.
 */
class PairCapSpec extends SparkTestBase {
  import spark.implicits._

  private def rankData(parts: Int) = {
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(600) { i =>
      val qid = (i % 20).toLong
      val v = rng.nextDouble() * 10.0
      (qid, v, if (v > 5.0) 1.0 else 0.0)
    }
    rows.toDF("user_id", "f1", "rel").repartition(parts)
  }

  private val spec = DMatrixSpec(labelCol = Seq("rel"),
    qidCol = Some("user_id"))

  private def fit(cap: Int, parts: Int = 4, rounds: Int = 2,
      objective: String = "rank:pairwise") = {
    val res = GraftBoost.train(rankData(parts), spec,
      TrainParams(objective = objective, numRounds = rounds,
        maxDepth = 2, seed = 7, pairCap = cap), numWorkers = 4)
    GraftBoost.predict(res.model, rankData(1), spec)
      .select("f1", "prediction").orderBy("f1")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
  }

  test("a cap covering every discordant partner is bit-identical to " +
      "all-pairs (the sampler must not perturb the exact path)") {
    // each qid group has 30 rows, so <= 29 discordant partners per row
    assert(fit(cap = 0) === fit(cap = 1000))
  }

  test("capped sampling is partition-invariant — (seed, round, qid) " +
      "seeding, not partition state") {
    assert(fit(cap = 3, parts = 1) === fit(cap = 3, parts = 7))
    // and across the lambdarank family too
    assert(fit(cap = 3, parts = 2, objective = "rank:ndcg") ===
      fit(cap = 3, parts = 5, objective = "rank:ndcg"))
  }

  test("a covering cap matches all-pairs bit-identically under IEEE " +
      "edge labels — NaN rows pair with nothing, -0.0f equals 0.0f " +
      "(advisor r16: the prefix must use IEEE keying, not total " +
      "ordering)") {
    val labels = Array(Float.NaN, -0.0f, 0.0f, 1.0f, Float.NaN, 2.0f,
      -0.0f, 0.5f, 1.0f, 0.0f)
    val n = labels.length
    val rng = new scala.util.Random(11)
    val margins = Array.fill(n)(rng.nextFloat() * 4.0f - 2.0f)
    val weights = Array.fill(n)(1.0f)
    val obj = new Objectives.PairwiseRank
    def grads(cap: Int): (Seq[Float], Seq[Float]) = {
      val g = new Array[Float](n); val h = new Array[Float](n)
      obj.groupGradients(margins, labels, weights, g, h, 0, n,
        pairCap = cap, pairSeed = 99L)
      (g.toSeq, h.toSeq)
    }
    val exact = grads(0)
    assert(grads(cap = n + 5) === exact)
    // NaN-labelled rows must receive ZERO gradient on both paths (the
    // exact path's IEEE > never selects them in either role)
    assert(exact._1(0) === 0.0f && exact._1(4) === 0.0f)
    // a -0.0f row and a 0.0f row see the same partner set: identical
    // margins would give identical gradients; here just pin that the
    // 0.0f rows got no -0.0f partners (0.0f > -0.0f is IEEE-false) by
    // checking a group of ONLY {-0.0f, 0.0f} labels yields all-zero
    val zl = Array(-0.0f, 0.0f, 0.0f, -0.0f)
    val zg = new Array[Float](4); val zh = new Array[Float](4)
    obj.groupGradients(Array(1f, 2f, 3f, 4f), zl, Array.fill(4)(1f),
      zg, zh, 0, 4, pairCap = 2, pairSeed = 5L)
    assert(zg.toSeq === Seq(0f, 0f, 0f, 0f))
    assert(zh.toSeq === Seq(0f, 0f, 0f, 0f))
  }

  test("a tight cap still learns the separable relevance (higher " +
      "feature => higher score) and differs from all-pairs (it IS " +
      "sampling)") {
    val capped = fit(cap = 2)
    val full = fit(cap = 0)
    assert(capped !== full)
    // monotone separation on the learned stump family: mean score of
    // the top-feature half must exceed the bottom half's
    val (lo, hi) = capped.sortBy(_._1).splitAt(capped.size / 2)
    val mLo = lo.map(_._2).sum / lo.size
    val mHi = hi.map(_._2).sum / hi.size
    assert(mHi > mLo, s"capped ranker failed to separate: $mLo vs $mHi")
  }
}
