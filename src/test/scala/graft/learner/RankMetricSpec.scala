package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/** ndcg[@k] / map[@k] qid-group ranking metrics (the xgboost ranking
  * eval surface the reference forwards; rank-quality conformance is
  * tests/test_end_to_end.py:374-425 in the reference). */
class RankMetricSpec extends SparkTestBase {
  import spark.implicits._

  private def groupRows(rows: Seq[(Float, Float, Float, Long)],
      parts: Int = 2) = {
    // one qid group per slice: whole groups stay partition-contiguous,
    // exactly as the trainer lays rank data out (Sharding.sortByQid)
    val byGroup = rows.foldLeft(Vector.empty[Vector[
      (Float, Float, Float, Long)]]) { (acc, r) =>
      if (acc.nonEmpty && acc.last.last._4 == r._4)
        acc.init :+ (acc.last :+ r)
      else acc :+ Vector(r)
    }
    spark.sparkContext.parallelize(byGroup, math.min(parts, byGroup.size))
      .flatMap(identity)
  }

  test("ndcg matches a hand computation (with an all-negative group)") {
    val rows = Seq(
      (0.9f, 1f, 1f, 1L), (0.8f, 0f, 1f, 1L), (0.7f, 1f, 1f, 1L),
      (0.5f, 0f, 1f, 2L), (0.6f, 0f, 1f, 2L))
    // group 1 ranked rels [1,0,1]: dcg = 1 + 0.5 = 1.5,
    // ideal [1,1,0]: 1 + 1/log2(3); group 2 has no positives → 1.0
    val g1 = 1.5 / (1.0 + 1.0 / (math.log(3.0) / math.log(2.0)))
    val expected = (g1 + 1.0) / 2.0
    val got = Metrics.computeGroup("ndcg", groupRows(rows))
    assert(math.abs(got - expected) < 1e-12, s"ndcg $got vs $expected")
  }

  test("map matches a hand computation; map@1 truncates") {
    val rows = Seq(
      (0.9f, 1f, 1f, 1L), (0.8f, 0f, 1f, 1L), (0.7f, 1f, 1f, 1L),
      (0.5f, 0f, 1f, 2L), (0.6f, 1f, 1f, 2L))
    // g1: hits at ranks 1,3 → AP = (1 + 2/3)/2; g2 ranked rels [1,0] → 1
    val expected = ((1.0 + 2.0 / 3.0) / 2.0 + 1.0) / 2.0
    val got = Metrics.computeGroup("map", groupRows(rows))
    assert(math.abs(got - expected) < 1e-12, s"map $got vs $expected")
    // @1 (xgboost semantics — divisor is the UNCAPPED positive count):
    // g1 top doc relevant but 2 positives → 1/2; g2 top doc relevant,
    // 1 positive → 1. map@1 = (0.5 + 1)/2
    val at1 = Metrics.computeGroup("map@1", groupRows(rows))
    assert(math.abs(at1 - 0.75) < 1e-12, s"map@1 $at1")
  }

  test("map@k with more positives than k matches xgboost (never 1.0)") {
    // the ADVICE divergence case: a single group with 2 positives,
    // top-1 relevant — xgboost map@1 = 0.5, not 1.0
    val rows = Seq(
      (0.9f, 1f, 1f, 7L), (0.8f, 1f, 1f, 7L), (0.7f, 0f, 1f, 7L))
    val at1 = Metrics.computeGroup("map@1", groupRows(rows, parts = 1))
    assert(math.abs(at1 - 0.5) < 1e-12, s"map@1 $at1")
    // map@2: hits at 1,2 → (1 + 2/2)/2 = 1.0 (k covers all positives)
    val at2 = Metrics.computeGroup("map@2", groupRows(rows, parts = 1))
    assert(math.abs(at2 - 1.0) < 1e-12, s"map@2 $at2")
  }

  test("ndcg@k truncation and score ties keep row order") {
    val rows = Seq( // one group, all scores tied → ranked order = row order
      (0.5f, 0f, 1f, 9L), (0.5f, 1f, 1f, 9L), (0.5f, 1f, 1f, 9L))
    // ranked rels [0,1,1]: dcg@2 = 0 + 1/log2(3); ideal@2 = 1 + 1/log2(3)
    val l3 = 1.0 / (math.log(3.0) / math.log(2.0))
    val expected = l3 / (1.0 + l3)
    val got = Metrics.computeGroup("ndcg@2", groupRows(rows, parts = 1))
    assert(math.abs(got - expected) < 1e-12, s"ndcg@2 $got vs $expected")
  }

  test("group weight comes from the group's first row") {
    val rows = Seq(
      (0.9f, 1f, 3f, 1L), (0.1f, 0f, 3f, 1L), // perfect, weight 3
      (0.1f, 1f, 1f, 2L), (0.9f, 0f, 2L.toFloat, 2L)) // inverted, weight 1
    // inverted pair: ranked rels [0,1] → dcg = 1/log2(3), ideal = 1
    val inv = 1.0 / (math.log(3.0) / math.log(2.0))
    val expected = (3.0 * 1.0 + 1.0 * inv) / 4.0
    val got = Metrics.computeGroup("ndcg", groupRows(rows))
    assert(math.abs(got - expected) < 1e-12, s"weighted ndcg $got")
  }

  test("rank:pairwise training improves ndcg@10 and map (end-to-end)") {
    val rng = new scala.util.Random(83)
    val rows = (1 to 2000).map { i =>
      val q = i / 20 // 100 groups of 20
      val x = rng.nextDouble()
      val rel = if (x + 0.1 * rng.nextDouble() > 0.7) 1.0 else 0.0
      (x, rel, q.toLong)
    }
    val df = rows.toDF("x", "rel", "qid").repartition(4)
    val res = GraftBoost.train(df,
      DMatrixSpec(labelCol = Seq("rel"), qidCol = Some("qid")),
      TrainParams(objective = "rank:pairwise", numRounds = 15,
        maxDepth = 3, seed = 5, evalMetric = Seq("ndcg@10", "map")),
      evals = Seq(("train", df)))
    val ndcg = res.evalsResult("train")("ndcg@10")
    val map = res.evalsResult("train")("map")
    assert(ndcg.last > ndcg.head, s"ndcg@10 did not improve: $ndcg")
    assert(map.last > map.head, s"map did not improve: $map")
    assert(ndcg.last > 0.9, s"final ndcg@10 ${ndcg.last}")
  }

  test("per-group auc (r10): hand computation with midrank ties and " +
      "an undefined group excluded from the mean") {
    val rows = Seq(
      // g1: pos scores {0.9, 0.7}, neg {0.8}: ranks asc 0.7,0.8,0.9 →
      // rankSumPos = 1 + 3 = 4, auc = (4 − 2·3/2)/(2·1) = 0.5
      (0.9f, 1f, 1f, 1L), (0.8f, 0f, 1f, 1L), (0.7f, 1f, 1f, 1L),
      // g2: tie at 0.5 between one pos and one neg → midrank 1.5,
      // auc = (1.5 − 1)/(1·1) = 0.5; plus a neg below → ranks:
      // 0.2(neg)=1, ties 0.5 at midrank 2.5 → auc = (2.5 − 1)/2 = 0.75
      (0.5f, 1f, 1f, 2L), (0.5f, 0f, 1f, 2L), (0.2f, 0f, 1f, 2L),
      // g3: all negative → undefined, EXCLUDED from the mean
      (0.4f, 0f, 1f, 3L), (0.3f, 0f, 1f, 3L))
    val got = Metrics.computeGroup("auc", groupRows(rows))
    assert(math.abs(got - (0.5 + 0.75) / 2.0) < 1e-12, s"auc $got")
  }

  test("rank:pairwise default auc is the per-group mean, not global " +
      "(groups with inverted scales agree per-group)") {
    // two groups whose score SCALES are inverted: globally pooled, g2's
    // positives (scores ~0.1) rank below g1's negatives (~0.4) and the
    // pooled auc is pulled toward 0.5; per-group both are perfect 1.0
    val rows = Seq(
      (0.9f, 1f, 1f, 1L), (0.4f, 0f, 1f, 1L),
      (0.1f, 1f, 1f, 2L), (0.05f, 0f, 1f, 2L))
    val got = Metrics.computeGroup("auc", groupRows(rows))
    assert(got === 1.0, s"per-group auc must be 1.0, got $got")
  }

  test("rank training reports per-group auc in the eval history and " +
      "it improves (the rank:pairwise default metric)") {
    val rng = new scala.util.Random(89)
    val rows = (1 to 1500).map { i =>
      val q = i / 15
      val x = rng.nextDouble()
      val rel = if (x + 0.1 * rng.nextDouble() > 0.7) 1.0 else 0.0
      (x, rel, q.toLong)
    }
    val df = rows.toDF("x", "rel", "qid").repartition(3)
    val res = GraftBoost.train(df,
      DMatrixSpec(labelCol = Seq("rel"), qidCol = Some("qid")),
      TrainParams(objective = "rank:pairwise", numRounds = 10,
        maxDepth = 3, seed = 7),
      evals = Seq(("train", df)))
    val auc = res.evalsResult("train")("auc")
    assert(auc.last >= auc.head, s"auc did not improve: $auc")
    assert(auc.last > 0.9, s"final per-group auc ${auc.last}")
  }

  test("group metrics on a pointwise objective fail fast") {
    val df = (1 to 50).map(i => (i.toDouble, i % 2)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      GraftBoost.train(df, DMatrixSpec("y"),
        TrainParams(objective = "binary:logistic", numRounds = 2,
          evalMetric = Seq("ndcg")),
        evals = Seq(("train", df)))
    }
    assert(e.getMessage.contains("rank"), e.getMessage)
  }
}
