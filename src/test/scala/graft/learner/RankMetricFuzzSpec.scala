package graft.learner

import graft.SparkTestBase

/**
 * Randomized cross-check of the zero-shuffle group metrics (ndcg@k /
 * map@k / group-AUC) against independently-written reference math:
 * tie-heavy scores (midrank AUC, stable ndcg order), graded
 * relevances, all-positive/all-negative groups (AUC-excluded,
 * ndcg/map degenerate conventions), per-group weights, and varying
 * partition counts over the qid-contiguous layout.
 */
class RankMetricFuzzSpec extends SparkTestBase {

  private def refAuc(g: Seq[(Float, Float)]): Option[Double] = {
    val pos = g.filter(_._2 > 0f).map(_._1)
    val neg = g.filter(_._2 <= 0f).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      // P(pos > neg) + 0.5 P(tie), the Mann-Whitney definition
      var s = 0.0
      for (p <- pos; q <- neg)
        s += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
      Some(s / (pos.size.toDouble * neg.size))
    }
  }

  private def ranked(g: Seq[(Float, Float)]): Seq[Float] =
    g.zipWithIndex.sortBy { case ((s, _), i) => (-s.toDouble, i) }
      .map(_._1._2)

  private def refNdcg(g: Seq[(Float, Float)], k: Int): Double = {
    def dcg(rs: Seq[Float]): Double =
      rs.take(k).zipWithIndex.map { case (r, i) =>
        (math.pow(2.0, r) - 1.0) / (math.log(i + 2.0) / math.log(2.0))
      }.sum
    val ideal = dcg(g.map(_._2).sortBy(-_.toDouble))
    if (ideal == 0.0) 1.0 else dcg(ranked(g)) / ideal
  }

  private def refMap(g: Seq[(Float, Float)], k: Int): Double = {
    val rs = ranked(g)
    val totalPos = rs.count(_ > 0f)
    if (totalPos == 0) 1.0
    else {
      var hits = 0
      var s = 0.0
      for ((r, i) <- rs.take(k).zipWithIndex if r > 0f) {
        hits += 1; s += hits.toDouble / (i + 1)
      }
      s / totalPos
    }
  }

  test("fuzz: ndcg@k / map@k / group-AUC equal independent reference " +
      "math over tie-heavy random groups") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(5500 + trial)
      val k = 1 + rng.nextInt(6)
      val groups = Seq.tabulate(4 + rng.nextInt(6)) { q =>
        val gw = (1 + rng.nextInt(3)).toFloat
        val rows = Seq.fill(1 + rng.nextInt(12))(
          (rng.nextInt(4).toFloat,           // tie-heavy scores
            rng.nextInt(4).toFloat))         // graded relevance
        (q.toLong, gw, rows)
      }
      val rdd = spark.sparkContext
        .parallelize(groups, 1 + trial % 4)
        .flatMap { case (q, gw, rows) =>
          rows.map { case (s, r) => (s, r, gw, q) }
        }

      val gotN = Metrics.computeGroup(s"ndcg@$k", rdd)
      val gotM = Metrics.computeGroup(s"map@$k", rdd)
      val gotA = Metrics.computeGroup("auc", rdd)

      def weighted(f: Seq[(Float, Float)] => Option[Double]): Double = {
        val vs = groups.flatMap { case (_, gw, rows) =>
          f(rows).map(v => (v * gw, gw.toDouble))
        }
        if (vs.isEmpty) 0.0 else vs.map(_._1).sum / vs.map(_._2).sum
      }
      val expN = weighted(g => Some(refNdcg(g, k)))
      val expM = weighted(g => Some(refMap(g, k)))
      val expA = weighted(refAuc)
      assert(math.abs(gotN - expN) < 1e-9, s"trial $trial ndcg@$k")
      assert(math.abs(gotM - expM) < 1e-9, s"trial $trial map@$k")
      assert(math.abs(gotA - expA) < 1e-9, s"trial $trial auc")
    }
  }
}
