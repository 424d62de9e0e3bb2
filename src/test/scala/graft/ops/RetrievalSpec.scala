package graft.ops

import graft.SparkTestBase

/**
 * BM25 top-k retrieval (X57): scores against an independent driver-side
 * reference, rank/tie-break order, non-matching and empty documents,
 * partition invariance, and the fail-fast guards.
 */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference: same BM25 definition computed over plain
    * Scala collections. */
  private def ref(corpus: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val idf = terms.map { t =>
      val df = toks.count(_._2.contains(t))
      t -> math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      id -> terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        idf(t) * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.sum
    }.filter { case (id, _) =>
      toks.find(_._1 == id).get._2.exists(terms.contains)
    }.toMap
  }

  private val corpus = Seq(
    1L -> "spark shuffle join spark spark",
    2L -> "hash join probe build",
    3L -> "spark hash",
    4L -> "nothing relevant here at all whatsoever in this one",
    5L -> "  ", // empty after trim: dl 0, never matches
    6L -> "join join join join join join join join")

  test("scores match an independent BM25 reference; non-matching and " +
      "empty docs are excluded; rank order is score desc, id asc (X57)") {
    val df = corpus.toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "doc_id", "text",
      Seq("spark", "join"), topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exp = ref(corpus, Seq("spark", "join"))
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 6L))
    got.foreach { case (id, s) =>
      val e = BigDecimal(exp(id)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(s - e) < 1e-9, s"doc $id: got $s want $e")
    }
    // descending by score with the reference agreeing on the order
    val wantOrder = exp.toSeq.sortBy { case (id, s) => (-s, id) }
      .map(_._1).take(10)
    assert(got.map(_._1).toSeq === wantOrder)
  }

  test("topK truncates after the tie-break; identical profiles tie " +
      "on ascending id; partition-invariant") {
    // docs 11/12/13 are token-identical → bit-identical scores
    val tied = Seq(10L -> "alpha beta", 11L -> "alpha gamma",
      12L -> "alpha gamma", 13L -> "alpha gamma")
    val df = tied.toDF("doc_id", "text")
    def run(parts: Int) =
      Retrieval.bm25TopK(df.repartition(parts), "doc_id", "text",
        Seq("gamma"), topK = 2).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r = run(3)
    assert(r.map(_._1) === Seq(11L, 12L))
    assert(r(0)._2 === r(1)._2)
    assert(run(1) === r)
  }

  test("guards: empty terms, duplicate terms, bad topK, empty corpus") {
    val df = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Nil, 5) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Seq("a", "a"), 5) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Seq("a"), 0) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df.limit(0), "doc_id", "text", Seq("a"), 5) }
  }
}
