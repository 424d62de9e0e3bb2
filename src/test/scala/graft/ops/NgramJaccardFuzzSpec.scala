package graft.ops

import graft.SparkTestBase

/**
 * Randomized cross-check of the AllPairs prefix-filtered n-gram
 * Jaccard dedup against brute-force all-pairs over the same gram
 * sets: tiny vocabularies force heavy gram sharing (oversized
 * postings), `maxPosting = 3` forces the block-pair chunking path on
 * nearly every gram, and thresholds vary — the classic bug class here
 * is a LOST candidate pair (prefix too short, a chunk boundary, the
 * size filter), which exact verification can never recover.
 */
class NgramJaccardFuzzSpec extends SparkTestBase {
  import spark.implicits._

  /** The operator's shingling, mirrored: lowercase whitespace tokens,
    * word-n-gram 31-hashes (whole text when shorter than n), deduped. */
  private def gramSet(s: String, n: Int): Set[Int] = {
    val toks = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Set.empty
    else if (toks.length < n)
      Set(toks.foldLeft(1)((h, t) => h * 31 + t.hashCode))
    else (0 to toks.length - n).map { i =>
      (i until i + n).foldLeft(1)((h, j) => h * 31 + toks(j).hashCode)
    }.toSet
  }

  test("fuzz: prefix-filtered + chunked pair generation loses no pair " +
      "vs brute-force all-pairs Jaccard") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps")
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(4400 + trial)
      val n = 2 + trial % 2
      val threshold = Seq(0.3, 0.5, 0.8)(trial % 3)
      val nd = 15 + rng.nextInt(20)
      val docs = Seq.tabulate(nd) { i =>
        val len = rng.nextInt(10) // includes empty texts
        (i.toLong + 1,
          Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(1 + trial % 4)
      val got = Dedup.ngramJaccard(df, "doc_id", "text", n = n,
          threshold = threshold, maxPosting = 3)
        .select("keep_id", "dup_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val sets = docs.map { case (id, t) => id -> gramSet(t, n) }
        .filter(_._2.nonEmpty)
      val expected = (for {
        (ia, ga) <- sets; (ib, gb) <- sets if ia < ib
        inter = (ga & gb).size.toDouble
        j = inter / (ga.size + gb.size - inter)
        if j >= threshold
      } yield (ia, ib)).toSet
      assert(got === expected,
        s"trial $trial n=$n t=$threshold lost=${expected -- got} " +
          s"extra=${got -- expected}\ndocs=$docs")
    }
  }
}
