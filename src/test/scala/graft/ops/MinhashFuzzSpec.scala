package graft.ops

import graft.SparkTestBase

/**
 * Randomized soundness check of MinHash-LSH with exact verification:
 * every emitted pair must truly meet the Jaccard threshold with the
 * reported value (no false positives can survive the exact tier), and
 * planted EXACT duplicates must always be caught (identical texts
 * share every band bucket, and min-pairing links each member to its
 * group minimum). Recall for near-misses is probabilistic by design —
 * that side is gated by sim_recall_check, not asserted here.
 */
class MinhashFuzzSpec extends SparkTestBase {
  import spark.implicits._

  /** The operator's shingling, mirrored: lowercase, whitespace
    * collapsed, char-k rolling 31-hash set (whole text when short). */
  private def shingles(s: String, k: Int): Set[Int] = {
    val t = s.toLowerCase.replaceAll("\\s+", " ").trim
    if (t.length < k) Set(t.hashCode)
    else (0 to t.length - k).map(i => t.substring(i, i + k).hashCode)
      .toSet
  }

  test("fuzz: exact-verified LSH emits only true near-dups with the " +
      "exact jaccard, and always catches planted exact duplicates") {
    val words = Array("lorem", "ipsum", "dolor", "sit", "amet", "sed")
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(7100 + trial)
      def text() = Seq.fill(6 + rng.nextInt(10))(
        words(rng.nextInt(words.length))).mkString(" ")
      val base = Seq.tabulate(12 + rng.nextInt(10))(i =>
        (i.toLong + 1, text()))
      // plant exact-duplicate groups
      val dups = base.take(3).zipWithIndex.flatMap { case ((id, t), g) =>
        Seq.tabulate(1 + rng.nextInt(2))(j =>
          (100L + g * 10 + j, t))
      }
      val docs = base ++ dups
      val df = docs.toDF("doc_id", "text").repartition(1 + trial % 4)
      val threshold = 0.8
      val out = Dedup.minhashLsh(df, "doc_id", "text", shingleLen = 5,
          threshold = threshold, exactVerify = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      val sets = docs.map { case (id, t) => id -> shingles(t, 5) }.toMap

      // soundness: every emitted pair is a true near-dup with the
      // exact jaccard (rounded 6), ordered keep_id < dup_id
      for ((a, b, j) <- out) {
        assert(a < b, s"trial $trial pair order ($a,$b)")
        val (ga, gb) = (sets(a), sets(b))
        val inter = (ga & gb).size.toDouble
        val exact = inter / (ga.size + gb.size - inter)
        assert(exact >= threshold, s"trial $trial false positive ($a,$b)")
        assert(j === BigDecimal(exact).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"trial $trial jaccard mismatch ($a,$b): $j vs $exact")
      }

      // completeness for EXACT duplicates: within each identical-text
      // group, every non-minimal member must be emitted against some
      // smaller member of its group
      val groups = docs.groupBy(_._2).values.filter(_.size > 1)
      val pairSet = out.map(p => (p._1, p._2)).toSet
      for (g <- groups; ids = g.map(_._1).sorted; d <- ids.tail) {
        assert(ids.init.exists(k => pairSet.contains((k, d))),
          s"trial $trial exact duplicate $d of group $ids not caught\n" +
            s"out=$out")
      }
    }
  }
}
