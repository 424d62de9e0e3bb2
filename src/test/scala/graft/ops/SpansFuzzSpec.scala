package graft.ops

import graft.SparkTestBase

/**
 * Randomized cross-check of corpus-wide duplicate-span detection
 * against a brute-force reference: tiny vocabularies force heavy
 * k-gram repetition within AND across docs, so the canonical-first
 * exemption, the interval merge (adjacent runs coalesce via the
 * end-exclusive chain rule), and the per-doc grouping all get
 * exercised on shapes the documents fixture never produces.
 */
class SpansFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: duplicate spans equal the brute-force k-gram scan with " +
      "the canonical-first exemption and maximal interval merge") {
    val vocab = Array("a", "b", "c")
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(8400 + trial)
      val k = 2 + trial % 2
      val docs = Seq.tabulate(6 + rng.nextInt(6)) { i =>
        val len = rng.nextInt(14) // some below k → no grams
        (i.toLong + 1,
          Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(1 + trial % 4)
      val got = Dedup.duplicateSpans(df, "doc_id", "text", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet

      // brute force: every k-gram occurrence as (gram, doc, 1-based
      // pos); grams with >1 occurrence flag all but the (doc, pos)-min
      val occ = docs.flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.length < k) Nil
        else (0 to toks.length - k).map(i =>
          (toks.slice(i, i + k).mkString(" "), id, i + 1L))
      }
      val flagged = occ.groupBy(_._1).values.filter(_.size > 1)
        .flatMap { g =>
          val canon = g.minBy(o => (o._2, o._3))
          g.filterNot(_ == canon)
        }
      val expected = flagged.groupBy(_._2).flatMap { case (id, os) =>
        val ps = os.map(_._3).toSeq.sorted
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var s = -1L; var e = -1L
        ps.foreach { p =>
          if (s < 0) { s = p; e = p + k }
          else if (p <= e) e = math.max(e, p + k)
          else { out += ((s, e)); s = p; e = p + k }
        }
        if (s >= 0) out += ((s, e))
        out.map { case (a, b) => (id, a, b) }
      }.toSet
      assert(got === expected,
        s"trial $trial k=$k missing=${expected -- got} " +
          s"extra=${got -- expected}\ndocs=$docs")
    }
  }
}
