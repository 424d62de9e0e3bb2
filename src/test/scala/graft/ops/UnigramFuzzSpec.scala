package graft.ops

import graft.SparkTestBase

/**
 * Property fuzz for the unigram Viterbi encoder (the house fuzz
 * discipline — Minhash/TopK/Spans/Budget all carry one): against a
 * brute-force enumeration of ALL segmentations, [[Unigram
 * .UnigramModel.encode]] must return the max-total-score segmentation
 * and, among score ties, the one the DP's deterministic rule selects
 * (longest last piece, applied recursively toward the front — i.e.
 * the lexicographically greatest reversed piece-length sequence).
 * Scores are drawn from a COARSE grid on purpose so ties actually
 * occur; the oracle equivalence argument in the harness rests on this
 * exact tie rule, so it is the property most worth fuzzing.
 */
class UnigramFuzzSpec extends SparkTestBase {

  private def bruteForce(word: String,
      scoreOf: Map[String, Long]): Seq[String] = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to math.min(s.length, Unigram.MaxPieceLen)).flatMap { l =>
        val piece = s.substring(0, l)
        val ok = scoreOf.contains(piece) || l == 1
        if (!ok) Seq.empty
        else segs(s.substring(l)).map(piece +: _)
      }
    def score(seg: Seq[String]): Long = seg.iterator.map { p =>
      if (p.length == 1) scoreOf.getOrElse(p, Unigram.UnkScoreQ)
      else scoreOf(p)
    }.sum
    val all = segs(word)
    val best = all.map(score).max
    // DP tie rule: longest last piece, recursively toward the front =
    // greatest reversed length sequence, compared lexicographically
    implicit val ord: Ordering[Seq[Int]] =
      Ordering.Implicits.seqOrdering[Seq, Int]
    all.filter(score(_) == best)
      .maxBy(seg => seg.reverseIterator.map(_.length).toSeq)
  }

  test("encode == brute-force max-score segmentation under the " +
      "longest-last-piece tie rule (300 random vocab/word draws)") {
    val rng = new scala.util.Random(20260816L)
    val alphabet = "abc"
    (1 to 300).foreach { it =>
      // random piece table over substrings of length 1..3; scores on
      // a coarse grid (multiples of 5) so ties are common
      val pieces = scala.collection.mutable.Map[String, Long]()
      val nPieces = 3 + rng.nextInt(10)
      (1 to nPieces).foreach { _ =>
        val len = 1 + rng.nextInt(3)
        val p = Array.fill(len)(alphabet(rng.nextInt(3))).mkString
        pieces(p) = -5L * (1 + rng.nextInt(6))
      }
      // guarantee at least one piece so the model constructs
      pieces.getOrElseUpdate("a", -10L)
      val model = Unigram.UnigramModel(pieces.toSeq.sortBy(_._1))
      val scoreOf = pieces.toMap
      val wordLen = 1 + rng.nextInt(9)
      val word = Array.fill(wordLen)(alphabet(rng.nextInt(3))).mkString
      val got = model.encode(word).toSeq
      val want = bruteForce(word, scoreOf)
      assert(got == want,
        s"iter $it word=$word vocab=${pieces.toSeq.sortBy(_._1)}: " +
          s"got $got want $want")
      assert(got.mkString("") == word, s"iter $it: lossy encode $got")
    }
  }
}
