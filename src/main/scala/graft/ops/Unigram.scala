package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SentencePiece-style UNIGRAM LM tokenizer (Kudo 2018, "Subword
 * Regularization") — the other production subword family next to
 * [[TextOps.trainBpe]]'s BPE (X38): pieces carry unigram
 * log-probabilities and a word's tokenization is the VITERBI-best
 * segmentation (max Σ log p(piece)), learned by shrink-EM over a
 * bounded word-frequency table. Reference xgboost_ray forwards its
 * users' text pipelines untouched; this completes the tokenizer-
 * training story an LLM data pipeline needs (X101).
 *
 * Scale shape — the trainBpe contract exactly: the corpus is scanned
 * ONCE (token explode → map-side-combined word count → bounded
 * top-`maxWords` cut); seeding, EM, and pruning then run on the
 * DRIVER over ≤ maxWords word types (how production unigram trainers
 * work — SentencePiece operates on the frequency dict, never the
 * corpus). Encoding broadcasts the piece table and is per-row local
 * (zero shuffle, one scan, per-task word memo).
 *
 * Determinism — stronger than float log-probs: piece scores freeze to
 * FIXED-POINT integers (score_q = ⌊ln(c/C)·2²⁰ + 0.5⌋, exact long
 * counts in, one double ln per piece at train time), so the Viterbi
 * DP compares exact BIGINT sums — bit-identical across partitionings,
 * runs, AND SQL engines (the `tx_unigram_encode` oracle replays the
 * DP in DuckDB without ever computing a logarithm). Ties break by
 * the LONGEST last piece (the DP scans candidate start positions
 * ascending and replaces only on strict improvement). Characters
 * outside the table segment as single-char pieces at [[UnkScoreQ]],
 * so segmentation is total on any input.
 */
object Unigram {

  /** Fixed-point scale for quantized log-probs (2²⁰ — the house
    * fixed-point convention). */
  val ScoreScale: Double = 1048576.0

  /** Score of an out-of-vocabulary single character. More negative
    * than any real piece can reach with maxWords ≤ 2²⁰-scale corpora
    * (ln(1/2⁶³)·2²⁰ ≈ −4.6e7 ≫ this), so known pieces always win. */
  val UnkScoreQ: Long = -100L * 1048576L

  /** Longest candidate piece considered during seeding and DP. */
  val MaxPieceLen: Int = 6

  /**
   * A trained unigram tokenizer: pieces with quantized log-prob
   * scores. Driver-sized, serializable — train once, encode many.
   */
  final case class UnigramModel(pieces: Seq[(String, Long)])
      extends Serializable {
    require(pieces.nonEmpty, "unigram model needs >= 1 piece")
    @transient private lazy val scoreOf: Map[String, Long] =
      pieces.toMap
    @transient private lazy val maxLen: Int =
      pieces.iterator.map(_._1.length).max

    /** Viterbi-best segmentation of one word under the quantized
      * scores: best(pos) = max over starts j of best(j) +
      * score(word[j, pos)); candidate starts scan ASCENDING (longest
      * piece first) and replace only on STRICT improvement, so equal
      * scores keep the longest last piece — the deterministic tie
      * rule the SQL oracle mirrors. Unknown single chars take
      * [[UnkScoreQ]]; multi-char unknowns are simply not candidates. */
    def encode(word: String): Array[String] = {
      val n = word.length
      if (n == 0) return Array.empty
      val best = new Array[Long](n + 1)
      val back = new Array[Int](n + 1)
      var pos = 1
      while (pos <= n) {
        var bestScore = Long.MinValue
        var bestJ = -1
        var j = math.max(0, pos - math.max(maxLen, 1))
        while (j < pos) {
          val piece = word.substring(j, pos)
          val s =
            if (pos - j == 1)
              scoreOf.getOrElse(piece, UnkScoreQ)
            else scoreOf.getOrElse(piece, Long.MinValue)
          if (s != Long.MinValue && best(j) != Long.MinValue) {
            val cand = best(j) + s
            if (cand > bestScore) { bestScore = cand; bestJ = j }
          }
          j += 1
        }
        best(pos) = bestScore
        back(pos) = bestJ
        pos += 1
      }
      // single-char fallback guarantees every pos is reachable
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var p = n
      while (p > 0) { out += word.substring(back(p), p); p = back(p) }
      out.reverseIterator.toArray
    }
  }

  /**
   * Train a unigram piece table by shrink-EM (the SentencePiece
   * recipe, Viterbi-E simplified): seed with all substrings (length ≤
   * [[MaxPieceLen]]) of the top-`maxWords` word types weighted by
   * occurrence × word frequency, cut to `seedSize`; each iteration
   * re-scores pieces from their usage in the current Viterbi
   * segmentations and keeps the top `vocabSize` multi-char pieces
   * (single characters are never pruned — they guarantee coverage).
   * Counts are exact longs; every cut orders by (count DESC, piece
   * ASC), so the table is bit-deterministic across partitionings.
   */
  def trainUnigram(df: DataFrame, textCol: String,
      vocabSize: Int = 1000, maxWords: Int = 65536,
      seedSize: Int = 8192, emIters: Int = 2): UnigramModel = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(maxWords > 0 && seedSize > 0 && emIters >= 1,
      s"bad params: maxWords=$maxWords seedSize=$seedSize emIters=$emIters")
    val words = df
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(words.nonEmpty, "trainUnigram: empty corpus")

    // seed: substring occurrence counts weighted by word frequency
    val seedCounts = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- words) {
      var i = 0
      while (i < w.length) {
        var len = 1
        while (len <= MaxPieceLen && i + len <= w.length) {
          val p = w.substring(i, i + len)
          seedCounts(p) = seedCounts.getOrElse(p, 0L) + c
          len += 1
        }
        i += 1
      }
    }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toSet
    var vocab: Map[String, Long] = {
      val multi = seedCounts.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(seedSize).toMap
      multi ++ seedCounts.iterator.filter(_._1.length == 1)
    }

    var iter = 0
    var model: UnigramModel = null
    while (iter < emIters) {
      model = UnigramModel(toScores(vocab))
      // Viterbi-E: re-count pieces from each word's best segmentation
      val used = scala.collection.mutable.HashMap[String, Long]()
      for ((w, c) <- words; piece <- model.encode(w))
        used(piece) = used.getOrElse(piece, 0L) + c
      // M + prune: keep top-vocabSize multi-char USED pieces; single
      // chars keep a floor count of 1 so coverage never collapses
      val multi = used.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(vocabSize).toMap
      vocab = multi ++ chars.iterator.map(ch =>
        ch -> math.max(used.getOrElse(ch, 0L), 1L))
      iter += 1
    }
    UnigramModel(toScores(vocab))
  }

  /** Persist a trained piece table as parquet (the [[TextOps.saveBpe]]
    * cross-job reuse convention): scores are already exact integers,
    * so the round-trip is trivially lossless. `rank` pins the
    * (count desc, piece asc) training order so a reloaded model lists
    * pieces identically. */
  def saveUnigram(spark: org.apache.spark.sql.SparkSession,
      model: UnigramModel, path: String): Unit = {
    import spark.implicits._
    model.pieces.zipWithIndex.map { case ((p, s), r) => (r, p, s) }
      .toDF("rank", "piece", "score_q")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[UnigramModel]] written by [[saveUnigram]]. */
  def loadUnigram(spark: org.apache.spark.sql.SparkSession,
      path: String): UnigramModel =
    UnigramModel(spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq)

  private def toScores(counts: Map[String, Long]): Seq[(String, Long)] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.toSeq.sortBy { case (p, c) => (-c, p) }.map { case (p, c) =>
      p -> math.floor(math.log(c / total) * ScoreScale + 0.5).toLong
    }
  }

  /**
   * Encode a corpus under a trained [[UnigramModel]], appending one
   * `uni_seq` column — the per-document piece sequence as an array of
   * strings (word pieces in word order); callers derive counts /
   * joined-text views from it (SparkEntry's `tx_unigram_encode` does
   * exactly that). Broadcast table, per-task word memo, zero shuffle,
   * one scan. (Scaladoc corrected per advice r20 — the old text
   * promised `uni_pieces`/`uni_text` columns this function never
   * emitted, and carried an unused id parameter.)
   */
  def unigramTokens(df: DataFrame, textCol: String,
      model: UnigramModel): DataFrame =
    df.withColumn("uni_seq",
      TextOps.seqEncoderUdf(model.encode)(col(textCol)))
}
