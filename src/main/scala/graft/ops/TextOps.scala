package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * token counting, quality scoring, language ID, document fingerprinting.
 *
 * Everything here is pure Catalyst `Column` expressions (whole-stage
 * codegen, no UDFs) so a 100 TB scan stays in Tungsten — the only
 * exception is the winnowing fingerprint, which needs a rolling window
 * and is a tight-loop UDF.
 */
object TextOps {

  /** Null-safe text: NULL behaves as the empty document everywhere. */
  private def nz(text: Column): Column = coalesce(text, lit(""))

  /** Whitespace tokens of normalized text (empty/NULL → empty array).
    * Strips ALL leading/trailing whitespace via regexp — Spark's
    * `trim` removes spaces only, so a tab-padded document would
    * otherwise produce phantom empty tokens through `split`. */
  def tokens(text: Column): Column = {
    val t = regexp_replace(nz(text), "^\\s+|\\s+$", "")
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Whitespace token count — codegen'd, no UDF. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish subword count estimate: word-piece regex splits on
   * letter/digit/punct boundaries, approximating how byte-pair tokenizers
   * segment text (≈ tokens a GPT-style BPE would produce, without a
   * vocab). Deterministic and cheap: one regexp pass.
   */
  def subwordCount(text: Column): Column =
    regexp_count(nz(text), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(nz(text)) === 0, 0.0)
      .otherwise(regexp_count(nz(text), lit("[\\p{Punct}]"))
        .cast("double") / length(nz(text)))

  /** Uppercase ratio over letters. */
  def upperRatio(text: Column): Column = {
    val letters = regexp_count(nz(text), lit("[A-Za-z]"))
    when(letters === 0, 0.0)
      .otherwise(regexp_count(nz(text), lit("[A-Z]")).cast("double") /
        letters)
  }

  private val EnglishStops: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "i", "at",
    "be", "this", "have", "from", "or", "had", "by", "not", "but", "what",
    "we", "can", "an", "which", "their")

  /** Fraction of tokens that are English stopwords (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val stops = array(EnglishStops.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(stops, t)))
        .cast("double") / size(toks))
  }

  /** Mean word length (characters per token). */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L),
        (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /**
   * Fused (stopword_ratio, mean_word_len) in ONE token pass — the
   * Column formulations run their higher-order `filter`/`aggregate`
   * lambdas interpreted (not codegen), costing ~3 token-array walks per
   * document; this is the same single-pass-UDF trade [[langId]] makes.
   * Arithmetic matches the Column versions exactly on ASCII text
   * (hits/n and Σlen/n in double); astral-plane codepoints count as 2
   * chars here (Java UTF-16) vs 1 in Spark's `length`.
   */
  def stopwordAndMeanLen(text: Column): Column = {
    val stops = EnglishStops.toSet
    val f = udf { s: String =>
      if (s == null) (0.0, 0.0)
      else {
        val t = s.replaceAll("^\\s+|\\s+$", "")
        if (t.isEmpty) (0.0, 0.0)
        else {
          val toks = t.split("\\s+")
          var hits = 0
          var chars = 0L
          var i = 0
          while (i < toks.length) {
            if (stops.contains(toks(i).toLowerCase(
              java.util.Locale.ROOT))) hits += 1
            chars += toks(i).length
            i += 1
          }
          (hits.toDouble / toks.length, chars.toDouble / toks.length)
        }
      }
    }
    f(text)
  }

  /**
   * Composite quality score in [0,1] — the length/punct/stopword-ratio
   * heuristic family used by large-scale corpus filters (C4/Gopher-style
   * rules): long-enough docs, sane word lengths, some stopwords, not
   * mostly punctuation.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0)) // saturates at 50 tokens
    val mwl = meanWordLen(text)
    val wordLenScore = when(mwl >= 3 && mwl <= 10, 1.0)
      .when(mwl > 0, 0.5).otherwise(0.0)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    round((lenScore * 0.3 + wordLenScore * 0.2 + stopScore * 0.3 +
      punctScore * 0.2), 6)
  }

  // --- language ID: stopword-profile n-gram heuristic ---

  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> EnglishStops,
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein",
      "eine", "mit", "für", "auf", "sie", "des", "dem", "den", "von", "zu",
      "im", "sich", "auch", "als", "es", "war", "aber"),
    "fr" -> Seq("le", "la", "les", "de", "des", "du", "et", "est", "une",
      "un", "que", "qui", "dans", "pour", "pas", "sur", "avec", "au", "il",
      "elle", "ne", "se", "ce", "plus", "par"),
    "es" -> Seq("el", "la", "los", "las", "de", "del", "y", "es", "una",
      "un", "que", "en", "no", "se", "por", "con", "para", "su", "al",
      "lo", "como", "más", "pero", "sus", "le"))

  /**
   * Per-language stopword-hit score; lang = argmax. Pure expressions —
   * builds one score column per profile and picks the max via a struct
   * array (no UDF, survives codegen).
   */
  def langScores(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = Profiles.map { case (l, stops) =>
      val s = array(stops.map(lit): _*)
      struct(
        when(size(toks) === 0, 0.0)
          .otherwise(size(filter(toks, t => array_contains(s, t)))
            .cast("double") / size(toks)).as("score"),
        lit(l).as("lang"))
    }
    array(scores: _*)
  }

  /** Detected language code, "und" when no profile scores > 0.
    *
    * Single-pass UDF over the token stream with per-language hash sets:
    * the Column-expression variant (`langScores` + array_max) runs the
    * higher-order `filter` lambda interpreted — not codegen'd — per
    * profile, ~4 passes per document. Semantics are identical, including
    * the tie-break (equal scores prefer fr > es > en > de, matching the
    * struct-max ordering and the driver oracle). */
  def langId(text: Column): Column = {
    val profileSets: Seq[(String, Set[String])] =
      Profiles.map { case (l, ws) => (l, ws.toSet) }
    val f = udf { s: String =>
      if (s == null) "und"
      else {
        val t = s.toLowerCase(java.util.Locale.ROOT).trim
        if (t.isEmpty) "und"
        else {
          val toks = t.split("\\s+")
          val hits = new Array[Int](profileSets.length)
          var i = 0
          while (i < toks.length) {
            var p = 0
            while (p < profileSets.length) {
              if (profileSets(p)._2.contains(toks(i))) hits(p) += 1
              p += 1
            }
            i += 1
          }
          var best = -1
          var bestScore = 0.0
          var p = 0
          while (p < profileSets.length) {
            val sc = hits(p).toDouble / toks.length
            // >= with ascending profile order ⇒ ties prefer the LAST
            // profile in (en, de, fr, es) sorted by lang code:
            // struct-max picks lexicographically-largest lang on ties
            if (sc > bestScore ||
                (sc == bestScore && best >= 0 && sc > 0 &&
                  profileSets(p)._1 > profileSets(best)._1)) {
              best = p; bestScore = sc
            }
            p += 1
          }
          if (best < 0 || bestScore == 0.0) "und"
          else profileSets(best)._1
        }
      }
    }
    f(text)
  }

  /**
   * Exact-dup fingerprint: 64-bit hash of whitespace-normalized,
   * lowercased text. Pure codegen (xxhash64).
   */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(nz(text)), "\\s+", " ")))

  /**
   * Winnowing fingerprint (rolling Rabin-Karp hash, window minima) —
   * near-dup document sketch: k-gram rolling hashes, keep the minimum in
   * each window of w, distinct. Two docs sharing any winnowed hash are
   * near-dup candidates. UDF (rolling state), but output is a small
   * array usable with explode + groupBy at scale.
   */
  def winnow(k: Int = 9, w: Int = 16): Column => Column = { text =>
    val f = udf { s: String =>
      if (s == null || s.length < k) Array.empty[Long]
      else {
        val n = s.length
        // B·M sized so every intermediate fits a signed 64-bit long:
        // h < M = 2³¹−1, h·B < 2³¹·2²⁰ = 2⁵¹ (the previous M = 2⁶¹−1
        // overflowed h·B, silently breaking the rolling identity — the
        // same k-gram at different positions hashed differently)
        val B = 1000003L; val M = 2147483647L
        var pow = 1L
        var i = 1
        while (i < k) { pow = pow * B % M; i += 1 }
        val hashes = new Array[Long](n - k + 1)
        var h = 0L
        i = 0
        while (i < n) {
          if (i >= k) {
            h = (h - s.charAt(i - k) * pow % M + M) % M
          }
          h = (h * B + s.charAt(i)) % M
          if (i >= k - 1) hashes(i - k + 1) = h
          i += 1
        }
        // tiled window minima, deduped (winnowing-style sketch)
        val out = scala.collection.mutable.LinkedHashSet[Long]()
        var lo = 0
        while (lo < hashes.length) {
          val hi = math.min(lo + w, hashes.length)
          var mn = Long.MaxValue
          var j = lo
          while (j < hi) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
          out += mn
          lo += w
        }
        out.toArray
      }
    }
    f(text)
  }

  // --- repetition metrics (Gopher-style repetition filters) ---

  /**
   * Per-document repetition metrics, the Gopher/MassiveText-family
   * filter signals for boilerplate and degenerate text:
   *   - `max_token_frac`: occurrences of the most frequent token / total
   *     tokens;
   *   - `top2gram_frac`: occurrences of the most frequent token 2-gram /
   *     total 2-grams;
   *   - `dup3gram_frac`: fraction of 3-grams that occur more than once
   *     (counting all occurrences of duplicated grams).
   *
   * The metric is strictly per-document, so the scale-right shape is a
   * single tight-loop pass with local hash counting — zero shuffle, one
   * corpus scan — rather than explode + groupBy(doc, gram), which would
   * shuffle O(total tokens) rows for a result that never crosses
   * documents. Tokenization matches [[tokens]] (trim + `\s+` split).
   */
  def repetitionStats(text: Column): Column = {
    val f = udf { s: String =>
      if (s == null) (0.0, 0.0, 0.0)
      else {
        val t = s.replaceAll("^\\s+|\\s+$", "")
        if (t.isEmpty) (0.0, 0.0, 0.0)
        else {
        val toks = t.split("\\s+")
        val n = toks.length
        def gramStats(k: Int): (Int, Int, Int) = {
          // (maxCount, dupOccurrences, totalGrams) for token k-grams
          val m = new java.util.HashMap[String, Int]()
          var i = 0
          val total = n - k + 1
          val sb = new java.lang.StringBuilder
          while (i < total) {
            sb.setLength(0)
            var j = 0
            while (j < k) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j)); j += 1
            }
            m.merge(sb.toString, 1, Integer.sum)
            i += 1
          }
          var mx = 0; var dup = 0
          val it = m.values().iterator()
          while (it.hasNext) {
            val c = it.next()
            if (c > mx) mx = c
            if (c > 1) dup += c
          }
          (mx, dup, total)
        }
        val (mx1, _, t1) = gramStats(1)
        val maxTok = mx1.toDouble / t1
        val top2 = if (n < 2) 0.0 else {
          val (mx2, _, t2) = gramStats(2); mx2.toDouble / t2
        }
        val dup3 = if (n < 3) 0.0 else {
          val (_, d3, t3) = gramStats(3); d3.toDouble / t3
        }
        (maxTok, top2, dup3)
        }
      }
    }
    f(text)
  }

  /**
   * Shannon entropy (bits) of the document's token distribution — low
   * entropy flags repetitive/boilerplate text, near-zero flags
   * degenerate single-token spam; a complement to [[repetitionStats]]
   * in the quality-filter family. Per-document local computation, same
   * zero-shuffle single-pass shape as the repetition metrics.
   */
  def tokenEntropy(text: Column): Column = {
    val f = udf { s: String =>
      if (s == null) 0.0
      else {
        val t = s.replaceAll("^\\s+|\\s+$", "")
        if (t.isEmpty) 0.0
        else {
        val toks = t.split("\\s+")
        val m = new java.util.HashMap[String, Int]()
        toks.foreach(t => m.merge(t, 1, Integer.sum))
        val n = toks.length.toDouble
        var h = 0.0
        val it = m.values().iterator()
        while (it.hasNext) {
          val p = it.next() / n
          h -= p * math.log(p)
        }
        h / math.log(2.0)
        }
      }
    }
    f(text)
  }

  // --- PII detection / redaction ---

  /** Email / NANP-phone / IPv4 patterns, chosen to behave identically
    * under Java regex (Spark codegen) and RE2 (DuckDB oracle): ASCII
    * classes, `\b`, bounded quantifiers only. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII hit counts — pure codegen `regexp_count`. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(nz(text), lit(EmailRe)),
      regexp_count(nz(text), lit(PhoneRe)),
      regexp_count(nz(text), lit(Ipv4Re)))

  /**
   * Redact PII in place (emails, then phones, then IPs — order matters
   * only in that redaction tags must not re-match later patterns; these
   * don't). Pure codegen `regexp_replace`, global by default in Spark.
   */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(nz(text), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /**
   * Corpus-level document frequency: top `k` tokens by the number of
   * distinct documents containing them. The genuinely relational text
   * op — per-doc distinct tokens explode into a groupBy(token) count,
   * map-side combinable, one shuffle of O(distinct tokens per doc) rows.
   * Deterministic output: ties broken by token ascending.
   */
  def docFrequency(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    df.select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count("*").as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token").asc)
      .limit(k)
  }

  /**
   * Per-source vocabulary coverage / OOV audit (X96) — how well a
   * FIXED vocabulary (a tokenizer's word list, a reference lexicon)
   * covers each source's text: exact token and out-of-vocabulary
   * counts, distinct-type counts, and the fixed-point OOV rate
   * (`n_oov·2²⁰ div n_tokens`). The tokenizer-fit check run before
   * committing a vocab to a 100 TB corpus — a source whose OOV rate
   * spikes (code in a prose vocab, another language, mojibake) gets
   * flagged per source, not averaged away corpus-wide. Matching is
   * case-insensitive on the [[tokens]] whitespace normalization (the
   * house token rule; pre-tokenize the vocab the same way).
   *
   * Scale shape: ONE token-explode scan; the vocabulary BROADCASTS
   * (vocabularies are bounded by definition — an id-sized "vocab"
   * fails loudly at broadcast, not silently reshuffles) into a left
   * join; one map-side-combinable per-source aggregate with
   * |sources| output rows. Empty docs contribute nothing (zero
   * tokens is the honest reading for a coverage rate), so a source
   * of only-empty docs is ABSENT from the output — 0/0 coverage has
   * no defensible value and absence is visible.
   *
   * @param vocab one string column of in-vocabulary tokens
   *              (lowercased on the way in; duplicates collapsed)
   * @return (src, n_tokens, n_oov, n_types, n_oov_types, oov_q)
   */
  def oovStats(df: DataFrame, sourceCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.length == 1,
      s"oovStats: vocab must have exactly one column, got " +
        s"${vocab.columns.mkString(", ")}")
    val v = vocab.select(lower(col(vocab.columns.head)).as("__tok"))
      .distinct()
      .withColumn("__in", lit(1L))
    df.select(col(sourceCol).cast("string").as("src"),
        explode(tokens(lower(col(textCol)))).as("__tok"))
      .join(broadcast(v), Seq("__tok"), "left")
      .groupBy("src")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(col("__tok")).as("n_types"),
        countDistinct(when(col("__in").isNull, col("__tok")))
          .as("n_oov_types"))
      .withColumn("oov_q",
        when(col("n_tokens") === 0L, lit(null).cast("long"))
          .otherwise(expr("n_oov * 1048576L div n_tokens")))
  }

  /**
   * CCNet-style unigram language-model quality scoring: per-document
   * mean token log-probability under a unigram LM estimated from the
   * corpus itself, with the vocabulary cut to the top `vocabSize`
   * tokens by count and everything else scored at an OOV floor
   * (`ln(oovFactor / totalTokens)`). Low mean log-prob = surprising /
   * junky text — the LM-perplexity corpus filter (CCNet's approach,
   * there with a pretrained KenLM; here the corpus IS the LM, which is
   * the bootstrap variant when no external model ships).
   *
   * Scale shape, in order: (1) ONE map-combinable token-count shuffle,
   * persisted just long enough to serve its two driver-bounded
   * reductions (grand total + top-K cut) and released before return —
   * without the persist the lazy vocab would re-shuffle the whole
   * corpus when the result materializes; (2) the vocabulary cut is a
   * bounded `TakeOrderedAndProject` (per-partition top-K, no full
   * sort), ties broken (count DESC, token ASC) so the cut is
   * deterministic, collected (≤vocabSize rows) and re-emitted as a
   * literal relation; (3) that tiny vocab BROADCASTS into the
   * per-token left join; (4) one final groupBy(doc), with empty docs
   * carried through by `explode_outer` as NULL-token rows — so a
   * 100 TB corpus pays exactly two keyed shuffles, a bounded
   * TakeOrdered, and a broadcast join, and no cache outlives the call.
   *
   * Numeric contract: the only transcendental (`ln`) is evaluated
   * vocabSize+1 times while BUILDING the tiny vocab table, each result
   * immediately rounded to a 1e-6 grid (`lp_micro`, an integer); every
   * per-document quantity is then an exact BIGINT sum of those
   * integers, immune to float summation order across partitionings —
   * the property that makes the `tx_lmscore` harness row
   * hash-comparable against DuckDB.
   *
   * @return (idCol, n_tokens, lp_sum_micro, mean_logprob) — mean is
   *         the derived display value lp_sum / 1e6 / n (0.0 for empty
   *         docs)
   */
  def unigramLogProbs(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 50000, oovFactor: Double = 0.5): DataFrame =
    scoreUnigramLM(df, idCol, textCol,
      fitUnigramLM(df, textCol, vocabSize, oovFactor))

  /** A fitted unigram LM: (token → log-prob micro-units) for the top-K
    * vocabulary plus the OOV floor. Driver-sized (≤ vocabSize entries),
    * serializable — fit once on a reference corpus, score many. */
  final case class UnigramLM(vocab: Seq[(String, Long)], oovMicro: Long,
      totalTokens: Long) extends Serializable

  /** Estimate a [[UnigramLM]] from `df` (the CROSS-CORPUS half of
    * [[unigramLogProbs]]: CCNet scores the crawl under an LM fitted on
    * a clean reference corpus — fit here on the clean side, then
    * [[scoreUnigramLM]] any target). Scale shape and determinism as
    * documented on [[unigramLogProbs]] steps (1)-(2). */
  def fitUnigramLM(df: DataFrame, textCol: String,
      vocabSize: Int = 50000, oovFactor: Double = 0.5): UnigramLM = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    // ln(oovFactor/total) must be finite — 0 would yield -Infinity and
    // an opaque BigDecimal failure instead of a usable error
    require(oovFactor > 0 && !oovFactor.isInfinite,
      s"oovFactor must be a positive finite pseudo-count: $oovFactor")
    val tok = df.select(explode(tokens(lower(col(textCol)))).as("tok"))
    // the token-count shuffle feeds TWO driver-bounded reductions (the
    // grand total and the top-K cut) — persist it for their lifetime so
    // the corpus is shuffled once, then release BEFORE returning: the
    // fitted LM is a driver value, so no cache outlives the call
    val counts = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, topK) = try {
      val t = counts.agg(sum("cnt")).first() match {
        case r if r.isNullAt(0) => 1L // empty corpus
        case r => r.getLong(0) max 1L
      }
      val k = counts.orderBy(col("cnt").desc, col("tok").asc)
        .limit(vocabSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      (t, k)
    } finally counts.unpersist(blocking = false)
    UnigramLM(
      topK.map { case (t, c) =>
        (t, micro(math.log(c.toDouble / total.toDouble)))
      }.toSeq,
      micro(math.log(oovFactor / total.toDouble)), total)
  }

  /** The one LM log-prob quantizer (1e-6 grid): HALF_UP (away from
    * zero), matching Spark's round() and DuckDB's round() on these
    * negative values — math.round would round exact halves toward
    * +inf instead. Both LM fits and their oracles share this
    * contract; do not fork it. */
  private def micro(x: Double): Long = BigDecimal(x * 1e6)
    .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Persist a fitted [[UnigramLM]] as parquet (`path/vocab` +
    * `path/meta`), the same engine-readable convention as the model
    * sink — fit once on the clean reference corpus, reuse across
    * pipeline jobs. */
  def saveUnigramLM(spark: SparkSession, lm: UnigramLM,
      path: String): Unit = {
    import spark.implicits._
    lm.vocab.toDF("tok", "lp_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    Seq((lm.oovMicro, lm.totalTokens)).toDF("oov_micro", "total_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[UnigramLM]] written by [[saveUnigramLM]]. */
  def loadUnigramLM(spark: SparkSession, path: String): UnigramLM = {
    val meta = spark.read.parquet(s"$path/meta").head()
    UnigramLM(
      spark.read.parquet(s"$path/vocab")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      meta.getLong(0), meta.getLong(1))
  }

  /** Score `df` under a fitted [[UnigramLM]] — steps (3)-(4) of the
    * [[unigramLogProbs]] scale shape: literal-vocab broadcast join +
    * one doc group-by. */
  def scoreUnigramLM(df: DataFrame, idCol: String, textCol: String,
      lm: UnigramLM): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // explode_outer keeps empty documents as a single NULL-token row,
    // so they flow through the final group-by with zeros instead of
    // needing a doc-sized restore join
    val tok = df.select(col(idCol),
      explode_outer(tokens(lower(col(textCol)))).as("tok"))
    val vocab = lm.vocab.toDF("tok", "lp_micro")
    tok
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(col("tok")).as("n_tokens"),
        coalesce(sum(when(col("tok").isNotNull,
            coalesce(col("lp_micro"), lit(lm.oovMicro)))), lit(0L))
          .as("lp_sum_micro"))
      .withColumn("mean_logprob",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(round(col("lp_sum_micro").cast("double") / 1e6 /
            col("n_tokens"), 6)))
  }

  /**
   * A fitted bigram LM with stupid backoff (Brants et al. 2007 — the
   * web-scale smoothing: no discount mass bookkeeping, just
   * `p(b|a) = c(ab)/c(a)` when the bigram is known, else
   * `α·p_unigram(b)`). Driver-sized: top-K vocabulary + top-M bigram
   * table, every log-prob pre-quantized to 1e-6 micro-units — the
   * [[unigramLogProbs]] numeric contract (transcendentals only at fit,
   * scoring is exact BIGINT sums).
   */
  final case class BigramLM(vocab: Seq[(String, Long)],
      bigrams: Seq[(String, Long)], oovMicro: Long, backoffMicro: Long,
      totalTokens: Long) extends Serializable {
    /** Separator of the packed bigram key (sorts below every token
      * character, so key order == (a, b) order on both engines). */
    def sep: String = "\u0001"
  }

  /**
   * Estimate a [[BigramLM]] from `df`. Scale shape: the token-array
   * projection persists once and feeds (1) the map-combinable unigram
   * count shuffle with its bounded top-K cut, and (2) the pair rows —
   * PRE-FILTERED by two broadcast vocab joins so only vocab²-bounded
   * pairs reach the pair-count shuffle — with a bounded top-M cut
   * (count DESC, packed key ASC, a deterministic TakeOrdered). Both
   * tables collect driver-side (≤ vocabSize + maxBigrams rows); `ln`
   * runs once per table row and is immediately micro-quantized.
   */
  def fitBigramLM(df: DataFrame, textCol: String,
      vocabSize: Int = 50000, maxBigrams: Int = 200000,
      oovFactor: Double = 0.5, backoff: Double = 0.4): BigramLM = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(maxBigrams > 0, s"maxBigrams must be positive: $maxBigrams")
    require(oovFactor > 0 && !oovFactor.isInfinite,
      s"oovFactor must be a positive finite pseudo-count: $oovFactor")
    require(backoff > 0 && backoff <= 1,
      s"backoff must be in (0, 1]: $backoff")
    val spark = df.sparkSession
    import spark.implicits._
    val toksDf = df.select(tokens(lower(col(textCol))).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = toksDf.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (total, topK) = try {
        val t = counts.agg(sum("cnt")).first() match {
          case r if r.isNullAt(0) => 1L
          case r => r.getLong(0) max 1L
        }
        val k = counts.orderBy(col("cnt").desc, col("tok").asc)
          .limit(vocabSize)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (t, k)
      } finally counts.unpersist(blocking = false)
      val vocabCnt = topK.toMap
      val sep = "\u0001"
      val va = topK.map(_._1).toSeq.toDF("a")
      val vb = topK.map(_._1).toSeq.toDF("b")
      val pairCounts = toksDf
        .select(explode(when(size(col("toks")) > 1,
          transform(sequence(lit(2), size(col("toks"))),
            i => struct(element_at(col("toks"), i - 1).as("a"),
              element_at(col("toks"), i).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .join(broadcast(va), Seq("a"))
        .join(broadcast(vb), Seq("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
        .withColumn("pair", concat(col("a"), lit(sep), col("b")))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(maxBigrams)
        .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          r.getAs[Long]("cnt")))
      BigramLM(
        topK.map { case (t, c) =>
          (t, micro(math.log(c.toDouble / total.toDouble)))
        }.toSeq,
        pairCounts.map { case (a, b, c) =>
          (a + sep + b, micro(math.log(c.toDouble / vocabCnt(a))))
        }.toSeq,
        micro(math.log(oovFactor / total.toDouble)),
        micro(math.log(backoff)), total)
    } finally toksDf.unpersist(blocking = false)
  }

  /** Persist a fitted [[BigramLM]] (`path/vocab` + `path/bigrams` +
    * `path/meta`), the [[saveUnigramLM]] convention — fit once on the
    * reference corpus, score any number of pipeline jobs. Log-probs
    * are already integers, so the round-trip is exact. */
  def saveBigramLM(spark: SparkSession, lm: BigramLM,
      path: String): Unit = {
    import spark.implicits._
    lm.vocab.toDF("tok", "lp_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    lm.bigrams.toDF("pair", "lp_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bigrams")
    Seq((lm.oovMicro, lm.backoffMicro, lm.totalTokens))
      .toDF("oov_micro", "backoff_micro", "total_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[BigramLM]] written by [[saveBigramLM]]. */
  def loadBigramLM(spark: SparkSession, path: String): BigramLM = {
    val meta = spark.read.parquet(s"$path/meta").head()
    BigramLM(
      spark.read.parquet(s"$path/vocab")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      spark.read.parquet(s"$path/bigrams")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      meta.getLong(0), meta.getLong(1), meta.getLong(2))
  }

  /**
   * Score `df` under a fitted [[BigramLM]]: the first token scores as
   * a unigram, every later token as its known bigram or as
   * backoff + unigram (OOV tokens hit the OOV floor either way). Two
   * broadcast joins (vocab + bigram table) on one exploded projection,
   * one doc group-by — the [[scoreUnigramLM]] shape with context
   * sensitivity; per-doc sums are exact BIGINTs.
   *
   * @return (idCol, n_tokens, blp_sum_micro, mean_logprob)
   */
  def scoreBigramLM(df: DataFrame, idCol: String, textCol: String,
      lm: BigramLM): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol), tokens(lower(col(textCol)))
      .as("toks"))
    val withIdx = base.select(col(idCol), col("toks"),
      explode_outer(when(size(col("toks")) > 0,
        sequence(lit(1), size(col("toks"))))).as("i"))
    val cur = element_at(col("toks"), col("i"))
    val prev = when(col("i") > 1,
      element_at(col("toks"), col("i") - 1))
    val rows = withIdx.select(col(idCol), cur.as("cur"),
      when(prev.isNotNull, concat(prev, lit(lm.sep), cur)).as("pk"))
    val vdf = lm.vocab.toDF("cur", "cur_lp")
    val bdf = lm.bigrams.toDF("pk", "bi_lp")
    val uniTerm = coalesce(col("cur_lp"), lit(lm.oovMicro))
    val term = when(col("cur").isNull, 0L)
      .when(col("pk").isNull, uniTerm)
      .when(col("bi_lp").isNotNull, col("bi_lp"))
      .otherwise(lit(lm.backoffMicro) + uniTerm)
    rows
      .join(broadcast(vdf), Seq("cur"), "left")
      .join(broadcast(bdf), Seq("pk"), "left")
      .groupBy(col(idCol))
      .agg(count(col("cur")).as("n_tokens"),
        coalesce(sum(term), lit(0L)).as("blp_sum_micro"))
      .withColumn("mean_logprob",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(round(col("blp_sum_micro").cast("double") / 1e6 /
            col("n_tokens"), 6)))
  }

  /**
   * Sequence chunking: split each document into fixed-size token
   * windows with stride overlap — the context-window packing step of an
   * LLM data pipeline. Chunk i covers tokens [i·stride, i·stride+size).
   *
   * Pure narrow transformation: tokens → `posexplode` over window
   * starts → `slice` per chunk. No shuffle; output rows ≈ n/stride per
   * doc, so a 100 TB corpus chunks in one scan with no repartitioning.
   *
   * @return (idCol, chunk_idx, n_tokens, chunk_text) rows; empty docs
   *         produce no chunks
   */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got size=$chunkSize stride=$stride")
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(size(col("toks")) - col("start"), lit(chunkSize))
          .cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /**
   * A trained byte-pair-encoding tokenizer: the ranked merge table
   * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
   * with Subword Units"). Driver-sized (numMerges entries),
   * serializable — train once, encode many.
   */
  final case class BpeModel(merges: Seq[(String, String)])
      extends Serializable {
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy BPE encode of one word: start from characters plus the
      * `</w>` end mark, repeatedly apply the LOWEST-ranked adjacent
      * merge (all its occurrences, left to right) until none applies —
      * the standard encode loop matching how the merges were learned. */
    def encode(word: String): Array[String] = {
      var syms: Array[String] =
        word.map(_.toString).toArray :+ BpeEndMark
      var continue = syms.length > 1 && ranks.nonEmpty
      while (continue) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) continue = false
        else {
          val (a, b) = merges(bestRank)
          val out = new scala.collection.mutable.ArrayBuffer[String](
            syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.toArray
          if (syms.length < 2) continue = false
        }
      }
      syms
    }
  }

  /** End-of-word marker (Sennrich's `</w>`): distinguishes "est" the
    * suffix from "est" mid-word, and lets decode rejoin words. */
  val BpeEndMark = "</w>"

  /** Inverse of per-word [[BpeModel.encode]] over a token stream:
    * concatenate subwords and split words on the end mark. Lossless up
    * to the encoder's normalization (trim/lower/whitespace collapse):
    * `decodeBpe(words.flatMap(encode))` == `words.mkString(" ")`. */
  def decodeBpe(tokens: Seq[String]): String = {
    val joined = tokens.mkString("")
    // a trailing end mark yields a trailing empty split — drop it
    joined.split(java.util.regex.Pattern.quote(BpeEndMark), -1)
      .iterator.filter(_.nonEmpty).mkString(" ")
  }

  /**
   * Train a BPE merge table on a corpus — tokenizer training as a
   * pipeline operator.
   *
   * Scale shape (the part that must survive 100 TB): the corpus is
   * scanned ONCE — one token explode into one map-side-combined
   * `groupBy(word).count()` shuffle — and cut to the top `maxWords`
   * word types by (count DESC, word ASC) through a bounded
   * orderBy+limit. Merge learning then runs on the DRIVER over that
   * word-FREQUENCY table (≤ maxWords rows), which is exactly how
   * production BPE trainers work (Sennrich 2016 operates on the word
   * frequency dict, not the corpus): `numMerges` iterations of
   * pair-count + merge over ≤ maxWords short symbol arrays, no
   * re-scan per merge. Zipf means the top-64k word types cover the
   * overwhelming mass of any natural corpus, so the frequency cut
   * changes merges only in the noise tail.
   *
   * Determinism: counts are exact longs; the best pair ties break
   * lexicographically on the pair, so the merge table replays
   * bit-for-bit across runs/partitionings. Learning stops early when
   * the best pair occurs < 2 times (merging singletons memorizes
   * hapaxes). Tokenization matches [[tokens]] + lower-case (the
   * unigram-LM convention).
   */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int = 1000,
      maxWords: Int = 65536): BpeModel = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(maxWords > 0, s"maxWords must be positive: $maxWords")
    val counts = df
      .select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ BpeEndMark, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pc(p) = pc.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        // max count, ties broken lexicographically on the pair — an
        // arbitrary-but-fixed rule so the table is partition-invariant
        val best = pc.foldLeft(("", "") -> -1L) {
          case (acc @ (bp, bc), (p, c)) =>
            if (c > bc || (c == bc && (p._1 < bp._1 ||
              (p._1 == bp._1 && p._2 < bp._2)))) p -> c
            else acc
        }
        if (best._2 < 2) done = true
        else {
          val (a, b) = best._1
          merges += best._1
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](
                syms.length)
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a &&
                  syms(j + 1) == b) { out += a + b; j += 2 }
                else { out += syms(j); j += 1 }
              }
              (out.toArray, c)
            }
          }
        }
      }
      m += 1
    }
    BpeModel(merges.toSeq)
  }

  /**
   * Encode a corpus under a trained [[BpeModel]] and append
   * `bpe_tokens` (BIGINT subword count per document) — the real-vocab
   * replacement for the [[subwordCount]] regex estimate, and the
   * pre-training cost signal sequence packing / mixture weighting
   * consume.
   *
   * Scale shape: the merge table broadcasts inside the UDF closure;
   * encoding is per-row local (zero shuffle, one scan) with a per-task
   * word→length memo (Zipf again: a few thousand distinct words cover
   * most tokens, so amortized cost per word is a hash probe).
   */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    // the memo lives in the udf CLOSURE (serialized empty, fresh per
    // task after deserialization, single-threaded within a task)
    val cache = scala.collection.mutable.HashMap[String, Int]()
    val enc = udf { s: String =>
      if (s == null) 0L
      else {
        val t = s.replaceAll("^\\s+|\\s+$", "")
        if (t.isEmpty) 0L
        else {
          var n = 0L
          for (w <- t.split("\\s+")) {
            val lw = w.toLowerCase(java.util.Locale.ROOT)
            // cap stops INSERTS only — cached head words still hit
            n += cache.get(lw).getOrElse {
              val len = model.encode(lw).length
              if (cache.size < 100000) cache.update(lw, len)
              len
            }
          }
          n
        }
      }
    }
    df.withColumn("bpe_tokens", enc(col(textCol)))
  }

  /**
   * Encode a corpus to its BPE subword sequences — like
   * [[bpeTokenCounts]] but appending the `bpe_seq` array<string>
   * column itself (the input sequence packing / n-gram analysis over
   * SUBWORDS consumes). Same scale shape: broadcast merges, per-task
   * memo, zero shuffle; prefer [[bpeTokenCounts]] when only the count
   * matters (the array column is corpus-sized).
   */
  def bpeTokens(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame =
    df.withColumn("bpe_seq", seqEncoderUdf(model.encode)(col(textCol)))

  /** Shared tokenizer-encoder UDF scaffold (BPE and unigram families,
    * review r20): null/trim/\s+-split/lower normalization identical
    * to [[tokens]]+`lower()` — Locale.ROOT, because the oracle SQL's
    * `lower(text)` is locale-free and a Turkish-locale JVM's bare
    * toLowerCase would map 'I' to dotless 'ı' and hash-diverge — with
    * the capped per-task word memo (cap stops INSERTS only; cached
    * head words still hit — review r13). The memo lives in the udf
    * closure: serialized empty, fresh per task, single-threaded. */
  private[graft] def seqEncoderUdf(encode: String => Array[String])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cache = scala.collection.mutable.HashMap[String, Array[String]]()
    udf { s: String =>
      if (s == null) Array.empty[String]
      else {
        val t = s.replaceAll("^\\s+|\\s+$", "")
        if (t.isEmpty) Array.empty[String]
        else t.split("\\s+").flatMap { w =>
          val lw = w.toLowerCase(java.util.Locale.ROOT)
          cache.get(lw).getOrElse {
            val e = encode(lw)
            if (cache.size < 100000) cache.update(lw, e)
            e
          }
        }
      }
    }
  }

  /**
   * Corpus-wide exact LINE dedup — the RefinedWeb/CCNet boilerplate
   * remover: every occurrence of any line appearing at least
   * `minRepeats` times ACROSS THE CORPUS (nav bars, cookie banners,
   * footers) is removed from every document; remaining lines rejoin in
   * their original order. Complements [[graft.ops.Dedup.duplicateSpans]]
   * (positional k-gram substring spans) at the line granularity, where
   * web boilerplate actually repeats.
   *
   * Lines shorter than `minLineLen` characters are EXEMPT (kept):
   * empty/near-empty lines are legitimately frequent and removing them
   * would reflow every document.
   *
   * Scale shape: ONE posexplode scan → ONE shuffle by line + a
   * per-line window count (all occurrences of a line land in the same
   * partition, so the corpus-wide count is partition-local there) →
   * one per-doc rebuild group-by. Before r21 this was a groupBy-count
   * plus a sort-merge anti join against the count table — the window
   * shape removes that second full-line exchange AND evaluates the
   * upstream text expressions once instead of once per join branch
   * (the count side is derived from the same shuffled rows, not a
   * re-scan). No collect, no all-pairs, no broadcast assumption (at
   * web scale the boilerplate set can be millions of lines). Skew: a
   * hyper-frequent line funnels to one partition either way, but the
   * whole-partition window FRAME buffers that key's occurrences in
   * WindowExec's row array before emitting, where the old sort-merge
   * anti-join streamed its probe side — the buffer is
   * ExternalAppendOnlyUnsafeRowArray, so a boilerplate explosion
   * spills to disk rather than OOMs (advice r21; probed in
   * `SkewCheck lines`), at spill-speed cost on that one partition.
   *
   * Returns (idCol, text) for EVERY input document — a fully-
   * boilerplate document comes back as the empty string, preserving
   * corpus cardinality for downstream joins.
   */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minRepeats: Int = 2, minLineLen: Int = 1): DataFrame = {
    require(minRepeats >= 2, s"minRepeats must be >= 2: $minRepeats")
    require(minLineLen >= 0, s"minLineLen must be >= 0: $minLineLen")
    val lines = df.select(col(idCol),
      posexplode(split(nz(col(textCol)), "\n")).as(Seq("idx", "line")))
    // corpus-wide occurrence count per exact line string: filtering on
    // length commutes with the count (all occurrences of a line share
    // its length), so counting every occurrence and gating the REMOVAL
    // on length is equivalent to the old filter-then-count-then-anti
    // shape while needing no second pass over the lines
    val w = org.apache.spark.sql.expressions.Window.partitionBy("line")
    val kept = lines
      .withColumn("__cnt", count(lit(1)).over(w))
      .filter(length(col("line")) < minLineLen ||
        col("__cnt") < minRepeats)
      .drop("__cnt")
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("line")))),
        x => x("line")), "\n").as("__graft_clean"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__graft_clean"), lit("")).as(textCol))
  }

  /**
   * URL canonicalization — the web-corpus URL-dedup key (two crawls of
   * `HTTPS://WWW.Site.com:443/a/?utm_source=x` and
   * `https://site.com/a` must collide). Pure codegen regex chain (no
   * UDF), patterns chosen — like [[piiCounts]] — to mean the same
   * thing in Java regex and RE2 so the DuckDB oracle can replay them:
   * fragment strip → scheme+host lowercase → `www.` strip → default
   * :80/:443 port strip → tracking-param removal
   * (`utm_*`/`fbclid`/`gclid`/`ref`) → separator cleanup → trailing
   * slash strip. Non-URL strings (no `scheme://` prefix) pass through
   * with only the fragment strip.
   */
  def canonicalUrl(url: Column): Column = {
    val t0 = regexp_replace(trim(nz(url)), "#.*$", "")
    val prefix =
      regexp_extract(t0, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest =
      regexp_replace(t0, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val t1 = when(prefix === "", t0)
      .otherwise(concat(lower(prefix), rest))
    val t2 = regexp_replace(t1, "://www\\.", "://")
    val t3 = regexp_replace(t2, ":(80|443)(/|\\?|$)", "$2")
    val t4 = regexp_replace(t3,
      "([?&])(utm_[^&=]*|fbclid|gclid|ref)=[^&]*", "$1")
    val t5 = regexp_replace(regexp_replace(regexp_replace(t4,
      "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    regexp_replace(regexp_replace(t5, "/+\\?", "?"), "/+$", "")
  }

  /** Lower-cased host of a URL ('' for non-URLs); userinfo skipped. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(trim(nz(url)),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Registrable-domain HEURISTIC from a host: last two labels, or
    * three when the second level is a common cc-SLD (co.uk-style).
    * A true answer needs the Public Suffix List (not available
    * offline); this covers the bulk and is deterministic — the
    * per-domain grouping lever [[graft.ops.CorpusPipeline.sourceCap]]
    * consumes. */
  def registeredDomain(host: Column): Column = {
    val cc = regexp_extract(host,
      "([^.]+\\.(?:co|com|net|org|gov|ac|edu)\\.[a-z][a-z])$", 1)
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(cc =!= "", cc).when(twoLabel =!= "", twoLabel).otherwise(host)
  }

  /** Non-empty path-segment count of a URL (0 for bare hosts). */
  def urlPathDepth(url: Column): Column =
    regexp_count(regexp_extract(trim(nz(url)),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1),
      lit("/[^/]")).cast("long")

  /** Persist a [[BpeModel]] as parquet (rank-ordered merge rows) —
    * the same engine-readable sink convention as [[saveUnigramLM]]. */
  def saveBpe(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[BpeModel]] written by [[saveBpe]]. */
  def loadBpe(spark: SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Convenience: append the standard text-analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val rep = repetitionStats(t)
    df.withColumn("token_count", tokenCount(t))
      .withColumn("subword_count", subwordCount(t))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("entropy", round(tokenEntropy(t), 6))
      .withColumn("__graft_rep", rep)
      .withColumn("max_token_frac", round(col("__graft_rep._1"), 6))
      .withColumn("top2gram_frac", round(col("__graft_rep._2"), 6))
      .withColumn("dup3gram_frac", round(col("__graft_rep._3"), 6))
      .drop("__graft_rep")
  }

  /**
   * Distinctive-term extraction (X82) — TF-IDF-style top-k terms per
   * document with a RATIONAL idf: score_q = tf·2²⁰ div df, the exact
   * fixed-point form of tf/df. The "what is this document about"
   * primitive behind corpus browsing, cluster labeling, and keyword
   * features. The rational weighting is chosen over log-idf
   * deliberately: it keeps every number in the pipeline an exact
   * BIGINT (the repo-wide determinism discipline — `ln` is libm-
   * dependent, not IEEE-specified; where a log is semantically
   * required the [[unigramQuality]] path shows the bounded-vocab
   * literal recipe), and within a document it orders terms by the
   * same "frequent here, rare everywhere" signal; quantization ties
   * break by token ascending, identically in SQL.
   *
   * Scale shape: one map-side-combinable (doc, token) aggregate, one
   * token aggregate for document frequencies, one token-keyed join of
   * the tf table against the df table (the vocabulary is NOT
   * broadcastable at corpus scale — trillions of rare tokens — so
   * this is an honest sort-merge the map-side combines have already
   * shrunk), and a per-document window whose partitions are bounded
   * by document length. No global sort, no driver state.
   *
   * @return (id, token, tf, df, score_q, rank) for rank ≤ k per doc,
   *         ranked by (score_q desc, token asc)
   */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"distinctiveTerms: k must be positive, got $k")
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id")
      .orderBy(col("score_q").desc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("score_q", expr("tf * 1048576L div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("id", "token", "tf", "df", "score_q", "rank")
  }

  /**
   * Corpus vocabulary divergence (X89) — Jensen-Shannon divergence
   * between two corpora's unigram distributions, the "how different
   * is source A's language from source B" number a mixture designer
   * reads next to [[graft.ops.Similarity.groupCentroidSims]]'s
   * embedding view (this one is exact, interpretable, and needs no
   * embedding model). Smoothed over the UNION vocabulary with the
   * add-half rule (the [[graft.ops.Profiler]] PSI convention), so a
   * token unseen on one side contributes finitely.
   *
   * Determinism: counts are exact BIGINTs; each per-token JS term is
   * an identical two-operand double sequence on both engines, rounded
   * to a 1e-9 grid INTO a BIGINT — the cross-token sum is then
   * order-free integer addition, immune to float summation order
   * (the tx_lmscore discipline applied to a corpus-sized sum). The
   * headline `js` is that integer divided back once.
   *
   * Scale shape: one map-side-combinable token-count aggregate per
   * corpus, a token-keyed full-outer join of the two COUNT tables
   * (vocabulary-sized, ≪ corpora — the tf⋈df class), totals via one
   * broadcast 1-row cross join, and a single global sum. The corpora
   * are each read once.
   *
   * @return one row: (n_a, n_b, vocab, js_q, js) — `js_q` the exact
   *         integer sum of 1e-9-grid terms, `js` = js_q/1e9 (in
   *         [0, ln 2]), 0 for identical distributions
   */
  def vocabDivergence(a: DataFrame, b: DataFrame,
      textCol: String): DataFrame = {
    def cnts(df: DataFrame, out: String) =
      df.select(explode(tokens(col(textCol))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(out))
    val joined = cnts(a, "ca").join(cnts(b, "cb"), Seq("token"),
        "full_outer")
      .select(col("token"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = joined.agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
      count(lit(1)).as("vocab"))
    val pa = (col("ca") + lit(0.5)) /
      (col("n_a").cast("double") + col("vocab").cast("double") * 0.5)
    val pb = (col("cb") + lit(0.5)) /
      (col("n_b").cast("double") + col("vocab").cast("double") * 0.5)
    val m = (pa + pb) / lit(2.0)
    val termQ = round((pa * log(pa / m) + pb * log(pb / m))
      * lit(0.5) * lit(1e9)).cast("long")
    joined.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("vocab"), termQ.as("tq"))
      .groupBy("n_a", "n_b", "vocab")
      .agg(sum("tq").as("js_q"))
      .select(col("n_a"), col("n_b"), col("vocab"), col("js_q"),
        round(col("js_q").cast("double") / lit(1e9), 6).as("js"))
  }
}
