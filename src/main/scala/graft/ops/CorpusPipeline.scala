package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus cleaning — the standard LLM-training-data prep
 * recipe composed from this package's primitives:
 *
 *   1. exact dedup (normalized-text fingerprint, keep smallest id)
 *   2. quality gate (token count / punctuation ratio / mean word
 *      length — the C4/Gopher-style rule family)
 *   3. near-dup removal (exact word-n-gram Jaccard over the survivors;
 *      every doc that is the larger side of a qualifying pair drops)
 *
 * Scale shape: stage 1 is one hash-partitioned window, stage 2 is a
 * pure codegen scan, stage 3 is the prefix-filtered inverted index of
 * `Dedup.ngramJaccard` — no cross joins anywhere, so the pipeline keeps
 * the same 100 TB posture as its parts.
 */
object CorpusPipeline {

  /**
   * @return surviving rows of `df` with appended quality columns
   *         (`token_count`, `punct_ratio`, `mean_word_len`)
   */
  /**
   * @param cacheSurvivors persist the quality-gated survivors
   *        (MEMORY_AND_DISK) so the expensive stage-1/2 computation
   *        (dedup window + per-document text UDFs) runs ONCE, serving
   *        both the near-dup gram build and the final anti-join —
   *        instead of twice. The cache backs the returned lazy plan, so
   *        it cannot be released here; it is LRU-evicted under
   *        pressure, and repeated pipeline runs can
   *        `spark.catalog.clearCache()` between batches. At extreme
   *        scale, when caching a corpus-sized intermediate is worse
   *        than recomputing it, pass `false` to trade the cache for a
   *        second window-shuffle + UDF pass.
   */
  def clean(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, maxPunct: Double = 0.1,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
      ngramN: Int = 3, jaccardThreshold: Double = 0.8,
      cacheSurvivors: Boolean = true): DataFrame = {
    val keepers = Dedup.exactKeepers(df, idCol, textCol)
    val qualityPlan = keepers
      .withColumn("token_count",
        TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("punct_ratio",
        round(TextOps.punctRatio(col(textCol)), 6))
      // fused single-pass UDF: the Column meanWordLen runs its
      // aggregate lambda interpreted per document (see tx_stats)
      .withColumn("mean_word_len",
        round(TextOps.stopwordAndMeanLen(col(textCol))("_2"), 6))
      .filter(col("token_count") >= minTokens &&
        col("punct_ratio") <= maxPunct &&
        col("mean_word_len").between(minMeanLen, maxMeanLen))
    val quality =
      if (cacheSurvivors)
        qualityPlan.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else qualityPlan
    // ngramJaccard is eager (it checkpoints its verified pairs and
    // releases its internal caches before returning), so with
    // cacheSurvivors the survivor cache is materialized HERE and the
    // anti-join below reads it instead of recomputing stages 1-2
    val dups = Dedup.ngramJaccard(quality, idCol, textCol, ngramN,
      jaccardThreshold).select(col("dup_id"))
    quality.join(dups, quality(idCol) === dups("dup_id"), "left_anti")
  }

  /**
   * Eval-set decontamination: flag training documents sharing any
   * token `n`-gram with an evaluation/benchmark document — the
   * standard "did the benchmark leak into the training corpus" sweep
   * run before LLM training.
   *
   * Scale shape: the eval set is tiny next to the corpus, so its gram
   * set BROADCASTS; the corpus side is one narrow scan + explode into
   * a broadcast-hash join — the only shuffle is the final per-doc
   * aggregate of matched rows (≈ contaminated grams only, a sliver of
   * the corpus). Grams join as `xxhash64(gram)` on BOTH sides: 8-byte
   * keys keep the broadcast build side small and the probe a long
   * compare instead of a multi-word string equality. A false flag
   * needs an eval-gram/corpus-gram 64-bit collision — vanishingly
   * rare even at 100 TB, and this is a flagging sweep, so the hashed
   * join is the default rather than an opt-in.
   *
   * @return one row per contaminated training doc: (train_id,
   *         n_shared distinct shared grams, eval_id = smallest matching
   *         eval doc)
   */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram length must be >= 1, got $n")
    def grams(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).cast("long").as(outId),
          TextOps.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= n)
        .select(col(outId), explode(array_distinct(
          transform(sequence(lit(0), size(col("toks")) - n),
            i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1,
              lit(n)))))))
          .as("gram"))
    grams(corpus, "train_id")
      .join(broadcast(grams(evalSet, "eval_id")), "gram")
      .groupBy("train_id")
      .agg(countDistinct("gram").as("n_shared"),
        min("eval_id").as("eval_id"))
  }

  /**
   * Semantic decontamination (X88) — the embedding face of
   * [[decontaminate]]: flag training documents whose embedding is
   * NEAR an evaluation document's, catching the contamination n-gram
   * overlap cannot see (paraphrases, translations, light rewrites —
   * the leakage mode that actually survives dedup pipelines). Every
   * corpus row reports its maximum cosine against the eval set and
   * the nearest eval id, so the threshold is an audit-time knob, not
   * a rerun.
   *
   * Exactness: the [[graft.ops.Similarity.cosineNative]] codegen
   * expression (exact two-operand double sequence, the sim_topk
   * convention — DuckDB's list_cosine_similarity replays it at 6
   * decimals); equal-cosine ties resolve to the smallest eval id via
   * a struct argmax, partition-invariantly. The flag compares the
   * UNROUNDED maximum.
   *
   * Scale shape: the eval set is tiny (the decontaminate premise) and
   * BROADCASTS; the corpus pays ONE scan through a broadcast
   * nested-loop of |eval| codegen cosines per row, and the per-doc
   * argmax is a map-side-combinable aggregate — no corpus shuffle
   * beyond it. O(|corpus|·|eval|) compute is the exact sweep's honest
   * cost; for huge eval sets, prescreen with the ANN paths and verify
   * the shortlist exactly.
   *
   * @return (id, max_cos, eval_id, flagged) — one row per corpus doc
   */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    require(!threshold.isNaN && threshold >= -1 && threshold <= 1,
      s"semanticDecontaminate: threshold must be in [-1, 1], got " +
        s"$threshold")
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val e = evalSet.select(col(idCol).cast("long").as("__eid"),
      col(vecCol).cast("array<double>").as("__ev"))
    c.crossJoin(broadcast(e))
      .withColumn("__cos",
        Similarity.cosineNative(spark, col("__cv"), col("__ev")))
      .groupBy("id")
      .agg(max(struct(col("__cos").as("c"), (-col("__eid")).as("n")))
        .as("__m"))
      .select(col("id"),
        round(col("__m.c"), 6).as("max_cos"),
        (-col("__m.n")).cast("long").as("eval_id"),
        (col("__m.c") >= threshold).as("flagged"))
  }

  /**
   * N-gram novelty scoring (X84) — the graded complement of
   * [[decontaminate]]'s binary flag: for every corpus document, what
   * FRACTION of its distinct token n-grams is unseen in a reference
   * corpus. The "how much new text does this source actually add"
   * score a mixture designer reads next to dedup rates: novelty ≈ 0
   * means the source re-serves the reference; the decontaminate sweep
   * answers "is this document tainted", this answers "is this source
   * worth its rate".
   *
   * Exactness: novelty_q = (n_grams − n_seen)·2²⁰ div n_grams — exact
   * BIGINTs end to end; documents shorter than n tokens have no
   * grams and report a NULL novelty (nothing to judge), never a fake
   * 0 or 1. Grams join as xxhash64 keys on both sides (the
   * [[decontaminate]] contract and collision caveat).
   *
   * Scale shape: the reference gram set is tiny next to the corpus
   * (the decontaminate premise) and BROADCASTS; the corpus pays one
   * scan + per-doc distinct-gram explode into the broadcast left
   * join, ONE map-side-combinable per-doc count aggregate, and a
   * narrow id-projection left join to carry gram-less documents into
   * the output visibly.
   *
   * @return (id, n_grams, n_seen, novelty_q) — one row per corpus doc
   */
  def noveltyScores(corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    require(n >= 1, s"noveltyScores: n-gram length must be >= 1, got $n")
    // the EXACT [[decontaminate]] gram shape, kept deliberately after
    // measuring the alternatives at sf0.1: (a) the token array must
    // live in its OWN projection behind the filter — inlining the
    // regex split into the (interpreted) HOF lambda re-tokenizes the
    // document per gram (15×); (b) the explode must take the gram
    // EXPRESSION directly — projecting the array to a column and
    // exploding that column planned 8× slower on the same data. Short
    // docs drop out of the gram stream here and re-enter as
    // n_grams = 0 through the id projection below.
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("id"),
          TextOps.tokens(col(textCol)).as("__toks"))
        .filter(size(col("__toks")) >= n)
        .select(col("id"), explode(array_distinct(
          transform(sequence(lit(0), size(col("__toks")) - n),
            i => xxhash64(concat_ws(" ",
              slice(col("__toks"), i + 1, lit(n)))))))
          .as("gram"))
    val refG = grams(reference).select("gram").distinct()
      .withColumn("__hit", lit(1L))
    val counts = grams(corpus)
      .join(broadcast(refG), Seq("gram"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_seen"))
    corpus.select(col(idCol).cast("long").as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      .withColumn("novelty_q",
        when(col("n_grams") > 0,
          expr("(n_grams - n_seen) * 1048576L div n_grams")))
  }

  /**
   * Data mixture: deterministic per-source weighted sampling — the
   * "mix sources at different rates" step of LLM training-data prep
   * (e.g. keep all of a high-quality source, 10% of a crawl).
   *
   * The keep decision hashes the row id (salted, md5 lower-4-bytes
   * little-endian — the byte order of DuckDB's `md5_number_lower`, so
   * the exact decision is replayable in SQL) against the source's rate.
   * Deterministic: the same row is kept or dropped on every run, on any
   * partitioning, under task retries — which `sample()` does not
   * guarantee — and it needs no shuffle, no RNG state, one codegen scan.
   *
   * @param rates keep-probability per source value; sources absent from
   *              the map use `defaultRate`
   */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r =>
      r >= 0.0 && r <= 1.0), s"rates must be in [0,1]: $rates")
    val rate = rates.foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, r).otherwise(acc)
    }
    df.filter(hashU32(col(idCol), ":mix").cast("double") <
      rate * 4294967296.0)
  }

  /** Salted per-row hash in [0, 2³²): md5's lower 4 digest bytes
    * little-endian — the byte order of DuckDB's `md5_number_lower`, so
    * keep decisions replay exactly in SQL. */
  private[graft] def hashU32(id: org.apache.spark.sql.Column,
      salt: String): org.apache.spark.sql.Column = {
    val h = md5(concat(id.cast("string"), lit(salt)))
    (0 until 4).map { j =>
      conv(substring(h, 17 + 2 * j, 2), 16, 10).cast("long") *
        (1L << (8 * j))
    }.reduce(_ + _)
  }

  /**
   * DSIR-style importance resampling (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): keep the `k`
   * source documents whose token distribution is most TARGET-like. The
   * per-doc importance log-weight is log p_target(doc) −
   * log p_source(doc) under two fitted [[TextOps.UnigramLM]]s (fit the
   * target LM on the clean reference corpus, the source LM on the raw
   * pool); selection is Gumbel-top-k over `logw + g`, with the Gumbel
   * noise derived from the salted-md5 row hash — equivalent to
   * sampling-without-replacement proportional to the softmax of the
   * importance weights, yet fully deterministic across runs,
   * partitionings, and task retries.
   *
   * Integer exactness: the LMs store log-probs in BIGINT micro-units,
   * so `logw_micro` is an exact integer difference of the two fused
   * per-doc micro-sums, the Gumbel noise micro-rounds HALF_UP, and the
   * ranking key is their exact BIGINT sum — SQL-replayable to the bit.
   *
   * Scale shape: both vocabularies broadcast (≤ vocabSize rows each);
   * ONE token-explode scan of the source feeds BOTH LM lookups and a
   * single per-doc aggregation (one shuffle); the top-k is TakeOrdered
   * — bounded per-partition heaps, no global sort. A 100 TB source
   * costs one scan, one keyed shuffle, and a k-bounded reduction.
   *
   * @return (idCol, n_tokens, logw_micro, key_micro) for the k
   *         selected documents, highest key first
   */
  def dsirResample(source: DataFrame, idCol: String, textCol: String,
      targetLM: TextOps.UnigramLM, sourceLM: TextOps.UnigramLM,
      k: Int, salt: String = ":dsir"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = source.sparkSession
    import spark.implicits._
    // explode_outer keeps empty docs (NULL token) so every source row
    // competes for selection — logw 0, key = Gumbel noise alone
    val tok = source.select(col(idCol),
      explode_outer(TextOps.tokens(lower(col(textCol)))).as("tok"))
    val vt = targetLM.vocab.toDF("tok", "lp_t")
    val vs = sourceLM.vocab.toDF("tok", "lp_s")
    val scored = tok
      .join(broadcast(vt), Seq("tok"), "left")
      .join(broadcast(vs), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("tok")).as("n_tokens"),
        coalesce(sum(when(col("tok").isNotNull,
            coalesce(col("lp_t"), lit(targetLM.oovMicro)))), lit(0L))
          .as("lp_t_micro"),
        coalesce(sum(when(col("tok").isNotNull,
            coalesce(col("lp_s"), lit(sourceLM.oovMicro)))), lit(0L))
          .as("lp_s_micro"))
    // u ∈ (0,1) exactly representable: (hash + 0.5) / 2³² — both the
    // sum and the power-of-two division are exact in double
    val u = (hashU32(col(idCol), salt).cast("double") + lit(0.5)) /
      4294967296.0
    val gumbelMicro =
      round(-log(-log(u)) * 1e6, 0).cast("long")
    scored
      .withColumn("logw_micro", col("lp_t_micro") - col("lp_s_micro"))
      .withColumn("key_micro", col("logw_micro") + gumbelMicro)
      .select(col(idCol), col("n_tokens"), col("logw_micro"),
        col("key_micro"))
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Per-source cap — bound any one source's (domain's) contribution to
   * the corpus, the standard over-representation lever of web-corpus
   * prep: a source with `n > maxPerSource` rows keeps each row with
   * probability maxPerSource/n via the same salted-md5 deterministic
   * decision [[mixture]] uses, so the kept count concentrates tightly
   * around the cap while the decision stays reproducible across runs,
   * partitionings, and retries.
   *
   * Scale shape: one map-side-combinable count aggregate (as many rows
   * as DISTINCT sources — broadcastable by definition), a broadcast
   * join of the per-source rate, one codegen filter. Deliberately NOT
   * an exact-N cap: exact selection needs a per-source total order,
   * and a skewed 100 TB source turns that sort into a straggler; the
   * rate form is sort-free and skew-free.
   */
  def sourceCap(df: DataFrame, idCol: String, sourceCol: String,
      maxPerSource: Long, salt: String = ":cap"): DataFrame = {
    require(maxPerSource > 0, s"cap must be positive, got $maxPerSource")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
    val rate = least(lit(1.0), lit(maxPerSource.toDouble) / col("__n"))
    df.join(broadcast(counts), Seq(sourceCol))
      .filter(hashU32(col(idCol), salt).cast("double") <
        rate * 4294967296.0)
      .select(df.columns.map(col): _*)
  }

  /**
   * Deterministic train/validation/test split — the salted-hash
   * assignment every training pipeline runs before anything else.
   * Each row's id hashes (same salted-md5 family as [[mixture]]) to
   * u ∈ [0,1); cumulative split weights partition [0,1) and the row
   * lands in the interval containing u. Properties `randomSplit` does
   * NOT give: the same row lands in the same split on every run, on
   * any partitioning, under task retries, and when the corpus grows —
   * adding documents never reassigns existing ones (the property that
   * keeps eval sets stable across corpus refreshes). Zero shuffle,
   * one codegen projection; replayable in SQL via
   * `md5_number_lower`.
   *
   * @param splits ordered (name, weight) pairs; weights are
   *               normalized, so (8,1,1) means 80/10/10
   */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      salt: String = ":split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), s"weights must be positive: $splits")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = hashU32(col(idCol), salt).cast("double") / 4294967296.0
    val expr = splits.init.zip(bounds.init).reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), b)) =>
      when(u < b, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /**
   * Split-leakage audit — near-duplicate documents that straddle a
   * train/val/test boundary leak training content into evaluation, the
   * contamination mode a per-document hash split cannot see (it
   * assigns each doc independently). Composes the near-dup machinery
   * ([[graft.ops.Dedup.ngramJaccard]] pairs →
   * [[graft.ops.Dedup.components]] clusters) with [[assignSplit]]'s
   * hash assignment and reports every document whose CLUSTER spans
   * more than one split — the rows to move (re-split by cluster
   * representative) or drop before trusting an eval number.
   *
   * Scale shape: the dedup stages keep their own bucketed posture
   * (nothing all-pairs); the audit tail joins only the pair-member set
   * (≪ corpus) against the split projection, aggregates by cluster id,
   * and broadcast-joins the (tiny) leaky-cluster list back — the
   * corpus itself is never reshuffled for the audit.
   *
   * @return (id, comp, split, n_splits) for every document in a
   *         leakage cluster; `comp` is the cluster's min doc id,
   *         `n_splits` how many splits the cluster touches
   */
  def splitLeakageAudit(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], n: Int = 3,
      threshold: Double = 0.8, salt: String = ":split"): DataFrame = {
    val pairs = Dedup.ngramJaccard(df, idCol, textCol, n, threshold)
    val comps = Dedup.components(pairs, "keep_id", "dup_id")
    val split = assignSplit(
      df.select(col(idCol).cast("long").as("id")), "id", splits, salt)
    // broadcast the pair-member set (≪ corpus by the audit's premise):
    // the split projection streams through a broadcast-hash join
    // instead of being sort-merge-shuffled by id (pinned in
    // PlanAuditSpec — this is what makes the no-corpus-reshuffle claim
    // above literally true in the physical plan)
    // the inner join keeps only pair members, so `tagged` is tiny —
    // but it is read TWICE (the leaky-cluster aggregate and the final
    // join), and each read re-ran the full corpus-projection scan
    // under it. Materialize it once (r21): one corpus scan instead of
    // two; the checkpointed rows are KBs by the audit's premise.
    val tagged = split.join(broadcast(comps), "id").localCheckpoint(true)
    val leaky = tagged.groupBy("comp")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    tagged.join(broadcast(leaky), "comp")
      .select(col("id"), col("comp"), col("split"), col("n_splits"))
  }

  /**
   * Token-budget corpus carve — the "cut an N-token training subset
   * from this corpus" step: documents are walked in a deterministic
   * salted-hash order (an unbiased shuffle, the [[mixture]] hash
   * family) and kept while the EXACT running token total stays within
   * `budget`. Weights are non-negative, so the running total is
   * monotone and `cum ≤ budget` is precisely the maximal hash-order
   * prefix that fits — the same subset on every run, partitioning, and
   * retry. (Unlike [[assignSplit]]'s per-row stability, a budget cut is
   * inherently global: growing the corpus interleaves new hashes into
   * the order and shifts the cut point — version the salt per carve.)
   *
   * Scale shape (the two-level distributed prefix sum — no global
   * Window, which would funnel 100 TB through one task): one range
   * exchange on the hash order, then (1) a per-partition total pass
   * collecting #partitions longs to the driver, (2) a broadcast-offset
   * local prefix pass. Partitions whose global offset already exceeds
   * the budget are skipped without reading a row, so the post-budget
   * tail of the corpus costs nothing but the first pass's count.
   * All sums are exact Longs with loud overflow (addExact); a negative
   * weight fails fast rather than silently un-monotoning the prefix.
   *
   * @return (doc_id, n_tokens, cum_tokens) for the kept prefix;
   *         `cum_tokens` is the running total INCLUDING the row
   */
  def tokenBudgetSample(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, salt: String = ":budget",
      partitions: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val np = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val prepared = df.select(col(idCol).cast("long").as("doc_id"),
        col(weightCol).cast("long").as("n_tokens"),
        hashU32(col(idCol), salt).as("__h"))
      .repartitionByRange(np, col("__h"), col("doc_id"))
      .sortWithinPartitions("__h", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE .rdd materialization shared by both passes: a second
    // Dataset.rdd call would plan a second physical tree, and the
    // offsets below are only correct if pass 2 reads the exact
    // partitioning pass 1 summed (the persist caches this plan's
    // output; the shared RDD instance makes the identity structural,
    // not cache-dependent)
    val sortedRdd = prepared.rdd
    val partTotals = sortedRdd.mapPartitionsWithIndex { (pi, it) =>
      var s = 0L
      it.foreach { r =>
        val w = r.getLong(1)
        require(w >= 0, s"tokenBudgetSample: negative weight $w for " +
          s"doc ${r.getLong(0)} — the budget prefix needs a monotone " +
          "running total")
        s = Math.addExact(s, w)
      }
      Iterator((pi, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(Math.addExact).dropRight(1)
    val bcOff = spark.sparkContext.broadcast(offsets)
    val b = budget
    val kept = sortedRdd.mapPartitionsWithIndex { (pi, it) =>
      var cum = bcOff.value(pi)
      // a partition starting past the budget cannot contribute (weights
      // are non-negative) — skip it unread
      if (cum > b) Iterator.empty
      else it.flatMap { r =>
        cum = Math.addExact(cum, r.getLong(1))
        if (cum <= b) Some((r.getLong(0), r.getLong(1), cum)) else None
      }
    }
    // materialize the (budget-bounded) result, then release the
    // full-corpus sorted projection — otherwise every carve leaks one
    // cached corpus copy for the session lifetime (the
    // Dedup.components cache-lifecycle pattern)
    val out = kept.toDF("doc_id", "n_tokens", "cum_tokens")
      .localCheckpoint(true)
    prepared.unpersist(blocking = false)
    out
  }

  /**
   * Sequence packing — assign documents to fixed-capacity token bins,
   * the "pack short documents into one training sequence" step that
   * minimizes padding waste when forming LLM training batches.
   *
   * Semantics (deterministic shard-local NEXT-FIT): documents shard by
   * `doc_id mod shards` and are walked in doc_id order within a shard;
   * each doc joins the current bin if it fits, else opens a new bin.
   * Docs longer than `capacity` occupy a full bin alone, packed to
   * exactly `capacity` tokens and flagged `truncated` (the caller
   * decides split-vs-drop). Next-fit accepts ≤2× the optimal bin count
   * in the adversarial case (far less on real length distributions)
   * for a ONE-PASS in-order scan; the first-fit-decreasing alternative
   * needs a global sort by length plus random access to all open bins
   * — exactly the shuffle/straggler shape to avoid at 100 TB.
   *
   * Scale shape: one hash shuffle on the shard key, one in-order scan
   * per partition (several shards per partition reset packing state at
   * the boundary), zero driver state, O(1) memory per task. Bin ids
   * replay exactly across partitionings and retries — which is what
   * makes the recursive-CTE DuckDB oracle possible.
   *
   * @return (doc_id, shard, bin, bin_offset, tokens_packed, truncated);
   *         `bin` is shard-local, `bin_offset` the doc's token offset
   *         within its packed sequence
   */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
      capacity: Long, shards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("doc_id"),
        col(nTokensCol).cast("long").as("n_tokens"),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
    val cap = capacity
    prepared.mapPartitions { it =>
      var curShard = -1L
      var bin = -1L
      var used = cap + 1 // forces a fresh bin for a shard's first doc
      it.map { case (docId, n, shard) =>
        if (shard != curShard) {
          curShard = shard; bin = -1L; used = cap + 1
        }
        val take = math.min(math.max(n, 0L), cap)
        if (used + take > cap) { bin += 1; used = 0L }
        val off = used
        used += take
        (docId, shard, bin, off, take, n > cap)
      }
    }.toDF("doc_id", "shard", "bin", "bin_offset", "tokens_packed",
      "truncated")
  }

  /** Fixed-size heap of the k best (score DESC, id ASC) pairs in EXACT
    * Long arithmetic (the Similarity.TopK shape, without the
    * Long↔Double detour — arbitrary integer scores stay exact). */
  private final class LongTopK(k: Int) extends Serializable {
    private val ids = new Array[Long](k)
    private val sc = new Array[Long](k)
    private var n = 0
    @inline private def worse(s1: Long, i1: Long, s2: Long, i2: Long)
        : Boolean = s1 < s2 || (s1 == s2 && i1 > i2)
    def add(id: Long, s: Long): this.type = {
      if (n < k) {
        ids(n) = id; sc(n) = s; n += 1
        var i = n - 1
        while (i > 0 && worse(sc(i), ids(i), sc((i - 1) / 2),
            ids((i - 1) / 2))) {
          val p = (i - 1) / 2
          val ts = sc(i); sc(i) = sc(p); sc(p) = ts
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        }
      } else if (worse(sc(0), ids(0), s, id)) {
        sc(0) = s; ids(0) = id
        var i = 0
        while (true) {
          val l = 2 * i + 1; val r = l + 1; var m = i
          if (l < n && worse(sc(l), ids(l), sc(m), ids(m))) m = l
          if (r < n && worse(sc(r), ids(r), sc(m), ids(m))) m = r
          if (m == i) return this
          val ts = sc(i); sc(i) = sc(m); sc(m) = ts
          val ti = ids(i); ids(i) = ids(m); ids(m) = ti
          i = m
        }
      }
      this
    }
    def merge(o: LongTopK): this.type = {
      var i = 0
      while (i < o.n) { add(o.ids(i), o.sc(i)); i += 1 }
      this
    }
    /** (id, score, rank) best-first, rank 1..n. */
    def ranked: Array[(Long, Long, Int)] = {
      val pairs = (0 until n).map(i => (ids(i), sc(i))).toArray
        .sortWith { case ((i1, s1), (i2, s2)) => worse(s2, i2, s1, i1) }
      pairs.zipWithIndex.map { case ((id, s), r) => (id, s, r + 1) }
    }
  }

  /**
   * Keep each group's k BEST rows by an integer score (score DESC, id
   * ASC tie-break) — the RANKED per-source cap: where [[sourceCap]]
   * thins an over-represented source at random, this keeps its best
   * documents (the quality-aware domain-balancing lever).
   *
   * Scale shape: `aggregateByKey` with per-group bounded heaps —
   * map-side combine ships at most k rows per (group, map task), so a
   * single giant group costs O(n log k) and never a full per-group
   * sort (a Window + row_number would shuffle and sort EVERY row of
   * every group). Deterministic: exact integer comparisons, ties to
   * the lower id.
   *
   * @return (group, id, score, rank) rows, rank 1..k best-first
   */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"topKPerGroup: k must be positive, got $k")
    val spark = df.sparkSession
    val ranked = df
      .select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(scoreCol).cast("long"))
      .rdd
      .map { r =>
        // fail fast with the column names — a null id/score (or a
        // non-numeric score column nulled by the cast) would otherwise
        // surface as a bare executor NPE
        require(!r.isNullAt(1) && !r.isNullAt(2),
          s"topKPerGroup: null or non-numeric $idCol/$scoreCol row " +
            s"in group ${r.getString(0)}")
        (r.getString(0), (r.getLong(1), r.getLong(2)))
      }
      .aggregateByKey(new LongTopK(k))(
        (h, p) => h.add(p._1, p._2),
        (a, b) => a.merge(b))
      .flatMap { case (g, h) =>
        h.ranked.map { case (id, s, r) =>
          org.apache.spark.sql.Row(g, id, s, r)
        }
      }
    spark.createDataFrame(ranked,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("group",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }

  /**
   * Contrastive training-triple mining (X68) — the training-data
   * generation step for embedding-model fine-tuning: emit
   * (anchor, positive, hard-negative) triples where the positive is a
   * near-duplicate of the anchor and the hard negative shares the
   * anchor's LSH bucket (similar enough to be confusable — the
   * in-batch-negatives-aren't-hard-enough fix retrieval training
   * uses) while staying below the `negMax` cosine ceiling.
   *
   * Semantics, fully deterministic: each hyperplane bucket's anchor is
   * its smallest id; every other member pairs with the anchor exactly
   * once (linear in bucket size — the [[graft.ops.Dedup.embeddingDups]]
   * min-pairing, never all-pairs); the positive is the smallest-id
   * member with cosine ≥ `posMin`, the negative the smallest-id member
   * with cosine < `negMax`; buckets missing either side emit nothing.
   * The plane normals are the frozen dyadic splitmix64 stream and all
   * cosines run on exact double casts, so the WHOLE mine — bucket
   * assignment, pairing, both argmins — SQL-replays bit-for-bit
   * (pp_triples carries a full hash oracle).
   *
   * Scale shape: one codegen signature scan, ONE hash-partitioned
   * window (spill-safe within buckets), two member-sized aggregates
   * and a (bucket, anchor)-keyed join of those aggregates. Tune
   * `planes` so expected bucket size stays task-sized (each +1 plane
   * halves it); the window never crosses buckets.
   *
   * @return (bucket, anchor_id, positive_id, pos_cos, negative_id,
   *         neg_cos), one row per bucket that yields a full triple
   */
  def contrastiveTriples(df: DataFrame, idCol: String, vecCol: String,
      posMin: Double = 0.95, negMax: Double = 0.8, planes: Int = 4,
      seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val sig = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"),
      Similarity.hyperplaneSig(col(vecCol), planes, seed).as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val paired = sig
      .withColumn("anchor_id", first("id").over(w))
      .withColumn("anchor_vec", first("vec").over(w))
      .filter(col("id") > col("anchor_id"))
      .withColumn("cos", Similarity.cosineNative(spark,
        col("vec"), col("anchor_vec")))
    val pos = paired.filter(col("cos") >= posMin)
      .groupBy("bucket", "anchor_id")
      .agg(min(struct(col("id"), col("cos"))).as("p"))
    val neg = paired.filter(col("cos") < negMax)
      .groupBy("bucket", "anchor_id")
      .agg(min(struct(col("id"), col("cos"))).as("m"))
    pos.join(neg, Seq("bucket", "anchor_id"))
      .select(col("bucket").cast("long").as("bucket"),
        col("anchor_id"),
        col("p.id").as("positive_id"),
        round(col("p.cos"), 6).as("pos_cos"),
        col("m.id").as("negative_id"),
        round(col("m.cos"), 6).as("neg_cos"))
  }

  /**
   * Per-source token-budget mixture carve (X91) — the form real
   * pretraining mixtures are actually specified in ("300 B tokens of
   * web, 50 B of code, all of wiki"): within each stratum, documents
   * walk the deterministic salted-hash order (the [[mixture]] family
   * — an unbiased shuffle) and the maximal prefix whose EXACT running
   * token total fits that stratum's budget is kept. The per-stratum
   * face of [[tokenBudgetSample]] (X61) with the same monotone-prefix
   * contract — non-negative weights (loud in-plan failure otherwise)
   * make `cum ≤ budget` precisely the maximal prefix, identical on
   * every run, partitioning, and retry.
   *
   * Scale shape: the [[stratifiedSplit]] two-level machinery carried
   * from counts to WEIGHTS — hash-high-bit buckets, a tiny (stratum,
   * bucket) weight-total aggregate (map-side combinable, exact
   * decimal sums) whose window yields per-bucket offsets, broadcast
   * back, and a (stratum, bucket)-partitioned running sum — no
   * per-stratum global window, no driver state; buckets whose offset
   * already exceeds the budget are eliminated by the codegen filter
   * without their rows surviving the scan's projection.
   *
   * @param budgets per-stratum token budgets; strata absent from the
   *        map use `defaultBudget` (Long.MaxValue = keep everything)
   * @return (id, stratum, n_tokens, cum_tokens) for kept rows;
   *         `cum_tokens` includes the row (the X61 convention)
   */
  def budgetedMixture(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, salt: String = ":mixbudget",
      buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      s"budgetedMixture: budgets must be non-negative")
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (name, b)) =>
        when(col("stratum") === name, lit(b)).otherwise(acc)
    }
    hashCumWeights(df, idCol, strataCol, weightCol, salt, buckets)
      .filter(col("cum_tokens") <= budget)
      .select("id", "stratum", "n_tokens", "cum_tokens")
  }

  /** The X91 loud weight guard: null joins negative in the failure
    * branch (advisor r18 — a bare `w < 0` is NULL for null weights,
    * so they'd slip through the otherwise branch as zero-cost kept
    * rows instead of failing). */
  private def guardedWeight(weightCol: String,
      op: String): org.apache.spark.sql.Column = {
    val w0 = col(weightCol).cast("long")
    when(w0.isNull || w0 < 0, raise_error(concat(
        lit(s"$op: null or negative weight "),
        coalesce(w0.cast("string"), lit("NULL")),
        lit(" - the budget prefix needs a monotone running total")))
      .cast("long")).otherwise(w0)
  }

  /** Shared X91/X92 machinery: every row's EXACT running weight total
    * in the per-stratum salted-hash order, via the two-level bucketed
    * prefix (no per-stratum global window — see [[budgetedMixture]]'s
    * scale notes). Returns ALL rows as (id, stratum, n_tokens,
    * cum_tokens, __tot), cum INCLUDING the row; `__tot` is the
    * stratum's exact total, computed FROM the tiny bucket table (a
    * window over S·buckets rows) so consumers that need it —
    * [[epochedMixture]]'s div/mod — cost no second input scan. */
  private def hashCumWeights(df: DataFrame, idCol: String,
      strataCol: String, weightCol: String, salt: String,
      buckets: Int, op: String = "budgetedMixture"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nb = if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val width = (4294967296L + nb - 1) / nb
    val proj = df.select(col(idCol).cast("long").as("id"),
        col(strataCol).cast("string").as("stratum"),
        guardedWeight(weightCol, op).as("n_tokens"),
        hashU32(col(idCol), salt).as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L"))
    val cnt = proj.groupBy("stratum", "__b")
      .agg(sum(col("n_tokens").cast("decimal(38,0)")).as("__t"))
    val wOff = Window.partitionBy("stratum").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy("stratum")
      .orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // loud guard: a stratum total past Long.MaxValue would cast to
    // null in non-ANSI mode and silently drop the whole stratum from
    // epochedMixture's div/mod — fail in-plan instead (house
    // contract). The window sum can ALSO saturate decimal(38,0) and
    // come back null before the range check sees it (the
    // interArrivalStats lesson, review r20) — a null total with rows
    // present is the same overflow, so it trips the guard too.
    // cum_tokens and __off are bounded by the total (non-negative
    // weights), so this one guard covers every downstream cast and
    // the __off empty-window coalesce can only see a REAL first-row
    // null, never an overflowed one.
    val totDec = sum("__t").over(wTot)
    val off = cnt
      .withColumn("__off", coalesce(sum("__t").over(wOff),
        lit(0L).cast("decimal(38,0)")))
      .withColumn("__tot",
        when(totDec.isNull || totDec > lit(Long.MaxValue),
          raise_error(concat(lit(s"$op: stratum "), col("stratum"),
            lit(" total weight overflows BIGINT - rescale the " +
              "weight column"))).cast("long"))
          .otherwise(totDec.cast("long")))
      .select("stratum", "__b", "__off", "__tot")
    val wRun = Window.partitionBy("stratum", "__b")
      .orderBy(col("__h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    proj.join(broadcast(off), Seq("stratum", "__b"))
      .withColumn("cum_tokens",
        (col("__off") + sum(col("n_tokens").cast("decimal(38,0)"))
          .over(wRun)).cast("long"))
      .drop("__h", "__b", "__off")
  }

  /**
   * Epoched mixture carve (X92) — the REPEAT-count face of
   * [[budgetedMixture]], the form over-sampled sources take in real
   * pretraining mixtures ("2.5 epochs of wiki, 0.3 of web"): when a
   * stratum's token budget EXCEEDS its total, every document repeats
   * `budget div total` times, and the remainder budget buys one extra
   * repeat for the maximal salted-hash-order prefix whose exact
   * running total fits (`budget mod total` — the X91 prefix contract
   * applied to the fractional epoch). Strata absent from `budgets`
   * default to exactly ONE epoch. Deterministic on every run,
   * partitioning, and retry; rows whose stratum budget buys them
   * nothing (integer part 0 and outside the remainder prefix) are
   * dropped.
   *
   * Exactness: totals and running prefixes are exact decimal(38,0)
   * sums of the loud-guarded non-negative weights; epochs and the
   * remainder are exact BIGINT `div`/`mod` — no float touches any
   * decision. A stratum with rows but ZERO total weight and a mapped
   * budget fails loudly in-plan (its epoch count would be unbounded).
   *
   * Scale shape: EXACTLY the X91 plan — one keyed exchange + the
   * tiny bucket-offset broadcast; the stratum totals ride that same
   * broadcast (a window over the S·buckets bucket table, not a
   * second input scan), so the input is read ONCE. No per-stratum
   * global window, no driver state. Output rows carry a repeat
   * COUNT, not physical copies —
   * the consumer explodes only where it materializes batches (a
   * 100 TB corpus never rewrites itself ×epochs).
   *
   * @param budgets per-stratum token budgets (may exceed the stratum
   *        total — that is the point); absent strata = one epoch
   * @return (id, stratum, n_tokens, cum_tokens, n_repeats ≥ 1) for
   *         rows kept at least once; `cum_tokens` is the X91 running
   *         total (audit aid for the remainder cut)
   */
  def epochedMixture(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, budgets: Map[String, Long],
      salt: String = ":mixbudget", buckets: Int = 0): DataFrame = {
    require(budgets.values.forall(_ >= 0),
      s"epochedMixture: budgets must be non-negative")
    val cum = hashCumWeights(df, idCol, strataCol, weightCol, salt,
      buckets, op = "epochedMixture")
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (name, b)) =>
        when(col("stratum") === name, lit(b)).otherwise(acc)
    }
    cum
      .withColumn("__budget", coalesce(budget, col("__tot")))
      .withColumn("__tot",
        when(col("__tot") === 0L && col("__budget") > 0L,
          raise_error(concat(
            lit("epochedMixture: stratum "), col("stratum"),
            lit(" has zero total weight - its epoch count is " +
              "unbounded; drop it or budget it 0"))).cast("long"))
          .otherwise(col("__tot")))
      .withColumn("n_repeats",
        // after the guard, __tot == 0 implies __budget == 0: nothing
        // bought, and the CaseWhen keeps the div out of that branch
        when(col("__tot") === 0L, lit(0L))
          .otherwise(expr("__budget div __tot") +
            when(col("cum_tokens") <= expr("__budget % __tot"), 1L)
              .otherwise(0L)))
      .filter(col("n_repeats") > 0L)
      .select("id", "stratum", "n_tokens", "cum_tokens", "n_repeats")
  }

  /**
   * Weak-label consensus (X93) — collapse multiple noisy labelers'
   * votes per item into one consensus label plus the agreement
   * diagnostics every human-annotation / weak-supervision pipeline
   * reads before trusting its training labels: vote and labeler
   * counts, the majority label under a DETERMINISTIC tie rule
   * (highest vote count, then lexicographically smallest label — an
   * equal-vote tie cannot be broken honestly, so it breaks visibly
   * and reproducibly), the winning count, the exact fixed-point
   * agreement ratio (`top_n·2²⁰ div n_votes`), and a unanimity flag.
   * Rows with a NULL label are NOT votes (an abstention) and are
   * ignored; items with only abstentions are absent from the output.
   *
   * Scale shape: one (item, label) map-side-combinable count
   * aggregate (output ≤ |items|·|labels| — labels are a small
   * enumeration by definition), one per-item aggregate over the raw
   * votes, and the argmax resolves with two more aggregates over the
   * ALREADY-AGGREGATED tiny table — every stage keys on the item, so
   * the exchanges share one partitioning; no window over raw votes,
   * no driver state. A hot item (millions of votes) collapses
   * map-side to ≤ |labels| partial rows per task.
   *
   * @return (item_id, n_votes, n_labelers, top_label, top_n, agree_q,
   *         unanimous) — one row per item with ≥ 1 non-null vote
   */
  def labelVotes(df: DataFrame, itemCol: String, labelerCol: String,
      labelCol: String): DataFrame = {
    val v = df
      .select(col(itemCol).cast("long").as("item_id"),
        col(labelerCol).cast("long").as("__labeler"),
        col(labelCol).cast("string").as("__label"))
      .filter(col("__label").isNotNull)
    val per = v.groupBy("item_id").agg(
      count(lit(1)).as("n_votes"),
      countDistinct(col("__labeler")).as("n_labelers"))
    val byLabel = v.groupBy("item_id", "__label")
      .agg(count(lit(1)).as("__n"))
    // the max table derives FROM byLabel — rename its key so the
    // rejoin is unambiguous (Spark's self-join lineage rule)
    val top = byLabel.groupBy("item_id").agg(max("__n").as("top_n"))
      .withColumnRenamed("item_id", "__ti")
    val winner = byLabel.join(top,
        col("item_id") === col("__ti") && col("__n") === col("top_n"))
      .groupBy("item_id", "top_n")
      .agg(min("__label").as("top_label"))
    per.join(winner, Seq("item_id"))
      .select(col("item_id"), col("n_votes"), col("n_labelers"),
        col("top_label"), col("top_n"),
        expr("top_n * 1048576L div n_votes").as("agree_q"),
        (col("top_n") === col("n_votes")).cast("long").as("unanimous"))
  }

  /**
   * Deterministic corpus shuffle (X98) — a reproducible global
   * training order: every row gets a (shard, pos_in_shard) address in
   * the salted-hash order (the [[mixture]] hash family — an unbiased
   * shuffle), identical on every run, partitioning, and retry, and
   * STABLE under re-runs with the same salt — the property
   * `orderBy(rand())` can never give and training reproducibility
   * needs ("resume epoch 2 from shard 17, row 40312"). Reading shards
   * 0..S−1 each in pos order IS the global hash order, because shards
   * are the hash's high bits.
   *
   * Scale shape: one hash exchange on the shard key and a per-shard
   * rank window — parallel ACROSS shards, so pick `shards` at least
   * the cluster's parallelism (a shard's rows serialize through one
   * task's spill-safe sort; shards ≈ output files is the natural
   * choice). No global sort, no driver state.
   *
   * @param shards number of output shards (≥ 1)
   * @return input columns ++ (shard 0-based, pos 1-based within the
   *         shard's hash order)
   */
  def shuffleOrder(df: DataFrame, idCol: String, shards: Int,
      salt: String = ":shuffle"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards >= 1, s"shuffleOrder: shards must be >= 1, got " +
      s"$shards")
    val clash = df.columns.toSet.intersect(Set("shard", "pos", "__h"))
    require(clash.isEmpty, s"shuffleOrder: column collision: " +
      s"${clash.mkString(", ")} — alias before shuffling")
    val width = (4294967296L + shards - 1) / shards
    val w = Window.partitionBy("shard")
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hashU32(col(idCol), salt))
      .withColumn("shard", expr(s"__h div ${width}L"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /**
   * Corpus snapshot diff (X95) — what changed between two crawls /
   * ingest runs, per source: the refresh audit read before re-running
   * the downstream pipeline ("src3 churned 40% — recompute its dedup
   * clusters; src7 is untouched — reuse"). Per source:
   * `n_added` (id only in `current`), `n_removed` (id only in
   * `previous`), `n_changed` (same id, different normalized content —
   * the [[Dedup.exact]] fingerprint), `n_unchanged`, and the exact
   * fixed-point churn ratio `(added+removed+changed)·2²⁰ div (all
   * ids observed for the source in either snapshot)`.
   * Attribution: present-in-current rows count under the CURRENT
   * source (a doc that moved sources counts as its new home), removed
   * rows under the PREVIOUS source.
   *
   * Contract: ids are unique within each snapshot (duplicate ids
   * multiply the join — run [[Profiler.integrityAudit]] first if
   * unsure; that is the tool for key health, this one assumes it).
   *
   * Scale shape: each side projects to (id, source, fingerprint) —
   * the text never ships — then ONE id-keyed full-outer join (the
   * inherent cost of a diff) feeding a map-side-combinable aggregate
   * with |sources| output rows. No window, no driver state.
   *
   * @return (src, n_added, n_removed, n_changed, n_unchanged,
   *         churn_q), one row per source present in either snapshot
   */
  def snapshotDiff(previous: DataFrame, current: DataFrame,
      idCol: String, sourceCol: String, textCol: String): DataFrame = {
    def proj(df: DataFrame, pre: String) =
      df.select(col(idCol).cast("long").as("id"),
        col(sourceCol).cast("string").as(s"${pre}src"),
        TextOps.fingerprint(col(textCol)).as(s"${pre}fp"))
    val j = proj(previous, "o").join(proj(current, "n"), Seq("id"),
      "full_outer")
    val added = when(col("ofp").isNull, 1L).otherwise(0L)
    val removed = when(col("nfp").isNull, 1L).otherwise(0L)
    val changed = when(col("ofp").isNotNull && col("nfp").isNotNull &&
      col("ofp") =!= col("nfp"), 1L).otherwise(0L)
    val unchanged = when(col("ofp") === col("nfp"), 1L).otherwise(0L)
    j.groupBy(coalesce(col("nsrc"), col("osrc")).as("src"))
      .agg(sum(added).as("n_added"), sum(removed).as("n_removed"),
        sum(changed).as("n_changed"), sum(unchanged).as("n_unchanged"))
      .withColumn("churn_q", expr(
        "(n_added + n_removed + n_changed) * 1048576L div " +
          "(n_added + n_removed + n_changed + n_unchanged)"))
  }

  /**
   * Stratified EXACT-proportion split (X76) — per stratum, split
   * counts are exact to the row: stratum rows rank in a deterministic
   * salted-hash order (the [[mixture]] hash family, id tie-break) and
   * split k takes ranks (floor(n·c(k−1)/T), floor(n·c(k)/T)] where
   * c(k) is the cumulative weight and T the total — pure BIGINT
   * comparisons (`r·T ≤ n·c(k)`), so every split size is within one
   * row of proportional and they sum to n exactly. The guarantee
   * [[assignSplit]]'s independent per-row hash cannot give: a 25-row
   * source under 80/10/10 gets exactly 20/2/3, never 17/4/4 — the
   * per-stratum eval coverage a mixture-weighted corpus needs. The
   * trade (inherent, documented): an exact-count cut is a RANK cut,
   * so growing a stratum reassigns rows near its boundaries — salt
   * per carve; use [[assignSplit]] when per-row stability matters
   * more than exact proportions.
   *
   * Scale shape: NO per-stratum global window (one task per stratum —
   * the 100 TB funnel when strata are few). The rank is two-level:
   * rows bucket by the hash's high bits (`__h div width` — uniform by
   * construction, `buckets` cells per stratum), a (stratum, bucket)
   * count aggregate (map-side combinable; S·buckets rows) yields
   * per-bucket rank offsets and stratum totals via a window over that
   * TINY table, and the per-row rank is a (stratum, bucket)-
   * partitioned row_number — parallel across buckets — plus the
   * broadcast offset. Equivalent to the global per-stratum rank,
   * because the bucket order IS the hash order's prefix.
   *
   * @param splits ordered (name, weight) pairs, weights positive
   *               integer proportions (8,1,1 = 80/10/10)
   * @return (id, stratum, strat_rank, split); `strat_rank` is the
   *         1-based position in the stratum's hash order (audit aid)
   */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
      splits: Seq[(String, Long)], salt: String = ":strat",
      buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(splits.nonEmpty, "stratifiedSplit: need at least one split")
    require(splits.forall(_._2 > 0),
      s"stratifiedSplit: weights must be positive integers: $splits")
    val total = splits.map(_._2)
      .reduce((a: Long, b: Long) => Math.addExact(a, b))
    require(total <= 1000000L,
      s"stratifiedSplit: total weight $total is implausibly large — " +
        "rank·total must stay in BIGINT")
    val cums = splits.map(_._2)
      .scanLeft(0L)((a, b) => Math.addExact(a, b)).tail
    val nb = if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val width = (4294967296L + nb - 1) / nb
    val proj = df.select(col(idCol).cast("long").as("id"),
        col(strataCol).cast("string").as("stratum"),
        hashU32(col(idCol), salt).as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L"))
    val cnt = proj.groupBy("stratum", "__b").agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy("stratum").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = cnt
      .withColumn("__off", coalesce(sum("__c").over(wOff), lit(0L)))
      .withColumn("__n",
        sum("__c").over(Window.partitionBy("stratum")))
      .select("stratum", "__b", "__off", "__n")
    val wRank = Window.partitionBy("stratum", "__b")
      .orderBy(col("__h"), col("id"))
    val ranked = proj.join(broadcast(off), Seq("stratum", "__b"))
      .withColumn("strat_rank",
        col("__off") + row_number().over(wRank).cast("long"))
    // first split k with rank·T ≤ n·cum(k); the last split is the
    // `otherwise`, so rounding never strands a row
    val assign = splits.init.zipWithIndex.reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), k)) =>
      when(col("strat_rank") * lit(total) <= col("__n") * lit(cums(k)),
        name).otherwise(acc)
    }
    ranked.withColumn("split", assign)
      .select("id", "stratum", "strat_rank", "split")
  }
}
