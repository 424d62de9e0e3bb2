package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Gap-rule event sessionization — the session carve-up a behavioral /
 * clickstream pipeline runs before building per-session training
 * examples (the event-log analog of the qid grouping the trainer's
 * ranking path consumes; reference xgboost_ray shards ranking data by
 * precomputed group, `matrix.py` qid handling — sessions are how those
 * groups get MADE from raw logs).
 *
 * Scale shape: ONE shuffle (hash by the user column), an in-partition
 * sort, and window passes over each user's ordered events — no driver
 * state, no collect; the downstream per-session aggregate reuses the
 * same partitioning (user_id co-locates every (user, session) group),
 * so the whole pipeline is a single exchange. A power user with
 * millions of events stays one partition's sequential scan — the
 * inherent cost of the gap rule — while users parallelize freely.
 *
 * All timestamp arithmetic is INTEGER nanos (the events table carries
 * timestamp[ns], read as Long under Spark's nanosAsLong conf; a double
 * division at 1.7e18 nanos would lose sub-second precision), so the
 * carve-up is bit-deterministic and replays exactly in SQL.
 */
object Sessions {

  private val NanosPerSec = 1000000000L

  /** Integer-nanos view of the timestamp column, whatever flavor the
    * source carries: Long passes through (nanos by contract, the
    * nanosAsLong parquet path); TIMESTAMP_NTZ converts TZ-FREE via
    * exact interval-since-epoch decimal arithmetic (a cast through
    * TimestampType would shift by the session time zone); TIMESTAMP is
    * an instant, so unix_micros is already TZ-free. */
  private[graft] def asNanos(events: DataFrame, tsCol: String): Column =
    events.schema(tsCol).dataType match {
      case LongType => col(tsCol)
      case TimestampNTZType =>
        ((col(tsCol) - lit("1970-01-01 00:00:00").cast("timestamp_ntz"))
          .cast("decimal(30,6)") * lit(NanosPerSec)).cast("long")
      case TimestampType => unix_micros(col(tsCol)) * lit(1000L)
      case other => throw new IllegalArgumentException(
        s"sessionize: $tsCol is $other — need Long nanos or a timestamp")
    }

  /**
   * Assign a 1-based `session_idx` per user: a new session starts when
   * the gap to the user's previous event exceeds `gapSec` (strictly —
   * an exactly-gap-long pause stays in-session). Ordering ties on the
   * timestamp break by `orderCol`, so the carve-up is deterministic
   * under any partitioning.
   */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"sessionize: gapSec must be positive, got $gapSec")
    val tn = asNanos(events, tsCol)
    val w = Window.partitionBy(userCol).orderBy(tn, col(orderCol))
    val prev = lag(tn, 1).over(w)
    events
      .withColumn("__sess_new",
        when(prev.isNull || tn - prev > lit(gapSec * NanosPerSec), 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__sess_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__sess_new")
  }

  /** Epoch-second view of an integer-nanos column. `/` on longs is
    * DOUBLE division in Spark (sub-integer error at 1.7e18 nanos flips
    * the truncation); decimal division is exact, then the cast floors. */
  private def toSec(c: Column): Column =
    (c.cast("decimal(38,0)") / lit(NanosPerSec)).cast("long")

  /**
   * Session-level features over the [[sessionize]] carve-up: event
   * count, start/end/duration in epoch seconds, the exact fixed-point
   * sum of `valueCol` (Σ floor(v·2²⁰+0.5) — order-free BIGINT, so the
   * result is partition-invariant), and the distinct event-type count.
   * Same single-exchange plan: the aggregate's (user, session) keys are
   * co-located by the window's user partitioning already.
   */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapSec: Long, valueCol: String,
      typeCol: String): DataFrame = {
    val sec = toSec(asNanos(events, tsCol))
    sessionize(events, userCol, tsCol, orderCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(sec).as("start_s"),
        max(sec).as("end_s"),
        (max(sec) - min(sec)).as("duration_s"),
        sum(floor(col(valueCol) * 1048576.0 + 0.5).cast("long"))
          .as("value_q"),
        countDistinct(col(typeCol)).as("n_types"))
  }

  /**
   * Session aggregate over Spark's NATIVE `session_window` — the form
   * that runs unchanged in batch AND Structured Streaming (where the
   * state store holds only OPEN sessions per user and the watermark
   * evicts closed ones — the scale path for unbounded event logs).
   *
   * Boundary semantics are IDENTICAL to [[sessionize]] (probed, and
   * pinned by SessionsSpec): an event exactly `gapSec` after its
   * predecessor merges into the session; strictly later starts a new
   * one. `session_window.end` is last-event + gap, so `end_us` here is
   * NOT [[sessionStats]]'s last-event second — it is the instant the
   * session would have closed.
   *
   * `tsCol` must be a real TimestampType event-time column (streaming
   * watermarks attach to nothing else); outputs are exact integer
   * micros via unix_micros (TZ-free — timestamps are instants).
   */
  def sessionWindowStats(df: DataFrame, userCol: String, tsCol: String,
      gapSec: Long, valueCol: String): DataFrame = {
    require(gapSec > 0, s"sessionWindowStats: gapSec must be positive")
    df.groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSec seconds"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col(valueCol) * 1048576.0 + 0.5).cast("long"))
          .as("value_q"))
      .select(col(userCol),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("value_q"))
  }

  /**
   * Fixed-width temporal downsampling (X66) — per-(user, bar) OHLC-ish
   * rollup of an event stream: event count, missing count, exact
   * fixed-point value sum/min/max, and the FIRST/LAST value in the bar
   * under the deterministic (event time, event id) total order. The
   * time-series feature-engineering primitive ("one row per user-hour")
   * that turns a raw event log into model-ready rows.
   *
   * Exactness: timestamps convert by the [[sessionize]] TZ-free nanos
   * rule and bars are integer division of micros — TRUNCATING toward
   * zero (Spark `div` == DuckDB BIGINT `//`, cross-engine identical),
   * NOT floored: a pre-1970 timestamp lands in a double-width bar 0
   * together with the first post-epoch bar. Event logs are
   * post-epoch in practice; if yours aren't, shift to a non-negative
   * epoch before resampling rather than relying on bar 0's shape.
   * Values quantize by the Profiler rule (NaN = missing, never a fake
   * 0); the sum aggregates in decimal(38,0) and the cast back to long
   * fails loudly on overflow rather than wrapping.
   *
   * Scale shape: ONE hash aggregate with map-side partials — first/last
   * ride struct-min/max over the (us, id, vq) struct (NOT min_by/
   * max_by, which would null-skip a missing first value — see the
   * inline comment), so there is NO window, NO per-group sort, NO
   * shuffle beyond the aggregate's own exchange. A billion-event day
   * rolls up in a single pass.
   *
   * @param barUs bar width in MICROSECONDS (3600000000L = hourly)
   * @return (user_id, bar, n, n_vals, v_sum_q, v_min_q, v_max_q,
   *         v_first_q, v_last_q); `bar` = epoch_us div barUs
   *         (truncating)
   */
  def resampleBars(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String, barUs: Long): DataFrame = {
    require(barUs > 0, s"resampleBars: barUs must be positive, got $barUs")
    val us = floor(asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    val d = col(valueCol).cast("double")
    val vq = when(isnan(d), lit(null))
      .otherwise(floor(d * 1048576.0 + 0.5).cast("long"))
    events
      .select(col(userCol).cast("long").as("user_id"), us.as("__us"),
        col(idCol).cast("long").as("__id"), vq.as("__vq"))
      .withColumn("bar", expr(s"__us div ${barUs}L"))
      .groupBy("user_id", "bar")
      .agg(
        count(lit(1)).as("n"),
        count(col("__vq")).as("n_vals"),
        sum(col("__vq").cast("decimal(38,0)")).cast("long")
          .as("v_sum_q"),
        min(col("__vq")).as("v_min_q"),
        max(col("__vq")).as("v_max_q"),
        // first/last via struct-min/max on the UNIQUE (us, id) prefix:
        // unlike min_by/max_by this carries a null value through
        // instead of engine-specific null-skipping — a bar whose first
        // event is missing-valued must REPORT the missing, not the
        // next value
        min(struct(col("__us"), col("__id"), col("__vq")))
          .getField("__vq").as("v_first_q"),
        max(struct(col("__us"), col("__id"), col("__vq")))
          .getField("__vq").as("v_last_q"))
  }

  /**
   * Session transition counts (X79) — the corpus-wide first-order
   * Markov statistics of event flows: for every WITHIN-SESSION
   * consecutive event pair under the [[sessionize]] carve-up and the
   * deterministic (ts, id) order, count (from_type → to_type)
   * occurrences and the number of distinct sessions containing the
   * transition. The "what do users actually do next" table behind
   * behavioral features, anomaly baselines, and funnel design (it
   * tells you WHICH funnel to measure with
   * [[graft.ops.Features.funnel]]).
   *
   * Pairs never cross a session boundary: a gap long enough to split
   * sessions is evidence the two events are unrelated — counting that
   * pair would launder noise into the transition matrix. Equal-ts
   * ties order by id (the [[sessionize]] rule), so the pairing is
   * partition/retry-invariant and replays exactly in SQL.
   *
   * Scale shape: ONE hash exchange (the [[sessionize]] user
   * partitioning — the lag window reuses it), then one map-side-
   * combinable aggregate whose key space is |event types|² — KBs of
   * output from any corpus size.
   *
   * @return (from_type, to_type, n_trans, n_sessions)
   */
  def transitionCounts(events: DataFrame, userCol: String,
      tsCol: String, orderCol: String, typeCol: String,
      gapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = sessionize(events, userCol, tsCol, orderCol, gapSec)
    val tn = asNanos(sess, tsCol)
    val w = Window.partitionBy(userCol).orderBy(tn, col(orderCol))
    sess
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .withColumn("__from_sess", lag(col("session_idx"), 1).over(w))
      .filter(col("__from").isNotNull &&
        col("__from_sess") === col("session_idx"))
      .select(col(userCol).as("__user"), col("session_idx"),
        col("__from").as("from_type"), col(typeCol).as("to_type"))
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_trans"),
        countDistinct(col("__user"), col("session_idx"))
          .as("n_sessions"))
  }

  /**
   * Inter-arrival statistics (X90) — per user, the exact cadence
   * profile of their event stream: event count, first→last span, and
   * the min / max / mean / std of consecutive inter-event gaps under
   * the deterministic (ts, id) order. The burstiness fingerprint
   * behind bot detection, engagement segmentation, and choosing a
   * sessionization gap ([[sessionize]]'s `gapSec` should sit in the
   * valley between the intra-burst and inter-burst modes this table
   * exposes).
   *
   * Exactness: gaps are exact BIGINT micros; Σgap is exactly the span
   * (telescoping), Σgap² accumulates in decimal(38,0) (a squared
   * month of micros overflows a long); mean and std are single
   * IEEE-double expressions over those exact integers, rounded to 6.
   * Singleton users report null gap stats — no gaps exist, and a fake
   * 0 would read as "infinitely bursty". Overflow bound (advisor
   * r18): Spark caps decimal products at precision 38, so the std
   * numerator `Σgap²·(n−1)` overflows once it passes ~10³⁸ (e.g. a
   * user with ~10⁹ events spread over decades) — where DuckDB's
   * 128-bit HUGEINT (~1.7·10³⁸) still fits. Rather than diverge
   * engine-dependently (ANSI throws, non-ANSI yields a silent null
   * std), a pre-multiplication guard fails LOUDLY in-plan just below
   * the cap.
   *
   * Scale shape: ONE hash exchange (the user partitioning), the lag
   * window rides it, and the per-user aggregate reuses the same
   * partitioning — the [[sessionize]] single-exchange plan.
   *
   * @return (user_id, n_events, span_us, gap_min_us, gap_max_us,
   *         gap_mean, gap_std) — population std over the n−1 gaps
   */
  def interArrivalStats(events: DataFrame, userCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val us = floor(asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    val w = Window.partitionBy("user_id").orderBy("us", "id")
    val base = events
      .select(col(userCol).cast("long").as("user_id"), us.as("us"),
        col(idCol).cast("long").as("id"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
    val ng = (count(lit(1)) - 1L).cast("decimal(38,0)")
    val sq = sum(col("gap").cast("decimal(38,0)") *
      col("gap").cast("decimal(38,0)"))
    val span = (max("us") - min("us")).cast("decimal(38,0)")
    // loud guard just below the decimal(38,0) cap: past it, ANSI mode
    // throws anyway and non-ANSI would yield a silent null std — the
    // double comparison's ~1e22 representation error is 15 orders of
    // magnitude inside the 2e36 margin, so the guard can never pass
    // a product that overflows. The sum itself can also saturate
    // decimal(38,0) and come back null in non-ANSI mode BEFORE the
    // product check sees it — a null sq would null the comparison and
    // fall through to the silent branch, so a group with gaps (ng>0)
    // whose Σgap² is null trips the guard explicitly.
    val wouldOverflow =
      (ng > 0 && sq.isNull) ||
        sq.cast("double") * ng.cast("double") > lit(9.8e37) ||
        span.cast("double") * span.cast("double") > lit(9.8e37)
    val stdNum = when(wouldOverflow,
      raise_error(concat(lit("interArrivalStats: user "),
        col("user_id").cast("string"),
        lit(" gap-square sum overflows the decimal(38,0) std " +
          "numerator - split the window or compute std downstream")))
        .cast("decimal(38,0)"))
      .otherwise(sq * ng - span * span)
    base.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      (max("us") - min("us")).as("span_us"),
      min("gap").as("gap_min_us"),
      max("gap").as("gap_max_us"),
      when(ng > 0, round(span.cast("double") / ng.cast("double"), 6))
        .as("gap_mean"),
      when(ng > 0, round(sqrt(stdNum.cast("double")) /
        ng.cast("double"), 6)).as("gap_std"))
  }

  /**
   * Session co-occurrence / association rules (X83) — pairwise
   * frequent-itemset mining over the [[sessionize]] carve-up: for
   * every unordered event-type pair {a, b}, in how many sessions do
   * BOTH occur (`n_ab`), out of how many contain each alone (`n_a`,
   * `n_b`), with both directed confidences as exact fixed-point
   * BIGINTs (conf(a→b) = n_ab·2²⁰ div n_a). The "users who did A in a
   * session also did B" table — support/confidence/lift (lift = the
   * consumer's one division away: n·n_ab/(n_a·n_b)) behind
   * recommendation heuristics and anomaly baselines. [[X79]] counts
   * ORDERED adjacent transitions; this counts unordered WITHIN-SESSION
   * co-presence — the two complementary views of session structure.
   *
   * Scale shape: distinct (session, type) items ride the sessionize
   * partitioning (≤ |types| rows per session); the pair join is
   * per-session (bounded: C(|types in session|, 2), with |types|
   * small by definition); counts aggregate map-side to a ≤ |types|²
   * key space; the total-session count attaches as a broadcast 1-row
   * cross join. Everything after the carve-up is KB-scale.
   *
   * @return (item_a, item_b, n_ab, n_a, n_b, n_sessions, conf_ab_q,
   *         conf_ba_q) for item_a < item_b with n_ab ≥ minSupport
   */
  def associationPairs(events: DataFrame, userCol: String,
      tsCol: String, orderCol: String, typeCol: String, gapSec: Long,
      minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"associationPairs: minSupport must be " +
      s"positive, got $minSupport")
    val items = sessionize(events, userCol, tsCol, orderCol, gapSec)
      .select(col(userCol).cast("long").as("u"), col("session_idx"),
        col(typeCol).cast("string").as("item"))
      .distinct()
    val tot = items.select(col("u"), col("session_idx")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val cnts = items.groupBy("item").agg(count(lit(1)).as("n"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.u") === col("b.u") &&
          col("a.session_idx") === col("b.session_idx") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(cnts.as("ca")), col("item_a") === col("ca.item"))
      .join(broadcast(cnts.as("cb")), col("item_b") === col("cb.item"))
      .crossJoin(broadcast(tot))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("ca.n").as("n_a"), col("cb.n").as("n_b"),
        col("n_sessions"),
        expr("n_ab * 1048576L div `ca`.n").as("conf_ab_q"),
        expr("n_ab * 1048576L div `cb`.n").as("conf_ba_q"))
  }

  /**
   * Point-in-time feature snapshot (X99) — the offline feature-store
   * read: for every (entity, feature), the LATEST observation
   * STRICTLY BEFORE a cutoff instant ("every user's last-known value
   * of each signal as of midnight, for the training run"). Strictly
   * before, so a model trained on the snapshot never sees the cutoff
   * instant itself — the same leakage discipline as
   * [[labelOutcomes]] / [[Features.trailingFeatures]], applied to
   * state instead of windows.
   *
   * Determinism: timestamps by the [[asNanos]] rule to micros; the
   * "latest" pick is a struct argmax over (us, id, vq) — equal-us
   * ties resolve to the LARGEST id (the as-of family's documented
   * tie rule), so the snapshot is identical on every partitioning
   * and replays exactly in SQL. Values follow the
   * [[Profiler.quantize]] fixed-point rule; a latest observation
   * with a missing (null/NaN) value reports a null `value_q` but
   * still wins the recency contest — "the entity's state is
   * 'unknown'" is itself the honest latest state.
   *
   * Scale shape: one codegen filter (pushed to the scan) + ONE
   * map-side-combinable (entity, feature) aggregate — a 100 TB log
   * snapshots in a scan; output is |entities|·|features| rows. No
   * window over the log, no join, no driver state.
   *
   * @return (user_id, feature, us, obs_id, value_q) — one row per
   *         (entity, feature) with ≥ 1 pre-cutoff observation
   */
  def snapshotAsOf(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      cutoffUs: Long): DataFrame = {
    val us = floor(asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    events
      .select(col(userCol).cast("long").as("user_id"),
        col(typeCol).cast("string").as("feature"), us.as("__us"),
        col(idCol).cast("long").as("__id"),
        Profiler.quantize(valueCol).as("__vq"))
      .filter(col("__us") < cutoffUs)
      .groupBy("user_id", "feature")
      .agg(max(struct(col("__us"), col("__id"), col("__vq")))
        .as("__top"))
      .select(col("user_id"), col("feature"),
        col("__top.__us").as("us"), col("__top.__id").as("obs_id"),
        col("__top.__vq").as("value_q"))
  }

  /**
   * Leakage-safe outcome labeling (X70) — the supervised-label
   * generation step for event models ("did this user convert within
   * the horizon AFTER this event?"): every event gets `label` 1 iff
   * the SAME user has a qualifying target event in (ts, ts+horizon],
   * plus the exact time-to-event and the matched target id. Point-in-
   * time correct by construction: strictly-future matching means an
   * event can never label itself, and nothing at or before the event
   * time leaks into its label — the train-serve skew a naive windowed
   * self-join gets wrong at the boundary.
   *
   * Determinism: timestamps convert by the [[sessionize]] TZ-free
   * nanos rule to micros; the target side pre-aggregates to ONE row
   * per (user, us) keeping the LARGEST target id (the documented
   * as-of tie rule AND the hot-timeline shrink from the SkewCheck
   * as-of probe), so the matched row is unique on every partitioning
   * and in the SQL replay. Events equal-timestamped WITH a target are
   * strictly-future, so they do NOT match it (horizon is (0, h]).
   *
   * Scale shape: the [[AsofJoin.asofJoinForward]] core — one keyed
   * exchange per side, an in-partition merge, no window over the raw
   * log; the first future target is the nearest, so `tolerance`
   * nulls out-of-horizon matches without a second scan.
   *
   * @param targetFilter which events count as outcomes (a Column
   *        predicate over the RAW event row, e.g.
   *        `col("event_type") === "purchase"`)
   * @return (id, user_id, us, label, tte_us, target_id) — label 1 with
   *         exact `tte_us` = match time − event time, or 0 with -1
   *         sentinels (the j2/j4 as-of harness convention: keeps the
   *         columns non-null longs, trainer- and compare-friendly)
   */
  def labelOutcomes(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, targetFilter: Column, horizonUs: Long)
      : DataFrame = {
    require(horizonUs > 0,
      s"labelOutcomes: horizonUs must be positive, got $horizonUs")
    val us = floor(asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    val base = events.select(col(idCol).cast("long").as("id"),
      col(userCol).cast("long").as("user_id"), us.as("us"))
    val targets = events.filter(targetFilter)
      .select(col(userCol).cast("long").as("user_id"), us.as("us"),
        col(idCol).cast("long").as("tid"))
      .groupBy("user_id", "us").agg(max("tid").as("tid"))
    AsofJoin.asofJoinForward(base, targets, "user_id", "us", "us",
        payloadCols = Seq("tid"), strict = true,
        tolerance = Some(horizonUs))
      .select(col("id"), col("user_id"), col("us"),
        when(col("asof_ts").isNotNull, 1L).otherwise(0L).as("label"),
        coalesce((col("asof_ts") - col("us")).cast("long"), lit(-1L))
          .as("tte_us"),
        coalesce(col("asof_tid").cast("long"), lit(-1L))
          .as("target_id"))
  }
}
