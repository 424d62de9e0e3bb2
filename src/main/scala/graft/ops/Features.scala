package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time feature engineering over event logs — the transforms
 * that turn a raw log into leakage-safe model inputs (the step
 * upstream of the trainer's matrix build, `data/DMatrixSpec`; the
 * reference assumes these features already exist in its input frames,
 * e.g. `matrix.py`'s feature-column handling — making them is this
 * module's job).
 *
 * Every output here is POINT-IN-TIME CORRECT by construction: a row's
 * features are computed only from strictly-earlier data (trailing
 * windows end at −1 micro; leave-one-out encoding subtracts the row's
 * own label), so train-time features equal what a live system could
 * have known — the train/serve skew class these transforms exist to
 * prevent.
 */
object Features {

  /**
   * Trailing-window activity features (X73) — for each event, the
   * same user's activity in the window `[ts − windowUs, ts − 1]`
   * micros: event count, non-missing value count, and the exact
   * fixed-point value sum. "How active was this user in the hour
   * BEFORE this moment" — strictly-before, so an event never sees
   * itself or its same-instant peers (ties share a timestamp; a live
   * scorer could not have counted them).
   *
   * Exactness: timestamps by the [[Sessions.asNanos]] TZ-free rule to
   * micros; values by the [[Profiler.quantize]] rule (NaN = missing);
   * the windowed sum aggregates in decimal(38,0) and the final cast
   * to long fails loudly on overflow. RANGE frames are value-based in
   * both engines, so equal-timestamp rows get identical frames on any
   * partitioning — the output is bit-deterministic.
   *
   * Scale shape: ONE hash exchange on the user column, a spill-safe
   * in-partition sort, and a sliding RANGE frame — no self-join, no
   * interval explode (the per-event window is a frame, not a join —
   * contrast [[Intervals.rangeJoin]], which is for windows that are
   * ROWS of their own table). Honest cost note: the frame BOUNDS
   * advance monotonically, but Spark's window aggregates cannot
   * retract, so each row re-aggregates its frame buffer — O(events ×
   * frame occupancy) per user, measured by `SkewCheck trail`. For
   * timelines dense relative to the window, the streaming form
   * ([[graft.streaming.StreamPipeline.trailingStream]]) is the
   * designed mitigation: its running totals subtract on eviction,
   * O(1) amortized per event, with finals pinned identical. A hot
   * user serializes through one task either way — the inherent cost
   * of that user's timeline, same note as [[AsofJoin]].
   *
   * @return (id, user_id, us, n_trail, n_vals_trail, v_sum_q_trail) —
   *         counts 0 and sum 0 for an empty window (a user's first
   *         event), never null
   */
  def trailingFeatures(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, valueCol: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0,
      s"trailingFeatures: windowUs must be positive, got $windowUs")
    val us = floor(Sessions.asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-windowUs, -1)
    events
      .select(col(idCol).cast("long").as("id"),
        col(userCol).cast("long").as("user_id"), us.as("us"),
        Profiler.quantize(valueCol).as("__vq"))
      .withColumn("n_trail", count(lit(1)).over(w))
      .withColumn("n_vals_trail", count(col("__vq")).over(w))
      .withColumn("v_sum_q_trail",
        coalesce(sum(col("__vq").cast("decimal(38,0)")).over(w),
          lit(0L).cast("decimal(38,0)")).cast("long"))
      .drop("__vq")
  }

  /**
   * Leave-one-out target encoding (X74) — replace a categorical column
   * with the smoothed mean label of its OTHER rows:
   *
   *   enc = (sum_q(cat) − own_q + m · prior) / (n(cat) − 1 + m)
   *
   * where `prior` is the global labeled mean and `m` the smoothing
   * pseudo-count. Leakage-safe: a row's own label never contributes to
   * its own feature (the trap that makes naive target encoding
   * memorize labels); rare categories shrink toward the prior instead
   * of echoing their one label back. Rows with a missing (null/NaN)
   * label get the posterior form (sum + m·prior)/(n + m) — nothing to
   * leave out; with m > 0 (required) no denominator can reach zero.
   *
   * Exactness: labels quantize by the [[Profiler.quantize]] rule; all
   * sums/counts are exact BIGINTs; `prior` and `enc` are IEEE double
   * arithmetic over those exact integers in a FIXED expression shape,
   * so the result is bit-identical across partitionings and in the
   * DuckDB replay.
   *
   * Scale shape: ONE map-side-combinable aggregate over the category
   * column (output = |categories| rows) plus one scalar global
   * aggregate, then the per-row encoding attaches via a BROADCAST join
   * of that tiny table — the corpus itself is never shuffled; the
   * encode is a codegen projection over the scan. Categorical columns
   * are bounded-cardinality by definition; a caller feeding an id-like
   * column gets a loud broadcast failure, not a silent reshuffle.
   *
   * @return input columns ++ (enc double) — null only when the WHOLE
   *         table has no labeled rows
   */
  def targetEncodeLoo(df: DataFrame, catCol: String, labelCol: String,
      smoothing: Double): DataFrame = {
    require(smoothing > 0 && !smoothing.isNaN && !smoothing.isInfinite,
      s"targetEncodeLoo: smoothing must be a positive finite " +
        s"pseudo-count, got $smoothing")
    val yq = Profiler.quantize(labelCol)
    val g = df.agg(
        sum(yq.cast("decimal(38,0)")).cast("double").as("gs"),
        count(yq).as("gn"))
      .head()
    val prior =
      if (g.isNullAt(0) || g.getLong(1) == 0L) Double.NaN
      else g.getDouble(0) / (g.getLong(1).toDouble * 1048576.0)
    val stats = df.groupBy(col(catCol).cast("string").as("__cat"))
      .agg(sum(yq.cast("decimal(38,0)")).cast("long").as("__sum_q"),
        count(yq).as("__n"))
    val ownQ = yq
    val num = (coalesce(col("__sum_q"), lit(0L)) -
      coalesce(ownQ, lit(0L))).cast("double") / lit(1048576.0) +
      lit(smoothing) * lit(prior)
    val den = (col("__n") - when(ownQ.isNotNull, 1L).otherwise(0L))
      .cast("double") + lit(smoothing)
    df.join(broadcast(stats),
        col(catCol).cast("string") <=> col("__cat"), "left")
      .withColumn("enc",
        when(lit(prior.isNaN), lit(null).cast("double"))
          .otherwise(num / den))
      .drop("__cat", "__sum_q", "__n")
  }

  /**
   * Ordered-step funnel (X75) — per user, the earliest time each step
   * of a sequence was reached STRICTLY AFTER the previous step, all
   * within `windowUs` of step 1 ("view → click → purchase inside 7
   * days"). The conversion-labeling step for sequence models, and the
   * product-analytics query every event warehouse runs.
   *
   * Semantics (each deterministic, each replayable in SQL):
   *   - step 1 anchors at the user's GLOBAL earliest step-1 event;
   *   - step k (k ≥ 2) is the earliest step-k event with
   *     `ts > t(k−1)` and `ts ≤ t1 + windowUs` — strictly after
   *     (an equal-timestamp pair cannot prove order, so it does not
   *     advance the funnel) and inside the window anchored at t1;
   *   - `depth` = number of steps reached; unreached steps report -1.
   *
   * Scale shape: one aggregate per step over that step's FILTERED
   * event subset (pushed-down type predicate — each pass scans only
   * its step's rows), joined to the per-user milestone table, which is
   * |users|-sized — k−1 user-keyed hash joins, never a window or sort
   * over the raw log. Funnels are short (k ≤ a handful) by nature, so
   * the chain is a few narrow stages, not an O(k) blowup.
   *
   * @param steps event-type values in funnel order (≥ 2, distinct)
   * @return (user_id, t_1 .. t_k micros with -1 sentinels, depth,
   *         tte_us = t_k − t_1 when fully converted else -1); one row
   *         per user that reached step 1
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.length >= 2,
      s"funnel: need at least 2 steps, got ${steps.length}")
    require(steps.distinct.length == steps.length,
      s"funnel: steps must be distinct, got ${steps.mkString(", ")}")
    require(windowUs > 0,
      s"funnel: windowUs must be positive, got $windowUs")
    val us = floor(Sessions.asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    val e = events.select(col(userCol).cast("long").as("user_id"),
      col(typeCol).cast("string").as("__type"), us.as("__us"))

    var ms = e.filter(col("__type") === steps.head)
      .groupBy("user_id").agg(min("__us").as("t_1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val k = i + 1
      val hit = e.filter(col("__type") === step)
        .join(ms.select(
            Seq("user_id", s"t_$i", "t_1").distinct.map(col): _*),
          "user_id")
        .filter(col("__us") > col(s"t_$i") &&
          col("__us") <= col("t_1") + lit(windowUs))
        .groupBy("user_id").agg(min("__us").as(s"t_$k"))
      ms = ms.join(hit, Seq("user_id"), "left")
    }
    val k = steps.length
    val depth = steps.indices.drop(1).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L)
    }
    ms.withColumn("depth", depth)
      .withColumn("tte_us",
        when(col(s"t_$k").isNotNull, col(s"t_$k") - col("t_1"))
          .otherwise(lit(-1L)))
      .select(col("user_id") +:
        steps.indices.map(i =>
          coalesce(col(s"t_${i + 1}"), lit(-1L)).as(s"t_${i + 1}")) :+
        col("depth") :+ col("tte_us"): _*)
  }
}
