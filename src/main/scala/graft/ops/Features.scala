package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
   * sums are exact Longs with loud overflow (`Math.addExact`). The
   * frame is value-based ([us−W, us−1]), so equal-timestamp rows get
   * identical frames on any partitioning — the output is
   * bit-deterministic and replays exactly as a SQL RANGE frame.
   *
   * Scale shape: ONE hash exchange on the user column, a spill-safe
   * in-partition sort, and a NARROW two-pointer slide — no self-join,
   * no interval explode (the per-event window is a frame, not a join —
   * contrast [[Intervals.rangeJoin]], which is for windows that are
   * ROWS of their own table). The slide keeps running totals and
   * SUBTRACTS on eviction (the same arithmetic the streaming form
   * [[graft.streaming.StreamPipeline.trailingStream]] uses), so the
   * cost is O(n) per user regardless of frame occupancy — a dense hot
   * timeline pays its scan, not O(events × frame) re-aggregation (the
   * r18 `SkewCheck trail` measured 162 s for Spark's non-retracting
   * RANGE-frame aggregate on an 8M-row hot user; this shape is
   * scan-linear on the same input). Memory per task is bounded by the
   * densest single window's occupancy (the events inside one W-span),
   * not the timeline — and UNLIKE Spark's window machinery this
   * buffer does not spill, so `maxWindowOccupancy` fails LOUDLY
   * (default 2²⁴ ≈ 16.7M events ≈ 700 MB of buffer) instead of
   * silently OOMing a task; a timeline that dense relative to W wants
   * a smaller window or the streaming form. A hot user still
   * serializes through one task — the inherent cost of that user's
   * timeline, same note as [[AsofJoin]]. Rows with a null
   * id/user/timestamp fail loudly (the
   * [[graft.streaming.StreamPipeline.trailingStream]] contract).
   *
   * @return (id, user_id, us, n_trail, n_vals_trail, v_sum_q_trail) —
   *         counts 0 and sum 0 for an empty window (a user's first
   *         event), never null
   */
  def trailingFeatures(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, valueCol: String,
      windowUs: Long, maxWindowOccupancy: Int = 1 << 24): DataFrame = {
    require(windowUs > 0,
      s"trailingFeatures: windowUs must be positive, got $windowUs")
    require(maxWindowOccupancy > 0,
      "trailingFeatures: maxWindowOccupancy must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val w = windowUs
    val maxBuf = maxWindowOccupancy
    val us = floor(Sessions.asNanos(events, tsCol).cast("decimal(38,0)")
      / lit(1000L)).cast("long")
    val vq = Profiler.quantize(valueCol)
    events
      .select(col(idCol).cast("long").as("id"),
        col(userCol).cast("long").as("user_id"), us.as("us"),
        coalesce(vq, lit(0L)).as("__vq"),
        vq.isNotNull.as("__has"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us")
      .as[(Long, Long, Long, Long, Boolean)]
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[(Long, Long, Long, Long, Long, Long)] {
          // the window's events for the CURRENT user: (us, vq, has)
          private val buf =
            new scala.collection.mutable.ArrayDeque[(Long, Long, Boolean)]()
          private var curUser = 0L
          private var hasUser = false
          private var n = 0L; private var nv = 0L; private var sum = 0L
          // emitted rows of the in-flight equal-(user, us) group
          private val out =
            new scala.collection.mutable.ArrayDeque[
              (Long, Long, Long, Long, Long, Long)]()
          def hasNext: Boolean = out.nonEmpty || in.hasNext
          def next(): (Long, Long, Long, Long, Long, Long) = {
            if (out.isEmpty) {
              val (user, ts) = { val h = in.head; (h._2, h._3) }
              if (!hasUser || user != curUser) {
                buf.clear(); n = 0L; nv = 0L; sum = 0L
                curUser = user; hasUser = true
              }
              // two-pointer evict: head leaves once it falls strictly
              // before [ts − W, ts − 1]; ts − head.us never overflows
              // (head.us ≤ ts by the in-partition sort)
              while (buf.nonEmpty && ts - buf.head._1 > w) {
                val h = buf.removeHead()
                n -= 1
                if (h._3) { nv -= 1; sum = Math.subtractExact(sum, h._2) }
              }
              // every row of the equal-ts group sees the PRE-group
              // totals (ties share a timestamp — a live scorer could
              // not have counted them), then the whole group ages
              // into the window buffer
              val gn = n; val gnv = nv; val gsum = sum
              while (in.hasNext && in.head._2 == user &&
                  in.head._3 == ts) {
                val r = in.next()
                out.append((r._1, user, ts, gn, gnv, gsum))
                buf.append((ts, r._4, r._5))
                n += 1
                if (r._5) { nv += 1; sum = Math.addExact(sum, r._4) }
                // this buffer does not spill (unlike Spark's window
                // machinery) — fail loudly, never OOM silently
                if (buf.length > maxBuf)
                  throw new IllegalStateException(
                    s"trailingFeatures: user $user holds more than " +
                      s"$maxBuf events inside one $w-us window - " +
                      "shrink the window, raise maxWindowOccupancy, " +
                      "or use StreamPipeline.trailingStream")
              }
            }
            out.removeHead()
          }
        }
      }
      .toDF("id", "user_id", "us", "n_trail", "n_vals_trail",
        "v_sum_q_trail")
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
   * aggregate — CROSS-JOINED INSIDE THE BROADCAST BUILD SIDE
   * (|categories| × 1 rows, never the corpus) — then the per-row
   * encoding attaches via a BROADCAST join of that tiny table; the
   * corpus itself is never shuffled and the encode is a codegen
   * projection over the scan. The whole thing is LAZY: calling this
   * function builds a plan and runs no job (the prior is an in-plan
   * column, not a driver-side `.head()`), so the input is evaluated
   * only when the returned frame is. Categorical columns are
   * bounded-cardinality by definition; a caller feeding an id-like
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
    val globals = df.agg(
      sum(yq.cast("decimal(38,0)")).cast("double").as("__gs"),
      count(yq).as("__gn"))
    val stats = df.groupBy(col(catCol).cast("string").as("__cat"))
      .agg(sum(yq.cast("decimal(38,0)")).cast("long").as("__sum_q"),
        count(yq).as("__n"))
    // the same IEEE sequence the r18 driver-side prior used:
    // gs_double / (gn_double * 1048576.0) — bit-identical results
    val prior = when(col("__gn") === 0L, lit(null).cast("double"))
      .otherwise(col("__gs") /
        (col("__gn").cast("double") * lit(1048576.0)))
    val ownQ = yq
    val num = (coalesce(col("__sum_q"), lit(0L)) -
      coalesce(ownQ, lit(0L))).cast("double") / lit(1048576.0) +
      lit(smoothing) * prior
    val den = (col("__n") - when(ownQ.isNotNull, 1L).otherwise(0L))
      .cast("double") + lit(smoothing)
    df.join(broadcast(stats.crossJoin(globals)),
        col(catCol).cast("string") <=> col("__cat"), "left")
      .withColumn("enc",
        when(prior.isNull, lit(null).cast("double"))
          .otherwise(num / den))
      .drop("__cat", "__sum_q", "__n", "__gs", "__gn")
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
