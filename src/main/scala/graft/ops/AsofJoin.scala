package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed point-in-time (as-of) join — for each left row, attach
 * the single most recent right row of the same key with
 * `rightTs <= leftTs` (or `<` in strict mode), optionally within a
 * tolerance window. The feature-store primitive a training pipeline
 * needs for leakage-free feature attachment ("the user's latest
 * snapshot BEFORE this event"): the reference delegates such
 * time-travel joins to its dataframe substrate (pandas
 * `merge_asof`; `data_sources/modin.py`-style per-partition frames),
 * which single-nodes the problem — this is the shuffle-merge form
 * that survives 100 TB.
 *
 * Spark has no native as-of join. The naive encodings both die at
 * scale: a range join explodes to the per-key cross product before
 * filtering, and a window over the unioned table still pays a global
 * per-key sort PLUS carries every left column through the window
 * state. This operator instead does the textbook distributed
 * merge-asof:
 *
 *   1. project both sides onto a shared (key, ts, tag, payload…,
 *      left…) schema and UNION them — no row explosion, ever;
 *   2. ONE hash exchange on the key (`repartition`), so a key's whole
 *      timeline lands in one partition;
 *   3. `sortWithinPartitions(key, ts, tag, payload…)` — Spark's
 *      spill-safe external sort, no global ordering needed;
 *   4. one forward `mapPartitions` pass that carries the last-seen
 *      right payload per key and emits each left row joined to it —
 *      O(1) state, O(n) time, zero additional shuffle.
 *
 * Determinism: ties between right rows on the same (key, ts) resolve
 * to the lexicographically largest payload tuple (they sort last, and
 * last-seen wins) — partitioning/retry invariant. Inclusive vs strict
 * equality is the tag sort order: at equal ts the right row sorts
 * BEFORE the left row when matches may be inclusive, AFTER it when
 * strict, so the single forward pass implements both without
 * branching on time values.
 *
 * Skew note: one key's full history serializes through one task. Keys
 * here are entities (users, customers) whose per-entity event counts
 * are bounded in any curated corpus; a pathological hot key should be
 * pre-aggregated (as the harness query does per (key, ts)) before the
 * join.
 */
object AsofJoin {

  /** The shuffle+sort core, split out so the plan audit can pin its
    * shape: ONE hash exchange on the key and a PARTITION-LOCAL sort
    * (`sortWithinPartitions` — global=false, so no rangepartitioning
    * sampling pass, no global ordering machinery). */
  private[graft] def asofMerged(rProj: DataFrame, lProj: DataFrame,
      payloadCols: Seq[String]): DataFrame = {
    val sortCols = Seq(col("__k"), col("__ts"), col("__tag")) ++
      payloadCols.map(c => col(s"__p_$c"))
    rProj.unionByName(lProj)
      .repartition(col("__k"))
      .sortWithinPartitions(sortCols: _*)
  }

  /**
   * @param left       rows to enrich (all columns carried through)
   * @param right      timeline to attach from
   * @param keyCol     equi-join key column name (same name both sides)
   * @param leftTsCol  left event-time column (LongType)
   * @param rightTsCol right event-time column (LongType)
   * @param payloadCols right columns to attach (emitted as
   *                   `asof_<name>`, plus `asof_ts` = matched right ts)
   * @param strict     false: match `rightTs <= leftTs` (merge_asof
   *                   default); true: `rightTs < leftTs`
   * @param tolerance  max allowed `leftTs - rightTs` (same unit as the
   *                   ts columns); None = unbounded lookback
   * @return left columns + `asof_ts` + `asof_<payload>` (null when no
   *         right row qualifies — the left-join convention)
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payloadCols: Seq[String],
      strict: Boolean = false, tolerance: Option[Long] = None)
      : DataFrame = {
    val spark = left.sparkSession
    require(payloadCols.nonEmpty, "asofJoin: no payload columns")
    require(keyCol.nonEmpty, "asofJoin: empty key column name")
    require(left.schema(leftTsCol).dataType == LongType,
      s"asofJoin: left ts column $leftTsCol must be LongType")
    require(right.schema(rightTsCol).dataType == LongType,
      s"asofJoin: right ts column $rightTsCol must be LongType")
    // the merge pass detects key changes with the boxed value's equals:
    // atomic types compare by content, but BinaryType surfaces as
    // Array[Byte] (reference equality — equal keys would look distinct
    // and silently drop every match) and nested/map types have their
    // own ordering pitfalls; fail loudly like the ts type check does
    Seq(left.schema(keyCol).dataType,
        right.schema(keyCol).dataType).foreach { kt =>
      val contentEquals = kt match {
        case BinaryType | NullType => false
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      }
      require(contentEquals,
        s"asofJoin: key column $keyCol type $kt is not supported — " +
          "use an atomic non-binary key (cast binary keys to " +
          "hex/string first)")
    }
    tolerance.foreach(t => require(t >= 0, s"asofJoin: tolerance $t < 0"))
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("asof_ts") &&
      !payloadCols.exists(p => leftCols.contains(s"asof_$p")),
      "asofJoin: left side already has asof_* output columns")
    require(payloadCols.distinct == payloadCols,
      s"asofJoin: duplicate payload columns in $payloadCols")
    require(!payloadCols.contains("ts"),
      "asofJoin: a payload column named 'ts' collides with the " +
        "built-in asof_ts output — alias it on the right side first")

    // shared union schema: key, ts, tag, payload…, left…
    // at equal ts the INCLUSIVE form must see the right row first
    // (tag 0 < 1), the STRICT form must not see it yet (tag 1 > 0)
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)
    // a right row with a null key or null ts can never match anything —
    // drop it here; a LEFT row with a null key/ts stays and emits
    // unmatched (nulls sort first within a key, before any right row)
    val rProj = right
      .filter(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .select(
      Seq(col(keyCol).as("__k"), col(rightTsCol).as("__ts"),
        lit(rightTag).as("__tag")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType)
          .as(s"__l_$c")): _*)
    val lProj = left.select(
      Seq(col(keyCol).as("__k"), col(leftTsCol).as("__ts"),
        lit(leftTag).as("__tag")) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val merged = asofMerged(rProj, lProj, payloadCols)

    val np = payloadCols.length
    val emitLeftIsTag = leftTag
    val tol = tolerance
    val outSchema = StructType(
      leftCols.map(c => left.schema(c).copy()) ++
        Seq(StructField("asof_ts", LongType, nullable = true)) ++
        payloadCols.map(c =>
          StructField(s"asof_$c", right.schema(c).dataType,
            nullable = true)))
    val rows: RDD[Row] = merged.rdd.mapPartitions { it =>
      var curKey: Any = null
      var haveKey = false
      var lastTs = 0L
      var havePayload = false
      var lastPayload: Array[Any] = null
      it.flatMap { r =>
        val k = r.get(0)
        if (!haveKey || k != curKey) {
          curKey = k; haveKey = true; havePayload = false
          lastPayload = null
        }
        if (r.getInt(2) != emitLeftIsTag) {
          // right row: remember the newest payload for this key
          lastTs = r.getLong(1)
          lastPayload = Array.tabulate[Any](np)(i => r.get(3 + i))
          havePayload = true
          Iterator.empty
        } else {
          // gap computed defensively: in sort order leftTs >= lastTs,
          // so a NEGATIVE difference can only mean Long overflow
          // (sentinel far-past right ts vs epoch-nanos left) — and an
          // overflowing gap is by definition beyond any tolerance
          val ok = !r.isNullAt(1) && havePayload &&
            tol.forall { t =>
              val gap = r.getLong(1) - lastTs
              gap >= 0L && gap <= t
            }
          val nl = r.length - 3 - np
          val out = new Array[Any](nl + 1 + np)
          var i = 0
          while (i < nl) { out(i) = r.get(3 + np + i); i += 1 }
          if (ok) {
            out(nl) = lastTs
            var j = 0
            while (j < np) { out(nl + 1 + j) = lastPayload(j); j += 1 }
          } // else: the asof_* slots stay null
          Iterator.single(Row.fromSeq(scala.collection.immutable
            .ArraySeq.unsafeWrapArray(out)))
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /**
   * Forward as-of join (pandas `merge_asof(direction="forward")`): for
   * each left row, the EARLIEST right row with `rightTs >= leftTs`
   * (`>` when strict), optionally within `rightTs - leftTs <=
   * tolerance`. Time-reversal reduction onto the backward core — both
   * timestamps negate going in, the matched `asof_ts` negates coming
   * out — so the shuffle shape, determinism rule (same-(key,ts) ties →
   * largest payload tuple), and null handling are IDENTICAL to
   * [[asofJoin]] by construction. (A "nearest" direction is the
   * per-row min over this and [[asofJoin]] — two passes by necessity;
   * compose it if needed rather than paying both scans always.)
   *
   * Long.MinValue timestamps are rejected: they have no Long negation.
   */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payloadCols: Seq[String],
      strict: Boolean = false, tolerance: Option[Long] = None)
      : DataFrame = {
    require(left.schema(leftTsCol).dataType == LongType,
      s"asofJoin: left ts column $leftTsCol must be LongType")
    require(right.schema(rightTsCol).dataType == LongType,
      s"asofJoin: right ts column $rightTsCol must be LongType")
    def negTs(df: DataFrame, ts: String): DataFrame = df.withColumn(ts,
      when(col(ts) === Long.MinValue,
        raise_error(lit("asofJoinForward: Long.MinValue ts cannot be " +
          "negated"))).otherwise(-col(ts)).cast("long"))
    val out = asofJoin(negTs(left, leftTsCol), negTs(right, rightTsCol),
      keyCol, leftTsCol, rightTsCol, payloadCols, strict, tolerance)
    out.withColumn(leftTsCol, -col(leftTsCol))
      .withColumn("asof_ts",
        when(col("asof_ts").isNotNull, -col("asof_ts")).cast("long"))
  }

  /**
   * Nearest as-of join (pandas `merge_asof(direction="nearest")`): the
   * CLOSER of the backward (`rightTs <= leftTs`) and forward
   * (`rightTs >= leftTs`) matches by absolute gap; ties go to the
   * backward match (pandas' rule — and at gap 0 both directions see
   * the same (key, ts) right row anyway, since same-(key,ts) ties
   * resolve identically in both). `tolerance` bounds |gap| on each
   * side. Two single-exchange passes by necessity — nearest needs
   * lookback AND lookahead — combined with a per-row pick joined on
   * `leftIdCol`, which therefore MUST be unique and non-null — both
   * are ENFORCED in-plan (fail loudly, like every other precondition
   * here): a null id would silently lose its forward match in the
   * left join, and a duplicate id would silently duplicate output
   * rows. The guard rides the exchange the pick join pays anyway (a
   * map-side-combinable count per id on the forward side), so it
   * costs no extra shuffle. Gap comparison runs in decimal(38,0), so
   * a sentinel far-past/far-future timestamp cannot overflow the pick.
   */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payloadCols: Seq[String],
      leftIdCol: String, tolerance: Option[Long] = None): DataFrame = {
    val b = asofJoin(left, right, keyCol, leftTsCol, rightTsCol,
      payloadCols, strict = false, tolerance)
    val f = asofJoinForward(left, right, keyCol, leftTsCol, rightTsCol,
      payloadCols, strict = false, tolerance)
    // id-integrity guard: group the forward side by the id (one row
    // per LEFT row, so the count IS the id's multiplicity in `left`)
    // and raise in the projection that feeds the pick — the guarded
    // columns are the join key and the pick timestamp, which the
    // optimizer cannot prune away
    val fErr = (what: String) => raise_error(concat(
      lit(s"asofJoinNearest: $what leftIdCol '$leftIdCol' — the " +
        "nearest pick joins backward and forward matches on this id, " +
        "which must be unique and non-null (id: "),
      coalesce(col("__nid").cast("string"), lit("<null>")), lit(")")))
    val fSel = f.select(
      col(leftIdCol).as("__nid"),
      struct(col("asof_ts").as("__f_ts") +:
        payloadCols.map(p => col(s"asof_$p").as(s"__f_$p")): _*)
        .as("__fr"))
      .groupBy(col("__nid"))
      .agg(count(lit(1)).as("__nc"), first(col("__fr")).as("__fr"))
      .select(
        when(col("__nid").isNull, fErr("null")).otherwise(col("__nid"))
          .as("__nid") +:
          when(col("__nc") > 1, fErr("duplicate"))
            .otherwise(col("__fr").getField("__f_ts")).as("__f_ts") +:
          payloadCols.map(p =>
            col("__fr").getField(s"__f_$p").as(s"__f_$p")): _*)
    val dec = "decimal(38,0)"
    val bGap = col(leftTsCol).cast(dec) - col("asof_ts").cast(dec)
    val fGap = col("__f_ts").cast(dec) - col(leftTsCol).cast(dec)
    // materialize the pick ONCE: the per-column overwrites below
    // replace asof_ts, so re-resolving the predicate by name after
    // that would silently compare against the already-picked value
    val useForward = col("asof_ts").isNull ||
      (col("__f_ts").isNotNull && fGap < bGap)
    val picked = b.join(fSel, col(leftIdCol) === col("__nid"), "left")
      .withColumn("__use_f", useForward)
      .withColumn("asof_ts",
        when(col("__use_f"), col("__f_ts")).otherwise(col("asof_ts")))
    payloadCols.foldLeft(picked) { (df, p) =>
      df.withColumn(s"asof_$p",
        when(col("__use_f"), col(s"__f_$p")).otherwise(col(s"asof_$p")))
    }.drop("__nid", "__f_ts", "__use_f")
      .drop(payloadCols.map(p => s"__f_$p"): _*)
  }
}
