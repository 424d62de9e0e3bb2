package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Exact distributed quantiles (X50): agreement with a driver-side
 * sorted reference (the definition), multi-iteration range narrowing,
 * ties, nulls, and partition invariance.
 */
class ProfilerSpec extends SparkTestBase {
  import spark.implicits._

  private def q20(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  /** The definition the profiler must match: value at 1-indexed rank
    * (n−1)·pct/100 + 1 of the ascending non-null fixed-point values. */
  private def refQuantile(vs: Seq[Double], pct: Int): Long = {
    val s = vs.map(q20).sorted
    s(((s.length - 1).toLong * pct / 100L).toInt)
  }

  test("profile matches the sorted-reference definition (with nulls, " +
      "ties, and pct 0/100) and is partition-invariant") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(997)(math.floor(rng.nextDouble() * 500) / 10.0)
    val rows = vals.map(v => (Some(v), v * 3.5)) ++
      Seq.fill(13)((Option.empty[Double], 1.0))
    val pcts = Seq(0, 25, 50, 75, 95, 100)
    def run(parts: Int) =
      Profiler.profile(rows.toDF("a", "b").repartition(parts),
        Seq("a", "b"), pcts).orderBy("col_name").collect()
    val r = run(4)
    val a = r(0); val b = r(1)
    assert(a.getAs[String]("col_name") === "a")
    assert(a.getAs[Long]("n") === 997L)
    assert(a.getAs[Long]("nulls") === 13L)
    assert(a.getAs[Long]("min_q") === vals.map(q20).min)
    assert(a.getAs[Long]("max_q") === vals.map(q20).max)
    assert(a.getAs[Long]("sum_q") === vals.map(q20).sum)
    pcts.foreach { p =>
      assert(a.getAs[Long](s"p${p}_q") === refQuantile(vals, p),
        s"column a pct $p")
      assert(b.getAs[Long](s"p${p}_q") ===
        refQuantile(rows.map(_._2), p), s"column b pct $p")
    }
    assert(b.getAs[Long]("nulls") === 0L)
    // bit-identical under a different partitioning
    assert(run(1).map(_.toSeq).toSeq === r.map(_.toSeq).toSeq)
  }

  test("wide-range column forces multiple narrowing iterations and " +
      "stays exact") {
    // range ≈ 8e12 in fixed-point units ⇒ 65536-wide buckets twice
    // before width-1 resolution (3 iterations)
    val rng = new scala.util.Random(11)
    val vals = Seq.fill(2003)(rng.nextDouble() * 8.0e6 - 4.0e6)
    val df = vals.map(Tuple1(_)).toDF("x").repartition(8)
    val r = Profiler.profile(df, Seq("x"), Seq(25, 50, 75)).head()
    Seq(25, 50, 75).foreach { p =>
      assert(r.getAs[Long](s"p${p}_q") === refQuantile(vals, p), s"pct $p")
    }
  }

  test("heavy ties resolve to the tied value; n=1 returns it for " +
      "every pct") {
    val df = (Seq.fill(500)(2.5) ++ Seq.fill(10)(9.0) ++ Seq(1.0))
      .map(Tuple1(_)).toDF("x").repartition(5)
    val r = Profiler.profile(df, Seq("x"), Seq(50, 99)).head()
    assert(r.getAs[Long]("p50_q") === q20(2.5))
    assert(r.getAs[Long]("p99_q") === q20(9.0))
    val one = Seq(Tuple1(42.25)).toDF("x")
    val r1 = Profiler.profile(one, Seq("x"), Seq(0, 50, 100)).head()
    Seq(0, 50, 100).foreach(p =>
      assert(r1.getAs[Long](s"p${p}_q") === q20(42.25)))
  }

  test("correlations: exact ±1 on affine pairs, 0 on a constant, " +
      "pairwise-complete nulls, partition-invariant (X55)") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 400).map { i =>
      val x = rng.nextDouble() * 100
      // y = 2x+1 exactly representable? use quantization-friendly grid
      val xq = math.floor(x * 16) / 16.0
      (Some(xq), Some(2.0 * xq + 1.0), Some(-3.0 * xq),
        Some(5.0), if (i % 10 == 0) None else Some(rng.nextDouble()))
    }
    val df = rows.toDF("x", "y2", "yn", "const", "z")
    def run(parts: Int) =
      Profiler.correlations(df.repartition(parts),
        Seq("x", "y2", "yn", "const", "z"))
        .orderBy("col_a", "col_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
    val r = run(4)
    val m = r.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(m(("x", "y2"))._2 === 1.0)  // perfectly affine, positive
    assert(m(("x", "yn"))._2 === -1.0) // perfectly affine, negative
    assert(m(("x", "const"))._2 === 0.0) // zero variance → defined 0
    assert(m(("x", "z"))._1 === 360L) // pairwise-complete n drops nulls
    assert(math.abs(m(("x", "z"))._2) < 0.2) // independent-ish
    assert(run(1) === r)
  }

  test("an entirely-null column is rejected loudly") {
    val df = Seq((Option.empty[Double], 1.0), (None, 2.0))
      .toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profiler.profile(df, Seq("a"), Seq(50))
    }
    assert(e.getMessage.contains("entirely null"))
  }

  test("NaN rows are missing values, not zeros: excluded from n/min/" +
      "max/sum, quantiles, correlations, and drift bins") {
    val clean = Seq(5.0, 10.0, 15.0, 20.0, 25.0)
    val df = (clean.map(v => (Some(v), Some(v * 2))) ++
      Seq((Some(Double.NaN), Some(40.0)), (Some(Double.NaN), None)))
      .toDF("a", "b")
    val r = Profiler.profile(df, Seq("a"), Seq(0, 50, 100)).head()
    assert(r.getAs[Long]("n") === 5L)     // NaN not counted as value 0
    assert(r.getAs[Long]("nulls") === 2L) // ...but as missing
    assert(r.getAs[Long]("min_q") === q20(5.0))
    assert(r.getAs[Long]("sum_q") === clean.map(q20).sum)
    assert(r.getAs[Long]("p50_q") === q20(15.0))
    val c = Profiler.correlations(df, Seq("a", "b")).head()
    assert(c.getAs[Long]("n") === 5L)      // pairwise-complete drops NaN
    assert(c.getAs[Double]("corr") === 1.0) // exact affine, NaN-free
    val drift = Profiler.driftPsi(df, df, "a", 5)
      .agg(sum("base_n"), sum("cur_n")).head()
    assert(drift.getLong(0) === 5L && drift.getLong(1) === 5L)
  }

  test("non-finite and overflow-range inputs fail fast instead of " +
      "silently corrupting the narrowing walk") {
    val inf = Seq(1.0, 2.0, Double.PositiveInfinity).map(Tuple1(_))
      .toDF("v")
    val e1 = intercept[IllegalArgumentException] {
      Profiler.profile(inf, Seq("v"), Seq(50))
    }
    assert(e1.getMessage.contains("±2^62"))
    // |v| past ~4.4e12 overflows hi−lo after the 2^20 scale
    val huge = Seq(-9.0e12, 0.0, 9.0e12).map(Tuple1(_)).toDF("v")
    val e2 = intercept[IllegalArgumentException] {
      Profiler.profile(huge, Seq("v"), Seq(50))
    }
    assert(e2.getMessage.contains("±2^62"))
    val e3 = intercept[IllegalArgumentException] {
      Profiler.correlations(inf.withColumn("w", col("v") * 2),
        Seq("v", "w"))
    }
    assert(e3.getMessage.contains("co-moment"))
    val clean = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val e4 = intercept[IllegalArgumentException] {
      Profiler.driftPsi(clean, inf, "v", 4).collect()
    }
    assert(e4.getMessage.contains("±2^62"))
  }

  test("driftPsi: closed-form bin counts and terms on a shifted " +
      "distribution, partition-invariant (X56)") {
    // base 1..100 with bins=4: decile... quartile edges at ranks
    // (99·25/100+1)=25, 50, 75 → values 25, 50, 75; current 51..150
    // lands 0/0/25/75 by the strict-greater rule (75 sticks low)
    val base = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val cur = (51 to 150).map(i => Tuple1(i.toDouble)).toDF("v")
    def run(p1: Int, p2: Int) =
      Profiler.driftPsi(base.repartition(p1), cur.repartition(p2),
        "v", 4).orderBy("bin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    val r = run(3, 5)
    assert(r.map(t => (t._1, t._2, t._3)) === Seq(
      (0L, 25L, 0L), (1L, 25L, 0L), (2L, 25L, 25L), (3L, 25L, 75L)))
    def term(nb: Long, nc: Long): Double = {
      val pb = (nb + 0.5) / 102.0; val pc = (nc + 0.5) / 102.0
      BigDecimal((pc - pb) * math.log(pc / pb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    r.foreach { case (b, nb, nc, t) =>
      assert(t === term(nb, nc), s"bin $b") }
    assert(r.map(_._4).sum > 0.25) // the standard "drifted" reading
    assert(run(1, 1) === r)
  }

  test("driftPsiMulti: the whole-schema audit equals per-column " +
      "driftPsi exactly, including nulls and mismatched drift shapes") {
    val base = (1 to 100).map(i => (Some(i.toDouble),
      if (i % 9 == 0) None else Some((i % 10).toDouble))).toDF("v", "w")
    val cur = (51 to 150).map(i => (Some(i.toDouble),
      Some((i % 5).toDouble))).toDF("v", "w")
    val multi = Profiler.driftPsiMulti(base, cur, Seq("v", "w"), 4)
      .orderBy("col_name", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    def single(c: String) = Profiler.driftPsi(base, cur, c, 4)
      .orderBy("bin").collect()
      .map(r => (c, r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(multi === (single("v") ++ single("w")))
    val e = intercept[IllegalArgumentException] {
      Profiler.driftPsiMulti(base, cur, Seq("v", "v"), 4)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("driftPsi: identical snapshots score exactly zero; smoothing " +
      "keeps empty bins finite; non-divisor bins rejected") {
    val df = (1 to 60).map(i => Tuple1((i % 7).toDouble)).toDF("v")
    val same = Profiler.driftPsi(df, df, "v", 5).collect()
    assert(same.forall(_.getDouble(3) === 0.0))
    // current entirely above the base range → upper bin only; the
    // empty-bin terms stay finite via the +0.5 smoothing
    val hi = (1 to 40).map(i => Tuple1(1000.0 + i)).toDF("v")
    val shift = Profiler.driftPsi(df, hi, "v", 5)
      .orderBy("bin").collect()
    assert(shift.forall(r => !r.getDouble(3).isNaN
      && !r.getDouble(3).isInfinite))
    assert(shift.last.getLong(2) === 40L)
    val e = intercept[IllegalArgumentException] {
      Profiler.driftPsi(df, df, "v", 7)
    }
    assert(e.getMessage.contains("divide 100"))
  }

  test("bucketize: strict-greater edges (ties stick low), NaN/null → " +
      "null bucket, frozen train-side edges apply unchanged to new " +
      "data, unsorted edges rejected") {
    import spark.implicits._
    val u = 1.0 / 1048576.0
    // edges at q=2 and q=5: values ≤2 → bucket 0, (2,5] → 1, >5 → 2
    val df = Seq((1L, Some(1 * u)), (2L, Some(2 * u)), (3L, Some(3 * u)),
      (4L, Some(5 * u)), (5L, Some(6 * u)), (6L, None),
      (7L, Some(Double.NaN))).toDF("id", "v")
    val got = graft.ops.Profiler.bucketize(df, "v", Seq(2L, 5L))
      .select("id", "v_bucket").orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toSeq
    assert(got === Seq((1L, Long.box(0L)), (2L, Long.box(0L)),
      (3L, Long.box(1L)), (4L, Long.box(1L)), (5L, Long.box(2L)),
      (6L, null), (7L, null)))
    // train/serve freeze: edges from a train half bucket a serve half
    // identically whether computed before or after the serve rows exist
    val train = spark.range(100).select($"id",
      ($"id" % 17 * 3).cast("double").as("v"))
    val edges = graft.ops.Profiler.psiEdges(train, "v", bins = 4)
    val serve = spark.range(100, 160).select($"id",
      ($"id" % 23 * 2).cast("double").as("v"))
    val a = graft.ops.Profiler.bucketize(serve, "v", edges)
      .select("id", "v_bucket").collect().map(r => (r.getLong(0),
        r.getLong(1))).toSet
    // identical edges → identical buckets, independent of serve content
    val b = graft.ops.Profiler.bucketize(serve.limit(30), "v", edges)
      .select("id", "v_bucket").collect().map(r => (r.getLong(0),
        r.getLong(1))).toSet
    assert(b.subsetOf(a))
    intercept[IllegalArgumentException] {
      graft.ops.Profiler.bucketize(df, "v", Seq(5L, 2L))
    }
  }

  test("rankNormalize: hand-computed midrank percentiles with ties, " +
      "null/NaN → null pct, singleton group → 0.5, partition-" +
      "invariant (X69)") {
    // group a: scores 1, 2, 2, 4 → pct = 1/8, 4/8, 4/8, 7/8
    // group b: single row → 1/2; nulls and NaNs carry null pct
    val rows = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "a", 4.0),
      (5L, "b", 9.0), (6L, "a", Double.NaN))
    def run(parts: Int) =
      graft.ops.Profiler.rankNormalize(
        rows.toDF("id", "src", "score").repartition(parts),
        "id", "src", "score")
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(3)) null else Double.box(r.getDouble(3))))
        .toSeq
    val got = run(4)
    assert(got === Seq(
      (1L, "a", Double.box(0.125)), (2L, "a", Double.box(0.5)),
      (3L, "a", Double.box(0.5)), (4L, "a", Double.box(0.875)),
      (5L, "b", Double.box(0.5)), (6L, "a", null)), got.toString)
    assert(run(1) === got)
    // the calibration property the op exists for: a per-source top-50%
    // cut is one global predicate even when raw scales differ wildly
    val skewed = Seq.tabulate(40)(i =>
      (i.toLong, "lo", i.toDouble / 100)) ++
      Seq.tabulate(40)(i => (100L + i, "hi", 1000.0 + i))
    val kept = graft.ops.Profiler.rankNormalize(
        skewed.toDF("id", "src", "score"), "id", "src", "score")
      .filter(col("pct") > 0.5).groupBy("group").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("lo" -> 20L, "hi" -> 20L), kept.toString)
  }
  // ---- groupClipEdges + winsorize (X78) ----

  test("groupClipEdges: exact-rank per-group edges ((n-1)p div 100 + 1 " +
      "over the non-null ascending order); all-missing groups get " +
      "null edges (X78)") {
    val df = (
      // group a: values 0..9 → n=10, p20 rank = 9*20/100+1 = 2 → 1.0;
      // p80 rank = 9*80/100+1 = 8 → 7.0
      (0 until 10).map(i => (s"a", i.toDouble)) ++
      // group b: single value → both edges = it
      Seq(("b", 42.0)) ++
      // group c: all NaN → no edges
      Seq(("c", Double.NaN), ("c", Double.NaN))
    ).toDF("g", "v")
    val q = (x: Double) => math.floor(x * 1048576.0 + 0.5).toLong
    val e = Profiler.groupClipEdges(df, "g", "v", 20, 80)
      .orderBy("group").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toSeq
    assert(e === Seq(("a", Long.box(q(1.0)), Long.box(q(7.0))),
      ("b", Long.box(q(42.0)), Long.box(q(42.0)))))
    intercept[IllegalArgumentException] {
      Profiler.groupClipEdges(df, "g", "v", 80, 20)
    }
  }

  test("winsorize: integer clip to frozen edges, nulls stay null, " +
      "unknown groups pass through with visible null edges, frozen " +
      "train edges apply unchanged to serve data (X78)") {
    val train = (0 until 10).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "g", "v")
    val edges = Profiler.groupClipEdges(train, "g", "v", 20, 80)
    val q = (x: Double) => math.floor(x * 1048576.0 + 0.5).toLong
    // serve frame: below-lo clip, in-range passthrough, above-hi clip,
    // NaN stays null, a group the train never saw passes unclipped
    val serve = Seq((0L, "a", 0.5), (1L, "a", 3.0), (2L, "a", 99.0),
      (3L, "a", Double.NaN), (4L, "zz", 99.0)).toDF("id", "g", "v")
    val r = Profiler.winsorize(serve, "id", "g", "v", edges)
      .orderBy("id").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(5)) null else Long.box(x.getLong(5)),
        x.getBoolean(6))).toSeq
    assert(r === Seq(
      (0L, Long.box(q(1.0)), true),
      (1L, Long.box(q(3.0)), false),
      (2L, Long.box(q(7.0)), true),
      (3L, null, false),
      (4L, Long.box(q(99.0)), false)))
    // serve-time data never moved the boundaries: the train frame
    // winsorizes to the same edges it produced
    val t = Profiler.winsorize(train, "id", "g", "v", edges)
      .agg(min("lo_q"), max("hi_q")).head()
    assert((t.getLong(0), t.getLong(1)) === (q(1.0), q(7.0)))
  }

  test("winsorize is partition-invariant and rejects malformed edge " +
      "tables (X78)") {
    val df = (1L to 60L).map(i =>
      (i, s"g${i % 3}", (i % 11).toDouble)).toDF("id", "g", "v")
    def run(parts: Int) = {
      val d = df.repartition(parts)
      Profiler.winsorize(d, "id", "g", "v",
          Profiler.groupClipEdges(d, "g", "v", 10, 90))
        .orderBy("id").collect()
        .map(x => (x.getLong(0),
          if (x.isNullAt(5)) null else Long.box(x.getLong(5)),
          x.getBoolean(6))).toSeq
    }
    assert(run(1) === run(7))
    intercept[IllegalArgumentException] {
      Profiler.winsorize(df, "id", "g", "v",
        Seq(("a", 1L)).toDF("group", "lo_q"))
    }
  }
  // ---- integrityAudit (X85) ----

  test("integrityAudit: null FKs, orphans, unreferenced PKs, and key " +
      "cardinalities — hand-computed and partition-invariant (X85)") {
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None, None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L, 3L).toDF("pk") // dup PK row: still 3 distinct
    def run(fp: Int, dp: Int) =
      Profiler.integrityAudit(fact.repartition(fp), "fk",
          dim.repartition(dp), "pk")
        .head()
    val r = run(1, 1)
    // 6 fact rows; 2 null FKs; fk 9 is an orphan (1 row); distinct
    // non-null FKs {1, 2, 9} = 3; distinct PKs {1, 2, 3} = 3; PK 3 is
    // never referenced
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((6L, 2L, 1L, 3L, 3L, 1L)))
    val r2 = run(5, 3)
    assert(r.toSeq === r2.toSeq)
  }
  // ---- calibrationTable (X86) ----

  test("calibrationTable: frozen-edge buckets, exact per-bucket " +
      "score/label means, NaN scores in a visible NULL-bucket row, " +
      "partition invariance (X86)") {
    // edges frozen by hand at [2.0q]: bucket 0 = q <= 2.0, bucket 1
    // above; labels 0/1
    val q = (v: Double) => math.floor(v * 1048576.0 + 0.5).toLong
    val edges = Seq(q(2.0))
    val df = Seq(
      (1.0, 0.0), (2.0, 1.0),          // bucket 0: means 1.5, 0.5
      (3.0, 1.0), (5.0, 1.0),          // bucket 1: means 4.0, 1.0
      (Double.NaN, 0.0))               // NULL bucket, label visible
      .toDF("score", "y")
    def run(parts: Int) =
      Profiler.calibrationTable(df.repartition(parts), "score", "y",
          edges)
        .orderBy(col("bucket").asc_nulls_last).collect()
        .map(r => (if (r.isNullAt(0)) null else Long.box(r.getLong(0)),
          r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else Double.box(r.getDouble(3)),
          if (r.isNullAt(4)) null else Double.box(r.getDouble(4))))
        .toSeq
    val got = run(1)
    assert(got === Seq(
      (Long.box(0L), 2L, 2L, Double.box(1.5), Double.box(0.5)),
      (Long.box(1L), 2L, 2L, Double.box(4.0), Double.box(1.0)),
      (null, 1L, 1L, null, Double.box(0.0))))
    assert(run(6) === got)
  }
  // ---- driftPsiByGroup (X87) ----

  test("driftPsiByGroup: identical distributions score exactly 0 per " +
      "bin, a planted shift scores high, current-only groups are " +
      "dropped, NaN excluded, partition-invariant (X87)") {
    val base = (
      (1 to 100).map(i => ("stable", (i % 10).toDouble)) ++
      (1 to 100).map(i => ("shifty", (i % 10).toDouble)) ++
      Seq(("stable", Double.NaN))).toDF("g", "v")
    val cur = (
      (1 to 50).map(i => ("stable", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("shifty", (i % 10).toDouble + 100.0)) ++
      Seq(("newgrp", 1.0))).toDF("g", "v")
    def run(parts: Int) =
      Profiler.driftPsiByGroup(base.repartition(parts),
          cur.repartition(parts), "g", "v", bins = 10)
        .orderBy("group", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
    val got = run(1)
    assert(got.map(_._1).distinct.sorted === Seq("shifty", "stable"))
    assert(got.count(_._1 == "stable") === 10)
    // stable: same shape at half the volume → every smoothed
    // proportion matches to ~1/(2N) — psi terms tiny
    val stablePsi = got.filter(_._1 == "stable").map(_._5).sum
    assert(math.abs(stablePsi) < 0.01, stablePsi.toString)
    // shifty: all current mass lands above every base edge (bin 9)
    val shifty = got.filter(_._1 == "shifty")
    assert(shifty.filter(_._2 == 9L).head._4 === 50L)
    assert(shifty.map(_._5).sum > 1.0, shifty.map(_._5).sum.toString)
    // counts exact; the NaN base row never counted
    assert(got.filter(_._1 == "stable").map(_._3).sum === 100L)
    assert(run(7) === got)
  }
}
