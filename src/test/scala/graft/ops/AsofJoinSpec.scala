package graft.ops

import graft.SparkTestBase

/**
 * Distributed merge-asof (X58): closed-form matches, inclusive vs
 * strict equality, tolerance windows, unmatched nulls, deterministic
 * same-ts tie-break, null handling, and partition invariance.
 */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val right = Seq(
    (1L, 10L, "a", 100L), (1L, 20L, "b", 200L), (2L, 15L, "c", 300L))
    .toDF("k", "ts", "v", "x")
  private val left = Seq(
    (1L, 5L, "l0"), (1L, 15L, "l1"), (1L, 20L, "l2"), (2L, 40L, "l3"),
    (3L, 7L, "l4"))
    .toDF("k", "ts", "tag")

  private def run(strict: Boolean, tol: Option[Long] = None,
      lparts: Int = 4, rparts: Int = 3) =
    AsofJoin.asofJoin(left.repartition(lparts), right.repartition(rparts),
      "k", "ts", "ts", Seq("v", "x"), strict = strict, tolerance = tol)
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4)), Option(r.get(5)))).toSeq

  test("inclusive (merge_asof default): rightTs <= leftTs, latest wins, " +
      "unmatched rows keep nulls") {
    assert(run(strict = false) === Seq(
      (1L, 5L, "l0", None, None, None),          // nothing at/before 5
      (1L, 15L, "l1", Some(10L), Some("a"), Some(100L)),
      (1L, 20L, "l2", Some(20L), Some("b"), Some(200L)), // equal ts matches
      (2L, 40L, "l3", Some(15L), Some("c"), Some(300L)),
      (3L, 7L, "l4", None, None, None)))         // key with no right rows
  }

  test("strict: rightTs < leftTs — the equal-ts right row is excluded") {
    val r = run(strict = true)
    assert(r(2) === ((1L, 20L, "l2", Some(10L), Some("a"), Some(100L))))
    assert(r(1) === ((1L, 15L, "l1", Some(10L), Some("a"), Some(100L))))
  }

  test("tolerance bounds the lookback window") {
    val r = run(strict = false, tol = Some(5L))
    // l1@15 matches a@10 (gap 5 <= 5); l3@40 vs c@15 (gap 25) does not
    assert(r(1)._4 === Some(10L))
    assert(r(3) === ((2L, 40L, "l3", None, None, None)))
  }

  test("same-(key,ts) right duplicates resolve to the largest payload " +
      "tuple, invariantly across partitionings") {
    val dupR = Seq((1L, 10L, "a", 1L), (1L, 10L, "z", 2L),
      (1L, 10L, "m", 3L)).toDF("k", "ts", "v", "x")
    val l = Seq((1L, 11L, "q")).toDF("k", "ts", "tag")
    def go(p: Int) = AsofJoin.asofJoin(l, dupR.repartition(p), "k", "ts",
      "ts", Seq("v", "x")).collect().map(r => (r.getString(4),
      r.getLong(5))).toSeq
    assert(go(1) === Seq(("z", 2L))) // "z" sorts last lexicographically
    assert(go(5) === go(1))
  }

  test("null right keys/timestamps never match; null left ts emits " +
      "unmatched; output is partition-invariant") {
    val nr = right.unionByName(Seq((1L, 999L, "bad", 9L)).toDF("k", "ts",
      "v", "x").withColumn("ts", org.apache.spark.sql.functions
      .lit(null).cast("long")))
    val nl = left.unionByName(Seq((1L, 999L, "lnull")).toDF("k", "ts",
      "tag").withColumn("ts", org.apache.spark.sql.functions
      .lit(null).cast("long")))
    val out = AsofJoin.asofJoin(nl, nr, "k", "ts", "ts", Seq("v", "x"))
      .collect()
    assert(out.length === nl.count())
    val nullRow = out.find(_.isNullAt(1)).get
    assert(nullRow.isNullAt(3) && nullRow.isNullAt(4))
    assert(run(strict = false, lparts = 1, rparts = 1) ===
      run(strict = false, lparts = 7, rparts = 5))
  }

  test("forward direction: earliest rightTs >= leftTs (or > when " +
      "strict), tolerance bounds the lookahead, partition-invariant") {
    def fwd(strict: Boolean, tol: Option[Long] = None, p: Int = 4) =
      AsofJoin.asofJoinForward(left.repartition(p), right.repartition(3),
        "k", "ts", "ts", Seq("v", "x"), strict = strict, tolerance = tol)
        .orderBy("k", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getString(4)))).toSeq
    assert(fwd(strict = false) === Seq(
      (1L, 5L, "l0", Some(10L), Some("a")),   // earliest at/after 5
      (1L, 15L, "l1", Some(20L), Some("b")),
      (1L, 20L, "l2", Some(20L), Some("b")),  // equal ts matches
      (2L, 40L, "l3", None, None),            // nothing after 40
      (3L, 7L, "l4", None, None)))
    // strict: the equal-ts right row is excluded → nothing after 20
    assert(fwd(strict = true)(2) === ((1L, 20L, "l2", None, None)))
    // tolerance: l0@5 → a@10 is gap 5; tol 4 kills it
    assert(fwd(strict = false, tol = Some(4L)).head ===
      ((1L, 5L, "l0", None, None)))
    assert(fwd(strict = false, p = 9) === fwd(strict = false, p = 1))
  }

  test("output column collisions are rejected loudly — left asof_*, " +
      "duplicate payloads, and a payload named ts") {
    val l2 = left.withColumn("asof_ts",
      org.apache.spark.sql.functions.lit(1L))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l2, right, "k", "ts", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("asof_"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "k", "ts", "ts", Seq("v", "v"))
    }
    assert(e2.getMessage.contains("duplicate"))
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "k", "ts", "ts", Seq("ts", "v"))
    }
    assert(e3.getMessage.contains("asof_ts"))
  }

  test("nearest direction: closer side wins, ties go backward, " +
      "tolerance bounds both sides, one-sided matches fall through") {
    val l2 = Seq((1L, 5L, 100L), (1L, 14L, 101L), (1L, 16L, 102L),
      (1L, 15L, 103L), (1L, 40L, 104L), (3L, 7L, 105L))
      .toDF("k", "ts", "lid")
    def run(tol: Option[Long], parts: Int = 4) =
      AsofJoin.asofJoinNearest(l2.repartition(parts),
        right.repartition(3), "k", "ts", "ts", Seq("v", "x"), "lid",
        tolerance = tol)
        .orderBy("lid").collect()
        .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getString(4)))).toSeq
    // right k=1: a@10, b@20
    assert(run(None) === Seq(
      (100L, Some(10L), Some("a")),  // only forward is closer? 5→10 fwd only
      (101L, Some(10L), Some("a")),  // gap 4 back vs 6 fwd → back
      (102L, Some(20L), Some("b")),  // gap 6 back vs 4 fwd → fwd
      (103L, Some(10L), Some("a")),  // tie (5 vs 5) → backward
      (104L, Some(20L), Some("b")),  // nothing forward → backward
      (105L, None, None)))           // key with no right rows
    // tolerance 4: lid 100 (gap 5 fwd), 103 (gap 5 both sides) and
    // 104 (gap 20 back) drop out
    assert(run(Some(4L)) === Seq(
      (100L, None, None),
      (101L, Some(10L), Some("a")),
      (102L, Some(20L), Some("b")),
      (103L, None, None),
      (104L, None, None),
      (105L, None, None)))
    assert(run(None, parts = 9) === run(None, parts = 1))
  }

  test("binary keys are rejected loudly — Array[Byte] compares by " +
      "reference in the merge pass, which would silently drop matches") {
    import org.apache.spark.sql.functions.{col, encode}
    val lb = left.withColumn("k", encode(col("k").cast("string"), "utf-8"))
    val rb = right.withColumn("k", encode(col("k").cast("string"), "utf-8"))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(lb, rb, "k", "ts", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("binary"))
  }

  private def chainMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(Option(c.getMessage).getOrElse(""))
      .append('\n'); c = c.getCause }
    sb.toString
  }

  test("nearest fails loudly on a duplicate leftIdCol — silent output " +
      "duplication is not an option") {
    val l2 = Seq((1L, 14L, 101L), (1L, 16L, 101L), (1L, 5L, 100L))
      .toDF("k", "ts", "lid")
    val e = intercept[Throwable] {
      AsofJoin.asofJoinNearest(l2, right, "k", "ts", "ts", Seq("v"),
        "lid").collect()
    }
    assert(chainMessages(e).contains("duplicate leftIdCol"),
      chainMessages(e))
  }

  test("nearest fails loudly on a null leftIdCol — a null id would " +
      "silently lose its forward match in the pick join") {
    val l2 = Seq((1L, 14L, java.lang.Long.valueOf(101L)),
      (1L, 16L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "ts", "lid")
    val e = intercept[Throwable] {
      AsofJoin.asofJoinNearest(l2, right, "k", "ts", "ts", Seq("v"),
        "lid").collect()
    }
    assert(chainMessages(e).contains("null leftIdCol"),
      chainMessages(e))
  }

  test("an overflowing time gap counts as beyond tolerance, not as a " +
      "match (sentinel far-past right ts vs epoch-scale left ts)") {
    val r = Seq((1L, -9000000000000000000L, "sentinel"))
      .toDF("k", "ts", "v")
    val l = Seq((1L, 1700000000000000000L, "ev")).toDF("k", "ts", "tag")
    // unbounded lookback still matches the sentinel...
    val open = AsofJoin.asofJoin(l, r, "k", "ts", "ts", Seq("v"))
      .collect().head
    assert(open.getString(4) === "sentinel")
    // ...but ANY tolerance must reject it (the true gap ~1.07e19
    // overflows Long; a wrapped-negative gap must not read as small)
    val bounded = AsofJoin.asofJoin(l, r, "k", "ts", "ts", Seq("v"),
      tolerance = Some(1000000000L)).collect().head
    assert(bounded.isNullAt(3) && bounded.isNullAt(4))
  }
}
