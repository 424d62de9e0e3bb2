package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Bucketed interval (range) join (X72): half-open containment
 * boundaries, single-emit across grain-spanning intervals, keyed and
 * unkeyed matching, the replication guard, and partition invariance.
 *
 * Long timestamp columns are NANOS by the [[Sessions.asNanos]]
 * contract; every literal below is `us * 1000` so the intended
 * microsecond instants read directly.
 */
class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private def us(v: Long): Long = v * 1000L // micros → nanos column value

  private def probe(rows: (Long, Long)*) = // (pid, ts_us)
    rows.map { case (p, t) => (p, us(t)) }.toDF("pid", "ts")

  private def ivs(rows: (Long, Long, Long)*) = // (iid, s_us, e_us)
    rows.map { case (i, s, e) => (i, us(s), us(e)) }
      .toDF("iid", "s", "e")

  private def run(p: org.apache.spark.sql.DataFrame,
      i: org.apache.spark.sql.DataFrame, grainUs: Long,
      keys: Seq[String] = Nil, maxGrains: Int = 4096) =
    Intervals.rangeJoin(p, "ts", i, "s", "e", grainUs, keys, maxGrains)
      .select("iid", "pid", "offset_us").orderBy("iid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("half-open [s, e): ts == start matches at offset 0, ts == end " +
      "does not") {
    val r = run(probe((1L, 100L), (2L, 150L), (3L, 99L)),
      ivs((7L, 100L, 150L)), grainUs = 10L)
    assert(r === Seq((7L, 1L, 0L)))
  }

  test("an interval spanning many grain cells matches each contained " +
      "probe exactly once; outside probes never match") {
    val p = probe((1L, 0L), (2L, 5L), (3L, 19L), (4L, 20L), (5L, 35L))
    val r = run(p, ivs((9L, 0L, 20L)), grainUs = 3L)
    assert(r === Seq((9L, 1L, 0L), (9L, 2L, 5L), (9L, 3L, 19L)))
  }

  test("overlapping intervals each emit their own match row") {
    val r = run(probe((1L, 10L)), ivs((5L, 0L, 20L), (6L, 5L, 15L)),
      grainUs = 4L)
    assert(r === Seq((5L, 1L, 10L), (6L, 1L, 5L)))
  }

  test("equi-keys gate matches: same cell, different key → no row") {
    val p = Seq((1L, us(10L), "a"), (2L, us(10L), "b"))
      .toDF("pid", "ts", "k")
    val i = Seq((5L, us(0L), us(20L), "a")).toDF("iid", "s", "e", "k")
    val r = Intervals.rangeJoin(p, "ts", i, "s", "e", 8L, Seq("k"))
      .select("iid", "pid", "offset_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r === Seq((5L, 1L, 10L)))
  }

  test("empty intervals (end <= start) are dropped, not matched at " +
      "their start instant") {
    val r = run(probe((1L, 10L)), ivs((5L, 10L, 10L), (6L, 12L, 11L)),
      grainUs = 4L)
    assert(r === Seq())
  }

  test("the replication guard fails loudly when an interval spans " +
      "more grains than allowed") {
    val ex = intercept[Exception] {
      run(probe((1L, 0L)), ivs((5L, 0L, 100L)), grainUs = 2L,
        maxGrains = 10)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("spans more than 10 grains")))
  }

  test("column collision between sides fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      Intervals.rangeJoin(probe((1L, 0L)), "ts",
        ivs((5L, 0L, 10L)).withColumnRenamed("iid", "pid"),
        "s", "e", 4L)
    }
    assert(ex.getMessage.contains("column collision"))
  }

  test("result is partition-invariant") {
    val p = probe((1L to 40L).map(i => (i, i * 7L % 100L)): _*)
    val i = ivs((1L to 12L).map(j => (j, j * 5L, j * 5L + 13L)): _*)
    val one = run(p.coalesce(1), i.coalesce(1), grainUs = 6L)
    assert(one.nonEmpty)
    assert(run(p.repartition(7), i.repartition(5), grainUs = 6L) === one)
  }
}
