package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The round driver captures only the LAST 2000 BYTES of the bench
 * run's stdout and parses the metrics JSON line from there (rounds
 * 1–13 all shipped an unparseable line: sbt's `[info] ` prefix plus a
 * detail payload that outgrew the window). This spec keeps the fix
 * honest as the harness grows: the worst-case compact line must fit
 * the budget for the CURRENT full query set PLUS ten future queries
 * (r14 shipped red because queries were added without re-running it —
 * the headroom margin means a few additions can't flip it silently),
 * and the line must be valid JSON regardless of the JVM's default
 * locale. The bounded `_rest` fallback tier guarantees fit for any
 * set size, so these are now invariants, not a race against growth.
 */
class BenchLineBudgetSpec extends AnyFunSuite {

  private def names = SparkEntry.queries.keys.toSeq.sorted

  test("worst-case bench line for the full query set plus 10 future " +
      "queries fits the 2000-byte driver tail window") {
    // worst realistic per-query median at sf0.1 is two digits before
    // the point; 10 synthetic future names model next round's growth
    val future = (1 to 10).map(i => f"future_query_$i%02d")
    val all = names ++ future
    val worst = all.map(n => (n, 99.99))
    val line = Bench.compactLine(worst, failed = all.size,
      total = 9999.99, sfDir = "/root/testdata/sf0.1")
    val sbtTrailer = 80 // "[success] Total time: ...\n"
    assert(line.length + sbtTrailer <= 2000,
      s"bench line is ${line.length} bytes — with sbt's trailer it " +
        "no longer fits the driver's 2000-byte tail capture")
    assert(!line.contains("\n"))
    assert(line.startsWith("{\"metric\":\"total\""))
    // the full-set header must carry totals even when _rest kicks in
    assert(line.contains("\"value\":9999.99"))
    assert(line.contains(s""""failed":${all.size}"""))
    // the rep policy must be readable from the line alone: every
    // per-query number is a median of `reps` runs (verdict r19 #2)
    assert(line.contains("\"stat\":\"median\""), line.take(120))
    assert(line.contains("\"reps\":3"), line.take(120))
  }

  test("a just-outgrown query set degrades precision instead of " +
      "overflowing") {
    // sized so the 2-decimal form exceeds the budget by < 1 byte/query
    // (the degradation's saving) and the 1-decimal form fits: 88
    // 12-char names at "12.34" ≈ 1930 bytes, at "12.3" ≈ 1842
    val many = (1 to 88).map(i => (f"qry_name_$i%03d", 12.34))
    val two = Bench.compactLine(many.take(1), 0, 12.34, "/x")
    assert(two.contains("\"qry_name_001\":12.34")) // small set: 2 dec
    val line = Bench.compactLine(many, 0, 1085.92, "/x")
    assert(line.contains("\"qry_name_001\":12.3,"),
      s"expected the 1-decimal fallback, got: ${line.take(120)}")
    assert(line.length <= Bench.LineBudget)
  }

  test("a pathologically large query set falls back to slowest-K " +
      "plus a _rest aggregate and still fits") {
    val huge = (1 to 300).map(i => (f"qq_$i%03d", if (i <= 5) 80.0 + i
      else 0.5))
    val line = Bench.compactLine(huge, 0, 547.5, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"${line.length} bytes")
    assert(line.contains("\"_rest\":{\"n\":"), line.take(160))
    // the slowest queries survive individually — they're the evidence
    (1 to 5).foreach { i =>
      assert(line.contains(f""""qq_$i%03d":${80 + i}%d"""),
        s"slow query qq_$i missing from: ${line.take(200)}")
    }
    // sf is emitted as its basename to save budget
    assert(line.contains("\"sf\":\"sf0.1\""), line.takeRight(40))
  }

  test("decimal formatting is locale-independent (no comma separators)") {
    val default = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val l2 = Bench.compactLine(Seq(("q", 1.25)), 0, 1.25, "/x")
      assert(l2.contains("\"q\":1.25"), s"locale leaked into JSON: $l2")
      assert(l2.contains("\"value\":1.25"), l2)
    } finally java.util.Locale.setDefault(default)
  }
}
