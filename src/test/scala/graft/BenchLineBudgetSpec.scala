package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The round driver captures only the LAST 2000 BYTES of the bench
 * run's stdout and parses the metrics JSON line from there (rounds
 * 1–13 all shipped an unparseable line: sbt's `[info] ` prefix plus a
 * detail payload that outgrew the window). This spec keeps the fix
 * honest as the harness grows: the worst-case compact line for the
 * CURRENT full query set must fit the budget, and the line must be
 * valid JSON regardless of the JVM's default locale.
 */
class BenchLineBudgetSpec extends AnyFunSuite {

  private def names = SparkEntry.queries.keys.toSeq.sorted

  test("worst-case bench line for the full query set fits the " +
      "2000-byte driver tail window") {
    // worst realistic per-query median at sf0.1 is two digits before
    // the point ("99.99" = 5 chars, same as the 1-decimal "999.9")
    val worst = names.map(n => (n, 99.99))
    val line = Bench.compactLine(worst, failed = 86, total = 9999.99,
      sfDir = "/root/testdata/sf0.1")
    val sbtTrailer = 80 // "[success] Total time: ...\n"
    assert(line.length + sbtTrailer <= 2000,
      s"bench line is ${line.length} bytes — with sbt's trailer it " +
        "no longer fits the driver's 2000-byte tail capture; trim " +
        "the query set's contribution or the format")
    // and it must survive the budget as a single parseable JSON line
    assert(!line.contains("\n"))
    assert(line.startsWith("{\"metric\":\"total\""))
  }

  test("a just-outgrown query set degrades precision instead of " +
      "overflowing") {
    // sized so the 2-decimal form exceeds the budget by < 1 byte/query
    // (the degradation's saving) and the 1-decimal form fits: 86
    // 12-char names at "12.34" ≈ 1886 bytes, at "12.3" ≈ 1800
    val many = (1 to 86).map(i => (f"qry_name_$i%03d", 12.34))
    val two = Bench.compactLine(many.take(1), 0, 12.34, "/x")
    assert(two.contains("\"qry_name_001\":12.34")) // small set: 2 dec
    val line = Bench.compactLine(many, 0, 1061.24, "/x")
    assert(line.contains("\"qry_name_001\":12.3,"),
      s"expected the 1-decimal fallback, got: ${line.take(120)}")
    assert(line.length <= Bench.LineBudget)
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
