package graft.ops

import graft.SparkTestBase

/**
 * Corpus-wide line dedup (`TextOps.dedupLines`) — the RefinedWeb-style
 * boilerplate remover: every occurrence of a line repeated across the
 * corpus disappears, survivors rejoin in order, short lines are
 * exempt, and fully-boilerplate docs come back empty (cardinality
 * preserved).
 */
class LineDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val banner = "accept all cookies"
  private val nav = "home | products | about"

  private def corpus(parts: Int) = Seq(
    (1L, s"$banner\nunique first doc line\n$nav\nmore unique text"),
    (2L, s"$banner\nsecond doc content\n$nav"),
    (3L, s"$banner\n$nav"),                 // fully boilerplate
    (4L, "only unique content here\n\nafter a blank line"),
    (5L, "")                                // empty doc
  ).toDF("id", "text").repartition(parts)

  test("repeated lines vanish everywhere, survivors keep their order") {
    val out = TextOps.dedupLines(corpus(3), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "unique first doc line\nmore unique text")
    assert(out(2L) === "second doc content")
    assert(out(3L) === "", "fully-boilerplate doc must come back empty")
    assert(out(4L) === "only unique content here\n\nafter a blank line")
    assert(out(5L) === "")
    assert(out.size === 5, "every input doc must come back")
  }

  test("minLineLen exempts short lines (blank lines are legitimately " +
      "frequent)") {
    val df = Seq(
      (1L, "a\nx marks the spot\n\nb"),
      (2L, "a\ndifferent content\n\nb"),
      (3L, "a\n\nb")).toDF("id", "text")
    // 'a', 'b', '' each repeat 3x but are under minLineLen = 2
    val out = TextOps.dedupLines(df, "id", "text", minRepeats = 2,
      minLineLen = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a\nx marks the spot\n\nb")
    assert(out(3L) === "a\n\nb")
    // raising the threshold above their length keeps them exempt;
    // lowering it to 1 removes the 'a'/'b' repeats but '' stays
    val strict = TextOps.dedupLines(df, "id", "text", minRepeats = 2,
      minLineLen = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict(1L) === "x marks the spot\n")
    assert(strict(3L) === "")
  }

  test("minRepeats gates the corpus frequency cut") {
    val df = Seq(
      (1L, "twice\nonce a"), (2L, "twice\nonce b")).toDF("id", "text")
    val loose = TextOps.dedupLines(df, "id", "text", minRepeats = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(1L) === "twice\nonce a", "freq 2 < minRepeats 3 stays")
    val e = intercept[IllegalArgumentException] {
      TextOps.dedupLines(df, "id", "text", minRepeats = 1)
    }
    assert(e.getMessage.contains("minRepeats"))
  }

  test("partition invariance") {
    val a = TextOps.dedupLines(corpus(1), "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = TextOps.dedupLines(corpus(8), "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }
}
