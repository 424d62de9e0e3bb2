package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Per-group centroid similarity matrix (X80): hand-pinned geometry,
 * zero-norm honesty, non-finite fail-fast, and partition invariance.
 */
class GroupSimsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Seq[Double])], parts: Int = 1) =
    Similarity.groupCentroidSims(
        rows.toDF("g", "vec").repartition(parts), "g", "vec")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(
          r.getDouble(4)))).toSeq

  test("hand-pinned geometry: parallel groups cos 1, orthogonal cos " +
      "0, opposite cos -1; cosine is of the MEAN (sums), not any row") {
    val rows = Seq(
      // group a: mean = (1, 1)
      ("a", Seq(2.0, 0.0)), ("a", Seq(0.0, 2.0)),
      // group b: parallel to a's mean
      ("b", Seq(3.0, 3.0)),
      // group c: orthogonal to a's mean
      ("c", Seq(1.0, -1.0)),
      // group d: opposite
      ("d", Seq(-5.0, -5.0)))
    val r = run(rows)
    val m = r.map(x => (x._1, x._2) -> x._5.doubleValue()).toMap
    assert(m(("a", "b")) === 1.0)
    assert(m(("a", "c")) === 0.0)
    assert(m(("a", "d")) === -1.0)
    assert(m(("b", "c")) === 0.0)
    val counts = r.map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    assert(counts(("a", "b")) === ((2L, 1L)))
  }

  test("an all-zero group reports null cosine (never NaN); pair " +
      "count is C(|G|, 2)") {
    val r = run(Seq(("a", Seq(1.0, 0.0)), ("z", Seq(0.0, 0.0)),
      ("b", Seq(0.0, 1.0))))
    assert(r.length === 3)
    assert(r.filter(x => x._1 == "a" && x._2 == "z")
      .head._5 === null)
    assert(r.filter(x => x._1 == "a" && x._2 == "b")
      .head._5.doubleValue() === 0.0)
  }

  test("non-finite components fail loudly instead of quantizing to 0") {
    val ex = intercept[Exception] {
      run(Seq(("a", Seq(1.0, Double.NaN)), ("b", Seq(1.0, 0.0))))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("non-finite component")))
  }

  test("the matrix is partition-invariant on random grouped vectors") {
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(120) { i =>
      (s"g${i % 5}", Seq.fill(8)((rng.nextInt(64) - 32) / 16.0))
    }
    val one = run(rows, 1)
    assert(one.length === 10)
    assert(run(rows, 7) === one)
  }
}
