package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Randomized cross-check of the iterative-narrowing exact quantiles
 * against a sort-and-index reference: heavy duplicates, negatives,
 * NaN (missing), nulls, and adversarial single-value columns — the
 * shapes that stress the bucket-walk rank arithmetic. The contract
 * under test: p<pct>_q is the value at 1-indexed rank
 * (n−1)·pct/100 + 1 (integer division) of the ascending non-null
 * quantized values, and n/nulls/min/max/sum are exact.
 */
class ProfilerFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: exact quantiles, counts, and sums match the " +
      "sort-and-index reference on random dirty columns") {
    def q20(x: Double) = math.floor(x * 1048576.0 + 0.5).toLong
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(7700 + trial)
      val n = 50 + rng.nextInt(200)
      // duplicates-heavy small-cardinality values, mixed signs, some
      // NaN (missing by the quantizer) and a few SQL nulls
      val vals: Seq[Option[Double]] = Seq.tabulate(n) { _ =>
        rng.nextInt(10) match {
          case 0 => Some(Double.NaN)
          case 1 => None
          case _ => Some((rng.nextInt(41) - 20) / 8.0)
        }
      }
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(Double.box).orNull) }
        .toDF("id", "x")
        .select(col("id"), col("x").cast("double").as("x"))
        .repartition(1 + trial % 4)
      val percents = Seq(0, 10, 50, 90, 100)
      val row = Profiler.profile(df, Seq("x"), percents).head()

      val clean = vals.flatten.filterNot(_.isNaN).map(q20).sorted
      val m = clean.size
      assert(row.getAs[Long]("n") === m)
      assert(row.getAs[Long]("nulls") === (n - m))
      assert(row.getAs[Long]("min_q") === clean.head)
      assert(row.getAs[Long]("max_q") === clean.last)
      assert(row.getAs[Long]("sum_q") === clean.sum)
      for (p <- percents) {
        val rank = (m - 1).toLong * p / 100 // 0-indexed after floor div
        assert(row.getAs[Long](s"p${p}_q") === clean(rank.toInt),
          s"trial $trial pct=$p n=$m rank=$rank\nclean=$clean")
      }
    }
  }
}
