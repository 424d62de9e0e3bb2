package graft.ops

import graft.SparkTestBase

/**
 * Randomized cross-check of the bounded-heap per-group top-k against
 * a sort-and-take reference: heavy score ties (the deterministic
 * (score desc, id asc) rank must hold), groups smaller than k, and
 * k = 1 — under varying partitionings, so heap merge order is
 * exercised too.
 */
class TopKFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: bounded-heap top-k equals sort-and-take with the " +
      "deterministic tie order across random groups and ks") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(6100 + trial)
      val k = 1 + rng.nextInt(5)
      val n = 40 + rng.nextInt(160)
      val rows = Seq.tabulate(n)(i =>
        (s"g${rng.nextInt(6)}", i.toLong, rng.nextInt(7).toLong))
      val df = rows.toDF("src", "id", "score")
        .repartition(1 + trial % 5)
      val got = CorpusPipeline.topKPerGroup(df, "src", "id", "score", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getAs[Number](3).longValue()))
        .sortBy(t => (t._1, t._4))
        .toSeq
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, evs) =>
        evs.sortBy(e => (-e._3, e._2)).take(k).zipWithIndex
          .map { case ((_, id, s), i) => (g, id, s, (i + 1).toLong) }
      }.sortBy(t => (t._1, t._4))
      assert(got === expected, s"trial $trial k=$k")
    }
  }
}
