package graft.data

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Randomized round-trip check of the sharding/combine machinery:
 * interleaved and batch shard assignments must exactly match the
 * reference formulas (row i → i % k; np.array_split ranges), shards
 * must partition the rows (disjoint and complete) for ANY (n, k)
 * incl. k > n and uneven splits, and restoreOrder after per-shard
 * processing must reproduce the original order — the combine_data
 * contract.
 */
class ShardingFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: interleaved/batch shard assignment, disjoint coverage, " +
      "and order restoration match the reference formulas") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(2200 + trial)
      val n = 1 + rng.nextInt(60)
      val k = 1 + rng.nextInt(9) // k > n happens
      val rows = Seq.tabulate(n)(i => (s"v${rng.nextInt(100)}", i * 2L))
      val df = rows.toDF("payload", "weight").repartition(1 + trial % 4)
      val withId = Sharding.withRowIdByKey(df, Seq("weight", "payload"))

      // the row id is assigned in (weight, payload) order — recover
      // the id→row mapping the reference formulas apply to
      val ordered = rows.sortBy(r => (r._2, r._1))

      // interleaved: id % k
      val inter = Sharding.interleavedShard(withId, k)
      val gotInter = inter.select(col("__row_id"), col("__shard"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(gotInter.size === n)
      for ((id, s) <- gotInter) assert(s === (id % k).toInt,
        s"trial $trial interleaved id=$id k=$k got=$s")

      // batch: np.array_split — first n%k shards get ceil(n/k) rows
      val batch = Sharding.batchShard(withId, k, n.toLong)
      val gotBatch = batch.select(col("__row_id"), col("__shard"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val base = n / k; val rem = n % k
      val expectedSizes = Seq.tabulate(k)(i =>
        if (i < rem) base + 1 else base)
      val sizes = gotBatch.values.groupBy(identity)
        .map { case (s, g) => s -> g.size }
      for (s <- 0 until k)
        assert(sizes.getOrElse(s, 0) === expectedSizes(s),
          s"trial $trial batch n=$n k=$k shard=$s sizes=$sizes")
      // contiguity: max id of shard s < min id of shard s+1
      val byShard = gotBatch.groupBy(_._2).view
        .mapValues(m => (m.keys.min, m.keys.max)).toMap
      for (s <- 0 until k - 1; a <- byShard.get(s); b <- byShard.get(s + 1))
        assert(a._2 < b._1, s"trial $trial batch shard $s overlaps ${s + 1}")

      // shards partition the rows; restoreOrder reproduces the
      // (weight, payload) sequence after a union of per-shard frames
      val roundTrip = (0 until k).map(r => Sharding.shardRows(inter, r))
        .reduce(_ unionByName _)
      val restored = Sharding.restoreOrder(roundTrip)
        .select("payload", "weight")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(restored === ordered, s"trial $trial restore n=$n k=$k")
    }
  }
}
