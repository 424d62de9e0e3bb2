package graft.ops

import graft.SparkTestBase

/**
 * Randomized cross-check of deterministic next-fit sequence packing
 * against a brute-force reference: random token lengths including 0,
 * exact-capacity, and oversized (truncated) docs, multiple shards,
 * varying partitionings — the packing invariants (shard-local doc_id
 * walk order, bin never exceeds capacity, offsets contiguous,
 * truncation flags) must replay exactly.
 */
class PackFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: next-fit packing equals the brute-force walk and never " +
      "overfills a bin") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(9900 + trial)
      val cap = 8L + rng.nextInt(24)
      val shards = 1 + rng.nextInt(4)
      val n = 20 + rng.nextInt(60)
      val docs = Seq.tabulate(n) { i =>
        val len = rng.nextInt(4) match {
          case 0 => rng.nextInt(2 * cap.toInt + 4).toLong // incl. oversize
          case _ => rng.nextInt(cap.toInt + 1).toLong     // incl. 0, cap
        }
        (i.toLong + 1, len)
      }
      val df = docs.toDF("doc_id", "n_tokens").repartition(1 + trial % 5)
      val got = CorpusPipeline
        .packSequences(df, "doc_id", "n_tokens", cap, shards)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))))
        .toMap

      val expected = docs.groupBy(d => d._1 % shards).flatMap {
        case (shard, ds) =>
          var bin = -1L; var used = cap + 1
          ds.sortBy(_._1).map { case (id, len) =>
            val take = math.min(math.max(len, 0L), cap)
            if (used + take > cap) { bin += 1; used = 0L }
            val off = used
            used += take
            id -> ((shard, bin, off, take, len > cap))
          }
      }
      assert(got === expected, s"trial $trial cap=$cap shards=$shards")

      // global invariant: no bin's packed tokens exceed capacity, and
      // offsets within a bin are contiguous from 0
      got.values.groupBy(v => (v._1, v._2)).foreach { case (b, ms) =>
        // zero-length docs legitimately share their offset with the
        // next doc — sort them first at each offset so the running
        // sum stays aligned
        val sorted = ms.toSeq.sortBy(m => (m._3, m._4))
        assert(sorted.map(_._4).sum <= cap, s"bin $b overfilled")
        var expect = 0L
        for (m <- sorted) { assert(m._3 === expect, s"bin $b gap")
          expect += m._4 }
      }
    }
  }
}
