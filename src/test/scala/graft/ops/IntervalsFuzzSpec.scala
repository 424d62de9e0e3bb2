package graft.ops

import graft.SparkTestBase

/**
 * Range-join fuzz (X72): random probes × random intervals × random
 * grains (including grain ≫ span and grain ≪ span, keyed and unkeyed)
 * must equal a naive O(n·m) driver-side containment scan — the
 * bucketing is an execution strategy, never a semantics change.
 */
class IntervalsFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: bucketed range join equals the naive containment scan " +
      "across random data, grains, and key modes") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(8200 + trial)
      val keyed = trial % 2 == 1
      val nP = 40 + rng.nextInt(120)
      val nI = 10 + rng.nextInt(50)
      val grain = Seq(3L, 7L, 50L, 1000L)(rng.nextInt(4))
      val probes = Seq.tabulate(nP)(i =>
        (i.toLong, rng.nextInt(500).toLong * 1000L,
          rng.nextInt(3).toLong))
      val ivs = Seq.tabulate(nI) { j =>
        val s = rng.nextInt(480).toLong
        (j.toLong, s * 1000L, (s + 1 + rng.nextInt(60)).toLong * 1000L,
          rng.nextInt(3).toLong)
      }
      val pDF = probes.toDF("pid", "ts", "k")
      val iDF0 = ivs.toDF("iid", "s", "e", "k")
      // unkeyed mode: the collision guard (tested in IntervalsSpec)
      // correctly rejects a shared non-key column — drop it
      val iDF = if (keyed) iDF0 else iDF0.drop("k")
      val got = Intervals.rangeJoin(pDF, "ts", iDF, "s", "e",
          grainUs = grain, keyCols = if (keyed) Seq("k") else Nil)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // naive reference over micros (Long ts columns are nanos)
      val expect = (for {
        (pid, pts, pk) <- probes
        (iid, is, ie, ik) <- ivs
        if !keyed || pk == ik
        pUs = pts / 1000L; sUs = is / 1000L; eUs = ie / 1000L
        if pUs >= sUs && pUs < eUs
      } yield (pid, iid)).sorted
      assert(got === expect,
        s"trial $trial grain=$grain keyed=$keyed nP=$nP nI=$nI")
    }
  }
}
