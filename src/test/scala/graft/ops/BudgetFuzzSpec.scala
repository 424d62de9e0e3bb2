package graft.ops

import graft.SparkTestBase

/**
 * Randomized cross-check of the two-level prefix-sum budget carve
 * against a driver-side brute-force walk: the reference recomputes
 * the salted-md5 hash order independently (JVM MessageDigest, the
 * documented md5_number_lower byte convention), runs a sequential
 * cumulative sum, and cuts at the budget. Trials vary corpus size,
 * weight distribution (zero weights, heavy ties, all-zero), budget
 * position (0, mid, exact boundary, beyond-total), input partitioning,
 * and the op's own partition count — so partition-offset stitching and
 * the skip-unread fast path are both exercised.
 */
class BudgetFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def refHash(id: Long, salt: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id$salt".getBytes("UTF-8"))
    (0 until 4).map(j => (dig(8 + j).toLong & 0xffL) << (8 * j)).sum
  }

  test("fuzz: tokenBudgetSample equals the sequential hash-order walk " +
      "across random weights, budgets, and partitionings") {
    for (trial <- 0 until 12) {
      val rng = new scala.util.Random(7300 + trial)
      val n = 20 + rng.nextInt(180)
      val salt = s":fz$trial"
      val rows = Seq.tabulate(n) { i =>
        val w = rng.nextInt(4) match {
          case 0 => 0L // zero-weight rows ride along inside the prefix
          case 1 => rng.nextInt(3).toLong // heavy ties
          case _ => rng.nextInt(1000).toLong
        }
        ((i * 7 + trial).toLong, w)
      }
      val total = rows.map(_._2).sum
      val walk = rows.sortBy { case (id, _) => (refHash(id, salt), id) }
        .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, w)) =>
          (id, w, cum + w)
        }.tail
      val budget = rng.nextInt(5) match {
        case 0 => 0L
        case 1 => total + 1 + rng.nextInt(100) // beyond-total: keep all
        case 2 if walk.nonEmpty => // exact boundary at a random cum
          walk(rng.nextInt(walk.length))._3
        case _ => (total * rng.nextDouble()).toLong
      }
      val expected = walk.takeWhile(_._3 <= budget).toSet // monotone cum
      val df = rows.toDF("doc_id", "n_tokens")
        .repartition(1 + rng.nextInt(6))
      val got = CorpusPipeline.tokenBudgetSample(df, "doc_id",
          "n_tokens", budget, salt = salt,
          partitions = 1 + rng.nextInt(5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got === expected,
        s"trial $trial n=$n budget=$budget total=$total")
    }
  }
}
