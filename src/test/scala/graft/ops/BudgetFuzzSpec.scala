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

  test("fuzz: epochedMixture equals the sequential per-stratum " +
      "epochs + remainder-prefix walk across random strata, weights, " +
      "budget modes, and partitionings (X92)") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(7400 + trial)
      val n = 20 + rng.nextInt(150)
      val salt = s":ep$trial"
      val rows = Seq.tabulate(n) { i =>
        val w = rng.nextInt(3) match {
          case 0 => rng.nextInt(3).toLong // zero weights + heavy ties
          case _ => rng.nextInt(200).toLong
        }
        ((i * 3 + trial).toLong, s"s${rng.nextInt(3)}", w)
      }
      val strata = rows.map(_._2).distinct
      val totals = strata.map(s0 =>
        s0 -> rows.filter(_._2 == s0).map(_._3).sum).toMap
      // budget modes: absent (one epoch), zero, sub-total fraction,
      // k epochs + fractional remainder
      val budgets: Map[String, Long] = strata.flatMap { s0 =>
        rng.nextInt(4) match {
          case 0 => None
          case 1 => Some(s0 -> 0L)
          case 2 => Some(s0 -> (totals(s0) * rng.nextDouble()).toLong)
          case _ => Some(s0 -> (totals(s0) * (1 + rng.nextInt(3)) +
            (totals(s0) * rng.nextDouble()).toLong))
        }
      }.toMap
      // the zero-total + positive-budget loud-failure path is unit-
      // tested; fuzz only the defined domain
      if (strata.forall(s0 =>
          totals(s0) > 0 || budgets.getOrElse(s0, 0L) == 0L)) {
        val expected = strata.flatMap { s0 =>
          val sr = rows.filter(_._2 == s0)
            .sortBy(r => (refHash(r._1, salt), r._1))
          val tot = totals(s0)
          val budget = budgets.getOrElse(s0, tot)
          var cum = 0L
          sr.flatMap { case (id, _, w) =>
            cum += w
            if (tot == 0) None
            else {
              val rep = budget / tot +
                (if (cum <= budget % tot) 1L else 0L)
              if (rep > 0) Some((id, s0, w, cum, rep)) else None
            }
          }
        }.toSet
        val got = CorpusPipeline.epochedMixture(
            rows.toDF("doc_id", "src", "w")
              .repartition(1 + rng.nextInt(5)),
            "doc_id", "src", "w", budgets, salt = salt,
            buckets = 1 + rng.nextInt(5))
          .collect().map(r => (r.getLong(0), r.getString(1),
            r.getLong(2), r.getLong(3), r.getLong(4))).toSet
        assert(got === expected, s"trial $trial n=$n " +
          s"budgets=$budgets totals=$totals")
      }
    }
  }
}
