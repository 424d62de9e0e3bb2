package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Randomized cross-check of the gap-rule sessionizer against a
 * brute-force in-memory reference: dense random event times force
 * gaps exactly AT the threshold (merge), one past it (split),
 * equal-ts ties (ordered by the tiebreak column), and single-event
 * sessions — the boundary space a fixed fixture under-samples.
 */
class SessionsFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzz: session carve-up, ordering, and per-session stats match " +
      "the brute-force reference across random timelines") {
    def q20(x: Double) = math.floor(x * 1048576.0 + 0.5).toLong
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(9000 + trial)
      val gapSec = 1L + rng.nextInt(4) // tiny gap → lots of boundaries
      val n = 30 + rng.nextInt(40)
      // second-granular event times in a window of ~n·gap seconds so
      // exact-threshold gaps occur often; a few equal-ts collisions
      val rows = Seq.tabulate(n) { i =>
        (rng.nextInt(3).toLong,                       // user
          rng.nextInt(n * 2).toLong,                  // epoch seconds
          i.toLong,                                   // event id
          (rng.nextInt(400) - 200) / 32.0,            // value
          s"t${rng.nextInt(3)}")                      // type
      }
      val df = rows.toDF("user_id", "sec", "event_id", "value",
          "event_type")
        .withColumn("ts",
          timestamp_micros(col("sec") * 1000000L).cast("timestamp_ntz"))
        .drop("sec")
        .repartition(1 + trial % 5)
      val got = Sessions.sessionStats(df, "user_id", "ts", "event_id",
          gapSec, "value", "event_type")
        .orderBy("user_id", "session_idx")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
        .toSeq

      // brute force: per user, order by (sec, event_id); a gap
      // STRICTLY greater than gapSec starts a new session
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        val ordered = evs.sortBy(e => (e._2, e._3))
        val sessions = scala.collection.mutable
          .ArrayBuffer[scala.collection.mutable.ArrayBuffer[
            (Long, Long, Long, Double, String)]]()
        for (e <- ordered) {
          if (sessions.isEmpty || e._2 - sessions.last.last._2 > gapSec)
            sessions += scala.collection.mutable.ArrayBuffer(e)
          else sessions.last += e
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong, s.size.toLong,
            s.map(_._2).min, s.map(_._2).max,
            s.map(_._2).max - s.map(_._2).min,
            s.map(e => q20(e._4)).sum,
            s.map(_._5).distinct.size.toLong)
        }
      }.sortBy(e => (e._1, e._2))

      assert(got === expected,
        s"trial $trial gap=$gapSec\nrows=${rows.sortBy(r =>
          (r._1, r._2, r._3))}")
    }
  }

  test("fuzz: associationPairs equals brute-force session " +
      "co-occurrence counting — distinct-per-session items, unordered " +
      "a<b pairs, minSupport, exact fixed-point confidences — across " +
      "random logs, gaps, and partitionings (X83, judge r19 item 5)") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(9600 + trial)
      val gapSec = 1L + rng.nextInt(3)
      val minSup = 1L + rng.nextInt(2)
      val n = 40 + rng.nextInt(80)
      // a tight second-range forces same-session repeats of one item
      // (the distinct-per-session rule) and equal-ts ties
      val rows = Seq.tabulate(n) { i =>
        (rng.nextInt(4).toLong, rng.nextInt(n).toLong, i.toLong,
          s"t${rng.nextInt(4)}")
      }
      val df = rows.toDF("user_id", "sec", "event_id", "event_type")
        .withColumn("ts",
          timestamp_micros(col("sec") * 1000000L).cast("timestamp_ntz"))
        .drop("sec")
        .repartition(1 + trial % 5)
      val got = Sessions.associationPairs(df, "user_id", "ts",
          "event_id", "event_type", gapSec, minSup)
        .orderBy("item_a", "item_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toSeq
      // brute force: the same gap-rule carve-up, then per-session
      // DISTINCT item sets
      val sessions: Seq[Set[String]] =
        rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
          val ordered = evs.sortBy(e => (e._2, e._3))
          val ss = scala.collection.mutable.ArrayBuffer[
            scala.collection.mutable.ArrayBuffer[
              (Long, Long, Long, String)]]()
          for (e <- ordered) {
            if (ss.isEmpty || e._2 - ss.last.last._2 > gapSec)
              ss += scala.collection.mutable.ArrayBuffer(e)
            else ss.last += e
          }
          ss.map(_.map(_._4).toSet)
        }
      val itemN = sessions.flatMap(_.toSeq).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val expected = sessions
        .flatMap(_.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        .toSeq.filter(_._2 >= minSup)
        .map { case ((a, b), nab) =>
          (a, b, nab, itemN(a), itemN(b), sessions.size.toLong,
            nab * 1048576L / itemN(a), nab * 1048576L / itemN(b))
        }.sortBy(e => (e._1, e._2))
      assert(got === expected, s"trial $trial gap=$gapSec " +
        s"minSup=$minSup")
    }
  }

  test("fuzz: snapshotAsOf equals the brute-force latest-strictly-" +
      "before pick across random logs, dense ts ties, NaN values, " +
      "cutoffs, and partitionings (X99)") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(9700 + trial)
      val n = 40 + rng.nextInt(120)
      // 12 distinct instants force constant ties; cutoff inside range
      val rows = Seq.tabulate(n) { i =>
        (i.toLong, rng.nextInt(12).toLong, rng.nextInt(4).toLong,
          s"f${rng.nextInt(3)}",
          if (rng.nextInt(5) == 0) Double.NaN else rng.nextInt(40) / 8.0)
      }
      val cutoff = 1L + rng.nextInt(12)
      val df = rows.map { case (id, us, u, f, v) =>
        (id, us * 1000L, u, f, v) } // nanos = us·1000
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .repartition(1 + trial % 5)
      val got = Sessions.snapshotAsOf(df, "user_id", "ts", "event_id",
          "event_type", "value", cutoff)
        .orderBy("user_id", "feature").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) null else Long.box(r.getLong(4)))).toSeq
      val expected = rows.filter(_._2 < cutoff)
        .groupBy(r => (r._3, r._4)).toSeq
        .map { case ((u, f), evs) =>
          val top = evs.maxBy(e => (e._2, e._1)) // (us, id) argmax
          (u, f, top._2, top._1,
            if (top._5.isNaN) null
            else Long.box(math.floor(top._5 * 1048576.0 + 0.5).toLong))
        }.sortBy(e => (e._1, e._2))
      assert(got === expected, s"trial $trial cutoff=$cutoff n=$n")
    }
  }

  test("fuzz: labelVotes equals the brute-force majority walk across " +
      "random votes, abstentions, ties, and partitionings (X93)") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(9800 + trial)
      val n = 40 + rng.nextInt(120)
      val rows = Seq.tabulate(n) { i =>
        (rng.nextInt(8).toLong, rng.nextInt(5).toLong,
          if (rng.nextInt(6) == 0) null
          else s"l${rng.nextInt(3)}")
      }
      val df = rows.toDF("item", "labeler", "label")
        .repartition(1 + trial % 5)
      val got = CorpusPipeline.labelVotes(df, "item", "labeler",
          "label")
        .orderBy("item_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toSeq
      val expected = rows.filter(_._3 != null).groupBy(_._1).toSeq
        .map { case (item, vs) =>
          val byLabel = vs.groupBy(_._3).map { case (l, g) =>
            (l, g.size.toLong) }
          val topN = byLabel.values.max
          val topLabel = byLabel.filter(_._2 == topN).keys.min
          val nVotes = vs.size.toLong
          (item, nVotes, vs.map(_._2).distinct.size.toLong, topLabel,
            topN, topN * 1048576L / nVotes,
            if (topN == nVotes) 1L else 0L)
        }.sortBy(_._1)
      assert(got === expected, s"trial $trial n=$n")
    }
  }
}
