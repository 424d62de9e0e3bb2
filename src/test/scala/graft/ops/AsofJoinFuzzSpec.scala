package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/**
 * Randomized cross-check of the distributed merge-asof against a
 * brute-force in-memory reference (seeded, deterministic): dense
 * (key, ts) collision ranges force equal-ts runs, duplicate right
 * timelines, unmatched keys, null timestamps, and payload ties — the
 * corners a fixed fixture under-samples. Every trial checks all three
 * directions, strict/inclusive equality, and bounded/unbounded
 * tolerance, on two different partitionings.
 */
class AsofJoinFuzzSpec extends SparkTestBase {

  private val leftSchema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("ts", LongType, nullable = true),
    StructField("lid", LongType, nullable = false)))
  private val rightSchema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("ts", LongType, nullable = true),
    StructField("p1", LongType, nullable = true),
    StructField("p2", LongType, nullable = false)))

  private case class L(k: Option[Long], ts: Option[Long], lid: Long)
  private case class R(k: Option[Long], ts: Option[Long],
      p1: Option[Long], p2: Long)

  /** Spark's ascending nulls-first tuple order on (p1, p2) — the tie
    * rule is "largest payload tuple wins". */
  private def payloadOrd: Ordering[R] =
    Ordering.by(r => (r.p1.isDefined, r.p1.getOrElse(0L), r.p2))

  private def refMatch(l: L, rs: Seq[R], strict: Boolean,
      forward: Boolean, tol: Option[Long]): Option[R] = {
    if (l.k.isEmpty || l.ts.isEmpty) return None
    val lts = BigInt(l.ts.get)
    val cand = rs.filter(r => r.k == l.k && r.ts.isDefined).filter { r =>
      val rts = BigInt(r.ts.get)
      if (forward) { if (strict) rts > lts else rts >= lts }
      else { if (strict) rts < lts else rts <= lts }
    }
    if (cand.isEmpty) return None
    val bestTs =
      if (forward) cand.map(_.ts.get).min else cand.map(_.ts.get).max
    val gap = (BigInt(bestTs) - lts).abs
    if (tol.exists(t => gap > BigInt(t))) return None
    Some(cand.filter(_.ts.get == bestTs).max(payloadOrd))
  }

  private def refNearest(l: L, rs: Seq[R], tol: Option[Long])
      : Option[R] = {
    val b = refMatch(l, rs, strict = false, forward = false, tol)
    val f = refMatch(l, rs, strict = false, forward = true, tol)
    (b, f) match {
      case (Some(rb), Some(rf)) =>
        val lts = BigInt(l.ts.get)
        val gb = (lts - BigInt(rb.ts.get)).abs
        val gf = (BigInt(rf.ts.get) - lts).abs
        if (gf < gb) Some(rf) else Some(rb) // ties go backward
      case (Some(rb), None) => Some(rb)
      case (None, Some(rf)) => Some(rf)
      case _ => None
    }
  }

  private def collectOut(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Option[Long], Option[Long], Option[Long])] =
    df.collect().map { r =>
      val lid = r.getLong(r.fieldIndex("lid"))
      def opt(c: String): Option[Long] = {
        val i = r.fieldIndex(c)
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      }
      lid -> ((opt("asof_ts"), opt("asof_p1"), opt("asof_p2")))
    }.toMap

  test("fuzz: backward/forward/nearest × strict × tolerance all match " +
      "the brute-force reference on dense random timelines") {
    val spark2 = spark
    for (trial <- 0 until 12) {
      val rng = new scala.util.Random(1000 + trial)
      // dense ranges force collisions; a few keys exist on one side only
      def key(): Option[Long] =
        if (rng.nextInt(20) == 0) None else Some(rng.nextInt(5).toLong)
      def ts(): Option[Long] =
        if (rng.nextInt(15) == 0) None else Some(rng.nextInt(25).toLong)
      val ls = Seq.tabulate(20 + rng.nextInt(20))(i =>
        L(key(), ts(), i.toLong))
      val rs = Seq.tabulate(15 + rng.nextInt(15))(_ =>
        R(key(), ts(),
          if (rng.nextInt(6) == 0) None else Some(rng.nextInt(4).toLong),
          rng.nextInt(4).toLong))
      val lDf = spark2.createDataFrame(
        spark2.sparkContext.parallelize(ls.map(l =>
          Row(l.k.orNull, l.ts.orNull, l.lid)), 1 + trial % 5),
        leftSchema)
      val rDf = spark2.createDataFrame(
        spark2.sparkContext.parallelize(rs.map(r =>
          Row(r.k.orNull, r.ts.orNull, r.p1.orNull, r.p2)),
          1 + (trial + 2) % 4),
        rightSchema)
      val tol = if (trial % 3 == 0) None else Some(rng.nextInt(8).toLong)

      for (strict <- Seq(false, true); forward <- Seq(false, true)) {
        val out = collectOut(
          if (forward)
            AsofJoin.asofJoinForward(lDf, rDf, "k", "ts", "ts",
              Seq("p1", "p2"), strict = strict, tolerance = tol)
          else
            AsofJoin.asofJoin(lDf, rDf, "k", "ts", "ts",
              Seq("p1", "p2"), strict = strict, tolerance = tol))
        assert(out.size === ls.size,
          s"trial $trial strict=$strict fwd=$forward: row count")
        for (l <- ls) {
          val exp = refMatch(l, rs, strict, forward, tol)
          val got = out(l.lid)
          assert(got === ((exp.map(_.ts.get), exp.flatMap(_.p1),
            exp.map(_.p2))),
            s"trial $trial strict=$strict fwd=$forward tol=$tol " +
              s"left=$l expected=$exp got=$got\nright=${rs.sortBy(r =>
                (r.k, r.ts))}")
        }
      }

      val nOut = collectOut(AsofJoin.asofJoinNearest(lDf, rDf, "k",
        "ts", "ts", Seq("p1", "p2"), "lid", tolerance = tol))
      for (l <- ls) {
        val exp = refNearest(l, rs, tol)
        val got = nOut(l.lid)
        assert(got === ((exp.map(_.ts.get), exp.flatMap(_.p1),
          exp.map(_.p2))),
          s"trial $trial nearest tol=$tol left=$l expected=$exp " +
            s"got=$got\nright=${rs.sortBy(r => (r.k, r.ts))}")
      }
    }
  }
}
