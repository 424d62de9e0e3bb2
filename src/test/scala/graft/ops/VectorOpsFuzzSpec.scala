package graft.ops

import graft.SparkTestBase

/**
 * Randomized cross-checks for the r17 vector operators:
 *
 *  - `ivfFlatTopK` with EVERY cell probed must equal `bruteForceTopK`
 *    bit-for-bit on random corpora (cell pruning is the only
 *    approximation — the training, assignment, scoring, and tie rules
 *    must be exact), and a pruned run must be partition-invariant.
 *  - `centroidOutlierScores` must equal a driver-side reference that
 *    replays the documented integer contract (floor(v·2²⁰+0.5)
 *    quantize, component sums, TRUNCATING division by n, exact
 *    Σ(vq−c)²) on random vectors including negatives — the truncation
 *    branch IEEE floor would get wrong.
 */
class VectorOpsFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def randVec(rng: scala.util.Random, dim: Int): Seq[Float] =
    Seq.fill(dim)((rng.nextDouble() * 2.0 - 1.0).toFloat)

  test("fuzz: full-probe IVF-Flat equals brute force bit-for-bit") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(8400 + trial)
      val dim = Seq(4, 8, 16)(rng.nextInt(3))
      val n = 30 + rng.nextInt(120)
      val nCells = 2 + rng.nextInt(6)
      val corpus = Seq.tabulate(n)(i => (i.toLong, randVec(rng, dim)))
        .toDF("vec_id", "embedding").repartition(1 + rng.nextInt(5))
      val queries = corpus.filter("vec_id < 3")
        .selectExpr("vec_id AS query_id", "embedding")
      val k = 1 + rng.nextInt(6)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rank").collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"),
            r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSeq
      val exact = rows(Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "query_id", k))
      val full = rows(Similarity.ivfFlatTopK(corpus, queries,
        "vec_id", "embedding", "query_id", k, nCells = nCells,
        nProbe = nCells, lloydIters = 1 + rng.nextInt(3),
        seed = trial.toLong))
      assert(full === exact, s"trial $trial nCells=$nCells k=$k")
    }
  }

  test("fuzz: pruned IVF-Flat bit-identical across partitionings") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(9100 + trial)
      val dim = 8
      val n = 40 + rng.nextInt(100)
      val nCells = 2 + rng.nextInt(6)
      val nProbe = 1 + rng.nextInt(nCells)
      val base = Seq.tabulate(n)(i => (i.toLong, randVec(rng, dim)))
      val queries = base.take(3).map { case (id, v) => (id, v) }
        .toDF("query_id", "embedding")
      def run(parts: Int) = Similarity.ivfFlatTopK(
          base.toDF("vec_id", "embedding").repartition(parts),
          queries, "vec_id", "embedding", "query_id", k = 4,
          nCells = nCells, nProbe = nProbe, seed = trial.toLong)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"),
          r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSeq
      assert(run(1) === run(2 + rng.nextInt(6)),
        s"trial $trial nCells=$nCells nProbe=$nProbe")
    }
  }

  test("fuzz: centroidOutlierScores equals the integer-contract " +
      "reference on random signed vectors across partitionings") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(9900 + trial)
      val dim = 1 + rng.nextInt(12)
      val n = 1 + rng.nextInt(150)
      val rows = Seq.tabulate(n)(i => (i.toLong, randVec(rng, dim)))
      val expected = {
        val vq = rows.map { case (id, v) =>
          (id, v.map(x => math.floor(x.toDouble * 1048576.0 + 0.5)
            .toLong).toArray)
        }
        val sums = new Array[Long](dim)
        vq.foreach { case (_, a) =>
          var j = 0; while (j < dim) { sums(j) += a(j); j += 1 }
        }
        val c = sums.map(_ / n) // truncating, like the op and DuckDB //
        vq.map { case (id, a) =>
          (id, a.zip(c).map { case (x, cc) =>
            (x - cc) * (x - cc) }.sum)
        }.toSet
      }
      val got = Similarity.centroidOutlierScores(
          rows.toDF("vec_id", "embedding")
            .repartition(1 + rng.nextInt(6)),
          "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"trial $trial n=$n dim=$dim")
    }
  }
}
