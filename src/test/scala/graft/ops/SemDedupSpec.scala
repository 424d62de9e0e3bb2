package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * SemDeDup (X41, Abbas et al. 2023): deterministic k-means over the
 * embedding space + exact within-cluster near-dup pairs. The clustering
 * must replay bit-for-bit across partitionings (salted-md5 init, exact
 * fixed-point Lloyd sums), and the within-cluster search must find
 * planted duplicates with exact-cosine precision.
 */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int = 300, dim: Int = 16, seed: Int = 5) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
  }

  test("planted exact duplicates are found with cosine 1.0 and pair " +
      "to the smaller id") {
    val base = corpus()
    val planted = base.filter($"id" < 10)
      .select(($"id" + 1000000L).as("id"), $"vec")
    val out = Dedup.semDedup(base.unionByName(planted), "id", "vec",
      minCosine = 0.999, k = 6).collect()
    val dups = out.map(r => r.getLong(2)).toSet
    (0 until 10).foreach { i =>
      assert(dups.contains(i + 1000000L),
        s"planted copy of $i must be detected")
    }
    out.filter(_.getLong(2) >= 1000000L).foreach { r =>
      assert(r.getLong(1) === r.getLong(2) - 1000000L,
        "identical vectors share a cluster; partner is the original")
      assert(r.getDouble(3) === 1.0)
    }
  }

  test("deterministic across partitionings: 1-partition output == " +
      "12-partition output, clusters included") {
    val base = corpus(400)
    val planted = base.filter($"id" < 8)
      .select(($"id" + 1000000L).as("id"), $"vec")
    val all = base.unionByName(planted)
    def run(parts: Int) =
      Dedup.semDedup(all.repartition(parts), "id", "vec",
        minCosine = 0.99, k = 5, lloydIters = 3)
        .orderBy("dup_id").collect().toSeq
    assert(run(1) === run(12),
      "md5 init + fixed-point Lloyd sums must make clustering and " +
        "pairs partition-invariant")
  }

  test("cluster ids stay under k and near-dups never cross clusters " +
      "by construction") {
    val out = Dedup.semDedup(corpus(200), "id", "vec",
      minCosine = -1.0, k = 4).cache()
    assert(out.agg(max("cluster")).head.getInt(0) < 4)
    // with minCosine = -1 every within-cluster pair reports: the pair
    // count must equal sum over clusters of (sz-1) (each non-minimal
    // member pairs with its smallest-id partner exactly once)
    val n = out.select("dup_id").distinct().count()
    val perCluster = out.groupBy("cluster")
      .agg(countDistinct("dup_id").as("d")).collect()
    perCluster.foreach(r => assert(r.getLong(1) > 0))
    assert(n === out.count(), "one row per duplicate")
    out.unpersist()
  }

  test("precision is exact: every reported pair re-verifies above the " +
      "threshold with brute-force cosine") {
    val base = corpus(150, dim = 8, seed = 11)
    val out = Dedup.semDedup(base, "id", "vec",
      minCosine = 0.5, k = 3).collect()
    val vecs = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.foreach { r =>
      val a = vecs(r.getLong(1)); val b = vecs(r.getLong(2))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(cos >= 0.5 - 1e-9, s"pair ${r.getLong(1)}-${r.getLong(2)} " +
        s"cosine $cos below threshold")
    }
  }
}
