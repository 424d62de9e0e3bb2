package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 * Two paths:
 *  - `bruteForceTopK`: exact cosine top-k. The query side is broadcast
 *    (it's small by assumption), the corpus is scanned once, and the
 *    top-k per query is a partial (map-side) TopK then a tiny shuffle —
 *    the correct baseline even at 100 TB when queries ≪ corpus.
 *  - `lshTopK`: random-hyperplane LSH with multi-probe — corpus hashed
 *    once into 2^planes buckets, queries probe their own bucket plus all
 *    Hamming-1 neighbors; exact cosine re-rank inside probed buckets.
 *    Recall tunable via planes/probes; corpus-side work drops ~2^planes×.
 *
 * The dot products run as pure Catalyst expressions (zip_with +
 * aggregate → codegen); no UDF in the hot path.
 */
object Similarity {

  /** Cosine similarity of two float-array columns (codegen, no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d),
      (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d),
      (acc, v) => acc + v))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  /** Random-hyperplane signature (bucket id in [0, 2^planes)). Plane
    * normals are deterministic from (seed, plane, dim) — computed via
    * codegen-able hash trick? No: tiny UDF, but it runs once per row. */
  def hyperplaneSig(vec: Column, planes: Int, seed: Long): Column = {
    val f = udf { v: Seq[Float] =>
      var sig = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var i = 0
        while (i < v.length) {
          // deterministic pseudo-gaussian normal component
          var z = seed + p * 1048573L + i
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^= z >>> 31
          val u = (z >>> 11).toDouble / (1L << 53).toDouble // [0,1)
          dot += v(i) * (u - 0.5)
          i += 1
        }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      sig
    }
    f(vec)
  }

  /**
   * Exact cosine top-k neighbors for each query vector.
   *
   * @param corpus  (id, vec) table — the big side
   * @param queries (qid, vec) table — small, broadcast
   * @return (query_id, id, cosine, rank) rows, rank 1..k
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String, k: Int)
      : DataFrame = {
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("qvec"))))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /**
   * LSH-bucketed ANN: `tables` independent hyperplane hash tables; each
   * query probes its own bucket plus all Hamming-1 buckets per table
   * (multi-probe); candidates unioned across tables, exact cosine
   * re-rank. Recall grows with tables; corpus cost is tables× one hash
   * per row (no re-scan).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, planes: Int = 8,
      tables: Int = 4, seed: Long = 7L): DataFrame = {
    def tableSigs(vec: Column) = array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        hyperplaneSig(vec, planes, seed + 1000003L * t).as("sig"))
    }: _*)
    val hashedCorpus = corpus.select(col(idCol).as("id"),
      col(vecCol).as("vec"), explode(tableSigs(col(vecCol))).as("b"))
      .select(col("id"), col("vec"), col("b.t"), col("b.sig"))
    // query probes: own bucket + flip each bit once, per table
    val probes = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qvec"), explode(tableSigs(col(vecCol))).as("b"))
      .select(col("query_id"), col("qvec"), col("b.t"),
        explode(concat(array(col("b.sig")),
          array((0 until planes).map(p =>
            col("b.sig").bitwiseXOR(lit(1 << p))): _*))).as("sig"))
    val joined = hashedCorpus.join(broadcast(probes), Seq("t", "sig"))
      .select("query_id", "id", "vec", "qvec")
      .dropDuplicates("query_id", "id")
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /**
   * IVF-style ANN: sampled centroids (driver k-means--), corpus
   * partitioned by nearest centroid, queries probe nProbe nearest cells.
   * The scale path when queries are NOT small: both sides shuffle by
   * cell id instead of broadcasting.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, nCells: Int = 16,
      nProbe: Int = 4, seed: Long = 11L): DataFrame = {
    val spark = corpus.sparkSession
    // centroids: deterministic sample of corpus vectors
    val sample = corpus.select(col(vecCol)).sample(false, 1.0, seed)
      .limit(nCells).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val bc = spark.sparkContext.broadcast(sample)
    val nearestCells = udf { (v: Seq[Float], n: Int) =>
      val cs = bc.value
      cs.indices.map { ci =>
        val c = cs(ci)
        var dot = 0.0; var nv = 0.0; var nc = 0.0
        var i = 0
        while (i < v.length && i < c.length) {
          dot += v(i) * c(i); nv += v(i) * v(i); nc += c(i) * c(i); i += 1
        }
        val cos = if (nv == 0 || nc == 0) 0.0
          else dot / (math.sqrt(nv) * math.sqrt(nc))
        (ci, cos)
      }.sortBy(-_._2).take(n).map(_._1).toArray
    }
    val corpusCells = corpus.select(col(idCol).as("id"),
      col(vecCol).as("vec"),
      element_at(nearestCells(col(vecCol), lit(1)), 1).as("cell"))
    val queryCells = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qvec"),
      explode(nearestCells(col(vecCol), lit(nProbe))).as("cell"))
    val joined = corpusCells.join(queryCells, "cell")
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
