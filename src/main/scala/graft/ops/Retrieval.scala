package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ranked keyword retrieval over a document corpus — the relevance
 * primitive a training-data pipeline uses for targeted corpus slicing
 * (pull the documents most related to an eval topic before
 * decontamination review) and query-driven quality audits. The
 * reference delegates per-row text handling to its dataframe substrate
 * (`data_sources/partitioned_pandas.py`-style column ops); ranked
 * retrieval is part of the corpus-curation surface this engine adds on
 * top.
 *
 * Scale shape: ZERO shuffle on the corpus. Per-term term frequencies
 * are higher-order array expressions evaluated in the scan projection
 * (the query has a handful of terms — a column each, never an
 * explode+join), corpus statistics (N, Σdl, per-term document
 * frequency) come from ONE aggregate pass, and the final top-k is
 * `TakeOrderedAndProject` (per-partition bounded heaps, k rows to the
 * driver — no global sort). At 100 TB both passes are embarrassingly
 * parallel scans.
 *
 * Determinism: tf/dl/df/N are exact integers; idf and the BM25 ratio
 * are the same two-operand double sequence on both engines (scores of
 * equal (tf…, dl) profiles are bit-identical), ties break on ascending
 * doc id.
 */
object Retrieval {

  /**
   * BM25 top-k: the `topK` highest-scoring documents for `terms`
   * (Robertson/Sparck-Jones BM25 with the Lucene `+1` idf floor:
   * idf = ln((N − df + 0.5)/(df + 0.5) + 1)). Documents containing
   * none of the terms are dropped. Returns (id, score) with the score
   * rounded to 6 decimals, ordered by unrounded score desc, id asc.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: no query terms")
    require(terms.distinct == terms, s"bm25TopK: duplicate terms in $terms")
    require(topK > 0, s"bm25TopK: topK must be positive, got $topK")
    val toks = TextOps.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol).as("id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")))
    // one aggregate pass: corpus size, total length, per-term df
    val statAggs = Seq(count(lit(1)).as("n"),
      sum(col("dl").cast("long")).as("sdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
          .as(s"df_$i")
      }
    val st = base.agg(statAggs.head, statAggs.tail: _*).head()
    val n = st.getAs[Long]("n")
    require(n > 0, "bm25TopK: empty corpus")
    val avgdl = st.getAs[Long]("sdl").toDouble / n.toDouble
    val idfs = terms.indices.map { i =>
      val df = st.getAs[Long](s"df_$i")
      math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }
    // per-term tf as scan-projection array expressions (no shuffle)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("toks"), x => x === lit(t))).as(s"tf_$i")
    }
    val scored = base.select(col("id") +: col("dl") +: tfCols: _*)
    // score shape mirrored EXACTLY by the SQL oracle: idf·(tf·(k1+1))
    // / (tf + k1·((1−b) + b·dl/avgdl)), summed left-to-right
    val dlD = col("dl").cast("double")
    val score = terms.indices.map { i =>
      val tfD = col(s"tf_$i").cast("double")
      lit(idfs(i)) * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / lit(avgdl)))
    }.reduce(_ + _)
    val anyTf = terms.indices.map(i => col(s"tf_$i")).reduce(_ + _)
    scored.filter(anyTf > 0)
      .withColumn("score_raw", score)
      .orderBy(col("score_raw").desc, col("id").asc)
      .limit(topK)
      .select(col("id"), round(col("score_raw"), 6).as("score"))
  }
}
