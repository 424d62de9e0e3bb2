package graft.learner

import org.apache.spark.rdd.RDD

/**
 * Per-feature quantile cut computation + row binning — the histogram
 * method's sketch step (xgboost `tree_method=hist` builds quantile
 * sketches once, then trains on binned bytes; the reference forwards
 * `hist` as the distributable tree method, main.py:1506-1515 rejects
 * `exact`).
 *
 * v1 sketch: a seeded uniform row sample (capped at `maxSampleRows`)
 * collected to the driver, exact quantiles on the sample. This is the
 * standard sample-based sketch (same family LightGBM uses); at 100 TB
 * the sample is still `maxSampleRows` — the collect is O(sample), not
 * O(data), and the binning pass itself is a single distributed map.
 *
 * Bin layout: `cuts(f)` are interior boundaries; bin(x) = #{c < x}, so
 * bin(x) <= b  ⇔  x <= cuts(f)(b). numBins(f) = cuts(f).length + 1.
 * Bin 255 is reserved for missing (NaN), so cuts are capped at 254.
 */
object Binner {

  val MissingBin: Int = 255
  val MaxCuts: Int = 254

  final case class Bins(cuts: Array[Array[Float]]) extends Serializable {
    def numFeatures: Int = cuts.length
    /** Real bins per feature (excluding the missing bin). */
    def numBins(f: Int): Int = cuts(f).length + 1
    def maxRealBins: Int = {
      var m = 1; var f = 0
      while (f < cuts.length) { m = math.max(m, numBins(f)); f += 1 }
      m
    }

    /** bin(x) = #{cuts < x} via binary search (first cut >= x). */
    def bin(f: Int, x: Float): Int = {
      if (x.isNaN) return MissingBin
      val c = cuts(f)
      var lo = 0; var hi = c.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (c(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }

    def binRow(x: Array[Float]): Array[Byte] = {
      val out = new Array[Byte](x.length)
      var f = 0
      while (f < x.length) { out(f) = bin(f, x(f)).toByte; f += 1 }
      out
    }
  }

  /**
   * Build cuts from a seeded sample of feature rows.
   *
   * @param rows      feature vectors (may contain NaN)
   * @param totalRows exact or estimated row count (drives sample fraction)
   */
  def fit(rows: RDD[Array[Float]], totalRows: Long, maxBins: Int = 256,
      maxSampleRows: Int = 200000, seed: Long = 42L): Bins = {
    require(maxBins >= 2 && maxBins <= 256, s"maxBins in [2,256]: $maxBins")
    val sample: Array[Array[Float]] =
      if (totalRows <= maxSampleRows) rows.collect()
      else rows.sample(withReplacement = false,
        math.min(1.0, maxSampleRows.toDouble / totalRows * 1.1), seed)
        .collect()
    require(sample.nonEmpty, "cannot fit bins on an empty dataset")
    val numFeatures = sample.head.length
    val nCuts = math.min(maxBins - 1, MaxCuts)
    val cuts = Array.tabulate(numFeatures) { f =>
      val vals = sample.iterator.map(_(f)).filterNot(_.isNaN).toArray
      if (vals.isEmpty) Array.empty[Float]
      else {
        java.util.Arrays.sort(vals)
        // quantile cut at rank i/(nCuts+1); dedupe keeps cuts strict-mono
        val raw = (1 to nCuts).iterator
          .map(i => vals(((i.toLong * (vals.length - 1)) / (nCuts + 1)).toInt))
          .toArray
        dedupeSorted(raw)
      }
    }
    Bins(cuts)
  }

  private def dedupeSorted(a: Array[Float]): Array[Float] = {
    if (a.isEmpty) return a
    val out = new scala.collection.mutable.ArrayBuffer[Float](a.length)
    out += a(0)
    var i = 1
    while (i < a.length) {
      if (a(i) > out.last) out += a(i)
      i += 1
    }
    out.toArray
  }
}
