package graft.learner

import org.apache.spark.rdd.RDD

/**
 * Per-feature quantile cut computation + row binning — the histogram
 * method's sketch step (xgboost `tree_method=hist` builds quantile
 * sketches once, then trains on binned bytes; the reference forwards
 * `hist` as the distributable tree method, main.py:1506-1515 rejects
 * `exact`).
 *
 * Two sketch paths:
 *  - `totalRows <= maxSampleRows`: exact quantiles on the collected
 *    rows — deterministic regardless of partitioning (what the
 *    golden-equality tests rely on).
 *  - larger data: one distributed pass building a Greenwald-Khanna
 *    `QuantileSummaries` PER FEATURE, tree-merged. Driver traffic is
 *    O(features × sketch), independent of row count AND of feature
 *    width × sample size — no 200k-row collect blow-up on wide tables.
 *
 * Bin layout: `cuts(f)` are interior boundaries; bin(x) = #{c < x}, so
 * bin(x) <= b  ⇔  x <= cuts(f)(b). numBins(f) = cuts(f).length + 1.
 * Bin 255 is reserved for missing (NaN), so cuts are capped at 254.
 */
object Binner {

  val MissingBin: Int = 255
  val MaxCuts: Int = 254

  final case class Bins(cuts: Array[Array[Float]],
      cat: Array[Boolean] = Array.empty) extends Serializable {
    def numFeatures: Int = cuts.length
    /** Declared-categorical feature (identity-binned category codes)? */
    def isCat(f: Int): Boolean = cat.nonEmpty && cat(f)
    /** Real bins per feature (excluding the missing bin). */
    def numBins(f: Int): Int = cuts(f).length + 1
    def maxRealBins: Int = {
      var m = 1; var f = 0
      while (f < cuts.length) { m = math.max(m, numBins(f)); f += 1 }
      m
    }

    /** bin(x) = #{cuts < x} via binary search (first cut >= x). For a
      * categorical feature the cuts are the integers 0..max−1, making
      * the bin the category code itself — but a non-integral or
      * out-of-range value would silently land in a neighbouring code's
      * bin, so those fail fast instead (enable_categorical contract:
      * codes are non-negative integers, matrix.py:142,159,800).
      *
      * `tolerateUnseenCats` (EVAL rows): an integral code above the
      * trained max maps to the spare bin max+1 — it equals no trained
      * split code, so every one-hot `==` split routes it right, exactly
      * like the raw-float predict path routes unseen categories. TRAIN
      * rows keep the fail-fast (an unseen code there means the binner
      * never saw the data it is histogramming). Eval-only bins never
      * index histograms, so the out-of-numBins value is safe.
      * KNOWN LIMIT: at the full 255-category cardinality there is no
      * spare byte value (max+1 would collide with [[MissingBin]]), so
      * unseen eval codes fall back to the fail-fast there — group rare
      * categories upstream if eval sets can carry novel codes at max
      * cardinality. */
    def bin(f: Int, x: Float, tolerateUnseenCats: Boolean = false): Int = {
      if (x.isNaN) return MissingBin
      if (isCat(f) && (x != math.floor(x) || x < 0 || x > cuts(f).length)) {
        if (tolerateUnseenCats && x == math.floor(x) && x >= 0 &&
            cuts(f).length + 1 < MissingBin)
          return cuts(f).length + 1
        throw new IllegalArgumentException(
          s"graft: categorical feature $f got value $x; expected an " +
            s"integer category code in [0, ${cuts(f).length}] (encode " +
            "categories as non-negative integer codes, e.g. StringIndexer)")
      }
      val c = cuts(f)
      var lo = 0; var hi = c.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (c(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }

    def binRow(x: Array[Float],
        tolerateUnseenCats: Boolean = false): Array[Byte] = {
      // pre-assembled feature widths are a runtime property; a row that
      // disagrees with the fitted width would silently mis-bin (short
      // arrays truncate, long ones drop features) — fail it instead
      if (x.length != cuts.length) throw new IllegalArgumentException(
        s"graft: feature row has ${x.length} element(s); training " +
          s"resolved ${cuts.length} features (inconsistent pre-assembled " +
          "feature widths?)")
      val out = new Array[Byte](x.length)
      var f = 0
      while (f < x.length) {
        out(f) = bin(f, x(f), tolerateUnseenCats).toByte; f += 1
      }
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
      maxSampleRows: Int = 200000, seed: Long = 42L,
      catFeatures: Array[Boolean] = Array.empty,
      knownWidth: Option[Int] = None): Bins = {
    require(maxBins >= 2 && maxBins <= 256, s"maxBins in [2,256]: $maxBins")
    val nCuts = math.min(maxBins - 1, MaxCuts)
    if (totalRows <= maxSampleRows)
      fitExact(rows.collect(), nCuts, catFeatures)
    else if (catFeatures.contains(true))
      // identity binning must observe the TRUE max code and validate
      // every value — a row sample can miss rare categories, which
      // would then fail (or mis-bin) at binning time. The sketch path
      // scans all rows once; its cat accumulator is exact.
      fitSketch(rows, nCuts, catFeatures)
    else {
      // feature width: statically known for per-column assembly
      // (DMatrixSpec.featureWidth) — the rows.first() job is only for
      // pre-assembled vector columns whose width is a runtime property.
      // The width does not change the sample (fraction/seed identical),
      // so cuts are bit-identical either way.
      val nf = knownWidth.getOrElse(rows.first().length)
      // collect a seeded sample only while its cell volume stays small
      // (narrow tables); wide tables take the sketch (driver traffic
      // independent of both row count and sample width)
      val maxCells = 8L << 20
      if (totalRows * nf <= maxCells * 4) {
        val targetRows = math.min(maxSampleRows.toLong, maxCells / nf)
        val sample = rows.sample(withReplacement = false,
          math.min(1.0, targetRows.toDouble / totalRows * 1.1), seed)
          .collect()
        if (sample.nonEmpty) fitExact(sample, nCuts, catFeatures)
        else fitSketch(rows, nCuts, catFeatures, knownWidth)
      } else fitSketch(rows, nCuts, catFeatures, knownWidth)
    }
  }

  private def isCatF(catFeatures: Array[Boolean], f: Int): Boolean =
    catFeatures.nonEmpty && catFeatures(f)

  /** Identity cuts for a categorical feature: cuts = 0..max−1, so
    * bin(code) = code. Codes must be non-negative integers with max ≤
    * MaxCuts (the byte-bin layout caps one feature at 255 categories;
    * bigger cardinalities should be hashed/target-encoded upstream). */
  private def catCuts(f: Int, maxCode: Double, anyBad: Boolean): Array[Float] = {
    if (anyBad) throw new IllegalArgumentException(
      s"graft: categorical feature $f has non-integral or negative " +
        "values; encode categories as integer codes in [0, 254] " +
        "(e.g. StringIndexer)")
    if (maxCode > MaxCuts) throw new IllegalArgumentException(
      s"graft: categorical feature $f has ${maxCode.toInt + 1} " +
        s"categories; the byte-binned layout supports at most " +
        s"${MaxCuts + 1} — hash or group rare categories upstream")
    // a feature with the single code 0 (or none) still gets zero cuts
    if (maxCode < 1) Array.empty[Float]
    else Array.tabulate(maxCode.toInt)(_.toFloat)
  }

  /** Exact quantiles on collected rows (small data / tests). */
  private def fitExact(sample: Array[Array[Float]], nCuts: Int,
      catFeatures: Array[Boolean] = Array.empty): Bins = {
    require(sample.nonEmpty, "cannot fit bins on an empty dataset")
    val numFeatures = sample.head.length
    sample.foreach(r => if (r.length != numFeatures)
      throw new IllegalArgumentException(
        s"graft: feature row has ${r.length} element(s); another row " +
          s"has $numFeatures (inconsistent pre-assembled feature widths?)"))
    val cuts = Array.tabulate(numFeatures) { f =>
      val vals = sample.iterator.map(_(f)).filterNot(_.isNaN).toArray
      if (isCatF(catFeatures, f)) {
        val bad = vals.exists(v => v != math.floor(v) || v < 0)
        catCuts(f, if (vals.isEmpty) 0 else vals.max.toDouble, bad)
      } else if (vals.isEmpty) Array.empty[Float]
      else {
        java.util.Arrays.sort(vals)
        // quantile cut at rank i/(nCuts+1); dedupe keeps cuts strict-mono
        val raw = (1 to nCuts).iterator
          .map(i => vals(((i.toLong * (vals.length - 1)) / (nCuts + 1)).toInt))
          .toArray
        dedupeSorted(raw)
      }
    }
    Bins(cuts, normalizedCat(catFeatures, numFeatures))
  }

  /** Distributed Greenwald-Khanna sketch per feature (one data pass,
    * tree-merged; the engine approxQuantile machinery). Categorical
    * features ride the same pass with a (max, any-bad) accumulator
    * instead of a quantile sketch — identity binning needs only the
    * top code plus the integrality check. */
  private def fitSketch(rows: RDD[Array[Float]], nCuts: Int,
      catFeatures: Array[Boolean] = Array.empty,
      knownWidth: Option[Int] = None): Bins = {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val numFeatures = knownWidth.getOrElse(rows.first().length)
    val relErr = math.min(0.25 / (nCuts + 1), 0.001)
    val catF = catFeatures
    val zero = (
      Array.tabulate(numFeatures)(f =>
        if (isCatF(catF, f)) null
        else new QuantileSummaries(
          QuantileSummaries.defaultCompressThreshold, relErr)),
      Array.fill(numFeatures)(-1.0),      // per-feature max (cat only)
      Array.fill(numFeatures)(false))     // non-integral/negative seen
    val merged = rows.treeAggregate(zero)(
      seqOp = { (acc, row) =>
        if (row.length != numFeatures) throw new IllegalArgumentException(
          s"graft: feature row has ${row.length} element(s); another " +
            s"row has $numFeatures (inconsistent pre-assembled feature " +
            "widths?)")
        var f = 0
        while (f < numFeatures) {
          val v = row(f)
          if (!v.isNaN) {
            if (isCatF(catF, f)) {
              if (v != math.floor(v) || v < 0) acc._3(f) = true
              else if (v > acc._2(f)) acc._2(f) = v.toDouble
            } else acc._1(f) = acc._1(f).insert(v.toDouble)
          }
          f += 1
        }
        acc
      },
      combOp = { (a, b) =>
        var f = 0
        while (f < numFeatures) {
          if (isCatF(catF, f)) {
            a._2(f) = math.max(a._2(f), b._2(f))
            a._3(f) = a._3(f) || b._3(f)
          } else a._1(f) = a._1(f).compress().merge(b._1(f).compress())
          f += 1
        }
        a
      },
      depth = 2)
    val cuts = Array.tabulate(numFeatures) { f =>
      if (isCatF(catF, f))
        catCuts(f, math.max(merged._2(f), 0.0), merged._3(f))
      else {
        val s = merged._1(f).compress()
        if (s.count == 0) Array.empty[Float]
        else {
          val raw = (1 to nCuts).iterator
            .flatMap(i => s.query(i.toDouble / (nCuts + 1)))
            .map(_.toFloat).toArray
          dedupeSorted(raw)
        }
      }
    }
    Bins(cuts, normalizedCat(catFeatures, numFeatures))
  }

  private def normalizedCat(catFeatures: Array[Boolean], nf: Int)
      : Array[Boolean] =
    if (catFeatures.isEmpty || !catFeatures.contains(true)) Array.empty
    else {
      require(catFeatures.length == nf,
        s"categorical flags length ${catFeatures.length} != features $nf")
      catFeatures
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
