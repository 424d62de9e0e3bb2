package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract / resize /
 * frame-sample operators.
 *
 * The decode kernels are STUBS — this container has no image/audio
 * codecs, so `decodeImage`/`decodeAudio` produce a deterministic fake
 * derived from the bytes (clearly marked below). Everything around them
 * is real and load-bearing: the schema contracts, the batch shape
 * (mapPartitions-style iteration, one struct per asset), the
 * size-balanced repartitioning, and the downstream embedding join path.
 * Swapping a real codec in changes ONE function body.
 *
 * Scale notes:
 *  - assets repartition by byte size (`balanceBySize`) so one partition
 *    doesn't get all the 4K videos while another gets thumbnails.
 *  - decode outputs keep the binary column OUT of the result unless
 *    asked — carrying 100 TB of pixels through a shuffle is the classic
 *    mistake; we project metadata/features only.
 */
object Multimodal {

  /** Canonical media struct: (bytes, mime, source_id). */
  def mediaStruct(bytes: Column, mime: Column, sourceId: Column): Column =
    struct(bytes.as("bytes"), mime.as("mime"), sourceId.as("source_id"))

  /**
   * Deterministic pseudo-decode of an image binary.
   * >>> STUB: a real build links an image codec here; the fake derives
   * >>> plausible metadata from a hash of the bytes so pipelines are
   * >>> testable end-to-end with stable results.
   */
  private val decodeImageUdf = udf { bytes: Array[Byte] =>
    if (bytes == null || bytes.isEmpty) None
    else {
      var h = 1125899906842597L
      var i = 0
      val step = math.max(1, bytes.length / 64) // sample bytes, O(64)
      while (i < bytes.length) { h = 31 * h + bytes(i); i += step }
      val w = 64 + math.floorMod(h, 1920).toInt
      val ht = 64 + math.floorMod(h >>> 16, 1080).toInt
      Some((w, ht, 3, bytes.length.toLong))
    }
  }

  /** binary → struct(width, height, channels, byte_size). */
  def decodeImage(bytes: Column): Column =
    decodeImageUdf(bytes).cast(
      "struct<width:int,height:int,channels:int,byte_size:bigint>")

  /**
   * Resize plan: pure-metadata op computing target dims preserving
   * aspect ratio (the pixel work happens inside the stubbed kernel).
   */
  def resizePlan(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"),
      lit(1.0))
    struct(ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"))
  }

  /**
   * Deterministic pseudo feature-extraction: binary → unit-norm
   * embedding. >>> STUB kernel (hash-seeded), real plumbing: output
   * shape array<float> of `dim`, usable by Similarity.* directly.
   */
  def extractFeatures(bytes: Column, dim: Int = 64): Column = {
    val f = udf { b: Array[Byte] =>
      if (b == null) Array.fill(dim)(0f)
      else {
        var h = 1125899906842597L
        var i = 0
        val step = math.max(1, b.length / 256)
        while (i < b.length) { h = 31 * h + b(i); i += step }
        val v = new Array[Float](dim)
        var z = h
        var norm = 0.0
        i = 0
        while (i < dim) {
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          val u = ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
          v(i) = u.toFloat
          norm += u * u
          i += 1
        }
        val n = math.sqrt(norm).toFloat
        if (n > 0) { i = 0; while (i < dim) { v(i) /= n; i += 1 } }
        v
      }
    }
    f(bytes)
  }

  /**
   * Frame-sampling plan for video binaries: emits `n` (frame_idx,
   * offset_ms) rows per asset via posexplode — the real frame grab plugs
   * into the stubbed decode. Output keeps source id, drops bytes.
   */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String,
      n: Int, assumedDurationMs: Column): DataFrame = {
    df.select(col(idCol), assumedDurationMs.as("__dur"),
      posexplode(sequence(lit(0), lit(n - 1))))
      .select(col(idCol), col("col").as("frame_idx"),
        (col("col") * col("__dur") / n).cast("long").as("offset_ms"))
  }

  /**
   * Size-balanced repartition: range-partition assets by cumulative byte
   * size so decode work spreads evenly (heavy assets don't pile up in
   * one task).
   */
  def balanceBySize(df: DataFrame, bytesCol: String, parts: Int)
      : DataFrame =
    df.withColumn("__sz", length(col(bytesCol)))
      .repartitionByRange(parts, col("__sz"),
        spark_partition_id() /* tiebreak spreads equal sizes */)
      .drop("__sz")
}
