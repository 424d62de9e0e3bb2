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

  /** Parse an ASCII integer starting at `from` in `b`, skipping
    * whitespace and `#` comment lines (netpbm header grammar). Returns
    * (value, nextIndex) or null. */
  private def pnmInt(b: Array[Byte], from: Int): (Int, Int) = {
    var i = from
    var guard = 0
    while (i < b.length && guard < 65536) {
      val c = b(i).toChar
      if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
      else if (c.isWhitespace) i += 1
      else {
        var v = 0L
        var start = i
        while (i < b.length && b(i).toChar.isDigit && i - start < 10) {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        if (i == start || v > Int.MaxValue) return null
        return (v.toInt, i)
      }
      guard += 1
    }
    null
  }

  /**
   * Image decode. REAL header parsing for the uncompressed formats a
   * JVM can read without codec libraries:
   *  - netpbm P1-P6 (PBM/PGM/PPM, ASCII + binary): dims from the ASCII
   *    header, channels 1 (P1/P2/P4/P5) or 3 (P3/P6)
   *  - BMP: little-endian width/height at offsets 18/22, bit depth → channels
   *  - PNG: width/height from the IHDR chunk (metadata only — pixel
   *    decode would need inflate; channels from the color-type byte)
   * Other formats (JPEG etc.) fall back to the deterministic
   * >>> STUB metadata (hash-derived dims) so pipelines stay testable
   * end-to-end in this codec-less container.
   */
  private val decodeImageUdf = udf { bytes: Array[Byte] =>
    if (bytes == null || bytes.isEmpty) None
    else {
      def stub: Option[(Int, Int, Int, Long)] = {
        var h = 1125899906842597L
        var i = 0
        val step = math.max(1, bytes.length / 64) // sample bytes, O(64)
        while (i < bytes.length) { h = 31 * h + bytes(i); i += step }
        val w = 64 + math.floorMod(h, 1920).toInt
        val ht = 64 + math.floorMod(h >>> 16, 1080).toInt
        Some((w, ht, 3, bytes.length.toLong))
      }
      def u32be(o: Int): Long =
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
          ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      def u32le(o: Int): Long =
        (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
          ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      val n = bytes.length
      if (n >= 3 && bytes(0) == 'P' && bytes(1) >= '1' && bytes(1) <= '6'
          && bytes(2).toChar.isWhitespace) {
        val channels = if (bytes(1) == '3' || bytes(1) == '6') 3 else 1
        val r = for {
          (w, i1) <- Option(pnmInt(bytes, 2))
          (h, _) <- Option(pnmInt(bytes, i1))
        } yield (w, h, channels, n.toLong)
        r.orElse(stub)
      } else if (n >= 30 && bytes(0) == 'B' && bytes(1) == 'M') {
        val w = u32le(18).toInt
        val h = math.abs(u32le(22).toInt) // negative = top-down rows
        val bpp = (bytes(28) & 0xFF) | ((bytes(29) & 0xFF) << 8)
        val channels = if (bpp >= 32) 4 else if (bpp >= 24) 3 else 1
        if (w > 0 && h > 0) Some((w, h, channels, n.toLong)) else stub
      } else if (n >= 29 && u32be(0) == 0x89504E47L &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
          bytes(15) == 'R') {
        val w = u32be(16).toInt
        val h = u32be(20).toInt
        val channels = (bytes(25) & 0xFF) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => 3
        }
        if (w > 0 && h > 0) Some((w, h, channels, n.toLong)) else stub
      } else stub
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
