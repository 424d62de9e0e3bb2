package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract / resize /
 * frame-sample operators.
 *
 * Decode is REAL wherever the JVM can read pixels without a codec
 * library: netpbm P1–P6 headers AND pixel payloads (see
 * [[imageChannelStats]] — true per-channel mean/std over the raw
 * samples), BMP/PNG headers. Only the codec-dependent kernels
 * (JPEG/PNG pixel decode, audio) remain deterministic-fake STUBS,
 * clearly marked below. Everything around them is real and
 * load-bearing: the schema contracts, the batch shape, the
 * size-balanced repartitioning, and the downstream embedding join
 * path. Swapping a real codec in changes ONE function body.
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
   * REAL pixel feature-extraction kernel for the netpbm family: the
   * P1–P6 pixel payload follows the ASCII header with no codec, so
   * per-channel mean/std are computed from the actual sample values —
   *  - P1/P2/P3: ASCII samples (bitmap / gray / RGB interleaved)
   *  - P4: packed bits, each row padded to a byte boundary
   *  - P5/P6: binary samples, 1 byte (maxval ≤ 255) or 2 bytes
   *    big-endian (maxval ≤ 65535) each, RGB interleaved for P6
   * Mean and std are exact-in-double (integer sums; population std via
   * sqrt(E[v²] − E[v]²)), so the result is independently replayable in
   * SQL — the `mm_features` DuckDB oracle does exactly that.
   * Returns NULL for non-netpbm bytes or a truncated payload (the
   * codec-needing formats — JPEG/PNG pixels — are where the stub
   * kernel remains); callers decide the fallback.
   */
  private[ops] def pnmChannelStats(bytes: Array[Byte])
      : Option[Seq[(Int, Long, Double, Double)]] = {
    if (bytes == null || bytes.length < 4 || bytes(0) != 'P') return None
    val kind = bytes(1) - '0'
    if (kind < 1 || kind > 6 || !bytes(2).toChar.isWhitespace) return None
    val channels = if (kind == 3 || kind == 6) 3 else 1
    val r1 = pnmInt(bytes, 2)
    if (r1 == null) return None
    val (w, i1) = r1
    val r2 = pnmInt(bytes, i1)
    if (r2 == null) return None
    val (h, i2) = r2
    var maxval = 1
    var pos = i2
    if (kind != 1 && kind != 4) {
      val r3 = pnmInt(bytes, pos)
      if (r3 == null) return None
      maxval = r3._1
      pos = r3._2
    }
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535) return None
    val nPx = w.toLong * h
    val sum = new Array[Double](channels)
    val sumsq = new Array[Double](channels)
    kind match {
      case 1 => // ASCII bitmap; digits may run together ("0110")
        var i = pos
        var count = 0L
        while (i < bytes.length && count < nPx) {
          val c = bytes(i).toChar
          if (c == '0' || c == '1') {
            val v = (c - '0').toDouble
            sum(0) += v; sumsq(0) += v * v; count += 1
          } else if (c == '#') {
            while (i < bytes.length && bytes(i) != '\n') i += 1
          } else if (!c.isWhitespace) return None
          i += 1
        }
        if (count < nPx) return None
      case 2 | 3 => // ASCII samples
        val total = nPx * channels
        var i = pos
        var count = 0L
        while (count < total) {
          val r = pnmInt(bytes, i)
          if (r == null) return None
          val v = r._1.toDouble
          i = r._2
          val c = (count % channels).toInt
          sum(c) += v; sumsq(c) += v * v
          count += 1
        }
      case 4 => // packed bits after ONE whitespace byte; rows padded
        val dataStart = pos + 1
        val rowBytes = (w + 7) / 8
        if (bytes.length < dataStart + h.toLong * rowBytes) return None
        var r = 0
        while (r < h) {
          var j = 0
          while (j < w) {
            val b = bytes(dataStart + r * rowBytes + j / 8)
            val v = ((b >> (7 - (j % 8))) & 1).toDouble
            sum(0) += v; sumsq(0) += v * v
            j += 1
          }
          r += 1
        }
      case _ => // 5 | 6: binary samples after ONE whitespace byte
        val dataStart = pos + 1
        val bps = if (maxval > 255) 2 else 1
        val total = nPx * channels
        if (bytes.length < dataStart + total * bps) return None
        var i = 0L
        while (i < total) {
          val o = dataStart + i * bps
          val v =
            if (bps == 1) (bytes(o.toInt) & 0xFF).toDouble
            else (((bytes(o.toInt) & 0xFF) << 8) |
              (bytes(o.toInt + 1) & 0xFF)).toDouble
          val c = (i % channels).toInt
          sum(c) += v; sumsq(c) += v * v
          i += 1
        }
    }
    Some((0 until channels).map { c =>
      val mean = sum(c) / nPx
      val variance = math.max(sumsq(c) / nPx - mean * mean, 0.0)
      (c, nPx, mean, math.sqrt(variance))
    })
  }

  private val channelStatsUdf = udf { bytes: Array[Byte] =>
    pnmChannelStats(bytes)
  }

  /** binary → array<struct<channel, n_px, mean, std>> (one row per
    * color channel), NULL for non-netpbm/truncated input — see
    * [[pnmChannelStats]]. */
  def imageChannelStats(bytes: Column): Column =
    channelStatsUdf(bytes).cast(
      "array<struct<channel:int,n_px:bigint,mean:double,std:double>>")

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
