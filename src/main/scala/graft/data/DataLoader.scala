package graft.data

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Source dispatch + file loading — the Spark-native analog of the
 * reference's `DataSource` registry and filetype sniffing
 * (reference: xgboost_ray/data_sources/__init__.py:13-24,
 * matrix.py:240-260; CSV: data_sources/csv.py:9-47; Parquet:
 * data_sources/parquet.py:9-48; dir glob matrix.py:501-505).
 *
 * On Spark, multi-file / directory / glob reads, gzip CSV, column
 * pruning, and partition locality are all native to the DataSource V2
 * scan — so each "source" collapses to a reader config. We keep:
 *   - extension sniffing (`get_filetype` analog),
 *   - deterministic file ordering (matrix.py:503-505 sorts globs; Spark's
 *     file listing is deterministic, we sort explicit lists),
 *   - `ignore` / `columns` projection forwarded to the scan so Catalyst
 *     prunes the parquet footer read (matrix.py:765-767).
 */
object DataLoader {

  sealed trait FileType
  case object CsvFile extends FileType
  case object ParquetFile extends FileType
  case object JsonFile extends FileType
  case object OrcFile extends FileType

  /** Extension-based detection (csv.py:20-23, parquet.py:20-23);
    * JSONL — the de-facto web-corpus interchange format (one JSON
    * object per line, often gzipped) — is an r9 addition beyond the
    * reference's registry, as is ORC (the other columnar format a
    * warehouse-fed pipeline inherits; same pushdown/pruning path as
    * parquet in Spark's scan). */
  def sniffFiletype(path: String): Option[FileType] = {
    val p = path.toLowerCase
    if (p.endsWith(".csv") || p.endsWith(".csv.gz")) Some(CsvFile)
    else if (p.endsWith(".parquet") || p.endsWith(".pq")) Some(ParquetFile)
    else if (p.endsWith(".json") || p.endsWith(".jsonl") ||
      p.endsWith(".json.gz") || p.endsWith(".jsonl.gz")) Some(JsonFile)
    else if (p.endsWith(".orc")) Some(OrcFile)
    else None
  }

  /**
   * Load one or more paths into a DataFrame. Multiple files of one format
   * become one multi-path scan (the reference's per-file shard concat,
   * matrix.py:65-67 / csv.py:40, is a no-op on Spark: the scan already
   * yields one logical table with one partition per split).
   *
   * @param columns optional column pruning pushed into the scan
   *                (README.md:197-210 `columns=` kwarg)
   * @param schema  optional explicit schema (feature_types override)
   */
  def load(
      spark: SparkSession,
      paths: Seq[String],
      columns: Option[Seq[String]] = None,
      schema: Option[StructType] = None,
      csvHeader: Boolean = true): DataFrame = {
    require(paths.nonEmpty, "no input paths")
    val sorted = paths.sorted // deterministic order (matrix.py:503-505)
    val types = sorted.flatMap(sniffFiletype).distinct
    require(types.size <= 1,
      s"mixed file types in one load: ${sorted.mkString(", ")}")
    val df = types.headOption match {
      case Some(CsvFile) =>
        val r = spark.read.option("header", csvHeader.toString)
        val r2 = schema.map(r.schema).getOrElse(r.option("inferSchema", "true"))
        r2.csv(sorted: _*)
      case Some(JsonFile) => // JSONL: one object per line (Spark default)
        val r = spark.read
        schema.map(r.schema).getOrElse(r).json(sorted: _*)
      case Some(OrcFile) =>
        val r = spark.read
        schema.map(r.schema).getOrElse(r).orc(sorted: _*)
      case _ => // parquet is the default for dirs / unknown extensions
        val r = spark.read
        schema.map(r.schema).getOrElse(r).parquet(sorted: _*)
    }
    columns match {
      case Some(cs) => df.select(cs.map(col): _*) // pruned at the scan
      case None => df
    }
  }

  def load(spark: SparkSession, path: String): DataFrame =
    load(spark, Seq(path))

  /**
   * Partitioned corpus sink (X65) — write a table as
   * `path/<col>=<value>/part-*.parquet` with the file layout a 100 TB
   * reader wants: directory partition pruning on `partitionCol`, and
   * per-directory file sizes steered to `targetRowsPerFile` so a big
   * partition neither serializes through one giant file (no read
   * parallelism, one straggler writer) nor shatters into
   * shuffle-partition-count shards (footer/metadata blowup).
   *
   * Mechanics: one cheap count aggregate per partition value plans
   * `ceil(rows / target)` buckets for it; rows route to buckets by the
   * deterministic salted-md5 id hash (retry/partitioning-invariant
   * CONTENT per directory — file names are Spark task artifacts); one
   * shuffle on (partition, bucket) spreads writers; Spark's native
   * `maxRecordsPerFile` enforces the per-file cap even where two
   * buckets hash into the same write task. Like any `partitionBy`,
   * the distinct partition-value set must be driver-small (it IS the
   * directory listing).
   *
   * Determinism contract: the input plan is evaluated TWICE (the
   * bucket-count aggregate, then the write re-scan) — it must produce
   * the same rows both times. A nondeterministic lineage (`rand()`,
   * unstable sampling, a source mutating between passes) can surface a
   * partition value or a null at write time that the planning pass
   * never saw; `element_at` (ANSI) / the null check then fail the
   * write job loudly rather than writing a mis-sized or null-keyed
   * directory. `persist()`/`localCheckpoint()` such an input yourself
   * before calling — the sink deliberately does NOT cache what may be
   * a 100 TB dataset on the caller's behalf.
   *
   * @return the planned buckets per partition value (what the layout
   *         spec asserts against)
   */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
      idCol: String, targetRowsPerFile: Long): Map[String, Int] = {
    require(targetRowsPerFile > 0,
      s"targetRowsPerFile must be positive: $targetRowsPerFile")
    val counts = df.groupBy(col(partitionCol).cast("string"))
      .count().collect()
      .map(r => Option(r.getString(0)).getOrElse(
        throw new IllegalArgumentException(
          s"writePartitioned: null $partitionCol — route nulls to an " +
            "explicit sentinel partition upstream")) -> r.getLong(1))
      .toMap
    val buckets = counts.map { case (v, n) =>
      v -> math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
        .toInt
    }
    val bucketOf = typedLit(buckets)
    val b = pmod(graft.ops.CorpusPipeline.hashU32(col(idCol), ":sink"),
      element_at(bucketOf, col(partitionCol).cast("string"))
        .cast("long"))
    // Writer fan-out (r18): repartition with an EXPLICIT partition
    // count of at least Σ buckets. A bare repartition(cols...) hashes
    // the buckets into spark.sql.shuffle.partitions AND lets AQE
    // coalesce small ones back together — measured 2.8× slower on a
    // 50%-hot partition value (SkewCheck sink) because several hot
    // buckets re-serialized through one writer task. The explicit
    // count pins the exchange (AQE honors user-specified repartition
    // numbers) and gives the bucket keys enough reducers that a hot
    // directory's writers actually run in parallel. (An exact one-
    // bucket-per-task RDD partitioner was tried and rejected: the
    // Row round-trip off Tungsten cost 4× the whole write.)
    val totalBuckets = buckets.values.map(_.toLong).sum
    val spark = df.sparkSession
    val fanout = math.max(
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt,
      math.min(totalBuckets, 65536L).toInt)
    df.withColumn("__bucket", b)
      .repartition(fanout, col(partitionCol), col("__bucket"))
      .drop("__bucket")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
    buckets
  }

  /**
   * In-memory matrix ingestion — the Numpy source analog
   * (data_sources/numpy.py:13-33): columns auto-named f0..fN, plus an
   * optional label vector.
   */
  def fromMatrix(
      spark: SparkSession,
      rows: Seq[Array[Double]],
      labels: Option[Seq[Double]] = None): DataFrame = {
    import spark.implicits._
    require(rows.nonEmpty, "empty matrix")
    val n = rows.head.length
    val names = (0 until n).map(i => s"f$i")
    labels match {
      case Some(ys) =>
        require(ys.size == rows.size, "labels length != rows")
        val df = rows.zip(ys).map { case (r, y) => (r.toSeq, y) }
          .toDF("_arr", "label")
        val cols = names.zipWithIndex.map { case (nm, i) =>
          $"_arr".getItem(i).as(nm)
        } :+ $"label"
        df.select(cols: _*)
      case None =>
        val df = rows.map(r => Tuple1(r.toSeq)).toDF("_arr")
        df.select(names.zipWithIndex.map { case (nm, i) =>
          $"_arr".getItem(i).as(nm)
        }: _*)
    }
  }
}
