package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column-role specification over a DataFrame — the Spark-native analog of
 * the reference's `RayDMatrix` (reference: xgboost_ray/matrix.py:696-968).
 *
 * The reference models a logical, lazily-loaded, sharded 2-D table of
 * float features plus per-row metadata vectors (label, weight, qid,
 * base_margin, survival bounds). On Spark the table IS a lazy, sharded
 * `DataFrame`; this class only declares which columns play which role and
 * resolves the feature set (all residual columns, original order
 * preserved — matrix.py:306-347).
 *
 * Scale note: `resolve()` emits a single `select` — Catalyst prunes the
 * parquet scan down to exactly the referenced columns, so a 100-column
 * table with 4 features reads 4 (+roles) columns, not 100.
 *
 * @param labelCol        label column; may be multiple names for
 *                        multi-label (matrix.py:410-425)
 * @param weightCol       per-row sample weight (matrix.py:315-317)
 * @param baseMarginCol   initial prediction offset (matrix.py:329-331)
 * @param qidCol          query/group id for ranking (matrix.py:325-327)
 * @param labelLowerCol   survival lower bound (matrix.py:333-343)
 * @param labelUpperCol   survival upper bound
 * @param ignore          columns to drop before role resolution
 *                        (matrix.py:744-745)
 * @param featureCols     explicit feature list (feature_names override,
 *                        matrix.py:797); None = all residual columns
 * @param featureWeights  per-feature sampling weight for colsample
 *                        (matrix.py:319-323)
 * @param missing         value treated as NA (matrix.py:794); NaN always is
 * @param categoricalCols feature columns holding CATEGORY CODES
 *                        (non-negative integers) — the
 *                        `enable_categorical` analog
 *                        (matrix.py:142,159,800): the tree grower uses
 *                        one-hot `== code` partition splits on them
 *                        instead of ordered thresholds. String columns
 *                        must be indexed upstream (e.g. StringIndexer).
 */
final case class DMatrixSpec(
    labelCol: Seq[String] = Nil,
    weightCol: Option[String] = None,
    baseMarginCol: Option[String] = None,
    qidCol: Option[String] = None,
    labelLowerCol: Option[String] = None,
    labelUpperCol: Option[String] = None,
    ignore: Seq[String] = Nil,
    featureCols: Option[Seq[String]] = None,
    featureWeights: Option[Array[Double]] = None,
    missing: Option[Double] = None,
    categoricalCols: Seq[String] = Nil) {

  def hasLabel: Boolean = labelCol.nonEmpty

  /** Role columns, in the order they are appended after the features. */
  def roleCols: Seq[String] =
    labelCol ++ weightCol ++ baseMarginCol ++ qidCol ++ labelLowerCol ++
      labelUpperCol

  /**
   * Resolve feature columns: explicit list if given, else every column
   * that is neither a role column nor ignored, preserving the source
   * column order (reference preserves residual order,
   * tests/test_matrix.py:64-72).
   */
  def resolveFeatures(df: DataFrame): Seq[String] = featureCols.getOrElse {
    val excluded = (roleCols ++ ignore).toSet
    df.columns.filterNot(excluded.contains).toSeq
  }

  /**
   * Numeric-feature projection: features kept as individual columns
   * (residual order), roles appended. The relational fragment of
   * matrix.py:283-358 `_split_dataframe`.
   */
  def project(df: DataFrame): DataFrame = {
    val feats = resolveFeatures(df)
    require(feats.nonEmpty, "DMatrixSpec resolved zero feature columns")
    df.select((feats ++ roleCols).map(col): _*)
  }

  /**
   * The single PRE-ASSEMBLED feature column, when `featureCols` names
   * exactly one column holding an MLlib `Vector` or a numeric array —
   * the `VectorAssembler` convention, so a standard MLlib `Pipeline`
   * stage output feeds the trainer directly (reference analog: the
   * sklearn wrappers accept an already-2-D X).
   */
  def preAssembledCol(df: DataFrame): Option[String] = featureCols match {
    case Some(Seq(f)) if df.columns.contains(f) =>
      df.schema(f).dataType match {
        case dt if dt == org.apache.spark.ml.linalg.SQLDataTypes.VectorType
          => Some(f)
        case ArrayType(_: NumericType, _) => Some(f)
        case _ => None
      }
    case _ => None
  }

  /**
   * The `features: array<float>` expression for this spec over `df`:
   * per-column assembly (residual order) or a pre-assembled
   * Vector/array column converted in place. `missing` values and NULLs
   * become NaN (xgboost semantics: NaN rides the per-node default
   * direction). Pure Catalyst expressions — whole-stage codegen, no UDF.
   * Shared by training assembly and every predict entry point, so
   * train- and inference-time feature semantics cannot drift.
   */
  def featuresArray(df: DataFrame): Column = preAssembledCol(df) match {
    case Some(f) =>
      val arr =
        if (df.schema(f).dataType ==
            org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
          org.apache.spark.ml.functions.vector_to_array(col(f), "float32")
        else col(f).cast(ArrayType(FloatType, containsNull = true))
      val filled = missing match {
        case Some(m) => transform(arr, x =>
          when(x.isNull || x === lit(m.toFloat), lit(Float.NaN))
            .otherwise(x))
        case None => transform(arr, x => coalesce(x, lit(Float.NaN)))
      }
      // fail-fast: a NULL row in the pre-assembled column would surface
      // as an opaque NPE deep inside the trainer/scorer; raise a clear
      // error at the row instead (element NULLs are valid — they become
      // NaN above; this guards the whole-row NULL only)
      when(col(f).isNull, raise_error(lit(
        s"graft: pre-assembled feature column '$f' is NULL for a row; " +
          "drop or impute NULL feature rows before train/predict")))
        .otherwise(filled)
    case None =>
      val feats = resolveFeatures(df)
      require(feats.nonEmpty, "DMatrixSpec resolved zero feature columns")
      val fcols: Seq[Column] = feats.map { f =>
        val c = col(f).cast(FloatType)
        missing match {
          case Some(m) =>
            when(c.isNull || c === lit(m.toFloat), lit(Float.NaN))
              .otherwise(c)
          case None => when(c.isNull, lit(Float.NaN)).otherwise(c)
        }
      }
      array(fcols: _*)
  }

  /** Per-feature categorical flags aligned with [[resolveFeatures]]
    * order — what the binner/grower consume. Empty when no categorical
    * columns are declared. */
  def categoricalFlags(df: DataFrame): Array[Boolean] =
    if (categoricalCols.isEmpty) Array.empty
    else {
      val feats = resolveFeatures(df)
      val catSet = categoricalCols.toSet
      feats.map(catSet.contains).toArray
    }

  /** Feature-vector width when statically known (per-column assembly);
    * None for a pre-assembled Vector/array column, whose width is a
    * runtime property. */
  def featureWidth(df: DataFrame): Option[Int] =
    if (preAssembledCol(df).isDefined) None
    else Some(resolveFeatures(df).size)

  /**
   * Assembled form: one `features: array<float>` column + role columns.
   */
  def assemble(df: DataFrame): DataFrame = {
    // role columns cast to what the learner consumes: labels/weights/
    // margins/bounds → float, qid → long
    val roles: Seq[Column] =
      labelCol.map(c => col(c).cast(FloatType).as(c)) ++
        (weightCol ++ baseMarginCol ++ labelLowerCol ++ labelUpperCol)
          .map(c => col(c).cast(FloatType).as(c)) ++
        qidCol.map(c => col(c).cast(LongType).as(c))
    df.select(
      (featuresArray(df).as(DMatrixSpec.FeaturesCol) +: roles): _*)
  }

  /** Analysis-time validation (matrix.py:890-892, main.py:1548-1553):
    * role columns exist, a label is present when required, feature
    * columns carry numeric types (P6 type-compat check — the reference
    * fails on non-numeric features inside xgb.DMatrix; we fail fast at
    * plan time instead of silently casting strings to NaN). */
  def validate(df: DataFrame, requireLabel: Boolean): Unit = {
    val cols = df.columns.toSet
    val missingCols = (roleCols ++ ignore.filter(cols.contains))
      .filterNot(cols.contains)
    require(missingCols.isEmpty,
      s"Role columns not in schema: ${missingCols.mkString(", ")}")
    if (requireLabel) require(hasLabel,
      "Training requires a label column (reference: RayDMatrix has_label " +
        "check, matrix.py:890-892)")
    if (preAssembledCol(df).isEmpty) {
      val nonNumeric = resolveFeatures(df).filter { f =>
        df.schema(f).dataType match {
          case _: NumericType => false
          case _ => true
        }
      }
      require(nonNumeric.isEmpty,
        s"Non-numeric feature columns: ${nonNumeric.mkString(", ")} " +
          "(cast them, list them in `ignore`, or set `featureCols`)")
      featureWeights.foreach { fw =>
        val n = resolveFeatures(df).size
        require(fw.length == n,
          s"feature_weights length ${fw.length} != num features $n")
      }
    } // pre-assembled width is only known at runtime; the binner checks it
    if (categoricalCols.nonEmpty) {
      // categorical columns must be resolvable BY NAME to feature
      // positions — impossible through a pre-assembled Vector/array
      require(preAssembledCol(df).isEmpty,
        "categoricalCols cannot be used with a pre-assembled feature " +
          "column (Vector/array) — pass per-column features so the " +
          "categorical positions are known")
      val feats = resolveFeatures(df).toSet
      val notFeature = categoricalCols.filterNot(feats.contains)
      require(notFeature.isEmpty,
        s"categoricalCols not among the resolved feature columns: " +
          s"${notFeature.mkString(", ")}")
      // string/categorical dtypes need indexing upstream — the feature
      // pipeline is float-typed end to end (codes ride as floats)
      val strTyped = categoricalCols.filter { c =>
        df.schema(c).dataType match {
          case _: NumericType => false
          case _ => true
        }
      }
      require(strTyped.isEmpty,
        s"categorical columns must hold numeric category CODES; " +
          s"non-numeric: ${strTyped.mkString(", ")} (index them first, " +
          "e.g. StringIndexer)")
    }
  }
}

object DMatrixSpec {
  val FeaturesCol = "features"

  /** Convenience: single label column. */
  def apply(label: String): DMatrixSpec = DMatrixSpec(labelCol = Seq(label))
}
