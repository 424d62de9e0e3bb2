package graft.ml

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.{GraftModel, TrainParams}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * MLlib `Pipeline`/`CrossValidator` interop — the conformance surface
 * the reference gets from sklearn (clone compatibility
 * tests/test_sklearn.py:603, grid-search compatibility :363,
 * get_params round-trips). On Spark the analogous contracts are
 * `org.apache.spark.ml.Estimator` with real `Params` (so `copy`,
 * `ParamMap` introspection, and `CrossValidator`'s
 * `fit(df, paramMap)` all work), `Model.transform`, and
 * `MLWritable`/`MLReadable` persistence.
 *
 * These wrappers delegate training to [[GraftClassifier]] /
 * [[GraftRegressor]]; they add no learning logic. Feature input is
 * plain numeric columns (graft's native convention), not an assembled
 * Vector column — `featuresCols` empty means "every residual numeric
 * column", exactly like [[DMatrixSpec]].
 *
 * Model persistence layers graft's parquet model sink (S12) under the
 * MLlib path: `path/graft/{nodes,meta,labels}` plus a `path/mlparams`
 * JSON table of Param values (the `DefaultParamsWriter` helpers MLlib
 * models use internally are `private[ml]`; the on-disk contract here is
 * self-contained instead).
 */
trait GraftMLParams extends Params {
  final val labelCol =
    new Param[String](this, "labelCol", "label column name")
  final def getLabelCol: String = $(labelCol)
  final val featuresCols = new StringArrayParam(this, "featuresCols",
    "feature columns; empty = every residual numeric column")
  final def getFeaturesCols: Array[String] = $(featuresCols)
  final val numRounds = new IntParam(this, "numRounds",
    "boosting rounds", ParamValidators.gtEq(1))
  final def getNumRounds: Int = $(numRounds)
  final val maxDepth = new IntParam(this, "maxDepth",
    "maximum tree depth", ParamValidators.gtEq(1))
  final def getMaxDepth: Int = $(maxDepth)
  final val eta = new DoubleParam(this, "eta", "learning rate",
    ParamValidators.gt(0.0))
  final def getEta: Double = $(eta)
  final val lambda = new DoubleParam(this, "lambda",
    "L2 regularization", ParamValidators.gtEq(0.0))
  final def getLambda: Double = $(lambda)
  final val subsample = new DoubleParam(this, "subsample",
    "row subsample rate per tree", ParamValidators.inRange(0.0, 1.0,
      lowerInclusive = false, upperInclusive = true))
  final def getSubsample: Double = $(subsample)
  final val seed = new LongParam(this, "seed", "random seed")
  final def getSeed: Long = $(seed)
  final val numWorkers = new IntParam(this, "numWorkers",
    "training repartition count; 0 keeps input partitioning",
    ParamValidators.gtEq(0))
  final def getNumWorkers: Int = $(numWorkers)
  final val numClass = new IntParam(this, "numClass",
    "declared class count (labels 0..k-1, skips label discovery); " +
      "0 = discover from data", ParamValidators.gtEq(0))
  final def getNumClass: Int = $(numClass)

  setDefault(labelCol -> "label", featuresCols -> Array.empty[String],
    numRounds -> 10, maxDepth -> 6, eta -> 0.3, lambda -> 1.0,
    subsample -> 1.0, seed -> 0L, numWorkers -> 0, numClass -> 0)

  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setFeaturesCols(v: Array[String]): this.type = set(featuresCols, v)
  def setNumRounds(v: Int): this.type = set(numRounds, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setEta(v: Double): this.type = set(eta, v)
  def setLambda(v: Double): this.type = set(lambda, v)
  def setSubsample(v: Double): this.type = set(subsample, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setNumWorkers(v: Int): this.type = set(numWorkers, v)
  def setNumClass(v: Int): this.type = set(numClass, v)

  private[ml] def mkTrainParams(objective: String): TrainParams =
    TrainParams(objective = objective, numClass = $(numClass),
      numRounds = $(numRounds), maxDepth = $(maxDepth), eta = $(eta),
      lambda = $(lambda), subsample = $(subsample), seed = $(seed))

  private[ml] def mkSpec: DMatrixSpec = DMatrixSpec(
    labelCol = Seq($(labelCol)),
    featureCols =
      if ($(featuresCols).isEmpty) None else Some($(featuresCols).toSeq))

  protected def validateFitSchema(schema: StructType): Unit = {
    require(schema.fieldNames.contains($(labelCol)),
      s"label column ${$(labelCol)} missing from ${schema.fieldNames.toSeq}")
    $(featuresCols).foreach(f => require(schema.fieldNames.contains(f),
      s"feature column $f missing from ${schema.fieldNames.toSeq}"))
  }
}

private[ml] object GraftMLIO {
  /** Standard MLlib stage-metadata file — `Pipeline`'s shared reader
    * discovers a stage's class from `path/metadata` before invoking the
    * class's own `read`, so custom writers must emit it too (the
    * `DefaultParamsWriter` that MLlib stages use is `private[ml]`; the
    * on-disk JSON format is stable and documented by usage). */
  def saveMetadata(instance: Params with Identifiable, className: String,
      path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    val sc = spark.sparkContext
    val paramJson = instance.params.flatMap(p => instance.get(p).map(v =>
      "\"" + p.name + "\":" + p.asInstanceOf[Param[Any]].jsonEncode(v)))
      .mkString("{", ",", "}")
    val json = s"""{"class":"$className","timestamp":${
      System.currentTimeMillis()},"sparkVersion":"${sc.version}","uid":"${
      instance.uid}","paramMap":$paramJson,"defaultParamMap":{}}"""
    sc.parallelize(Seq(json), 1).saveAsTextFile(s"$path/metadata")
  }

  /** Persist Param values + uid as a one-column-pair JSON table. */
  def saveParams(instance: Params with Identifiable, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val kv = ("__uid", instance.uid) +: instance.params.toSeq.flatMap {
      p => instance.get(p).map(v =>
        (p.name, p.asInstanceOf[Param[Any]].jsonEncode(v)))
    }
    kv.toDF("param", "value").repartition(1)
      .write.mode("overwrite").json(s"$path/mlparams")
  }

  /** (uid, decoded param setter) — applies stored params onto `target`
    * (any Params host that declares the same param names). */
  def loadParams(target: Params, path: String,
      spark: org.apache.spark.sql.SparkSession): String = {
    val kv = spark.read.json(s"$path/mlparams").collect()
      .map(r => r.getAs[String]("param") -> r.getAs[String]("value"))
      .toMap
    kv.foreach { case (name, json) =>
      if (name != "__uid" && target.hasParam(name)) {
        val p = target.getParam(name)
        target.set(p, p.jsonDecode(json))
      }
    }
    kv("__uid")
  }
}

// ---------------- Classifier ----------------

/** MLlib Estimator facade over [[GraftClassifier]]: auto
  * binary/softprob, label encoding, `Pipeline`/`CrossValidator`
  * compatible, `save`/`load` round-trip. */
class GraftXGBClassifier(override val uid: String)
    extends Estimator[GraftXGBClassificationModel] with GraftMLParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXGBClassifier"))

  override def fit(ds: Dataset[_]): GraftXGBClassificationModel = {
    transformSchema(ds.schema)
    val clf = new GraftClassifier()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams("binary:logistic"))
      .setNumWorkers($(numWorkers))
    if ($(featuresCols).nonEmpty) clf.setFeaturesCols($(featuresCols).toSeq)
    if ($(numClass) > 0) clf.setNumClass($(numClass))
    val inner = clf.fit(ds.toDF)
    copyValues(new GraftXGBClassificationModel(uid, inner))
      .setParent(this)
  }

  override def copy(extra: ParamMap): GraftXGBClassifier =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    validateFitSchema(schema)
    // declare what the fitted model will emit so downstream Pipeline
    // stages consuming probability/prediction validate pre-fit; the
    // softprob `probabilities` array is declarable only when the class
    // count is known up front
    val base = schema.add("prediction", DoubleType)
      .add("probability", org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
    if ($(numClass) > 2)
      base.add("probabilities", ArrayType(FloatType, containsNull = false))
    else base
  }
}

object GraftXGBClassifier
    extends DefaultParamsReadable[GraftXGBClassifier] {
  override def load(path: String): GraftXGBClassifier = super.load(path)
}

/** Fitted classifier: `prediction` = hard decoded label (the MLlib
  * classifier convention), `probability` (binary positive-class) or
  * `probabilities` (softprob vector) carries the scores. */
class GraftXGBClassificationModel(
    override val uid: String,
    private[ml] val inner: GraftClassificationModel)
    extends Model[GraftXGBClassificationModel] with GraftMLParams
    with MLWritable {

  def graftModel: GraftModel = inner.model
  def numClasses: Int = inner.numClasses
  def classLabels: Array[Double] = inner.classLabels

  // MLlib evaluators type-check any column named "probability" as a
  // Vector of class probabilities — emit the native convention
  private val binToVec = udf { (p: Double) =>
    org.apache.spark.ml.linalg.Vectors.dense(1.0 - p, p)
  }
  private val arrToVec = udf { (a: Seq[Float]) =>
    org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF
    if (inner.model.numClass >= 2)
      inner.transformClass(df)
        .withColumn("probability", arrToVec(col("probabilities")))
    else {
      val labels = if (inner.classLabels.nonEmpty) inner.classLabels
        else Array(0.0, 1.0)
      GraftBoost.predict(inner.model, df, inner.spec)
        .withColumn("probability", binToVec(col("prediction")))
        .withColumn("prediction",
          when(col("prediction") > 0.5, labels(1)).otherwise(labels(0)))
    }
  }

  override def transformSchema(schema: StructType): StructType = {
    val base = schema.add("prediction", DoubleType)
    val withProb = base.add("probability",
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
    if (inner.model.numClass >= 2)
      withProb.add("probabilities",
        ArrayType(FloatType, containsNull = false))
    else withProb
  }

  override def copy(extra: ParamMap): GraftXGBClassificationModel =
    copyValues(new GraftXGBClassificationModel(uid, inner), extra)
      .setParent(parent)

  override def write: MLWriter =
    new GraftXGBClassificationModel.Writer(this)
}

object GraftXGBClassificationModel
    extends MLReadable[GraftXGBClassificationModel] {

  private[ml] class Writer(instance: GraftXGBClassificationModel)
      extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftMLIO.saveMetadata(instance,
        classOf[GraftXGBClassificationModel].getName, path, sparkSession)
      instance.inner.save(sparkSession, s"$path/graft")
      GraftMLIO.saveParams(instance, path, sparkSession)
    }
  }

  private class Reader extends MLReader[GraftXGBClassificationModel] {
    override def load(path: String): GraftXGBClassificationModel = {
      val tmp = new GraftXGBClassifier()
      val uid = GraftMLIO.loadParams(tmp, path, sparkSession)
      val inner = GraftPredictionModel.loadClassifier(sparkSession,
        s"$path/graft", tmp.mkSpec)
      val m = new GraftXGBClassificationModel(uid, inner)
      tmp.params.foreach(p =>
        tmp.get(p).foreach(v => m.set(m.getParam(p.name), v)))
      m
    }
  }

  override def read: MLReader[GraftXGBClassificationModel] = new Reader

  override def load(path: String): GraftXGBClassificationModel =
    super.load(path)
}

// ---------------- Regressor ----------------

/** MLlib Estimator facade over [[GraftRegressor]]. */
class GraftXGBRegressor(override val uid: String)
    extends Estimator[GraftXGBRegressionModel] with GraftMLParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXGBRegressor"))

  final val objective = new Param[String](this, "objective",
    "regression objective",
    ParamValidators.inArray(Array("reg:squarederror", "reg:absoluteerror")))
  setDefault(objective -> "reg:squarederror")
  def setObjective(v: String): this.type = set(objective, v)

  override def fit(ds: Dataset[_]): GraftXGBRegressionModel = {
    transformSchema(ds.schema)
    val reg = new GraftRegressor()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams($(objective)))
      .setNumWorkers($(numWorkers))
    if ($(featuresCols).nonEmpty) reg.setFeaturesCols($(featuresCols).toSeq)
    val inner = reg.fit(ds.toDF)
    copyValues(new GraftXGBRegressionModel(uid, inner)).setParent(this)
  }

  override def copy(extra: ParamMap): GraftXGBRegressor =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    validateFitSchema(schema)
    schema.add("prediction", DoubleType)
  }
}

object GraftXGBRegressor extends DefaultParamsReadable[GraftXGBRegressor] {
  override def load(path: String): GraftXGBRegressor = super.load(path)
}

class GraftXGBRegressionModel(
    override val uid: String,
    private[ml] val inner: GraftRegressionModel)
    extends Model[GraftXGBRegressionModel] with GraftMLParams
    with MLWritable {

  def graftModel: GraftModel = inner.model

  override def transform(ds: Dataset[_]): DataFrame =
    inner.transform(ds.toDF)

  override def transformSchema(schema: StructType): StructType =
    schema.add("prediction", DoubleType)

  override def copy(extra: ParamMap): GraftXGBRegressionModel =
    copyValues(new GraftXGBRegressionModel(uid, inner), extra)
      .setParent(parent)

  override def write: MLWriter = new GraftXGBRegressionModel.Writer(this)
}

object GraftXGBRegressionModel
    extends MLReadable[GraftXGBRegressionModel] {

  private[ml] class Writer(instance: GraftXGBRegressionModel)
      extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftMLIO.saveMetadata(instance,
        classOf[GraftXGBRegressionModel].getName, path, sparkSession)
      instance.inner.save(sparkSession, s"$path/graft")
      GraftMLIO.saveParams(instance, path, sparkSession)
    }
  }

  private class Reader extends MLReader[GraftXGBRegressionModel] {
    override def load(path: String): GraftXGBRegressionModel = {
      val tmp = new GraftXGBRegressor()
      val uid = GraftMLIO.loadParams(tmp, path, sparkSession)
      val inner = GraftPredictionModel.loadRegressor(sparkSession,
        s"$path/graft", tmp.mkSpec)
      val m = new GraftXGBRegressionModel(uid, inner)
      tmp.params.foreach(p =>
        tmp.get(p).foreach(v => m.set(m.getParam(p.name), v)))
      m
    }
  }

  override def read: MLReader[GraftXGBRegressionModel] = new Reader

  override def load(path: String): GraftXGBRegressionModel =
    super.load(path)
}
