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
    "maximum tree depth; 0 = unbounded (lossguide with maxLeaves only)",
    ParamValidators.gtEq(0))
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
  final val earlyStoppingRounds = new IntParam(this, "earlyStoppingRounds",
    "stop when the last eval set's last metric has not improved for " +
      "this many rounds; 0 disables (xgboost early_stopping_rounds)",
    ParamValidators.gtEq(0))
  final def getEarlyStoppingRounds: Int = $(earlyStoppingRounds)
  final val evalMetric = new StringArrayParam(this, "evalMetric",
    "eval metric names recorded per round per eval set; empty = the " +
      "objective's default metric")
  final def getEvalMetric: Array[String] = $(evalMetric)
  final val categoricalCols = new StringArrayParam(this,
    "categoricalCols", "feature columns holding integer category " +
      "codes — one-hot == splits in the tree grower " +
      "(enable_categorical analog); empty = all numeric")
  final def getCategoricalCols: Array[String] = $(categoricalCols)
  final val booster = new Param[String](this, "booster",
    "xgboost booster: gbtree (default) or dart (gblinear has its own " +
      "facade)", ParamValidators.inArray(Array("gbtree", "dart")))
  final def getBooster: String = $(booster)
  final val rateDrop = new DoubleParam(this, "rateDrop",
    "dart dropout rate per existing tree per round",
    ParamValidators.inRange(0.0, 1.0))
  final def getRateDrop: Double = $(rateDrop)
  final val skipDrop = new DoubleParam(this, "skipDrop",
    "dart probability of skipping dropout for a round",
    ParamValidators.inRange(0.0, 1.0))
  final def getSkipDrop: Double = $(skipDrop)
  final val oneDrop = new BooleanParam(this, "oneDrop",
    "dart: force at least one dropped tree when dropout is not skipped")
  final def getOneDrop: Boolean = $(oneDrop)
  final val sampleType = new Param[String](this, "sampleType",
    "dart dropout sampling: uniform or weighted",
    ParamValidators.inArray(Array("uniform", "weighted")))
  final def getSampleType: String = $(sampleType)
  final val normalizeType = new Param[String](this, "normalizeType",
    "dart normalization: tree or forest",
    ParamValidators.inArray(Array("tree", "forest")))
  final def getNormalizeType: String = $(normalizeType)
  final val alpha = new DoubleParam(this, "alpha",
    "L1 regularization on leaf weights (xgboost alpha)",
    ParamValidators.gtEq(0.0))
  final def getAlpha: Double = $(alpha)
  final val gamma = new DoubleParam(this, "gamma",
    "minimum split gain (xgboost gamma / min_split_loss)",
    ParamValidators.gtEq(0.0))
  final def getGamma: Double = $(gamma)
  final val minChildWeight = new DoubleParam(this, "minChildWeight",
    "minimum child hessian sum (xgboost min_child_weight)",
    ParamValidators.gtEq(0.0))
  final def getMinChildWeight: Double = $(minChildWeight)
  final val colsampleBytree = new DoubleParam(this, "colsampleBytree",
    "feature subsample per tree", ParamValidators.inRange(0.0, 1.0,
      lowerInclusive = false, upperInclusive = true))
  final def getColsampleBytree: Double = $(colsampleBytree)
  final val colsampleBylevel = new DoubleParam(this, "colsampleBylevel",
    "feature subsample per depth level", ParamValidators.inRange(0.0,
      1.0, lowerInclusive = false, upperInclusive = true))
  final def getColsampleBylevel: Double = $(colsampleBylevel)
  final val colsampleBynode = new DoubleParam(this, "colsampleBynode",
    "feature subsample per split", ParamValidators.inRange(0.0, 1.0,
      lowerInclusive = false, upperInclusive = true))
  final def getColsampleBynode: Double = $(colsampleBynode)
  final val scalePosWeight = new DoubleParam(this, "scalePosWeight",
    "positive-class gradient scale (xgboost scale_pos_weight)",
    ParamValidators.gt(0.0))
  final def getScalePosWeight: Double = $(scalePosWeight)
  final val maxDeltaStep = new DoubleParam(this, "maxDeltaStep",
    "cap on raw leaf weight, 0 = off (xgboost max_delta_step)",
    ParamValidators.gtEq(0.0))
  final def getMaxDeltaStep: Double = $(maxDeltaStep)
  final val monotoneConstraints = new IntArrayParam(this,
    "monotoneConstraints", "per-feature monotonicity (+1/0/-1), " +
      "empty = unconstrained (xgboost monotone_constraints)")
  final def getMonotoneConstraints: Array[Int] = $(monotoneConstraints)
  final val growPolicy = new Param[String](this, "growPolicy",
    "tree growth policy: depthwise (level order) or lossguide " +
      "(best-first, xgboost grow_policy)",
    ParamValidators.inArray(Array("depthwise", "lossguide")))
  final def getGrowPolicy: String = $(growPolicy)
  final val maxLeaves = new IntParam(this, "maxLeaves",
    "max leaves per tree, 0 = unbounded (xgboost max_leaves)",
    ParamValidators.gtEq(0))
  final def getMaxLeaves: Int = $(maxLeaves)
  final val maxCatToOnehot = new IntParam(this, "maxCatToOnehot",
    "one-hot below, optimal-partition categorical splits at or above " +
      "this category count (xgboost max_cat_to_onehot)",
    ParamValidators.gtEq(1))
  final def getMaxCatToOnehot: Int = $(maxCatToOnehot)
  /** xgboost process_type: "update" re-fits the `initModel`'s trees
    * on the fit data instead of growing new ones (updater=refresh). */
  final val processType = new Param[String](this, "processType",
    "xgboost process_type: default (grow trees) or update (refresh an " +
      "initModel's leaf values/stats on the fit data)",
    ParamValidators.inArray(Array("default", "update")))
  final def getProcessType: String = $(processType)
  final val refreshLeaf = new BooleanParam(this, "refreshLeaf",
    "process_type=update: also refresh leaf VALUES (xgboost " +
      "refresh_leaf; false = stats only)")
  final def getRefreshLeaf: Boolean = $(refreshLeaf)

  setDefault(labelCol -> "label", featuresCols -> Array.empty[String],
    numRounds -> 10, maxDepth -> 6, eta -> 0.3, lambda -> 1.0,
    subsample -> 1.0, seed -> 0L, numWorkers -> 0, numClass -> 0,
    earlyStoppingRounds -> 0, evalMetric -> Array.empty[String],
    categoricalCols -> Array.empty[String], booster -> "gbtree",
    rateDrop -> 0.0, skipDrop -> 0.0, oneDrop -> false,
    sampleType -> "uniform", normalizeType -> "tree",
    alpha -> 0.0, gamma -> 0.0, minChildWeight -> 1.0,
    colsampleBytree -> 1.0, colsampleBylevel -> 1.0,
    colsampleBynode -> 1.0, scalePosWeight -> 1.0,
    maxDeltaStep -> 0.0, monotoneConstraints -> Array.empty[Int],
    growPolicy -> "depthwise", maxLeaves -> 0, maxCatToOnehot -> 4,
    processType -> "default", refreshLeaf -> true)

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
  def setEarlyStoppingRounds(v: Int): this.type =
    set(earlyStoppingRounds, v)
  def setEvalMetric(v: Array[String]): this.type = set(evalMetric, v)
  def setCategoricalCols(v: Array[String]): this.type =
    set(categoricalCols, v)
  def setBooster(v: String): this.type = set(booster, v)
  def setRateDrop(v: Double): this.type = set(rateDrop, v)
  def setSkipDrop(v: Double): this.type = set(skipDrop, v)
  def setOneDrop(v: Boolean): this.type = set(oneDrop, v)
  def setSampleType(v: String): this.type = set(sampleType, v)
  def setNormalizeType(v: String): this.type = set(normalizeType, v)
  def setAlpha(v: Double): this.type = set(alpha, v)
  def setGamma(v: Double): this.type = set(gamma, v)
  def setMinChildWeight(v: Double): this.type = set(minChildWeight, v)
  def setColsampleBytree(v: Double): this.type = set(colsampleBytree, v)
  def setColsampleBylevel(v: Double): this.type =
    set(colsampleBylevel, v)
  def setColsampleBynode(v: Double): this.type = set(colsampleBynode, v)
  def setScalePosWeight(v: Double): this.type = set(scalePosWeight, v)
  def setMaxDeltaStep(v: Double): this.type = set(maxDeltaStep, v)
  def setMonotoneConstraints(v: Array[Int]): this.type =
    set(monotoneConstraints, v)
  def setGrowPolicy(v: String): this.type = set(growPolicy, v)
  def setMaxLeaves(v: Int): this.type = set(maxLeaves, v)
  def setMaxCatToOnehot(v: Int): this.type = set(maxCatToOnehot, v)
  def setProcessType(v: String): this.type = set(processType, v)
  def setRefreshLeaf(v: Boolean): this.type = set(refreshLeaf, v)

  private[ml] def mkTrainParams(objective: String): TrainParams =
    TrainParams(objective = objective, numClass = $(numClass),
      numRounds = $(numRounds), maxDepth = $(maxDepth), eta = $(eta),
      lambda = $(lambda), subsample = $(subsample), seed = $(seed),
      earlyStoppingRounds = $(earlyStoppingRounds),
      evalMetric = $(evalMetric).toSeq,
      booster = $(booster), rateDrop = $(rateDrop),
      skipDrop = $(skipDrop), oneDrop = $(oneDrop),
      sampleType = $(sampleType), normalizeType = $(normalizeType),
      alpha = $(alpha), gamma = $(gamma),
      minChildWeight = $(minChildWeight),
      colsampleByTree = $(colsampleBytree),
      colsampleByLevel = $(colsampleBylevel),
      colsampleByNode = $(colsampleBynode),
      scalePosWeight = $(scalePosWeight),
      maxDeltaStep = $(maxDeltaStep),
      monotoneConstraints = $(monotoneConstraints).toSeq,
      growPolicy = $(growPolicy), maxLeaves = $(maxLeaves),
      maxCatToOnehot = $(maxCatToOnehot),
      processType = $(processType), refreshLeaf = $(refreshLeaf))

  private[ml] def mkSpec: DMatrixSpec = DMatrixSpec(
    labelCol = Seq($(labelCol)),
    featureCols =
      if ($(featuresCols).isEmpty) None else Some($(featuresCols).toSeq),
    categoricalCols = $(categoricalCols).toSeq)

  protected def validateFitSchema(schema: StructType): Unit = {
    require(schema.fieldNames.contains($(labelCol)),
      s"label column ${$(labelCol)} missing from ${schema.fieldNames.toSeq}")
    $(featuresCols).foreach(f => require(schema.fieldNames.contains(f),
      s"feature column $f missing from ${schema.fieldNames.toSeq}"))
  }
}

/** Fit-time eval sets (xgboost sklearn's `eval_set=` kwarg in `fit`):
  * DATA, not a Param — DataFrames are not JSON-encodable, so, exactly
  * like xgboost's `eval_set` (absent from `get_params()`), they are
  * not persisted by save/load and not carried by `copy()`. Per-round
  * metric histories land on the fitted model's `evalsResult`; pair
  * with `earlyStoppingRounds`/`evalMetric` Params for early stopping. */
trait GraftXGBEvalSets {
  protected var evalSets: Seq[(String, DataFrame)] = Nil
  def setEvalSets(es: Seq[(String, DataFrame)]): this.type = {
    evalSets = es; this
  }
}

/** Fit-time warm start (xgboost sklearn's `xgb_model=` kwarg in `fit`,
  * reference sklearn.py:466,518): boosting continues from the given
  * model's trees. DATA, not a Param — like eval sets, not persisted by
  * save/load and not carried by `copy()`. xgboost-JSON imports are
  * inference-only and fail fast in the trainer. */
trait GraftXGBInitModel {
  protected var initBooster: Option[graft.learner.GraftModel] = None
  def setInitModel(m: graft.learner.GraftModel): this.type = {
    initBooster = Some(m); this
  }
}

/** Forwarded predict kwargs (`pred_leaf` / `pred_contribs` /
  * `pred_interactions`) on the MLlib tree-model surface — same columns
  * as the native API (`leaf_indices` / `contribs` / `interactions`),
  * exact-SHAP defaults with the approx flags as escape hatches. */
trait GraftXGBPredictKwargs {
  protected def kwargsModel: GraftPredictionModel
  def transformLeaf(ds: Dataset[_]): DataFrame =
    kwargsModel.transformLeaf(ds.toDF)
  def transformContrib(ds: Dataset[_],
      approxContribs: Boolean = false): DataFrame =
    kwargsModel.transformContrib(ds.toDF, approxContribs)
  def transformInteractions(ds: Dataset[_],
      approxInteractions: Boolean = false): DataFrame =
    kwargsModel.transformInteractions(ds.toDF, approxInteractions)
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
    with GraftXGBEvalSets with GraftXGBInitModel with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXGBClassifier"))

  override def fit(ds: Dataset[_]): GraftXGBClassificationModel = {
    transformSchema(ds.schema)
    val clf = new GraftClassifier()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams("binary:logistic"))
      .setNumWorkers($(numWorkers))
      .setEvalSets(evalSets)
    initBooster.foreach(b => clf.setInitModel(b))
    if ($(featuresCols).nonEmpty) clf.setFeaturesCols($(featuresCols).toSeq)
    if ($(categoricalCols).nonEmpty)
      clf.setCategoricalCols($(categoricalCols).toSeq)
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
    with GraftXGBPredictKwargs
    with MLWritable {

  def graftModel: GraftModel = inner.model
  protected def kwargsModel: GraftPredictionModel = inner
  def numClasses: Int = inner.numClasses
  def classLabels: Array[Double] = inner.classLabels

  /** Per-round eval metric history from fit-time `setEvalSets` (the
    * xgboost `evals_result()` surface): evalSetName → metric → values. */
  def evalsResult: Map[String,
      Map[String, scala.collection.mutable.ArrayBuffer[Double]]] =
    inner.evalsResult

  /** sklearn `feature_importances_` in the MLlib model convention: a
    * normalized dense Vector (sums to 1; indices follow the resolved
    * feature order). `importanceType` ∈ weight | gain | total_gain |
    * cover | total_cover. */
  def featureImportances(importanceType: String)
      : org.apache.spark.ml.linalg.Vector =
    org.apache.spark.ml.linalg.Vectors.dense(
      inner.featureImportances(importanceType))
  def featureImportances: org.apache.spark.ml.linalg.Vector =
    featureImportances("weight")

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
    with GraftXGBEvalSets with GraftXGBInitModel with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXGBRegressor"))

  final val objective = new Param[String](this, "objective",
    "regression objective (pointwise, label-column based; survival:cox " +
      "uses the signed-label convention — survival:aft needs bounds " +
      "columns and stays on the GraftRegressor estimator)",
    ParamValidators.inArray(Array("reg:squarederror", "reg:absoluteerror",
      "reg:pseudohubererror", "reg:quantileerror", "count:poisson",
      "reg:gamma", "reg:tweedie", "survival:cox")))
  setDefault(objective -> "reg:squarederror")
  def setObjective(v: String): this.type = set(objective, v)

  final val huberSlope = new DoubleParam(this, "huberSlope",
    "reg:pseudohubererror transition slope (xgboost huber_slope)",
    ParamValidators.gt(0.0))
  setDefault(huberSlope -> 1.0)
  def setHuberSlope(v: Double): this.type = set(huberSlope, v)

  final val quantileAlpha = new DoubleParam(this, "quantileAlpha",
    "reg:quantileerror target quantile (xgboost quantile_alpha)",
    ParamValidators.inRange(0.0, 1.0, lowerInclusive = false,
      upperInclusive = false))
  setDefault(quantileAlpha -> 0.5)
  def setQuantileAlpha(v: Double): this.type = set(quantileAlpha, v)

  /** xgboost 2.x `quantile_alpha` LIST form: one tree per α per round;
    * transform's `prediction` carries the FIRST α (the underlying
    * predict exposes the full vector as `predictions`). Non-empty wins
    * over [[quantileAlpha]]. */
  final val quantileAlphas = new DoubleArrayParam(this, "quantileAlphas",
    "reg:quantileerror vector form (xgboost quantile_alpha list)",
    (v: Array[Double]) => v.forall(a => a > 0.0 && a < 1.0))
  setDefault(quantileAlphas -> Array.empty[Double])
  def setQuantileAlphas(v: Array[Double]): this.type = set(quantileAlphas, v)

  /** survival:aft through the facade: set BOTH bound columns and the
    * objective switches to interval labels (labelCol is ignored; a
    * right-censored row holds NULL/NaN in the upper column) — the
    * RayDMatrix label_lower_bound/label_upper_bound roles
    * (matrix.py:333-343) on the MLlib surface. */
  final val labelLowerBoundCol = new Param[String](this,
    "labelLowerBoundCol", "survival lower-bound column ('' = unused)")
  final val labelUpperBoundCol = new Param[String](this,
    "labelUpperBoundCol", "survival upper-bound column ('' = unused)")
  setDefault(labelLowerBoundCol -> "", labelUpperBoundCol -> "")
  def setLabelBoundsCols(lower: String, upper: String): this.type = {
    set(labelLowerBoundCol, lower); set(labelUpperBoundCol, upper)
  }
  final val aftDistribution = new Param[String](this, "aftDistribution",
    "survival:aft error distribution (xgboost aft_loss_distribution)",
    ParamValidators.inArray(Array("normal", "logistic", "extreme")))
  final val aftSigma = new DoubleParam(this, "aftSigma",
    "survival:aft distribution scale (aft_loss_distribution_scale)",
    ParamValidators.gt(0.0))
  setDefault(aftDistribution -> "normal", aftSigma -> 1.0)
  def setAftDistribution(v: String): this.type = set(aftDistribution, v)
  def setAftSigma(v: Double): this.type = set(aftSigma, v)

  override def fit(ds: Dataset[_]): GraftXGBRegressionModel = {
    transformSchema(ds.schema)
    val bounds = $(labelLowerBoundCol).nonEmpty ||
      $(labelUpperBoundCol).nonEmpty
    if (bounds) {
      require($(labelLowerBoundCol).nonEmpty &&
        $(labelUpperBoundCol).nonEmpty,
        "survival bounds need BOTH labelLowerBoundCol and " +
          "labelUpperBoundCol")
    }
    val obj = if (bounds) "survival:aft" else $(objective)
    if (bounds) require($(objective) == "reg:squarederror" ||
      $(objective) == "survival:aft",
      s"bound columns train survival:aft, not ${$(objective)}")
    val reg = new GraftRegressor()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams(obj).copy(
        huberSlope = $(huberSlope), quantileAlpha = $(quantileAlpha),
        quantileAlphas = $(quantileAlphas).toSeq,
        aftDistribution = $(aftDistribution), aftSigma = $(aftSigma)))
      .setNumWorkers($(numWorkers))
      .setEvalSets(evalSets)
    if (bounds)
      reg.setLabelBoundsCols($(labelLowerBoundCol), $(labelUpperBoundCol))
    initBooster.foreach(b => reg.setInitModel(b))
    if ($(featuresCols).nonEmpty) reg.setFeaturesCols($(featuresCols).toSeq)
    if ($(categoricalCols).nonEmpty)
      reg.setCategoricalCols($(categoricalCols).toSeq)
    val inner = reg.fit(ds.toDF)
    copyValues(new GraftXGBRegressionModel(uid, inner)).setParent(this)
  }

  override def copy(extra: ParamMap): GraftXGBRegressor =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    // bounds mode replaces the label column with the two bound columns
    if ($(labelLowerBoundCol).nonEmpty || $(labelUpperBoundCol).nonEmpty) {
      Seq($(labelLowerBoundCol), $(labelUpperBoundCol))
        .filter(_.nonEmpty).foreach(c =>
          require(schema.fieldNames.contains(c),
            s"bound column $c missing from ${schema.fieldNames.toSeq}"))
      $(featuresCols).foreach(f => require(
        schema.fieldNames.contains(f),
        s"feature column $f missing from ${schema.fieldNames.toSeq}"))
    } else validateFitSchema(schema)
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
    with GraftXGBPredictKwargs
    with MLWritable {

  def graftModel: GraftModel = inner.model
  protected def kwargsModel: GraftPredictionModel = inner

  /** Per-round eval metric history (see
    * [[GraftXGBClassificationModel.evalsResult]]). */
  def evalsResult: Map[String,
      Map[String, scala.collection.mutable.ArrayBuffer[Double]]] =
    inner.evalsResult

  /** sklearn `feature_importances_` in the MLlib model convention (see
    * [[GraftXGBClassificationModel.featureImportances]]). */
  def featureImportances(importanceType: String)
      : org.apache.spark.ml.linalg.Vector =
    org.apache.spark.ml.linalg.Vectors.dense(
      inner.featureImportances(importanceType))
  def featureImportances: org.apache.spark.ml.linalg.Vector =
    featureImportances("weight")

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

// ---------------- Ranker ----------------

/** Shared qid param so the fitted model persists/restores it through
  * the same `mlparams` table as the rest of the Param surface. */
trait GraftXGBRankerParams extends GraftMLParams {
  final val qidCol = new Param[String](this, "qidCol",
    "query/group id column for ranking")
  final def getQidCol: String = $(qidCol)
  setDefault(qidCol -> "qid")
  def setQidCol(v: String): this.type = set(qidCol, v)
}

/** MLlib Estimator facade over [[GraftRanker]] — the RayXGBRanker
  * surface (reference sklearn.py:920-1083): rank:pairwise over
  * qid-grouped rows, `Pipeline`/`CrossValidator` compatible,
  * save/load round-trip. Predictions are raw ranking margins (higher =
  * ranked earlier within a query), the xgboost ranker convention. */
class GraftXGBRanker(override val uid: String)
    extends Estimator[GraftXGBRankerModel] with GraftXGBRankerParams
    with GraftXGBEvalSets with GraftXGBInitModel with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXGBRanker"))

  final val objective = new Param[String](this, "objective",
    "ranking objective", ParamValidators.inArray(
      Array("rank:pairwise", "rank:ndcg", "rank:map")))
  setDefault(objective -> "rank:pairwise")
  def setObjective(v: String): this.type = set(objective, v)

  /** xgboost lambdarank_num_pair_per_sample analog: 0 = exact
    * all-pairs; k > 0 samples k lower-labelled partners per row —
    * the giant-qid-group scale lever (see TrainParams.pairCap). */
  final val pairCap = new IntParam(this, "pairCap",
    "max sampled pairs per row (0 = all discordant pairs)",
    ParamValidators.gtEq(0))
  setDefault(pairCap -> 0)
  def setPairCap(v: Int): this.type = set(pairCap, v)

  override def fit(ds: Dataset[_]): GraftXGBRankerModel = {
    transformSchema(ds.schema)
    val rk = new GraftRanker()
      .setLabelCol($(labelCol))
      .setQidCol($(qidCol))
      .setParams(mkTrainParams($(objective)).copy(pairCap = $(pairCap)))
      .setNumWorkers($(numWorkers))
      .setEvalSets(evalSets)
    initBooster.foreach(b => rk.setInitModel(b))
    if ($(featuresCols).nonEmpty) rk.setFeaturesCols($(featuresCols).toSeq)
    if ($(categoricalCols).nonEmpty)
      rk.setCategoricalCols($(categoricalCols).toSeq)
    val inner = rk.fit(ds.toDF)
    copyValues(new GraftXGBRankerModel(uid, inner)).setParent(this)
  }

  override def copy(extra: ParamMap): GraftXGBRanker = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    validateFitSchema(schema)
    require(schema.fieldNames.contains($(qidCol)),
      s"qid column ${$(qidCol)} missing from ${schema.fieldNames.toSeq}")
    schema.add("prediction", DoubleType)
  }
}

object GraftXGBRanker extends DefaultParamsReadable[GraftXGBRanker] {
  override def load(path: String): GraftXGBRanker = super.load(path)
}

class GraftXGBRankerModel(
    override val uid: String,
    private[ml] val inner: GraftRankerModel)
    extends Model[GraftXGBRankerModel] with GraftXGBRankerParams
    with GraftXGBPredictKwargs
    with MLWritable {

  def graftModel: GraftModel = inner.model
  protected def kwargsModel: GraftPredictionModel = inner

  /** Per-round eval metric history (see
    * [[GraftXGBClassificationModel.evalsResult]]). */
  def evalsResult: Map[String,
      Map[String, scala.collection.mutable.ArrayBuffer[Double]]] =
    inner.evalsResult

  /** sklearn `feature_importances_` in the MLlib model convention (see
    * [[GraftXGBClassificationModel.featureImportances]]). */
  def featureImportances(importanceType: String)
      : org.apache.spark.ml.linalg.Vector =
    org.apache.spark.ml.linalg.Vectors.dense(
      inner.featureImportances(importanceType))
  def featureImportances: org.apache.spark.ml.linalg.Vector =
    featureImportances("weight")

  override def transform(ds: Dataset[_]): DataFrame =
    inner.transform(ds.toDF)

  override def transformSchema(schema: StructType): StructType =
    schema.add("prediction", DoubleType)

  override def copy(extra: ParamMap): GraftXGBRankerModel =
    copyValues(new GraftXGBRankerModel(uid, inner), extra)
      .setParent(parent)

  override def write: MLWriter = new GraftXGBRankerModel.Writer(this)
}

object GraftXGBRankerModel extends MLReadable[GraftXGBRankerModel] {

  private[ml] class Writer(instance: GraftXGBRankerModel)
      extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftMLIO.saveMetadata(instance,
        classOf[GraftXGBRankerModel].getName, path, sparkSession)
      instance.inner.save(sparkSession, s"$path/graft")
      GraftMLIO.saveParams(instance, path, sparkSession)
    }
  }

  private class Reader extends MLReader[GraftXGBRankerModel] {
    override def load(path: String): GraftXGBRankerModel = {
      val tmp = new GraftXGBRanker()
      val uid = GraftMLIO.loadParams(tmp, path, sparkSession)
      val spec = tmp.mkSpec.copy(qidCol = Some(tmp.getQidCol))
      val inner = GraftPredictionModel.loadRanker(sparkSession,
        s"$path/graft", spec)
      val m = new GraftXGBRankerModel(uid, inner)
      tmp.params.foreach(p =>
        tmp.get(p).foreach(v => m.set(m.getParam(p.name), v)))
      m
    }
  }

  override def read: MLReader[GraftXGBRankerModel] = new Reader

  override def load(path: String): GraftXGBRankerModel = super.load(path)
}

// ---------------- Random-forest presets ----------------

/** MLlib Estimator facade over the random-forest preset
  * ([[GraftRFClassifier]]) — the RayXGBRFClassifier surface (reference
  * sklearn.py:880-917): `numTrees` trees grown in ONE boosting round
  * (numRounds is forced to 1, as xgboost forces num_boost_round) with
  * row subsampling (default 0.8) and per-node column subsampling, at
  * learning rate 1. The fitted model is a plain
  * [[GraftXGBClassificationModel]]: a forest is a one-round ensemble,
  * so the prediction/persistence surface is identical. */
class GraftXGBRFClassifier(override val uid: String)
    extends GraftXGBClassifier(uid) {

  def this() = this(Identifiable.randomUID("graftXGBRFClassifier"))

  final val numTrees = new IntParam(this, "numTrees",
    "forest size (xgboost num_parallel_tree / sklearn n_estimators)",
    ParamValidators.gtEq(1))
  final def getNumTrees: Int = $(numTrees)
  setDefault(numTrees -> 100, subsample -> 0.8)
  def setNumTrees(v: Int): this.type = set(numTrees, v)

  override def fit(ds: Dataset[_]): GraftXGBClassificationModel = {
    transformSchema(ds.schema)
    val clf = new GraftRFClassifier()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams("binary:logistic").copy(numRounds = 1,
        eta = 1.0, colsampleByNode = 0.8,
        numParallelTree = $(numTrees)))
      .setNumWorkers($(numWorkers))
      .setEvalSets(evalSets)
    initBooster.foreach(b => clf.setInitModel(b))
    if ($(featuresCols).nonEmpty) clf.setFeaturesCols($(featuresCols).toSeq)
    if ($(categoricalCols).nonEmpty)
      clf.setCategoricalCols($(categoricalCols).toSeq)
    if ($(numClass) > 0) clf.setNumClass($(numClass))
    val inner = clf.fit(ds.toDF)
    copyValues(new GraftXGBClassificationModel(uid, inner))
      .setParent(this)
  }
}

object GraftXGBRFClassifier
    extends DefaultParamsReadable[GraftXGBRFClassifier] {
  override def load(path: String): GraftXGBRFClassifier = super.load(path)
}

/** MLlib Estimator facade over [[GraftRFRegressor]] — the
  * RayXGBRFRegressor surface (reference sklearn.py:602-640). See
  * [[GraftXGBRFClassifier]] for the preset semantics. */
class GraftXGBRFRegressor(override val uid: String)
    extends GraftXGBRegressor(uid) {

  def this() = this(Identifiable.randomUID("graftXGBRFRegressor"))

  final val numTrees = new IntParam(this, "numTrees",
    "forest size (xgboost num_parallel_tree / sklearn n_estimators)",
    ParamValidators.gtEq(1))
  final def getNumTrees: Int = $(numTrees)
  setDefault(numTrees -> 100, subsample -> 0.8)
  def setNumTrees(v: Int): this.type = set(numTrees, v)

  override def fit(ds: Dataset[_]): GraftXGBRegressionModel = {
    transformSchema(ds.schema)
    val reg = new GraftRFRegressor()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams($(objective)).copy(numRounds = 1,
        eta = 1.0, colsampleByNode = 0.8,
        numParallelTree = $(numTrees),
        huberSlope = $(huberSlope), quantileAlpha = $(quantileAlpha)))
      .setNumWorkers($(numWorkers))
      .setEvalSets(evalSets)
    initBooster.foreach(b => reg.setInitModel(b))
    if ($(featuresCols).nonEmpty) reg.setFeaturesCols($(featuresCols).toSeq)
    if ($(categoricalCols).nonEmpty)
      reg.setCategoricalCols($(categoricalCols).toSeq)
    val inner = reg.fit(ds.toDF)
    copyValues(new GraftXGBRegressionModel(uid, inner)).setParent(this)
  }
}

object GraftXGBRFRegressor
    extends DefaultParamsReadable[GraftXGBRFRegressor] {
  override def load(path: String): GraftXGBRFRegressor = super.load(path)
}

// ---------------- Linear booster (gblinear) ----------------

/** MLlib Estimator facade over the linear booster ([[graft.api
  * .GraftLinear]]) — the `RayXGBRegressor(booster="gblinear")` surface
  * (reference tests/test_sklearn.py:493-517). Tree-only params
  * (maxDepth, subsample) are inherited but ignored, exactly as xgboost
  * ignores tree params under gblinear. */
/** Shared gblinear params so the fitted model persists/restores them. */
trait GraftXGBLinearParams extends GraftMLParams {
  final val objective = new Param[String](this, "objective",
    "pointwise objective for the linear booster",
    ParamValidators.inArray(Array("reg:squarederror", "reg:absoluteerror",
      "binary:logistic")))
  final def getObjective: String = $(objective)
  setDefault(objective -> "reg:squarederror")
  def setObjective(v: String): this.type = set(objective, v)
  // `alpha` (L1) now lives on GraftMLParams — same TrainParams field,
  // identical soft-threshold semantics for gblinear
}

class GraftXGBLinear(override val uid: String)
    extends Estimator[GraftXGBLinearModel] with GraftXGBLinearParams
    with GraftXGBEvalSets with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXGBLinear"))

  /** Fit-time warm start (`xgb_model=` analog) for the linear booster:
    * coordinate descent continues from this model's weights — works
    * with xgboost-JSON imports too. DATA, not a Param (like eval
    * sets): not persisted, not carried by `copy()`. */
  protected var initLinear: Option[graft.api.GraftLinear.LinearModel] =
    None
  def setInitModel(m: graft.api.GraftLinear.LinearModel): this.type = {
    initLinear = Some(m); this
  }

  override def fit(ds: Dataset[_]): GraftXGBLinearModel = {
    transformSchema(ds.schema)
    require($(categoricalCols).isEmpty,
      "graft: gblinear has no categorical split mode — one-hot encode " +
        "upstream or use a tree booster facade")
    val lr = new GraftLinearRegressor()
      .setLabelCol($(labelCol))
      .setParams(mkTrainParams($(objective)).copy(alpha = $(alpha),
        numClass = 0))
      .setNumWorkers($(numWorkers))
      .setEvalSets(evalSets)
    initLinear.foreach(m => lr.setInitModel(m))
    if ($(featuresCols).nonEmpty) lr.setFeaturesCols($(featuresCols).toSeq)
    val inner = lr.fit(ds.toDF)
    copyValues(new GraftXGBLinearModel(uid, inner)).setParent(this)
  }

  override def copy(extra: ParamMap): GraftXGBLinear = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    validateFitSchema(schema)
    schema.add("prediction", DoubleType)
  }
}

object GraftXGBLinear extends DefaultParamsReadable[GraftXGBLinear] {
  override def load(path: String): GraftXGBLinear = super.load(path)
}

class GraftXGBLinearModel(
    override val uid: String,
    private[ml] val inner: GraftLinearModel)
    extends Model[GraftXGBLinearModel] with GraftXGBLinearParams
    with MLWritable {

  def linearModel: graft.api.GraftLinear.LinearModel = inner.model

  /** Per-round eval metric history (see
    * [[GraftXGBClassificationModel.evalsResult]]). */
  def evalsResult: Map[String,
      Map[String, scala.collection.mutable.ArrayBuffer[Double]]] =
    inner.evalsResult

  /** Round index of the best eval score when early stopping was armed
    * (xgboost `best_iteration`); −1 otherwise. */
  def bestIteration: Int = inner.bestIteration

  /** Per-feature weights (class 0) — the gblinear `coef_` analog. */
  def coefficients: org.apache.spark.ml.linalg.Vector =
    org.apache.spark.ml.linalg.Vectors.dense(
      inner.model.weights(0).map(_.toDouble))
  def intercept: Double = inner.model.bias(0).toDouble

  override def transform(ds: Dataset[_]): DataFrame =
    inner.transform(ds.toDF)

  /** gblinear `pred_contribs`: exact per-feature w_j*x_j + bias slot. */
  def transformContrib(ds: Dataset[_]): DataFrame =
    inner.transformContrib(ds.toDF)

  override def transformSchema(schema: StructType): StructType =
    schema.add("prediction", DoubleType)

  override def copy(extra: ParamMap): GraftXGBLinearModel =
    copyValues(new GraftXGBLinearModel(uid, inner), extra)
      .setParent(parent)

  override def write: MLWriter = new GraftXGBLinearModel.Writer(this)
}

object GraftXGBLinearModel extends MLReadable[GraftXGBLinearModel] {

  private[ml] class Writer(instance: GraftXGBLinearModel)
      extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftMLIO.saveMetadata(instance,
        classOf[GraftXGBLinearModel].getName, path, sparkSession)
      instance.inner.save(sparkSession, s"$path/graft")
      GraftMLIO.saveParams(instance, path, sparkSession)
    }
  }

  private class Reader extends MLReader[GraftXGBLinearModel] {
    override def load(path: String): GraftXGBLinearModel = {
      val tmp = new GraftXGBLinear()
      val uid = GraftMLIO.loadParams(tmp, path, sparkSession)
      val lm = graft.api.GraftLinear.load(sparkSession, s"$path/graft")
      val m = new GraftXGBLinearModel(uid,
        new GraftLinearModel(lm, tmp.mkSpec))
      tmp.params.foreach(p =>
        tmp.get(p).foreach(v => m.set(m.getParam(p.name), v)))
      m
    }
  }

  override def read: MLReader[GraftXGBLinearModel] = new Reader

  override def load(path: String): GraftXGBLinearModel = super.load(path)
}
