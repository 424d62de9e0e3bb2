package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.data.DMatrixSpec
import graft.learner.{Objectives, TrainParams}

/**
 * Distributed linear booster — the `booster="gblinear"` side of the
 * xgboost param surface the reference forwards verbatim (reference:
 * xgboost_ray/tests/test_sklearn.py:493 `test_sklearn_api_gblinear`;
 * params pass-through sklearn.py:708-719).
 *
 * Model state is one weight vector + bias — it BROADCASTS, so a round
 * is exactly ONE `treeAggregate` job computing per-feature
 * [Σ gᵢ·xᵢⱼ, Σ hᵢ·xᵢⱼ²] (plus the bias pair [Σ gᵢ, Σ hᵢ]) with margins
 * recomputed on the fly from the broadcast weights. No cached margin
 * RDD, no shuffle, nothing persisted between rounds beyond the input
 * rows: at 100 TB each round is a single scan-and-reduce whose merge
 * volume is 2(d+1) doubles per partition.
 *
 * Update rule (xgboost's shotgun/parallel coordinate step with elastic
 * net, all coordinates updated from the same round's gradients):
 *   Δwⱼ = −η · T(Gⱼ + λ·wⱼ, α) / (Hⱼ + λ)
 *   Δbias = −η · G_b / H_b              (bias is not regularized)
 * where T is the L1 soft-threshold — the same `thresholdL1` the tree
 * leaf weight uses. Weights are stored as Float (rounded once per
 * round), so a single round from zero is replayable bit-exactly in
 * DuckDB with REAL casts (the `ml_linear` oracle).
 *
 * Missing features (NaN) contribute nothing to either the margin or
 * the feature's gradient sums — the sparse-ignores-absent semantics of
 * xgboost's DMatrix.
 */
object GraftLinear {

  /** Linear model: margin = bias + w·x (+ init/base margin). */
  final case class LinearModel(weights: Array[Float], bias: Float,
      objective: String, baseScore: Double) {

    /**
     * Margin as a pure unrolled Column expression (codegen, no UDF):
     * zero-weight features are dropped from the sum at plan time.
     */
    def marginExpr(features: Column): Column = {
      val terms = weights.iterator.zipWithIndex.collect {
        case (w, j) if w != 0f =>
          nanvl(coalesce(element_at(features, j + 1), lit(0f)), lit(0f))
            .cast("double") * w.toDouble
      }.toSeq
      val obj = Objectives.resolve(
        TrainParams(objective = objective, baseScore = baseScore))
      terms.foldLeft(lit(obj.initMargin(baseScore).toDouble +
        bias.toDouble))(_ + _)
    }

    /** Transformed prediction (prob for logistic, identity otherwise). */
    def predictExpr(features: Column): Column = {
      val m = marginExpr(features)
      objective match {
        case "binary:logistic" => lit(1.0) / (lit(1.0) + exp(-m))
        case _ => m
      }
    }
  }

  /**
   * Train a linear booster. Supports the pointwise single-output
   * objectives (squared/absolute error, logistic); multiclass and
   * ranking remain tree-booster territory, as in xgboost itself where
   * gblinear is a (generalized) linear model.
   */
  def train(df: DataFrame, spec: DMatrixSpec, params: TrainParams,
      numWorkers: Int = 0): LinearModel = {
    val obj = Objectives.resolve(params)
    require(obj.numOutputs <= 1 && !obj.needsGroups && !obj.needsBounds,
      s"gblinear supports pointwise single-output objectives; " +
        s"got ${obj.name}")
    spec.validate(df, requireLabel = true)
    val rows = GraftBoost.prepare(df, spec, obj, numWorkers)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = rows.first()._1.length
      val sc = df.sparkSession.sparkContext
      val init = obj.initMargin(params.baseScore)
      // scale_pos_weight: same binary-objective gating as the tree path
      val spw =
        if (params.scalePosWeight != 1.0 &&
          obj.name.startsWith("binary:")) params.scalePosWeight.toFloat
        else 1.0f
      val weights = new Array[Float](d)
      var bias = 0.0f
      var round = 0
      while (round < params.numRounds) {
        val bcW = sc.broadcast((weights.clone(), bias))
        val acc = rows.treeAggregate(new Array[Double](2 * d + 2))(
          seqOp = (a, r) => {
            val (x, y, wt, bm, _, _) = r
            val (w, b) = bcW.value
            var m = (if (bm.isNaN) init else bm).toDouble + b
            var j = 0
            while (j < d) {
              val xv = x(j)
              if (!xv.isNaN) m += w(j).toDouble * xv
              j += 1
            }
            val g = new Array[Float](1); val h = new Array[Float](1)
            obj.gradHess(Array(m.toFloat), y, g, h)
            val w2 = if (spw != 1.0f && y == 1.0f) wt * spw else wt
            val gw = g(0).toDouble * w2
            val hw = h(0).toDouble * w2
            j = 0
            while (j < d) {
              val xv = x(j)
              if (!xv.isNaN && xv != 0f) {
                a(2 * j) += gw * xv
                a(2 * j + 1) += hw * xv.toDouble * xv
              }
              j += 1
            }
            a(2 * d) += gw; a(2 * d + 1) += hw
            a
          },
          combOp = (a, c) => {
            var i = 0
            while (i < a.length) { a(i) += c(i); i += 1 }
            a
          },
          depth = 2)
        bcW.destroy()
        var j = 0
        while (j < d) {
          val denom = acc(2 * j + 1) + params.lambda
          // a feature absent from every row has H_j = 0; with λ = 0 the
          // step would be 0/0 — skip, as xgboost does for empty columns
          if (denom > 0) {
            val gj = acc(2 * j) + params.lambda * weights(j)
            val t =
              if (gj > params.alpha) gj - params.alpha
              else if (gj < -params.alpha) gj + params.alpha
              else 0.0
            weights(j) =
              (weights(j) - params.eta * t / denom).toFloat
          }
          j += 1
        }
        if (acc(2 * d + 1) > 0)
          bias = (bias - params.eta * acc(2 * d) / acc(2 * d + 1)).toFloat
        round += 1
      }
      LinearModel(weights, bias, obj.name, params.baseScore)
    } finally rows.unpersist(blocking = false)
  }

  /** Model sink/source (S12 parity for the linear booster): one
    * parquet of (idx, weight) rows — idx −1 is the bias — plus the
    * objective/baseScore meta encoded in the same file. */
  def save(model: LinearModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    val rows = model.weights.toSeq.zipWithIndex
      .map { case (w, i) => (i, w.toDouble, "", 0.0) } :+
      ((-1, model.bias.toDouble, model.objective, model.baseScore))
    rows.toDF("idx", "weight", "objective", "base_score")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): LinearModel = {
    val rows = spark.read.parquet(path).collect()
    val meta = rows.find(_.getInt(0) == -1).get
    val ws = rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0))
      .map(_.getDouble(1).toFloat)
    LinearModel(ws, meta.getDouble(1).toFloat, meta.getString(2),
      meta.getDouble(3))
  }

  /** Append a prediction column — pure codegen, no UDF, no shuffle. */
  def predict(model: LinearModel, df: DataFrame, spec: DMatrixSpec,
      outputCol: String = "prediction"): DataFrame = {
    val feats = spec.resolveFeatures(df)
    require(feats.size == model.weights.length,
      s"model expects ${model.weights.length} features, got ${feats.size}")
    val featsArr = array(feats.map(f =>
      when(col(f).cast("float").isNull, lit(Float.NaN))
        .otherwise(col(f).cast("float"))): _*)
    df.withColumn(outputCol, model.predictExpr(featsArr))
  }
}
