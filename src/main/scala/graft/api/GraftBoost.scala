package graft.api

import graft.data.{DMatrixSpec, Sharding}
import graft.learner._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Functional train/predict API — signature-level analog of the
 * reference's module entry points `train()` (xgboost_ray/main.py:1341)
 * and `predict()` (main.py:1810). The `RayParams` knobs that configure
 * Ray actors (num_actors, cpus_per_actor, placement) collapse into
 * `numWorkers` (a repartition count) because Spark owns placement,
 * locality and retries (SURVEY §2.6 C1-C3).
 */
object GraftBoost {

  /**
   * Train a boosted-tree model.
   *
   * @param df         training table (any numeric feature columns)
   * @param spec       column-role declaration (RayDMatrix analog)
   * @param params     boosting params
   * @param evals      named evaluation DataFrames (same schema), analog of
   *                   `evals=[(dtrain, "train")]` (main.py:1341)
   * @param numWorkers repartition count; 0 = keep input partitioning
   *                   (num_actors analog)
   */
  def train(
      df: DataFrame,
      spec: DMatrixSpec,
      params: TrainParams,
      evals: Seq[(String, DataFrame)] = Nil,
      numWorkers: Int = 0,
      callbacks: Seq[TrainingCallback] = Nil,
      initModel: Option[GraftModel] = None,
      distributedCallbacks: Seq[DistributedCallback] = Nil): TrainResult = {
    val obj = Objectives.resolve(params)
    val data = materialize(df, spec, params, numWorkers,
      distributedCallbacks)
    val evalRdds = evals.map { case (n, e) =>
      // the xgboost evals=[(dtrain, "train")] idiom: when an eval set
      // IS the training frame (same object), reuse the binned train
      // RDD instead of preparing+binning a duplicate copy — halves the
      // cached footprint and the prep passes for the most common eval
      // config (the reference benchmark trains exactly this way,
      // benchmark_cpu_gpu.py:96-100)
      if (e eq df) (n, data.blocks)
      // other eval rows tolerate unseen category codes (they bin to
      // the spare non-matching bin and route like predict); train rows
      // keep the fail-fast
      else (n, toBinned(prepare(e, spec, obj, numWorkers), data.bins,
        obj, params.baseScore, tolerateUnseenCats = true))
    }
    val p2 = params.copy(featureWeights =
      params.featureWeights.orElse(spec.featureWeights))
    // one-shot training owns its caches: boost releases the blocks as
    // the margin chain advances past them, exactly the pre-BinnedMatrix
    // lifecycle
    val res = Trainer.boost(data.blocks, evalRdds, data.bins, p2,
      callbacks, initModel, Some(df.sparkSession), distributedCallbacks,
      knownRows = data.knownRows)
    attachNames(res, data.featureNames)
  }

  /**
   * A materialized binned training matrix — the RayDMatrix "load once,
   * train many times" analog (the reference memoizes per-actor loading,
   * matrix.py:703-716, main.py:654-670). `prepare → bin → pack` runs
   * ONCE; every [[BinnedMatrix.train]] against the handle reuses the
   * cached [[graft.learner.TrainBlock]] RDD, so a hyperparameter
   * search / CV sweep pays the dominant load+bin cost once instead of
   * once per trial — and each trial's margin generations share the
   * static block columns with this cache by reference
   * (TrainBlock.withMargins), so N concurrent trials cost N margin
   * columns, not N dataset copies. The handle is tied to its binning
   * inputs: train() requires the same resolved objective, baseScore,
   * maxBins and seed it was materialized with (they shape the cuts,
   * the init margins, the output width and the group layout) and fails
   * fast otherwise. Release with [[BinnedMatrix.unpersist]].
   */
  final class BinnedMatrix private[api] (
      private[api] val blocks: org.apache.spark.rdd.RDD[TrainBlock],
      private[api] val bins: Binner.Bins,
      private[api] val catFlags: Array[Boolean],
      private[api] val featureNames: Seq[String],
      private[api] val specFeatureWeights: Option[Array[Double]],
      private[api] val session: SparkSession,
      private[api] val objName: String,
      private[api] val numOutputs: Int,
      private[api] val baseScore: Double,
      private[api] val maxBins: Int,
      private[api] val seed: Long,
      private[api] val forTraining: Boolean,
      private[api] val loadCallbacks: Seq[DistributedCallback],
      private[api] val knownRows: Long = -1L) {

    def numFeatures: Int = bins.numFeatures

    /** Exact row count — the count the materialization already took
      * (prepare/pack drop no rows) or, for handles built without one,
      * a cheap block-count sum over the cache. */
    lazy val numRows: Long =
      if (knownRows >= 0L) knownRows
      else blocks.mapPartitions(it =>
        Iterator.single(it.foldLeft(0L)(_ + _.n))).fold(0L)(_ + _)

    /** Train against the materialized blocks. Eval sets are other
      * matrices bound to THIS matrix's bins ([[materializeEval]]); pass
      * this object itself for the `evals=[(dtrain, "train")]` idiom. */
    def train(params: TrainParams,
        evals: Seq[(String, BinnedMatrix)] = Nil,
        callbacks: Seq[TrainingCallback] = Nil,
        initModel: Option[GraftModel] = None,
        distributedCallbacks: Seq[DistributedCallback] = Nil)
        : TrainResult =
      GraftBoost.trainBinned(this, params, evals, callbacks, initModel,
        distributedCallbacks)

    /** Release the cached blocks (the handle is spent afterwards). */
    def unpersist(): Unit = { blocks.unpersist(blocking = false); () }
  }

  /**
   * Materialize `df` into a reusable [[BinnedMatrix]]: validate the
   * spec, fit the binner, bin+pack into cached TrainBlocks. The
   * binning-relevant params (objective, baseScore, maxBins, seed,
   * storageLevel) are captured; later train() calls must match them.
   *
   * The fast (uncached) path evaluates the input lineage more than
   * once (count, binner fit, pack) and assumes those evaluations see
   * the same rows; a plan containing non-deterministic expressions
   * (rand(), unseeded shuffle-order dependence) is detected and takes
   * the cached path instead. A table MUTATED between the scans is
   * outside what any engine-side check can see — snapshot such inputs
   * first.
   *
   * `distributedCallbacks` passed HERE get the full lifecycle: their
   * before/afterDataLoading hooks fire as the matrix materializes
   * (the reference fires them inside its memoized load_data,
   * main.py). Callbacks first supplied to [[BinnedMatrix.train]] can
   * only fire their training-phase hooks — the data is already
   * loaded — and trainBinned warns when that happens.
   */
  def materialize(df: DataFrame, spec: DMatrixSpec, params: TrainParams,
      numWorkers: Int = 0,
      distributedCallbacks: Seq[DistributedCallback] = Nil)
      : BinnedMatrix = {
    val obj = Objectives.resolve(params)
    // survival objectives may declare bounds instead of a point label
    // (matrix.py:333-343): label_lower_bound stands in as the label
    val boundsOnly = obj.needsBounds && spec.labelCol.isEmpty &&
      spec.labelLowerCol.isDefined
    spec.validate(df, requireLabel = !boundsOnly)
    require(spec.labelCol.size == 1 || boundsOnly,
      "trainer supports a single label column (multi-label loading is a " +
        "data-layer feature; see DMatrixSpec)")
    val catFlags = spec.categoricalFlags(df)
    checkMonotoneCats(params, catFlags)

    // Round-1 strategy. DEFAULT (two-pass, r13): the fat per-row
    // prepared rows are not cached — Binner.fit and toBinned each
    // evaluate the narrow prepare lineage straight off the columnar
    // scan. MEASURED in r15 (BENCHLARGE.md): on local storage this
    // beats the "obvious" fusion below by 1.7–2.7× at 1e8 rows,
    // because a vectorized parquet re-scan is cheaper than writing and
    // re-reading a transient deserialized float copy of the dataset
    // (plus its GC pressure). Three cases still cache the prepared
    // rows once: distributed data-loading callbacks (before/after
    // DataLoading fires once, not once per pass), ranking (sortByQid's
    // reduce-side sort would re-run per pass), and non-deterministic
    // input plans (rand() projections, or Sample — seeded but
    // order-dependent over an unpinned shuffle), where re-evaluations
    // could keep different ROWS and make the count / binner-fit / pack
    // scans disagree.
    //
    // FUSED (params.fuseRound1): ONE evaluation of the prepare lineage
    // packs transient FloatBlocks; the binner fits from the cache and
    // the binned blocks convert block-locally. The right trade only
    // when the input scan itself dominates — cold remote object
    // storage at 100 TB — and the transient ~4 B/feature/row fits.
    // Bit-identical results either way (FusedRound1Spec pins it).
    if (params.fuseRound1) {
      val prepared = prepare(df, spec, obj, numWorkers,
        distributedCallbacks)
      val fblocks = packFloat(prepared, obj, params.baseScore)
        .persist(params.storageLevel)
      val totalRows = fblocks.map(_.n.toLong).fold(0L)(_ + _)
      val bins = Binner.fit(
        fblocks.flatMap(fb => (0 until fb.n).iterator.map(fb.featureRow)),
        totalRows, params.maxBins,
        seed = params.seed + 42, catFeatures = catFlags,
        knownWidth = spec.featureWidth(df))
      val blocks = fromFloat(fblocks, bins, obj)
        .persist(params.storageLevel)
      blocks.foreachPartition(_ => ()) // materialize bytes, drop floats
      fblocks.unpersist(blocking = false)
      val names = attachableNames(spec, df, bins.numFeatures)
      return new BinnedMatrix(blocks, bins, catFlags, names,
        spec.featureWeights, df.sparkSession, obj.name, obj.numOutputs,
        params.baseScore, params.maxBins, params.seed,
        forTraining = true, loadCallbacks = distributedCallbacks,
        knownRows = totalRows)
    }
    val nondetPlan = df.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Sample => true
      case p => p.expressions.exists(!_.deterministic)
    }
    val cachePrepared = distributedCallbacks.nonEmpty ||
      obj.needsGroups || nondetPlan
    val prepared0 = prepare(df, spec, obj, numWorkers, distributedCallbacks)
    val prepared =
      if (cachePrepared) prepared0.persist(params.storageLevel)
      else prepared0
    val totalRows = if (cachePrepared) prepared.count() else df.count()
    val bins = Binner.fit(prepared.map(_._1), totalRows, params.maxBins,
      seed = params.seed + 42, catFeatures = catFlags,
      knownWidth = spec.featureWidth(df))
    val blocks = toBinned(prepared, bins, obj, params.baseScore)
      .persist(params.storageLevel)
    blocks.foreachPartition(_ => ()) // materialize bytes, drop floats
    if (cachePrepared) prepared.unpersist(blocking = false)
    val names = attachableNames(spec, df, bins.numFeatures)
    new BinnedMatrix(blocks, bins, catFlags, names, spec.featureWeights,
      df.sparkSession, obj.name, obj.numOutputs, params.baseScore,
      params.maxBins, params.seed, forTraining = true,
      loadCallbacks = distributedCallbacks, knownRows = totalRows)
  }

  /** Materialize an EVAL set against an existing training matrix's
    * bins (unseen category codes bin to the spare non-matching slot
    * and route like predict, so a fresh eval frame cannot fail the
    * trained cuts). The result can only be passed as an eval. */
  def materializeEval(df: DataFrame, train: BinnedMatrix,
      spec: DMatrixSpec, params: TrainParams, numWorkers: Int = 0)
      : BinnedMatrix = {
    val obj = Objectives.resolve(params)
    // numOutputs is checked separately from the name: softmax/custom
    // objective names don't encode numClass, and a width mismatch
    // corrupts the packed margin stride rather than failing loudly.
    require(obj.name == train.objName &&
      obj.numOutputs == train.numOutputs &&
      params.baseScore == train.baseScore,
      s"graft: eval matrix must bin under the training matrix's " +
        s"objective/baseScore ('${train.objName}' ×${train.numOutputs}, " +
        s"${train.baseScore}); " +
        s"got '${obj.name}' ×${obj.numOutputs}, ${params.baseScore}")
    val ev = toBinned(prepare(df, spec, obj, numWorkers), train.bins,
      obj, params.baseScore, tolerateUnseenCats = true)
      .persist(params.storageLevel)
    ev.foreachPartition(_ => ())
    new BinnedMatrix(ev, train.bins, train.catFlags, Nil, None,
      df.sparkSession, train.objName, train.numOutputs, train.baseScore,
      train.maxBins, train.seed, forTraining = false,
      loadCallbacks = Nil)
  }

  private[api] def trainBinned(data: BinnedMatrix, params: TrainParams,
      evals: Seq[(String, BinnedMatrix)],
      callbacks: Seq[TrainingCallback],
      initModel: Option[GraftModel],
      distributedCallbacks: Seq[DistributedCallback]): TrainResult = {
    val obj = Objectives.resolve(params)
    require(data.forTraining,
      "graft: this matrix was materialized as an EVAL set " +
        "(unseen-category-tolerant binning); materialize(df, ...) the " +
        "training data instead")
    // obj.numOutputs is checked in addition to the name: the name
    // alone doesn't pin numClass (multi:softmax with numClass=3 vs 5
    // resolves to the same name), and the packed blocks carry margins
    // at stride k — reading them at a different stride is an executor
    // AIOOBE at best and silently corrupt gradients at worst.
    require(obj.name == data.objName &&
      obj.numOutputs == data.numOutputs &&
      params.baseScore == data.baseScore &&
      params.maxBins == data.maxBins && params.seed == data.seed,
      s"graft: BinnedMatrix was materialized for objective " +
        s"'${data.objName}' ×${data.numOutputs} (baseScore " +
        s"${data.baseScore}, maxBins ${data.maxBins}, seed " +
        s"${data.seed}); train() got '${obj.name}' ×${obj.numOutputs} " +
        s"(${params.baseScore}, ${params.maxBins}, ${params.seed}) — " +
        "these shape the bin cuts, init margins and block layout; " +
        "re-materialize to change them")
    checkMonotoneCats(params, data.catFlags)
    // Loading-phase hooks fire at materialize time (the reference
    // fires them inside its memoized load_data); a callback instance
    // first seen here can only get its training-phase hooks. Warn —
    // silence would read as the hook contract being broken.
    val lateCbs = distributedCallbacks.filterNot(cb =>
      data.loadCallbacks.exists(_ eq cb))
    if (lateCbs.nonEmpty)
      org.slf4j.LoggerFactory.getLogger("graft").warn(
        s"train() received ${lateCbs.size} distributed callback(s) that " +
          "materialize() never saw: their before/afterDataLoading hooks " +
          "will NOT fire (the matrix is already loaded). Pass loading " +
          "callbacks to materialize().")
    val evalRdds = evals.map { case (n, ev) =>
      if (ev eq data) (n, data.blocks) // the dtrain idiom
      else {
        require(ev.bins eq data.bins,
          s"graft: eval set '$n' was not materialized against this " +
            "matrix's bins — use materializeEval(evalDf, trainMatrix, ...)")
        (n, ev.blocks)
      }
    }
    val p2 = params.copy(featureWeights =
      params.featureWeights.orElse(data.specFeatureWeights))
    val res = Trainer.boost(data.blocks, evalRdds, data.bins, p2,
      callbacks, initModel, Some(data.session), distributedCallbacks,
      releaseInputs = false, knownRows = data.knownRows)
    attachNames(res, data.featureNames)
  }

  private def attachNames(res: TrainResult,
      names: Seq[String]): TrainResult =
    if (names.nonEmpty && names.length == res.model.numFeatures)
      res.copy(model = res.model.withFeatureNames(names))
    else res

  /** Resolved feature-column names worth carrying on a model (the
    * reference forwards RayDMatrix feature_names to the booster,
    * matrix.py:797-798) — none for a pre-assembled vector column
    * (unnamed slots) and none when a post-join frame carries DUPLICATE
    * names (they would collapse featureImportancesNamed keys and emit
    * xgboost-rejected duplicate feature_names on export). */
  private def attachableNames(spec: DMatrixSpec, df: DataFrame,
      numFeatures: Int): Seq[String] =
    if (spec.preAssembledCol(df).isDefined) Nil
    else {
      val ns = spec.resolveFeatures(df)
      if (ns.length == numFeatures && ns.distinct.length == ns.length) ns
      else Nil
    }

  /** Monotonicity has no meaning for an unordered one-hot partition —
    * a constraint on a declared-categorical feature would silently
    * veto/admit candidates by which code sits left, so reject it. */
  private def checkMonotoneCats(params: TrainParams,
      catFlags: Array[Boolean]): Unit =
    if (params.monotoneConstraints.nonEmpty && catFlags.nonEmpty) {
      val bad = params.monotoneConstraints.zipWithIndex.collect {
        case (c, f) if c != 0 && f < catFlags.length && catFlags(f) => f
      }
      require(bad.isEmpty,
        s"graft: monotone constraints are not defined for categorical " +
          s"features (one-hot == splits have no order); remove the " +
          s"constraint on feature index(es) ${bad.mkString(", ")}")
    }

  /** Per-label results of a multi-label run. */
  final case class MultiLabelResult(results: Seq[(String, TrainResult)]) {
    def models: Seq[(String, GraftModel)] =
      results.map { case (n, r) => (n, r.model) }
  }

  /** The per-label spec a multi-label run trains/predicts with: the
    * other label columns are ignored so the feature set is identical
    * across labels. */
  private def singleLabelSpec(spec: DMatrixSpec, label: String)
      : DMatrixSpec =
    spec.copy(labelCol = Seq(label),
      ignore = spec.ignore ++ spec.labelCol.filterNot(_ == label))

  /**
   * Multi-label training (matrix.py:410-425: list-of-names labels,
   * Parquet multi-label loading): one boosted ensemble per label column
   * over the SAME feature set — the per-target-tree layout xgboost
   * multi-output uses, trained sequentially with full cluster
   * parallelism per target.
   */
  def trainMultiLabel(
      df: DataFrame,
      spec: DMatrixSpec,
      params: TrainParams,
      evals: Seq[(String, DataFrame)] = Nil,
      numWorkers: Int = 0): MultiLabelResult = {
    require(spec.labelCol.size >= 2,
      s"multi-label needs >=2 label columns, got ${spec.labelCol}")
    val obj = Objectives.resolve(params)
    // ranking sorts rows by (qid, content incl. the label column) and
    // survival reads the label as a bound — both entangle the label
    // role with row layout. A spec DECLARING qid/bounds columns takes
    // the fallback too, even under a pointwise objective: the fast
    // path packs qids=null/uppers=null, which would silently degrade
    // a bounds metric (review r13) — the per-label pipeline carries
    // the declared columns through.
    if (obj.needsGroups || obj.needsBounds || spec.qidCol.isDefined ||
        spec.labelLowerCol.isDefined || spec.labelUpperCol.isDefined)
      return MultiLabelResult(spec.labelCol.map { l =>
        (l, train(df, singleLabelSpec(spec, l), params, evals,
          numWorkers))
      })
    // Every label trains over the SAME feature set (the other label
    // columns are roles, never features), so the dominant
    // prepare→bin→pack work is label-invariant. ONE pass assembles all
    // L label columns alongside the features and packs them together
    // (separate per-label plan evaluations CANNOT be zipped instead —
    // an exchange in the plan redistributes rows by the projected
    // bytes, which differ per label). Each label then trains against a
    // cheap view that swaps in its labels column; the packed
    // bins/weights/margins arrays are shared by reference and the
    // per-label boost owns (and frees) only its view. Cuts are
    // identical to the per-label pipeline (same features, same binner
    // seed): L labels cost 2 data scans total instead of 2L. The
    // by-reference sharing holds for DESERIALIZED storage levels
    // (boost's persist of the view then stores object refs into the
    // composite's arrays); under a _SER level each view's persist
    // serializes its own full byte copy for the duration of that
    // label's training — the 2-scan saving stands, the memory
    // saving does not.
    spec.validate(df, requireLabel = true)
    val catFlags = spec.categoricalFlags(df)
    checkMonotoneCats(params, catFlags)
    val k = obj.numOutputs
    val init = obj.initMargin(params.baseScore)
    val nLabels = spec.labelCol.size
    val multiRows = prepareMulti(df, spec, numWorkers)
    val totalRows = df.count()
    val bins = Binner.fit(multiRows.map(_._1), totalRows, params.maxBins,
      seed = params.seed + 42, catFeatures = catFlags,
      knownWidth = spec.featureWidth(df))
    val composite = multiRows.mapPartitions({ it0 =>
      val it = it0.buffered
      val nf = bins.numFeatures
      val cap = graft.learner.TrainBlock.capacity(nf, k)
      new Iterator[(TrainBlock, Array[Array[Float]])] {
        def hasNext: Boolean = it.hasNext
        def next(): (TrainBlock, Array[Array[Float]]) = {
          val binsArr = new Array[Byte](cap * nf)
          val labels = Array.fill(nLabels)(new Array[Float](cap))
          val weights = new Array[Float](cap)
          val margins = new Array[Float](cap * k)
          var n = 0
          while (it.hasNext && n < cap) {
            val (f, ys, w, bm) = it.next()
            val rb = bins.binRow(f)
            System.arraycopy(rb, 0, binsArr, n * nf, nf)
            var j = 0
            while (j < nLabels) { labels(j)(n) = ys(j); j += 1 }
            weights(n) = w
            val m0 = if (bm.isNaN) init else bm
            java.util.Arrays.fill(margins, n * k, n * k + k, m0)
            n += 1
          }
          (new TrainBlock(n, nf, k,
            java.util.Arrays.copyOf(binsArr, n * nf),
            java.util.Arrays.copyOf(labels(0), n),
            java.util.Arrays.copyOf(weights, n), null, null,
            java.util.Arrays.copyOf(margins, n * k)),
            Array.tabulate(nLabels - 1)(j =>
              java.util.Arrays.copyOf(labels(j + 1), n)))
        }
      }
    }, preservesPartitioning = true)
      .persist(params.storageLevel)
    composite.foreachPartition(_ => ())
    val names = attachableNames(spec, df, bins.numFeatures)
    try {
      MultiLabelResult(spec.labelCol.zipWithIndex.map { case (l, j) =>
        val lSpec = singleLabelSpec(spec, l)
        val blocks =
          if (j == 0) composite.map(_._1)
          else composite.map { case (b, others) =>
            new TrainBlock(b.n, b.nf, b.k, b.bins, others(j - 1),
              b.weights, null, null, b.margins)
          }
        val evalRdds = evals.map { case (n, e) =>
          if (e eq df) (n, blocks)
          else (n, toBinned(prepare(e, lSpec, obj, numWorkers), bins,
            obj, params.baseScore, tolerateUnseenCats = true))
        }
        val p2 = params.copy(featureWeights =
          params.featureWeights.orElse(spec.featureWeights))
        val res = Trainer.boost(blocks, evalRdds, bins, p2,
          Nil, None, Some(df.sparkSession), Nil,
          knownRows = totalRows)
        (l, attachNames(res, names))
      })
    } finally composite.unpersist(blocking = false)
  }

  /** One-pass multi-label row view: (features, all L labels, weight,
    * baseMargin) — the label-invariant twin of [[prepare]] for the
    * pointwise [[trainMultiLabel]] fast path. */
  private def prepareMulti(df: DataFrame, spec: DMatrixSpec,
      numWorkers: Int)
      : RDD[(Array[Float], Array[Float], Float, Float)] = {
    val base = if (numWorkers > 0) df.repartition(numWorkers) else df
    val assembled = spec.assemble(base)
    val cols = assembled.columns
    val lis = spec.labelCol.map(cols.indexOf(_)).toArray
    val wi = spec.weightCol.map(cols.indexOf(_)).getOrElse(-1)
    val mi = spec.baseMarginCol.map(cols.indexOf(_)).getOrElse(-1)
    assembled.rdd.mapPartitions({ it =>
      it.map { row: Row =>
        val f = row.getSeq[Float](0).toArray
        val ys = lis.map(li =>
          if (li >= 0 && !row.isNullAt(li)) row.getFloat(li) else 0f)
        val w = if (wi >= 0 && !row.isNullAt(wi)) row.getFloat(wi) else 1f
        val m = if (mi >= 0 && !row.isNullAt(mi)) row.getFloat(mi)
          else Float.NaN
        (f, ys, w, m)
      }
    }, preservesPartitioning = true)
  }

  /** Append one `prediction_<label>` column per trained label. */
  def predictMultiLabel(result: MultiLabelResult, df: DataFrame,
      spec: DMatrixSpec): DataFrame = {
    // earlier prediction columns must not leak into later feature sets
    val predCols = result.results.map { case (l, _) => s"prediction_$l" }
    result.results.foldLeft(df) { case (acc, (l, r)) =>
      val s = singleLabelSpec(spec, l)
      predict(r.model, acc, s.copy(ignore = s.ignore ++ predCols))
        .withColumnRenamed("prediction", s"prediction_$l")
    }
  }

  /**
   * Train ONE vector-leaf tree per round over all label columns — the
   * xgboost 2.x `multi_strategy = "multi_output_tree"` analog (see
   * [[graft.learner.MultiOutput]] for semantics and v1 scope). Same
   * prepare→bin→pack pipeline as [[trainMultiLabel]]'s fast path (one
   * data pass assembles all L labels), but training then costs one
   * histogram pass per level TOTAL instead of one per label, and the
   * model is L× smaller (shared split structure).
   */
  def trainMultiOutput(
      df: DataFrame,
      spec: DMatrixSpec,
      params: TrainParams,
      numWorkers: Int = 0): MultiOutput.MultiOutputModel = {
    require(spec.labelCol.size >= 2,
      s"multi_output_tree needs >=2 label columns, got ${spec.labelCol}")
    val obj = Objectives.resolve(params)
    require(!obj.needsGroups && !obj.needsBounds &&
      spec.qidCol.isEmpty && spec.labelLowerCol.isEmpty &&
      spec.labelUpperCol.isEmpty,
      "multi_output_tree supports pointwise objectives without " +
        "qid/bounds roles — use trainMultiLabel for those")
    // param-only knob validation BEFORE any data scan (review r20):
    // an unsupported booster/subsample must not cost prepare+bin+pack
    // of the whole input first
    MultiOutput.checkParams(params, obj)
    spec.validate(df, requireLabel = true)
    val catFlags = spec.categoricalFlags(df)
    val kOut = spec.labelCol.size
    val init = obj.initMargin(params.baseScore)
    val multiRows = prepareMulti(df, spec, numWorkers)
    val totalRows = df.count()
    val bins = Binner.fit(multiRows.map(_._1), totalRows,
      params.maxBins, seed = params.seed + 42, catFeatures = catFlags,
      knownWidth = spec.featureWidth(df))
    val blocks = multiRows.mapPartitions({ it0 =>
      val it = it0.buffered
      val nf = bins.numFeatures
      val cap = graft.learner.TrainBlock.capacity(nf, kOut)
      new Iterator[MultiOutput.MoBlock] {
        def hasNext: Boolean = it.hasNext
        def next(): MultiOutput.MoBlock = {
          val binsArr = new Array[Byte](cap * nf)
          val labels = new Array[Float](cap * kOut)
          val weights = new Array[Float](cap)
          val margins = new Array[Float](cap * kOut)
          var n = 0
          while (it.hasNext && n < cap) {
            val (f, ys, w, bm) = it.next()
            val rb = bins.binRow(f)
            System.arraycopy(rb, 0, binsArr, n * nf, nf)
            var j = 0
            while (j < kOut) { labels(n * kOut + j) = ys(j); j += 1 }
            weights(n) = w
            val m0 = if (bm.isNaN) init else bm
            java.util.Arrays.fill(margins, n * kOut, n * kOut + kOut, m0)
            n += 1
          }
          new MultiOutput.MoBlock(n, nf, kOut,
            java.util.Arrays.copyOf(binsArr, n * nf),
            java.util.Arrays.copyOf(labels, n * kOut),
            java.util.Arrays.copyOf(weights, n),
            java.util.Arrays.copyOf(margins, n * kOut))
        }
      }
    }, preservesPartitioning = true)
      .persist(params.storageLevel)
    blocks.foreachPartition(_ => ())
    try {
      val trees = MultiOutput.boost(blocks, bins, params, kOut)
      MultiOutput.MultiOutputModel(trees, kOut, obj.name,
        params.baseScore, bins.numFeatures, spec.labelCol)
    } finally blocks.unpersist(blocking = false)
  }

  /** Append one `prediction_<label>` column per target of a
    * [[trainMultiOutput]] model — each output scored through the same
    * codegen [[graft.functions.EnsembleScore]] path via its
    * structure-shared [[graft.learner.MultiOutput.MoTree.slice]]
    * view. */
  def predictMultiOutput(model: MultiOutput.MultiOutputModel,
      df: DataFrame, spec: DMatrixSpec): DataFrame = {
    // earlier prediction columns must not leak into later feature sets
    val predCols = model.labelNames.map(l => s"prediction_$l")
    model.labelNames.zipWithIndex.foldLeft(df) { case (acc, (l, j)) =>
      val s = singleLabelSpec(spec, l)
      predict(model.sliceModel(j), acc,
        s.copy(ignore = s.ignore ++ predCols))
        .withColumnRenamed("prediction", s"prediction_$l")
    }
  }

  /**
   * Batch prediction — analog of `predict()` (main.py:1750-1806):
   * embarrassingly parallel map, NO shuffle. Row order/correspondence
   * is preserved by construction (`withColumn`), which subsumes the
   * reference's `combine_data` order restoration
   * (matrix.py:1113-1156). Scoring runs through the whole-stage-codegen
   * [[graft.functions.EnsembleScore]] expression — primitive ArrayData
   * reads + flat-array tree traversal, no per-row Seq boxing (the r3
   * UDF hot-path regression); the model ships inside the expression
   * with the stage's task binary (the `ray.put(model)` analog,
   * main.py:1790).
   *
   * @return input df + `prediction` column (double; class id for softmax,
   *         probability for logistic) and, for softprob, a
   *         `probabilities` array column.
   */
  def predict(
      model: GraftModel,
      df: DataFrame,
      spec: DMatrixSpec,
      outputMargin: Boolean = false,
      distributedCallbacks: Seq[DistributedCallback] = Nil): DataFrame = {
    val spark = df.sparkSession
    val featsArr = checkedFeatures(model, df, spec)
    import org.apache.spark.sql.graftbridge.GraftColumnBridge
    // per-row base margin (DMatrix base_margin predict semantics,
    // matrix.py:329-331): rows without one — or a predict df without
    // the declared column — fall back to the objective's init margin
    // (NaN sentinel)
    val baseMargin = spec.baseMarginCol.filter(df.columns.contains)
      .map(c => coalesce(col(c).cast("float"), lit(Float.NaN)))
      .getOrElse(lit(Float.NaN))
    val scores = GraftColumnBridge.column(graft.functions.EnsembleScore(
      GraftColumnBridge.expression(featsArr),
      GraftColumnBridge.expression(baseMargin), model, outputMargin))
    val out = if (model.numClass >= 2 && model.objective == "multi:softprob") {
      val withP = df.withColumn("probabilities", scores)
      withP.withColumn("prediction",
        (array_position(col("probabilities"),
          array_max(col("probabilities"))) - 1).cast("double"))
    } else if (model.numClass >= 2 &&
        model.objective.startsWith("reg:quantileerror")) {
      // multi-quantile: the full per-α vector in `predictions` (xgboost
      // returns shape (n, k) for a quantile_alpha list); `prediction`
      // keeps the first α for the scalar-column consumers
      val withP = df.withColumn("predictions", scores)
      withP.withColumn("prediction",
        element_at(col("predictions"), 1).cast("double"))
    } else {
      df.withColumn("prediction", element_at(scores, 1).cast("double"))
    }
    if (distributedCallbacks.isEmpty) out
    else {
      // before/afterPredict fire when each output partition is computed
      val schema = out.schema
      val rdd = out.rdd.mapPartitions(
        DistributedCallback.wrapPredict(distributedCallbacks)(_))
      spark.createDataFrame(rdd, schema)
    }
  }

  /**
   * Leaf-index prediction — the xgboost `pred_leaf=True` kwarg the
   * reference forwards through `predict` (main.py:1750-1806): appends a
   * `leaf_indices` array<int> column with one leaf node id per tree
   * (ensemble layout order). The standard building block for
   * gradient-boosted embedding features and leaf-level analysis; same
   * codegen zero-boxing path as the score predict.
   */
  def predictLeaf(model: GraftModel, df: DataFrame,
      spec: DMatrixSpec): DataFrame = {
    val featsArr = checkedFeatures(model, df, spec)
    import org.apache.spark.sql.graftbridge.GraftColumnBridge
    df.withColumn("leaf_indices",
      GraftColumnBridge.column(graft.functions.EnsembleLeaves(
        GraftColumnBridge.expression(featsArr), model)))
  }

  /**
   * Feature-contribution prediction — the xgboost `pred_contribs=True`
   * kwarg the reference forwards through `predict` (main.py:1750-1806):
   * appends a `contribs` array<float> column laid out as documented on
   * [[GraftModel.contribs]] (per class: numFeatures contributions +
   * bias; each class block sums to that class's raw margin).
   *
   * @param approxContribs false (default, like xgboost): EXACT TreeSHAP
   *                       Shapley values (Lundberg's polynomial walk
   *                       over the trained cover stats); true: the
   *                       Saabas path decomposition (xgboost's
   *                       `approx_contribs=True`).
   */
  def predictContrib(model: GraftModel, df: DataFrame,
      spec: DMatrixSpec, approxContribs: Boolean = false): DataFrame = {
    val featsArr = checkedFeatures(model, df, spec)
    import org.apache.spark.sql.graftbridge.GraftColumnBridge
    val expr =
      if (approxContribs) graft.functions.EnsembleContribs(
        GraftColumnBridge.expression(featsArr), model)
      else graft.functions.EnsembleShapContribs(
        GraftColumnBridge.expression(featsArr), model)
    val out = df.withColumn("contribs", GraftColumnBridge.column(expr))
    // per-row base margin rides the bias slot (DMatrix base_margin
    // predict semantics, matrix.py:329-331) so each class block still
    // sums to the margin `predict` reports on the same spec
    baseMarginAdj(model, df, spec).fold(out) { adj =>
      val w = model.numFeatures + 1
      out.withColumn("contribs", transform(col("contribs"), (x, i) =>
        when(i % w === w - 1, (x.cast("double") + adj).cast("float"))
          .otherwise(x)))
    }
  }

  /** Bias-slot correction for a per-row base margin: bm − initMargin
    * (0 for NaN/absent rows). None when the spec declares no margin
    * column or `df` lacks it — the common path stays adjustment-free. */
  private def baseMarginAdj(model: GraftModel, df: DataFrame,
      spec: DMatrixSpec): Option[org.apache.spark.sql.Column] =
    spec.baseMarginCol.filter(df.columns.contains).map { c =>
      val bm = coalesce(col(c).cast("float"), lit(Float.NaN))
      when(isnan(bm), lit(0d))
        .otherwise(bm.cast("double") - model.initMargin.toDouble)
    }

  /**
   * Pairwise interaction prediction — the xgboost
   * `pred_interactions=True` kwarg the reference forwards through
   * `predict` (main.py:1750-1806): appends an `interactions`
   * array<float> column (per class a flattened (numFeatures+1)²
   * symmetric matrix; row sums reproduce [[predictContrib]]'s blocks,
   * totals the raw margins).
   *
   * @param approxInteractions false (default, like xgboost): EXACT
   *                           SHAP interaction values via conditioned
   *                           TreeSHAP walks
   *                           ([[GraftModel.shapInteractions]]); true:
   *                           the Saabas-style path decomposition
   *                           ([[GraftModel.interactions]]).
   */
  def predictInteractions(model: GraftModel, df: DataFrame,
      spec: DMatrixSpec, approxInteractions: Boolean = false)
      : DataFrame = {
    val featsArr = checkedFeatures(model, df, spec)
    import org.apache.spark.sql.graftbridge.GraftColumnBridge
    val expr =
      if (approxInteractions) graft.functions.EnsembleInteractions(
        GraftColumnBridge.expression(featsArr), model)
      else graft.functions.EnsembleShapInteractions(
        GraftColumnBridge.expression(featsArr), model)
    val out =
      df.withColumn("interactions", GraftColumnBridge.column(expr))
    // base margin lands on the (bias, bias) diagonal cell of each
    // class block, keeping row sums aligned with the adjusted contribs
    // and the total equal to the margin
    baseMarginAdj(model, df, spec).fold(out) { adj =>
      val side = model.numFeatures + 1
      val block = side * side
      val biasCell = (side - 1) * side + (side - 1)
      out.withColumn("interactions",
        transform(col("interactions"), (x, i) =>
          when(i % block === biasCell,
            (x.cast("double") + adj).cast("float")).otherwise(x)))
    }
  }

  // ---- internals ----

  /** Inference feature array via the SAME assembly expression training
    * used (`DMatrixSpec.featuresArray` — per-column or pre-assembled
    * Vector/array, `missing` substitution included), with the model
    * width check applied when the width is statically known. */
  private def checkedFeatures(model: GraftModel, df: DataFrame,
      spec: DMatrixSpec): org.apache.spark.sql.Column = {
    spec.featureWidth(df).foreach { n =>
      require(n == model.numFeatures,
        s"model expects ${model.numFeatures} features, got $n")
    }
    spec.featuresArray(df)
  }

  /** (features, label, weight, baseMargin, qid, upperBound) rows; label
    * doubles as the survival lower bound, upperBound is NaN unless the
    * spec declares survival bounds. */
  private[api] type Prepared =
    RDD[(Array[Float], Float, Float, Float, Long, Float)]

  private[api] def prepare(df: DataFrame, spec: DMatrixSpec, obj: Objective,
      numWorkers: Int,
      dcbs: Seq[DistributedCallback] = Nil): Prepared = {
    // ranking needs qid-contiguous partitions (matrix.py:70-102)
    val base =
      if (obj.needsGroups) {
        val q = spec.qidCol.getOrElse(throw new IllegalArgumentException(
          "rank objective requires qidCol"))
        val parts = if (numWorkers > 0) numWorkers
          else df.rdd.getNumPartitions
        // content-pinned intra-group order for listwise objectives:
        // the sort key is what the trainer consumes, nothing else
        val keyCols = (spec.resolveFeatures(df) ++ spec.labelCol ++
          spec.weightCol ++ spec.baseMarginCol ++ spec.labelLowerCol ++
          spec.labelUpperCol).filter(df.columns.contains)
        Sharding.sortByQid(df, q, math.max(parts, 1), keyCols)
      } else if (numWorkers > 0) df.repartition(numWorkers)
      else df

    val assembled = spec.assemble(base)
    val cols = assembled.columns
    val li = spec.labelCol.headOption.orElse(spec.labelLowerCol)
      .map(cols.indexOf(_)).getOrElse(-1)
    val wi = spec.weightCol.map(cols.indexOf(_)).getOrElse(-1)
    val mi = spec.baseMarginCol.map(cols.indexOf(_)).getOrElse(-1)
    val qi = spec.qidCol.map(cols.indexOf(_)).getOrElse(-1)
    val ui = spec.labelUpperCol.map(cols.indexOf(_)).getOrElse(-1)
    assembled.rdd.mapPartitions({ it0 =>
      val it = DistributedCallback.wrapLoading(dcbs, init = true)(it0)
      it.map { row: Row =>
        val f = row.getSeq[Float](0).toArray
        val y = if (li >= 0 && !row.isNullAt(li)) row.getFloat(li) else 0f
        val w = if (wi >= 0 && !row.isNullAt(wi)) row.getFloat(wi) else 1f
        val m = if (mi >= 0 && !row.isNullAt(mi)) row.getFloat(mi)
          else Float.NaN
        val q = if (qi >= 0 && !row.isNullAt(qi)) row.getLong(qi) else 0L
        val u = if (ui >= 0 && !row.isNullAt(ui)) row.getFloat(ui)
          else if (ui < 0) y // no upper column ⇒ uncensored point label
          else Float.NaN     // declared but NULL ⇒ right-censored (∞)
        (f, y, w, m, q, u)
      }
    }, preservesPartitioning = true)
  }

  /** Per-block feature-storage strategy for [[packBlocks]] — the ONLY
    * thing that differs between the byte-binned [[toBinned]] pack and
    * the fused path's raw-float pack. Everything else (capacity rule,
    * qid-group extension, anyQid/anyBound, NaN-margin init) lives once
    * in [[packBlocks]], so the two representations can never drift —
    * the fused path's bit-identity guarantee is structural, not a
    * discipline (the r12→r13 packing migration precedent). A fresh
    * sink is created per block (mutable feature buffer inside). */
  private trait FeatSink[B] {
    /** Feature width (from the binner for the binned sink — width
      * mismatches then fail the per-row check; from the first row for
      * the float sink). */
    def featWidth(firstRow: Array[Float]): Int
    def alloc(cells: Int): Unit
    def growTo(cells: Int): Unit
    def write(f: Array[Float], rowIdx: Int, nf: Int): Unit
    def result(n: Int, nf: Int, k: Int, labels: Array[Float],
        weights: Array[Float], qids: Array[Long], uppers: Array[Float],
        margins: Array[Float]): B
  }

  /** The one block packer: prepared rows → blocks of `sinkFor`'s
    * representation. Row order within a partition is the prepared
    * order and block boundaries are the capacity rule + qid-group
    * extension — the RepresentationGoldenSpec bit-identity contract. */
  private def packBlocks[B: scala.reflect.ClassTag](rows: Prepared,
      k: Int, init: Float, keepGroups: Boolean,
      sinkFor: () => FeatSink[B]): RDD[B] =
    rows.mapPartitions({ it0 =>
      val it = it0.buffered
      new Iterator[B] {
        def hasNext: Boolean = it.hasNext
        def next(): B = {
          val sink = sinkFor()
          val nf = sink.featWidth(it.head._1)
          val cap0 = TrainBlock.capacity(nf, k)
          var cap = cap0
          sink.alloc(cap * nf)
          var labels = new Array[Float](cap)
          var weights = new Array[Float](cap)
          var qids = new Array[Long](cap)
          var uppers = new Array[Float](cap)
          var margins = new Array[Float](cap * k)
          var n = 0
          var anyQid = false
          var anyBound = false
          def grow(): Unit = {
            cap *= 2
            sink.growTo(cap * nf)
            labels = java.util.Arrays.copyOf(labels, cap)
            weights = java.util.Arrays.copyOf(weights, cap)
            qids = java.util.Arrays.copyOf(qids, cap)
            uppers = java.util.Arrays.copyOf(uppers, cap)
            margins = java.util.Arrays.copyOf(margins, cap * k)
          }
          def add(): Unit = {
            val (f, y, w, m, q, u) = it.next()
            if (f.length != nf) throw new IllegalArgumentException(
              s"graft: feature row has ${f.length} element(s); " +
                s"expected $nf (inconsistent pre-assembled feature " +
                "widths?)")
            if (n == cap) grow()
            sink.write(f, n, nf)
            labels(n) = y; weights(n) = w; qids(n) = q; uppers(n) = u
            if (q != 0L) anyQid = true
            // NaN upper (right-censored) compares unequal to y, so the
            // bounds column is kept exactly when some row needs it
            if (u != y) anyBound = true
            val m0 = if (m.isNaN) init else m
            java.util.Arrays.fill(margins, n * k, n * k + k, m0)
            n += 1
          }
          add()
          while (it.hasNext && (n < cap0 ||
              (keepGroups && it.head._5 == qids(n - 1)))) add()
          sink.result(n, nf, k,
            java.util.Arrays.copyOf(labels, n),
            java.util.Arrays.copyOf(weights, n),
            if (anyQid) java.util.Arrays.copyOf(qids, n) else null,
            if (anyBound) java.util.Arrays.copyOf(uppers, n) else null,
            java.util.Arrays.copyOf(margins, n * k))
        }
      }
    }, preservesPartitioning = true)

  /** Fused round-1 pack (r15): prepared rows → [[FloatBlock]]s with
    * EXACTLY the block boundaries [[toBinned]] produces (the shared
    * [[packBlocks]] core guarantees it) so the later block-local
    * conversion is 1:1. See [[FloatBlock]] for why this exists. */
  private[api] def packFloat(rows: Prepared, obj: Objective,
      baseScore: Double): RDD[FloatBlock] =
    packBlocks(rows, obj.numOutputs, obj.initMargin(baseScore),
      obj.needsGroups, () => new FeatSink[FloatBlock] {
        private var feats: Array[Float] = _
        def featWidth(firstRow: Array[Float]): Int = firstRow.length
        def alloc(cells: Int): Unit = feats = new Array[Float](cells)
        def growTo(cells: Int): Unit =
          feats = java.util.Arrays.copyOf(feats, cells)
        def write(f: Array[Float], rowIdx: Int, nf: Int): Unit =
          System.arraycopy(f, 0, feats, rowIdx * nf, nf)
        def result(n: Int, nf: Int, k: Int, labels: Array[Float],
            weights: Array[Float], qids: Array[Long],
            uppers: Array[Float], margins: Array[Float]): FloatBlock =
          new FloatBlock(n, nf, k,
            java.util.Arrays.copyOf(feats, n * nf),
            labels, weights, qids, uppers, margins)
      })

  /** Block-local conversion of cached [[FloatBlock]]s into byte-binned
    * [[TrainBlock]]s — the second half of the fused round-1. Allocates
    * only the bins; every other column passes through by reference. */
  private[api] def fromFloat(blocks: RDD[FloatBlock], bins: Binner.Bins,
      obj: Objective, tolerateUnseenCats: Boolean = false)
      : RDD[TrainBlock] = {
    val k = obj.numOutputs
    blocks.map { fb =>
      val nf = fb.nf
      require(nf == bins.numFeatures,
        s"graft: packed rows have $nf feature(s) but the binner fit " +
          s"${bins.numFeatures} (inconsistent feature widths across " +
          "partitions?)")
      val binsArr = new Array[Byte](fb.n * nf)
      val row = new Array[Float](nf)
      var i = 0
      while (i < fb.n) {
        System.arraycopy(fb.feats, i * nf, row, 0, nf)
        val rb = bins.binRow(row, tolerateUnseenCats)
        System.arraycopy(rb, 0, binsArr, i * nf, nf)
        i += 1
      }
      new TrainBlock(fb.n, nf, k, binsArr, fb.labels, fb.weights,
        fb.qids, fb.uppers, fb.margins)
    }
  }

  /** Bin prepared rows into packed primitive [[TrainBlock]]s (the r12
    * cached representation — see TrainBlock.scala for the layout and
    * the footprint rationale). Row order within each partition is the
    * prepared order, so every downstream per-row pass (gradients,
    * histograms, metrics) sees the exact sequence the r11 per-row
    * tuples produced — the RepresentationGoldenSpec bit-identity
    * contract. `keepGroups` (ranking) extends a block past its
    * capacity until the current qid run ends, so qid groups never
    * straddle blocks. */
  private[api] def toBinned(rows: Prepared, bins: Binner.Bins, obj: Objective,
      baseScore: Double, tolerateUnseenCats: Boolean = false)
      : RDD[TrainBlock] =
    packBlocks(rows, obj.numOutputs, obj.initMargin(baseScore),
      obj.needsGroups, () => new FeatSink[TrainBlock] {
        private var binsArr: Array[Byte] = _
        def featWidth(firstRow: Array[Float]): Int = bins.numFeatures
        def alloc(cells: Int): Unit = binsArr = new Array[Byte](cells)
        def growTo(cells: Int): Unit =
          binsArr = java.util.Arrays.copyOf(binsArr, cells)
        def write(f: Array[Float], rowIdx: Int, nf: Int): Unit = {
          val rb = bins.binRow(f, tolerateUnseenCats)
          System.arraycopy(rb, 0, binsArr, rowIdx * nf, nf)
        }
        def result(n: Int, nf: Int, k: Int, labels: Array[Float],
            weights: Array[Float], qids: Array[Long],
            uppers: Array[Float], margins: Array[Float]): TrainBlock =
          new TrainBlock(n, nf, k,
            java.util.Arrays.copyOf(binsArr, n * nf),
            labels, weights, qids, uppers, margins)
      })
}
