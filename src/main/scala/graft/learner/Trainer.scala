package graft.learner

import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/**
 * Boosting parameters — union of the reference's `RayParams` and the
 * xgboost params it forwards (reference: xgboost_ray/main.py:449-504
 * RayParams; xgboost param passthrough main.py:1341-1398).
 */
final case class TrainParams(
    objective: String = "reg:squarederror",
    numClass: Int = 0,
    numRounds: Int = 10,
    maxDepth: Int = 6,
    eta: Double = 0.3,
    lambda: Double = 1.0,
    alpha: Double = 0.0,
    gamma: Double = 0.0,
    minChildWeight: Double = 1.0,
    subsample: Double = 1.0,
    colsampleByTree: Double = 1.0,
    colsampleByLevel: Double = 1.0,
    colsampleByNode: Double = 1.0,
    maxBins: Int = 256,
    baseScore: Double = 0.5,
    /** Random-forest mode: trees per class per round, each built from the
      * SAME gradients with independent row/col subsampling (xgboost
      * num_parallel_tree). Leaves are scaled by eta/numParallelTree so
      * the forest is a bagged average (divergence from xgboost, which
      * sums unscaled — ours keeps single-round regression unbiased). */
    numParallelTree: Int = 1,
    /** Ranking pair cap (the xgboost `lambdarank_num_pair_per_sample`
      * analog, 0 = ALL discordant pairs — the exact default every
      * rank oracle pins): with cap k > 0, each row pairs against at
      * most k sampled lower-labelled partners per round, turning the
      * per-group O(g²) pair enumeration into O(g·k) — the lever that
      * makes a multi-million-row qid group trainable (one group is
      * always one task by the contiguity contract). Sampling is
      * deterministic in (seed, round, qid), so gradients are
      * partition/retry invariant. */
    pairCap: Int = 0,
    /** survival:aft error-distribution scale (xgboost
      * aft_loss_distribution_scale). */
    aftSigma: Double = 1.0,
    /** survival:aft error distribution (xgboost aft_loss_distribution):
      * normal | logistic | extreme. */
    aftDistribution: String = "normal",
    /** reg:tweedie variance power ρ ∈ (1,2) (xgboost
      * tweedie_variance_power): ρ→1 Poisson-like, ρ→2 gamma-like. */
    tweedieVariancePower: Double = 1.5,
    /** reg:pseudohubererror slope δ (xgboost huber_slope): the
      * quadratic-to-linear transition scale of the pseudo-Huber loss. */
    huberSlope: Double = 1.0,
    /** reg:quantileerror target quantile α ∈ (0,1) (xgboost
      * quantile_alpha, scalar form). */
    quantileAlpha: Double = 0.5,
    /** reg:quantileerror VECTOR form (xgboost 2.x quantile_alpha
      * list): one tree per α per round (one-output-per-tree
      * multi-target strategy), each output fitting and
      * leaf-refreshing its own pinball quantile; predict returns the
      * full vector in `predictions`. Non-empty wins over
      * `quantileAlpha`. */
    quantileAlphas: Seq[Double] = Nil,
    seed: Long = 0L,
    earlyStoppingRounds: Int = 0,
    evalMetric: Seq[String] = Nil,
    featureWeights: Option[Array[Double]] = None,
    checkpointEvery: Int = 0,            // reference default 5 (main.py:466)
    checkpointPath: Option[String] = None,
    /** Custom objective hook (E6, reference sklearn.py:511-515): wins
      * over `objective`. Its `name` must start with "custom:" so a saved
      * model round-trips through Objectives.forName (margins-only
      * inference, the xgboost custom-obj contract). */
    customObjective: Option[Objective] = None,
    /** Custom eval metrics (E7, reference sklearn.py:431-437), evaluated
      * alongside `evalMetric` each round. */
    customMetrics: Seq[CustomMetric] = Nil,
    /** Cap one histogram aggregation buffer; wide feature sets are
      * processed in node chunks per level to stay under it. */
    maxHistBytes: Long = 64L << 20,
    /** Per-feature monotone constraints (xgboost monotone_constraints):
      * +1 prediction non-decreasing in the feature, −1 non-increasing,
      * 0 unconstrained. Indexed by feature position; shorter than the
      * feature count ⇒ remaining features unconstrained. Enforced by
      * (a) rejecting splits whose child weights violate the direction
      * and (b) midpoint bound propagation with leaf clamping — the
      * monotonicity guarantee holds by construction; split choice can
      * differ from xgboost's clamped-gain variant in edge cases. */
    monotoneConstraints: Seq[Int] = Nil,
    /** xgboost scale_pos_weight: multiplies the gradient/hessian of
      * positive (label==1) rows in binary objectives — the standard
      * class-imbalance lever. Applied to training gradients only, like
      * xgboost (eval metrics see the user's row weights unchanged). */
    scalePosWeight: Double = 1.0,
    /** xgboost max_delta_step: cap on |raw leaf weight| (before the η
      * scaling), stabilizing extremely-imbalanced logistic training.
      * 0 = no cap (xgboost default). Divergence: split GAIN is still
      * scored with uncapped weights (xgboost re-scores with the capped
      * weight); the learned values honor the cap either way. */
    maxDeltaStep: Double = 0.0,
    /** Interaction constraints (xgboost interaction_constraints):
      * groups of feature indices allowed to interact. A node may split
      * on feature f only if some group contains f together with every
      * feature already used on the path from the root (features in no
      * group form implicit singletons: once used, only they may be
      * reused below). Empty ⇒ unconstrained. */
    interactionConstraints: Seq[Seq[Int]] = Nil,
    /** Booster type (xgboost `booster`): "gbtree" (default) or "dart"
      * (Rashmi & Gilad-Bachrach 2015, "DART: Dropouts meet Multiple
      * Additive Regression Trees"). The reference forwards `booster`
      * with the rest of the xgboost params (main.py:1341-1398).
      * "gblinear" trains through [[graft.api.GraftLinear]], not here.
      * DART caveats match xgboost's: early-stopping `bestIteration` /
      * `modelAt` truncation are approximate because dropped trees are
      * rescaled retroactively, and each round re-predicts the kept
      * ensemble (the documented DART cost profile). */
    booster: String = "gbtree",
    /** DART dropout rate: each existing tree is dropped with this
      * probability before a round's gradients are computed. */
    rateDrop: Double = 0.0,
    /** DART: force at least one dropped tree whenever the dropout was
      * not skipped (xgboost `one_drop`). */
    oneDrop: Boolean = false,
    /** DART: probability of skipping the dropout entirely for a round;
      * a skipped round adds its trees exactly like gbtree. */
    skipDrop: Double = 0.0,
    /** DART dropout sampling: "uniform" (each tree equally likely) or
      * "weighted" (proportional to the tree's current DART weight). */
    sampleType: String = "uniform",
    /** DART normalization: "tree" — new trees weighted 1/(k+lr), the k
      * dropped trees rescaled by k/(k+lr); "forest" — new trees
      * weighted 1/(1+lr), dropped rescaled by 1/(1+lr). lr is
      * eta/treesPerRound, the xgboost convention. */
    normalizeType: String = "tree",
    /** Tree growth policy (xgboost grow_policy): "depthwise" (default)
      * expands the whole frontier level by level; "lossguide" expands
      * the highest-gain leaf first (best-first, LightGBM-style).
      * Distributed cost: depthwise scans the data once per LEVEL for
      * the whole frontier; lossguide scans once per applied SPLIT (the
      * two children of the last split evaluate per scan — the honest
      * leaf-wise histogram cost; LightGBM's data-parallel mode pays the
      * same per-split allreduce), so pair lossguide with maxLeaves.
      * With lossguide, maxDepth=0 means unbounded depth (xgboost
      * convention) and maxLeaves must then bound the tree. */
    growPolicy: String = "depthwise",
    /** Max leaves per tree (xgboost max_leaves; 0 = unbounded).
      * lossguide: the leaf budget of best-first growth. depthwise:
      * each level's splits apply best-gain-first until the budget is
      * spent, the rest of the frontier finalizes. */
    maxLeaves: Int = 0,
    /** xgboost `process_type`: "default" grows new trees; "update"
      * runs the `refresh` updater over an EXISTING model's trees
      * (initModel required) — per round, the corresponding round's
      * trees keep their structure while per-node cover/gain stats are
      * recomputed from the CURRENT data's gradients and (with
      * [[refreshLeaf]]) leaf values are re-fit as −η·T(G)/(H+λ). The
      * standard "re-fit an old model's leaves on fresh data" workflow;
      * numRounds must not exceed the init model's rounds. */
    processType: String = "default",
    /** xgboost `refresh_leaf`: when process_type=update, also refresh
      * leaf VALUES (true, xgboost's default) or stats only (false). */
    refreshLeaf: Boolean = true,
    /** xgboost `updater` for process_type=update: comma-separated
      * passes run in order each round — "refresh" (re-fit stats/leaves
      * on current data) and/or "prune" (collapse split nodes whose
      * gain < `gamma` into leaves, recursively bottom-up — xgboost's
      * TreePruner). Empty ⇒ "refresh" (xgboost's update default).
      * "refresh,prune" prunes by the RE-FIT gains — the "prune an
      * overfit model using fresh data" workflow. */
    updater: String = "",
    /** xgboost `max_cat_to_onehot`: a categorical node uses one-hot
      * `== code` splits while its category count is BELOW this
      * threshold, and optimal-partition splits (categories sorted by
      * gradient ratio G/H, prefix-scanned — the Fisher-optimal
      * many-vs-many grouping for second-order losses) at or above it.
      * xgboost's default is 4. Same O(bins log bins) driver cost;
      * codes unseen at training time route right. */
    maxCatToOnehot: Int = 4,
    /** Per-round learning rate (the xgboost LearningRateScheduler
      * callback / `learning_rates`): round index → η, overriding `eta`
      * for that round's trees (and DART normalization). Indexed by the
      * GLOBAL round, so checkpoint resume continues the schedule where
      * the init model left off. Native API only — a function cannot
      * ride an MLlib Param. */
    etaSchedule: Option[Int => Double] = None,
    /** StorageLevel name for the cached training representation
      * ("MEMORY_AND_DISK" default). Memory-bound executors can pick
      * "MEMORY_AND_DISK_SER": JVM object headers dominate the
      * deserialized per-row cost at narrow feature counts (~130 B/row
      * at 4 features vs ~25 B serialized — see BENCHLARGE.md), so the
      * serialized cache trades per-round deserialization CPU for a
      * several-× smaller cached footprint. The reference exposes the
      * same lever as Ray object-store spilling. */
    cacheLevel: String = "MEMORY_AND_DISK",
    /** Round-1 strategy: `false` (default) evaluates the prepare
      * lineage twice (binner-fit pass + bin/pack pass) — MEASURED
      * faster on local storage, where the vectorized columnar re-scan
      * is cheaper than writing and re-reading a transient float copy
      * of the dataset (BENCHLARGE.md r15: 38–42 s vs 66–113 s at 1e8
      * rows). `true` packs raw-float blocks in ONE lineage pass and
      * bins from the cache — the right trade only when the input scan
      * itself is the bottleneck (cold remote object storage) AND the
      * transient ~4 B/feature/row fits comfortably; results are
      * bit-identical either way (spec-pinned). */
    fuseRound1: Boolean = false) {
  /** Parsed [[cacheLevel]] (validated at param construction, so a typo
    * fails before any training work starts). */
  val storageLevel: StorageLevel = StorageLevel.fromString(cacheLevel)
}

/**
 * Custom eval metric (E7): `fn(margins, label, weight)` returns the
 * row's (weighted loss contribution, weight); the metric value is
 * sum(loss)/sum(weight) — the same partial+final aggregation shape the
 * built-ins use, so it distributes for free.
 */
final case class CustomMetric(
    name: String,
    fn: (Array[Float], Float, Float) => (Double, Double),
    isMaximize: Boolean = false) extends Serializable

// (r12) The per-row binned representation — bins(f) ∈ [0, numBins(f))
// or 255=missing, label doubling as the survival lower bound
// (matrix.py:333-343) — lives packed in [[TrainBlock]] primitive
// columns; see TrainBlock.scala for layout and footprint rationale.

/** Per-iteration callback (reference C9: compat/__init__.py:6-44). */
trait TrainingCallback extends Serializable {
  /** Return true to stop training (cooperative cancel, C6 analog). */
  def afterIteration(round: Int, metrics: Map[String, Double]): Boolean =
    false
}

/** Per-iteration callback that can also materialize the PARTIAL model
  * built so far (lazily — the thunk assembles it only when called).
  * Powers the Tune-style per-round report/checkpoint consumer
  * (reference: TuneReportCheckpointCallback, tune.py:26-104). */
trait ModelAwareCallback extends TrainingCallback {
  def afterIterationWithModel(round: Int, metrics: Map[String, Double],
      model: () => GraftModel): Boolean
  final override def afterIteration(round: Int,
      metrics: Map[String, Double]): Boolean =
    throw new IllegalStateException(
      "ModelAwareCallback must be driven via afterIterationWithModel")
}

final case class TrainResult(
    model: GraftModel,
    evalsResult: Map[String, Map[String, ArrayBuffer[Double]]],
    totalN: Long,
    roundsCompleted: Int,
    /** Best round index under early stopping (xgboost best_iteration);
      * -1 when early stopping was not active. */
    bestIteration: Int = -1,
    /** Metric value at bestIteration (xgboost best_score); NaN when
      * early stopping was not active. */
    bestScore: Double = Double.NaN) {
  /** Model truncated to the first `rounds` rounds — the
    * `iteration_range=(0, best_iteration+1)` predict idiom. */
  def modelAt(rounds: Int): GraftModel = model.truncate(rounds)
}

/**
 * Native distributed gradient-boosted-tree trainer.
 *
 * Semantic replacement for the reference's Rabit allreduce ring
 * (xgboost_ray/main.py:292-324, 672-793): there, every actor builds a
 * local gradient histogram and Rabit allreduces it so all workers see the
 * global histogram. Here the identical global histogram is produced by
 * `RDD.treeAggregate` (partial per-partition histograms, tree-merged),
 * and the (tiny) split-finding step runs once on the driver — the MLlib
 * GBT pattern. Same learned model, simpler failure model: a lost task is
 * recomputed by Spark (spark.task.maxFailures) instead of the reference's
 * actor-restart machinery (main.py:1606-1713).
 *
 * Scale design:
 *  - rows are binned once into bytes (≤256 bins/feature): 4 features =
 *    4 bytes/row vs 16 for floats; the per-round working set is margins
 *    (K floats) only.
 *  - per level, ONE job aggregates histograms for ALL active nodes
 *    (chunked if the buffer would exceed maxHistBytes).
 *  - driver work is O(nodes × features × bins) per level — independent
 *    of row count; executors never see the model except via broadcast.
 */
object Trainer {

  private val MissingBin = Binner.MissingBin

  /** Snapshot of one partially-built tree, broadcast per level chunk. */
  private final case class PartialTree(
      feature: Array[Int],        // -1 leaf, -2 pending (active frontier)
      thresholdBin: Array[Int],
      catSplit: Array[Boolean],   // categorical node marker
      catBits: Array[Array[Long]], // partition node bitmap (null=one-hot)
      defaultLeft: Array[Boolean],
      left: Array[Int],
      right: Array[Int],
      slotOf: Array[Int])         // nodeId → global histogram slot or -1

  /** One level chunk covering (tree, node) pairs across ALL trees of a
    * round — the unit of a single fused histogram job. */
  private final case class LevelChunk(
      trees: Array[PartialTree],  // per round-tree; null = no work here
      treeCls: Array[Int],        // tree → output class (gh index)
      treeSalts: Array[Int],      // tree → subsample salt
      featLists: Array[Array[Int]]) // global slot → sampled feature ids

  /** Route the binned row at byte offset `off` through a FINISHED
    * tree; returns the leaf's slot from the given node→slot map
    * (leaf-refresh traversal). */
  private def routeSlot(t: RegTree, slots: Array[Int],
      bins: Array[Byte], off: Int): Int = {
    var i = 0
    while (t.feature(i) >= 0) {
      val b = bins(off + t.feature(i)) & 0xFF
      i = if (b == MissingBin) {
        if (t.defaultLeft(i)) t.left(i) else t.right(i)
      } else if (if (t.isPartitionNode(i))
          ((t.catBits(i)(b >> 6) >>> (b & 63)) & 1L) == 1L
        else if (t.isCatNode(i)) b == t.thresholdBin(i)
        else b <= t.thresholdBin(i)) t.left(i)
      else t.right(i)
    }
    slots(i)
  }

  /** Traverse the partial tree for the binned row at byte offset
    * `off`; returns nodeId (pending or leaf). */
  private def route(pt: PartialTree, bins: Array[Byte], off: Int): Int = {
    var i = 0
    while (pt.feature(i) >= 0) {
      val b = bins(off + pt.feature(i)) & 0xFF
      i = if (b == MissingBin) { if (pt.defaultLeft(i)) pt.left(i) else pt.right(i) }
      else if (if (pt.catSplit(i)) {
          val bits = pt.catBits(i)
          if (bits != null) ((bits(b >> 6) >>> (b & 63)) & 1L) == 1L
          else b == pt.thresholdBin(i)
        } else b <= pt.thresholdBin(i)) pt.left(i)
      else pt.right(i)
    }
    i
  }

  // ---- growable node storage while building one tree ----
  private final class TreeBuilder {
    val feature = ArrayBuffer[Int]()
    val thresholdBin = ArrayBuffer[Int]()
    val threshold = ArrayBuffer[Float]()
    val catSplit = ArrayBuffer[Boolean]()
    val catBits = ArrayBuffer[Array[Long]]() // partition bitmap or null
    val defaultLeft = ArrayBuffer[Boolean]()
    val left = ArrayBuffer[Int]()
    val right = ArrayBuffer[Int]()
    val value = ArrayBuffer[Float]()
    val sumG = ArrayBuffer[Double]()
    val sumH = ArrayBuffer[Double]()
    val gain = ArrayBuffer[Double]()   // split gain (0 at leaves)
    // monotone-constraint value bounds, in the stored-value (post-η)
    // domain; (−∞, +∞) when unconstrained so clamping is a no-op
    val lower = ArrayBuffer[Double]()
    val upper = ArrayBuffer[Double]()
    // features on the path from the root (interaction constraints)
    val path = ArrayBuffer[List[Int]]()

    def newNode(g: Double, h: Double,
        lo: Double = Double.NegativeInfinity,
        up: Double = Double.PositiveInfinity,
        pf: List[Int] = Nil): Int = {
      feature += -2; thresholdBin += -1; threshold += 0f
      catSplit += false; catBits += null
      defaultLeft += false; left += -1; right += -1; value += 0f
      sumG += g; sumH += h; gain += 0.0
      lower += lo; upper += up; path += pf
      feature.length - 1
    }

    def clamp(w: Double, i: Int): Double =
      math.min(math.max(w, lower(i)), upper(i))

    def finalizeLeaf(i: Int, params: TrainParams): Unit = {
      feature(i) = -1
      value(i) = clamp(leafWeight(sumG(i), sumH(i), params), i).toFloat
    }

    def result(p: TrainParams): RegTree = {
      // internal nodes carry their would-be leaf weight too: the
      // Saabas contribution walk (GraftModel.contribs) attributes
      // v(child) − v(parent) per split, so v must exist at every node.
      // G/H are known for every materialized node (root from its first
      // histogram, children exactly at split time).
      var i = 0
      while (i < feature.length) {
        if (feature(i) >= 0 && !sumG(i).isNaN)
          value(i) =
            clamp(leafWeight(sumG(i), sumH(i), p), i).toFloat
        i += 1
      }
      new RegTree(feature.toArray, thresholdBin.toArray,
        threshold.toArray, defaultLeft.toArray, left.toArray,
        right.toArray, value.toArray, gain.toArray.map(_.toFloat),
        sumH.toArray.map(_.toFloat), // cover = hessian sum through node
        if (catSplit.contains(true)) catSplit.toArray else Array.empty,
        if (catBits.exists(_ != null)) catBits.toArray else Array.empty)
    }
  }

  /** xgboost leaf weight with L1/L2 regularization and shrinkage;
    * max_delta_step caps the RAW weight before η, as in xgboost. The
    * uncapped branch keeps the original operation ORDER — the bit-exact
    * stump oracles replay exactly (−η·T(G))/(H+λ). */
  private[learner] def leafWeight(g: Double, h: Double,
      p: TrainParams): Double =
    if (p.maxDeltaStep > 0) {
      val raw = -thresholdL1(g, p.alpha) / (h + p.lambda)
      p.eta * math.min(math.max(raw, -p.maxDeltaStep), p.maxDeltaStep)
    } else -p.eta * thresholdL1(g, p.alpha) / (h + p.lambda)

  private[learner] def thresholdL1(g: Double, alpha: Double): Double =
    if (g > alpha) g - alpha else if (g < -alpha) g + alpha else 0.0

  /** xgboost split score: T(G)² / (H + λ). */
  private[learner] def score(g: Double, h: Double,
      p: TrainParams): Double = {
    val t = thresholdL1(g, p.alpha)
    t * t / (h + p.lambda)
  }

  /** Weighted sampling without replacement (Efraimidis-Spirakis A-Res) —
    * implements colsample_by* honoring feature_weights
    * (reference: matrix.py:319-323, tests/test_end_to_end.py:429-470). */
  private def sampleFeatures(all: Array[Int], rate: Double,
      weights: Option[Array[Double]], rng: java.util.Random): Array[Int] = {
    if (rate >= 1.0 && weights.isEmpty) return all
    val n = math.max(1, math.round(rate * all.length).toInt)
    val keyed = all.map { f =>
      val w = weights.map(_(f)).getOrElse(1.0)
      val key = if (w <= 0) Double.NegativeInfinity
        else math.pow(rng.nextDouble(), 1.0 / w)
      (key, f)
    }
    keyed.sortBy(-_._1).take(n).map(_._2).sorted
  }

  /** Per-row (margins, label, weight) view of blocked data — the shape
    * [[Metrics.compute]] and global-pass objectives consume. Lazy row
    * tuples exist only inside the consuming job; the cache keeps blocks. */
  private[learner] def rowsOf(data: RDD[TrainBlock])
      : RDD[(Array[Float], Float, Float)] =
    data.mapPartitions(_.flatMap { b =>
      Iterator.tabulate(b.n)(i => (b.marginRow(i), b.labels(i), b.weights(i)))
    }, preservesPartitioning = true)

  /** Per-row (score, label, weight, qid) view — the shape the ranking
    * group metrics consume (k = 1 for rank objectives, so margin slot
    * 0 IS the score). */
  private def groupRowsOf(data: RDD[TrainBlock])
      : RDD[(Float, Float, Float, Long)] =
    data.mapPartitions(_.flatMap { b =>
      Iterator.tabulate(b.n)(i =>
        (b.margins(i * b.k), b.labels(i), b.weights(i), b.qid(i)))
    }, preservesPartitioning = true)

  /** Per-row (margins, lower, upper, weight) view — the survival-metric
    * shape (label doubles as the lower bound). */
  private def boundsRowsOf(data: RDD[TrainBlock])
      : RDD[(Array[Float], Float, Float, Float)] =
    data.mapPartitions(_.flatMap { b =>
      Iterator.tabulate(b.n)(i =>
        (b.marginRow(i), b.labels(i), b.upper(i), b.weights(i)))
    }, preservesPartitioning = true)

  /** Exact row count of blocked data (block `n` sums — no per-row work). */
  private def countRows(data: RDD[TrainBlock]): Long =
    data.mapPartitions(it =>
      Iterator.single(it.foldLeft(0L)(_ + _.n))).fold(0L)(_ + _)

  /**
   * Compute per-block gradients for one boosting round.
   * Output blocks carry gh = [g0,h0,...] interleaved (stride 2k) and a
   * deterministic per-row salt used by per-TREE subsampling in
   * buildTree (rows skip split voting but still get margin updates).
   * Row order — and with it the per-partition RNG draw sequence — is
   * the r11 per-row order exactly.
   */
  private def gradients(data: RDD[TrainBlock],
      obj: Objective, round: Int, p: TrainParams): RDD[GradBlock] = {
    val k = obj.numOutputs
    val seed = p.seed
    // scale_pos_weight multiplies positive-row gradients in binary
    // objectives (xgboost applies it inside logistic regression only)
    val spw =
      if (p.scalePosWeight != 1.0 && obj.name.startsWith("binary:"))
        p.scalePosWeight.toFloat
      else 1.0f
    if (!obj.needsGroups) {
      // global-pass objectives (Cox): one driver-reduced pre-pass per
      // round; the result rides the stage closure (Spark torrent-
      // broadcasts task binaries per stage and cleans them with it)
      val aux: Serializable =
        if (obj.needsGlobalPass) obj.globalPass(rowsOf(data))
        else null
      data.mapPartitionsWithIndex({ (pid, it) =>
        val rng = new java.util.Random(mix(seed, round, pid))
        it.map { b =>
          val n = b.n
          val gh = new Array[Float](n * 2 * k)
          val salts = new Array[Int](n)
          val g = new Array[Float](k); val h = new Array[Float](k)
          val m = new Array[Float](k)
          var i = 0
          while (i < n) {
            var c = 0
            while (c < k) { m(c) = b.margins(i * k + c); c += 1 }
            val y = b.labels(i)
            if (aux != null) obj.gradHessGlobal(aux, m, y, g, h)
            else if (obj.needsBounds)
              obj.gradHessBounds(m, y, b.upper(i), g, h)
            else obj.gradHess(m, y, g, h)
            val w =
              if (spw != 1.0f && y == 1.0f) b.weights(i) * spw
              else b.weights(i)
            c = 0
            while (c < k) {
              gh(i * 2 * k + 2 * c) = g(c) * w
              gh(i * 2 * k + 2 * c + 1) = h(c) * w
              c += 1
            }
            salts(i) = rng.nextInt()
            i += 1
          }
          new GradBlock(n, b.nf, k, b.bins, gh, salts)
        }
      }, preservesPartitioning = true)
    } else {
      // ranking: walk contiguous qid runs within each block (blocks
      // never split a group — GraftBoost.toBinned keepGroups), so
      // memory is O(one group's scratch) however big a partition grows
      // at scale. Qid groups never straddle partitions (sortByQid).
      data.mapPartitionsWithIndex({ (pid, it) =>
        val rng = new java.util.Random(mix(seed, round, pid))
        it.map { b =>
          val n = b.n
          val gh = new Array[Float](n * 2)
          val salts = new Array[Int](n)
          var i = 0
          while (i < n) {
            val q = b.qid(i)
            var j = i + 1
            while (j < n && b.qid(j) == q) j += 1
            val gn = j - i
            val margins = new Array[Float](gn)
            val labels = new Array[Float](gn)
            val weights = new Array[Float](gn)
            var x = 0
            while (x < gn) {
              margins(x) = b.margins(i + x); labels(x) = b.labels(i + x)
              weights(x) = b.weights(i + x); x += 1
            }
            val grad = new Array[Float](gn)
            val hess = new Array[Float](gn)
            // pair-sampling seed is (seed, round, qid)-deterministic —
            // NOT partition-derived — so capped gradients survive
            // repartitioning and task retries unchanged
            val pairSeed =
              if (p.pairCap > 0)
                mix(seed ^ java.lang.Long.rotateLeft(q, 21), round,
                  (q ^ (q >>> 32)).toInt)
              else 0L
            obj.groupGradients(margins, labels, weights, grad, hess,
              0, gn, p.pairCap, pairSeed)
            // rng draw per row in row order — identical to the r11
            // per-row emission sequence
            x = 0
            while (x < gn) {
              gh((i + x) * 2) = grad(x); gh((i + x) * 2 + 1) = hess(x)
              salts(i + x) = rng.nextInt()
              x += 1
            }
            i = j
          }
          new GradBlock(n, b.nf, 1, b.bins, gh, salts)
        }
      }, preservesPartitioning = true)
    }
  }

  private def mixInt(a: Int, b: Int): Int = {
    var z = a * 0x9e3779b9 + b
    z ^= z >>> 16; z *= 0x85ebca6b; z ^= z >>> 13; z *= 0xc2b2ae35
    z ^ (z >>> 16)
  }

  private def mix(seed: Long, round: Int, pid: Int): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (round * 1048573L + pid + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Driver-side per-tree growth state for one fused round. */
  private final class TreeState(val cls: Int, treeSeed: Long, nf: Int,
      p: TrainParams) {
    val rng = new java.util.Random(treeSeed)
    val treeSalt: Int = treeSeed.toInt ^ (treeSeed >>> 32).toInt
    val tb = new TreeBuilder
    val treeFeats: Array[Int] = sampleFeatures(Array.range(0, nf),
      p.colsampleByTree, p.featureWeights, rng)
    var active: Array[Int] = Array(tb.newNode(Double.NaN, Double.NaN))
  }

  /**
   * Build ALL trees of one boosting round (numParallelTree × numClass)
   * level-synchronously from the round's gradient RDD: per depth level,
   * ONE fused histogram job covers every (tree, active-node) pair —
   * the data is scanned once per level regardless of class count or
   * forest size, instead of once per level PER TREE (K× / forest-size×
   * fewer passes for softmax / RF presets). Work is chunked so one
   * aggregation buffer stays under maxHistBytes.
   */
  private def buildTrees(grads: RDD[GradBlock],
      bins: Binner.Bins, p: TrainParams, treeSeeds: Array[Long],
      classes: Array[Int]): Array[RegTree] = {
    // per-tree deterministic row subsample threshold on the row salt
    val subsampleCut: Int =
      if (p.subsample >= 1.0) Int.MaxValue
      else (Int.MinValue + (p.subsample * 4294967295.0)).toInt
    val sc = grads.sparkContext
    val b = bins.maxRealBins + 1 // last slot = missing
    val nf = bins.numFeatures
    val states = Array.tabulate(treeSeeds.length)(i =>
      new TreeState(classes(i), treeSeeds(i), nf, p))
    val treeSalts = states.map(_.treeSalt)
    val treeCls = states.map(_.cls)

    // interaction-constraint check: f may extend path P when some
    // group holds P ∪ {f}; path features themselves stay allowed, so
    // ungrouped features become implicit singletons once used
    val interSets: Array[Set[Int]] =
      p.interactionConstraints.map(_.toSet).toArray
    def interOk(path: List[Int], f: Int): Boolean =
      interSets.isEmpty || path.isEmpty || path.contains(f) ||
        interSets.exists(s => s.contains(f) && path.forall(s.contains))

    // ---- shared split machinery (both grow policies) ----

    /** Best split found for one frontier node; application is deferred
      * so each grow policy can order expansions its own way. `catSet`
      * is non-null for optimal-partition categorical splits: the codes
      * routing left, sorted ascending. */
    case class SplitDesc(gain: Double, f: Int, bin: Int, cat: Boolean,
        defLeft: Boolean, gL: Double, hL: Double,
        catSet: Array[Int] = null)

    /** Evaluate a batch of frontier nodes — (tree, nid, sampled feats) —
      * with fused chunked histogram jobs; sets node stats; returns the
      * best split per item (null = no admissible split). Deferring the
      * application is arithmetic-identical to the old apply-mid-batch
      * flow: items of one batch are never ancestors of each other, so
      * splitting one cannot change a sibling's routing or histogram. */
    def evaluateWork(work: ArrayBuffer[(Int, Int, Array[Int])])
        : Array[SplitDesc] = {
      val out = new Array[SplitDesc](work.length)
      if (work.isEmpty) return out
      val fPerNode = work.map(_._3.length).max
      val bytesPerNode = fPerNode.toLong * b * 2 * 8
      val chunkSize = math.max(1, (p.maxHistBytes / bytesPerNode).toInt)
      var done = 0
      work.grouped(chunkSize).foreach { chunk =>
        // per-tree node→global-slot maps for this chunk
        val slotOf = states.map(st => Array.fill(st.tb.feature.length)(-1))
        chunk.zipWithIndex.foreach { case ((t, nid, _), s) =>
          slotOf(t)(nid) = s
        }
        val chunkTrees = states.indices.map { t =>
          if (chunk.exists(_._1 == t)) {
            val tb = states(t).tb
            PartialTree(tb.feature.toArray, tb.thresholdBin.toArray,
              tb.catSplit.toArray, tb.catBits.toArray,
              tb.defaultLeft.toArray, tb.left.toArray, tb.right.toArray,
              slotOf(t))
          } else null
        }.toArray
        val bc = sc.broadcast(LevelChunk(chunkTrees, treeCls, treeSalts,
          chunk.map(_._3).toArray))
        val histSize = chunk.length * fPerNode * b * 2
        val seqOp = (acc: Array[Double], blk: GradBlock) => {
          val ch = bc.value
          val nf2 = blk.nf
          val k2 = blk.k
          val rb = blk.bins
          val gh = blk.gh
          var i = 0
          while (i < blk.n) {
            val off = i * nf2
            val salt = blk.salts(i)
            var t = 0
            while (t < ch.trees.length) {
              val pt = ch.trees(t)
              if (pt != null) {
                val keep = subsampleCut == Int.MaxValue ||
                  mixInt(salt, ch.treeSalts(t)) < subsampleCut
                val node = if (keep) route(pt, rb, off) else -1
                val slot = if (node >= 0) pt.slotOf(node) else -1
                if (slot >= 0) {
                  val cls = ch.treeCls(t)
                  val g = gh(i * 2 * k2 + 2 * cls)
                  val h = gh(i * 2 * k2 + 2 * cls + 1)
                  val fl = ch.featLists(slot)
                  var j = 0
                  while (j < fl.length) {
                    val bi = rb(off + fl(j)) & 0xFF
                    val slotBin = if (bi == MissingBin) b - 1 else bi
                    val idx = ((slot * fPerNode + j) * b + slotBin) * 2
                    acc(idx) += g; acc(idx + 1) += h
                    j += 1
                  }
                }
              }
              t += 1
            }
            i += 1
          }
          acc
        }
        val combOp = (a: Array[Double], c: Array[Double]) => {
          var i = 0
          while (i < a.length) { a(i) += c(i); i += 1 }
          a
        }
        // small total merge volume → single-stage aggregate (driver
        // merges the partials); big volume → tree merge so the driver
        // never receives numPartitions × histogram at once. The extra
        // treeAggregate stage is pure latency when histograms are KBs.
        val mergeBytes = histSize.toLong * 8L * grads.getNumPartitions
        val hist =
          if (mergeBytes < (64L << 20))
            grads.aggregate(new Array[Double](histSize))(seqOp, combOp)
          else grads.treeAggregate(new Array[Double](histSize))(
            seqOp, combOp, depth = 2)
        bc.destroy()

        // driver-side split finding per (tree, node) in this chunk
        chunk.zipWithIndex.foreach { case ((t, nid, fl), s) =>
          val tb = states(t).tb
          // node totals from feature 0's column (all bins + missing)
          if (tb.sumG(nid).isNaN) {
            var g = 0.0; var h = 0.0
            val base = (s * fPerNode) * b * 2
            var bi = 0
            while (bi < b) { g += hist(base + bi * 2); h += hist(base + bi * 2 + 1); bi += 1 }
            tb.sumG(nid) = g; tb.sumH(nid) = h
          }
          val gTot = tb.sumG(nid); val hTot = tb.sumH(nid)
          val parentScore = score(gTot, hTot, p)
          var bestGain = 0.0
          var bestF = -1; var bestBin = -1; var bestDefLeft = false
          var bestGL = 0.0; var bestHL = 0.0; var bestCat = false
          var bestCatSet: Array[Int] = null
          val mc = p.monotoneConstraints
          // a candidate split on a constrained feature must order its
          // child weights in the constraint's direction
          def monotoneOk(f: Int, gL: Double, hL: Double): Boolean = {
            val c = if (f < mc.length) mc(f) else 0
            if (c == 0) true
            else {
              val wl = leafWeight(gL, hL, p)
              val wr = leafWeight(gTot - gL, hTot - hL, p)
              if (c > 0) wl <= wr else wl >= wr
            }
          }
          var j = 0
          while (j < fl.length) {
            val f = fl(j)
            val base = ((s * fPerNode + j) * b) * 2
            val gMiss = hist(base + (b - 1) * 2)
            val hMiss = hist(base + (b - 1) * 2 + 1)
            val nb = bins.numBins(f)
            if (bins.isCat(f) && nb < p.maxCatToOnehot) {
              // one-hot categorical candidates: left = {code c}
              // (matrix.py:142,159,800 enable_categorical), missing
              // riding left or right like the numeric scan. Same
              // O(bins) cost — gl/hl read one bin instead of a prefix.
              var c = 0
              while (c < nb) {
                val gl = hist(base + c * 2)
                val hl = hist(base + c * 2 + 1)
                // missing → left
                val glA = gl + gMiss; val hlA = hl + hMiss
                if (hlA >= p.minChildWeight &&
                    hTot - hlA >= p.minChildWeight) {
                  val gain = 0.5 * (score(glA, hlA, p) +
                    score(gTot - glA, hTot - hlA, p) - parentScore) - p.gamma
                  if (gain > bestGain + 1e-12 && monotoneOk(f, glA, hlA)) {
                    bestGain = gain; bestF = f; bestBin = c; bestCat = true
                    bestDefLeft = true; bestGL = glA; bestHL = hlA
                    bestCatSet = null
                  }
                }
                // missing → right
                if (hl >= p.minChildWeight &&
                    hTot - hl >= p.minChildWeight) {
                  val gain = 0.5 * (score(gl, hl, p) +
                    score(gTot - gl, hTot - hl, p) - parentScore) - p.gamma
                  if (gain > bestGain + 1e-12 && monotoneOk(f, gl, hl)) {
                    bestGain = gain; bestF = f; bestBin = c; bestCat = true
                    bestDefLeft = false; bestGL = gl; bestHL = hl
                    bestCatSet = null
                  }
                }
                c += 1
              }
            } else if (bins.isCat(f)) {
              // optimal-partition categorical (xgboost max_cat_to_onehot
              // overflow): categories present at this node sorted by
              // gradient ratio G_c/H_c (Fisher's exact grouping for
              // second-order losses), then a prefix scan identical in
              // shape to the numeric one — candidate left set = first
              // j sorted categories, missing rides left or right.
              // Deterministic: ties sort by code. Codes absent here
              // (empty bins) join NEITHER side and route right at
              // inference, like unseen categories.
              val codes = (0 until nb).filter { c =>
                hist(base + c * 2) != 0.0 || hist(base + c * 2 + 1) != 0.0
              }.toArray
              if (codes.length >= 2) {
                val sorted = codes.sortBy { c =>
                  val g = hist(base + c * 2)
                  val h = hist(base + c * 2 + 1)
                  (g / math.max(h, 1e-16), c)
                }
                var gl = 0.0; var hl = 0.0
                var ci = 0
                while (ci < sorted.length - 1) {
                  val c = sorted(ci)
                  gl += hist(base + c * 2); hl += hist(base + c * 2 + 1)
                  // missing → left
                  val glA = gl + gMiss; val hlA = hl + hMiss
                  if (hlA >= p.minChildWeight &&
                      hTot - hlA >= p.minChildWeight) {
                    val gain = 0.5 * (score(glA, hlA, p) +
                      score(gTot - glA, hTot - hlA, p) - parentScore) -
                      p.gamma
                    if (gain > bestGain + 1e-12 &&
                        monotoneOk(f, glA, hlA)) {
                      bestGain = gain; bestF = f; bestBin = -1
                      bestCat = true; bestDefLeft = true
                      bestGL = glA; bestHL = hlA
                      bestCatSet = sorted.take(ci + 1).sorted
                    }
                  }
                  // missing → right
                  if (hl >= p.minChildWeight &&
                      hTot - hl >= p.minChildWeight) {
                    val gain = 0.5 * (score(gl, hl, p) +
                      score(gTot - gl, hTot - hl, p) - parentScore) -
                      p.gamma
                    if (gain > bestGain + 1e-12 && monotoneOk(f, gl, hl)) {
                      bestGain = gain; bestF = f; bestBin = -1
                      bestCat = true; bestDefLeft = false
                      bestGL = gl; bestHL = hl
                      bestCatSet = sorted.take(ci + 1).sorted
                    }
                  }
                  ci += 1
                }
              }
            } else {
            var gl = 0.0; var hl = 0.0
            var bi = 0
            while (bi < nb - 1) {
              gl += hist(base + bi * 2); hl += hist(base + bi * 2 + 1)
              // missing → left
              val glA = gl + gMiss; val hlA = hl + hMiss
              if (hlA >= p.minChildWeight &&
                  hTot - hlA >= p.minChildWeight) {
                val gain = 0.5 * (score(glA, hlA, p) +
                  score(gTot - glA, hTot - hlA, p) - parentScore) - p.gamma
                if (gain > bestGain + 1e-12 && monotoneOk(f, glA, hlA)) {
                  bestGain = gain; bestF = f; bestBin = bi
                  bestDefLeft = true; bestGL = glA; bestHL = hlA
                  bestCat = false; bestCatSet = null
                }
              }
              // missing → right
              if (hl >= p.minChildWeight && hTot - hl >= p.minChildWeight) {
                val gain = 0.5 * (score(gl, hl, p) +
                  score(gTot - gl, hTot - hl, p) - parentScore) - p.gamma
                if (gain > bestGain + 1e-12 && monotoneOk(f, gl, hl)) {
                  bestGain = gain; bestF = f; bestBin = bi
                  bestDefLeft = false; bestGL = gl; bestHL = hl
                  bestCat = false; bestCatSet = null
                }
              }
              bi += 1
            }
            }
            j += 1
          }
          if (bestF >= 0)
            out(done + s) = SplitDesc(bestGain, bestF, bestBin, bestCat,
              bestDefLeft, bestGL, bestHL, bestCatSet)
        }
        done += chunk.length
      }
      out
    }

    /** Apply a chosen split: create the children (stats exact from the
      * descriptor), propagate constraint bounds/paths, return (l, r). */
    def applySplit(t: Int, nid: Int, d: SplitDesc): (Int, Int) = {
      val tb = states(t).tb
      val gTot = tb.sumG(nid); val hTot = tb.sumH(nid)
      // child bounds: inherit the parent's; a split on a
      // constrained feature additionally pins the children on
      // either side of the clamped child-weight midpoint, which
      // makes every left-subtree value ≤ mid ≤ every
      // right-subtree value (for +1) — monotone by construction
      var lLo = tb.lower(nid); var lUp = tb.upper(nid)
      var rLo = lLo; var rUp = lUp
      val mc = p.monotoneConstraints
      val cBest = if (d.f < mc.length) mc(d.f) else 0
      if (cBest != 0) {
        val wl = tb.clamp(leafWeight(d.gL, d.hL, p), nid)
        val wr = tb.clamp(
          leafWeight(gTot - d.gL, hTot - d.hL, p), nid)
        val mid = (wl + wr) / 2
        if (cBest > 0) { lUp = math.min(lUp, mid)
          rLo = math.max(rLo, mid) }
        else { lLo = math.max(lLo, mid)
          rUp = math.min(rUp, mid) }
      }
      val childPath =
        if (p.interactionConstraints.isEmpty) Nil
        else d.f :: tb.path(nid)
      val l = tb.newNode(d.gL, d.hL, lLo, lUp, childPath)
      val r = tb.newNode(gTot - d.gL, hTot - d.hL, rLo, rUp, childPath)
      tb.gain(nid) = d.gain
      tb.feature(nid) = d.f
      tb.thresholdBin(nid) = d.bin
      // one-hot categorical: threshold IS the category code
      // (== routing); partition categorical: a 256-bit bitmap of the
      // left-routing codes (bin/threshold stay -1); numeric: the bin's
      // upper cut, as before
      tb.catSplit(nid) = d.cat
      if (d.catSet != null) {
        val bits = new Array[Long](4)
        d.catSet.foreach(c => bits(c >> 6) |= 1L << (c & 63))
        tb.catBits(nid) = bits
        tb.threshold(nid) = -1f
      } else {
        tb.threshold(nid) =
          if (d.cat) d.bin.toFloat else bins.cuts(d.f)(d.bin)
      }
      tb.defaultLeft(nid) = d.defLeft
      tb.left(nid) = l; tb.right(nid) = r
      (l, r)
    }

    if (p.growPolicy != "lossguide") {
      // ---- depthwise (default): expand the whole frontier per level —
      // ONE fused job per level regardless of class count / forest size.
      // maxLeaves > 0 spends the per-tree leaf budget best-gain-first
      // within each level (xgboost hist's depthwise behavior); the
      // budget-free path applies in scan order, bit-identical to the
      // pre-maxLeaves trainer.
      val leaves = Array.fill(states.length)(1)
      var depth = 0
      while (depth < p.maxDepth && states.exists(_.active.nonEmpty)) {
        // (treeIdx, nodeId, sampled features); per-tree RNG draw order is
        // identical to growing each tree separately. The interaction
        // filter runs AFTER sampling so the RNG sequence — and with it
        // the unconstrained model — is unchanged by the feature.
        val work = ArrayBuffer[(Int, Int, Array[Int])]()
        states.zipWithIndex.foreach { case (st, t) =>
          if (st.active.nonEmpty) {
            val levelFeats = sampleFeatures(st.treeFeats, p.colsampleByLevel,
              p.featureWeights, st.rng)
            st.active.foreach { nid =>
              val sampled = sampleFeatures(levelFeats,
                p.colsampleByNode, p.featureWeights, st.rng)
              val feats =
                if (interSets.isEmpty) sampled
                else sampled.filter(interOk(st.tb.path(nid), _))
              // no admissible feature: the node's stats are already known
              // (children get G/H at split time; only a root can be
              // stat-less, and a root has an empty path ⇒ never filtered)
              if (feats.isEmpty) st.tb.finalizeLeaf(nid, p)
              else work += ((t, nid, feats))
            }
          }
        }
        if (work.isEmpty) {
          states.foreach(_.active = Array.empty)
        } else {
          val descs = evaluateWork(work)
          val nextActive = Array.fill(states.length)(ArrayBuffer[Int]())
          if (p.maxLeaves == 0) {
            var i = 0
            while (i < work.length) {
              val (t, nid, _) = work(i)
              if (descs(i) == null) states(t).tb.finalizeLeaf(nid, p)
              else {
                val (l, r) = applySplit(t, nid, descs(i))
                nextActive(t) += l; nextActive(t) += r
              }
              i += 1
            }
          } else {
            // leaf-budgeted level: apply best-gain-first (ties: scan
            // order), finalize what the budget can't afford
            val order = descs.indices
              .filter(descs(_) != null)
              .sortBy(i => (-descs(i).gain, i))
            val applied = Array.fill(work.length)(false)
            order.foreach { i =>
              val (t, nid, _) = work(i)
              if (leaves(t) < p.maxLeaves) {
                val (l, r) = applySplit(t, nid, descs(i))
                leaves(t) += 1
                nextActive(t) += l; nextActive(t) += r
                applied(i) = true
              }
            }
            descs.indices.foreach { i =>
              if (!applied(i)) {
                val (t, nid, _) = work(i)
                states(t).tb.finalizeLeaf(nid, p)
              }
            }
          }
          states.zipWithIndex.foreach { case (st, t) =>
            st.active = nextActive(t).toArray
          }
        }
        depth += 1
      }
      // frontier nodes at maxDepth become leaves (stats already known)
      states.foreach(st => st.active.foreach(st.tb.finalizeLeaf(_, p)))
    } else {
      // ---- grow_policy=lossguide: best-first (leaf-wise) growth.
      // A per-tree priority queue holds evaluated candidate splits; each
      // iteration pops the highest-gain candidate per tree, applies it,
      // and evaluates the two children in ONE fused job across all trees
      // of the round. Distributed cost: one data scan per applied split
      // (children evaluated pairwise) — the honest leaf-wise histogram
      // cost (LightGBM's data-parallel mode pays the same per-split
      // allreduce), so cap it with maxLeaves. Candidate gains depend
      // only on the node's own rows, so popping in gain order yields
      // exactly the best-first tree; with no caps the split SET equals
      // depthwise's (expansion order can't change per-node decisions).
      val maxD = if (p.maxDepth > 0) p.maxDepth else Int.MaxValue
      val cap = if (p.maxLeaves > 0) p.maxLeaves else Int.MaxValue
      val leaves = Array.fill(states.length)(1)
      // node depth per tree (root = 0), parallel to the TreeBuilder
      // arrays — applySplit appends exactly two nodes per call
      val depthOf = states.map(_ => ArrayBuffer(0))
      // colsample_bylevel draw per (tree, depth), memoized on first
      // visit — leaf-wise revisits depths out of order, but the driver
      // expansion order is deterministic in seed, so the RNG sequence is
      val levelFeatsOf =
        states.map(_ => scala.collection.mutable.HashMap[Int, Array[Int]]())
      // max-gain queue; ties broken toward the earlier-evaluated node
      val queues = Array.fill(states.length)(
        scala.collection.mutable.PriorityQueue
          .empty[(Double, Int, Int, SplitDesc)](
            Ordering.by((c: (Double, Int, Int, SplitDesc)) => (c._1, -c._2))))
      var seqNo = 0

      def evalBatch(nodes: Seq[(Int, Int)]): Unit = {
        if (nodes.isEmpty) return
        val work = ArrayBuffer[(Int, Int, Array[Int])]()
        nodes.foreach { case (t, nid) =>
          val st = states(t)
          val lf = levelFeatsOf(t).getOrElseUpdate(depthOf(t)(nid),
            sampleFeatures(st.treeFeats, p.colsampleByLevel,
              p.featureWeights, st.rng))
          val sampled = sampleFeatures(lf, p.colsampleByNode,
            p.featureWeights, st.rng)
          val feats =
            if (interSets.isEmpty) sampled
            else sampled.filter(interOk(st.tb.path(nid), _))
          if (feats.isEmpty) st.tb.finalizeLeaf(nid, p)
          else work += ((t, nid, feats))
        }
        val descs = evaluateWork(work)
        var i = 0
        while (i < work.length) {
          val (t, nid, _) = work(i)
          if (descs(i) == null) states(t).tb.finalizeLeaf(nid, p)
          else {
            queues(t).enqueue((descs(i).gain, seqNo, nid, descs(i)))
            seqNo += 1
          }
          i += 1
        }
      }

      evalBatch(states.indices.map(t => (t, 0)))
      while (queues.exists(_.nonEmpty)) {
        val toEval = ArrayBuffer[(Int, Int)]()
        states.indices.foreach { t =>
          if (queues(t).nonEmpty) {
            if (leaves(t) >= cap) {
              // leaf budget exhausted: every queued candidate is a leaf
              queues(t).foreach(c => states(t).tb.finalizeLeaf(c._3, p))
              queues(t).clear()
            } else {
              val (_, _, nid, d) = queues(t).dequeue()
              val (l, r) = applySplit(t, nid, d)
              leaves(t) += 1
              val cd = depthOf(t)(nid) + 1
              depthOf(t) += cd; depthOf(t) += cd
              // depth-capped or budget-exhausted children are leaves
              // outright — no wasted histogram job on them
              if (cd >= maxD || leaves(t) >= cap) {
                states(t).tb.finalizeLeaf(l, p)
                states(t).tb.finalizeLeaf(r, p)
              } else { toEval += ((t, l)); toEval += ((t, r)) }
            }
          }
        }
        evalBatch(toEval.toSeq)
      }
      // lossguide leaves st.active at the root sentinel — nothing to
      // finalize here (every materialized node was closed above)
      states.foreach(_.active = Array.empty)
    }
    states.map(_.tb.result(p))
  }

  /**
   * xgboost UpdateTreeLeaf (adaptive trees) for the L1 family: reset
   * every leaf of the round's freshly built trees to
   * η · Q_α(label − margin) over the rows routed to the leaf, where Q_α
   * is the LOWER weighted quantile — the smallest value v with
   * W(≤ v) ≥ α·W. reg:absoluteerror refreshes at α = 0.5 and
   * reg:quantileerror at α = quantile_alpha, matching the objectives
   * xgboost refreshes (without it, constant-hessian L1 leaves are
   * −η·ΣG/(n+λ) ∈ [−η, η] and barely move the margin).
   *
   * Distributed and EXACT without shuffling a single row: a driver loop
   * of batched histogram refinement over the cached round data. Pass 0
   * aggregates per-leaf (Σw, min, max) of the float residuals; each
   * refinement pass aggregates one 1024-bin weight histogram per
   * UNRESOLVED leaf over its current interval (lo, hi] plus the
   * interval's min/max, and the driver narrows each leaf to the bin
   * containing the target rank. Bin membership is decided by plain
   * </> comparisons against broadcast double edges, so the running
   * W(≤ lo) bookkeeping is exact; a leaf resolves when its interval
   * holds one distinct float residual (1024⁴ = 2⁴⁰ subdivisions beats
   * a float's 2²⁴-ulp range, so ~4 passes). ALL leaves of ALL round
   * trees share each pass's single aggregate — a round costs ~5 cheap
   * narrow scans regardless of tree/leaf count, and nothing shuffles.
   *
   * Documented divergences from xgboost: the lower quantile (xgboost
   * interpolates adjacent order statistics), and the refresh sees all
   * rows (xgboost restricts to the row subsample).
   */
  private def refreshLeaves(
      data: RDD[TrainBlock],
      roundTrees: Array[RegTree],
      alphas: Array[Double], treeCls: Array[Int],
      eta: Double): Array[RegTree] = {
    val B = 1024
    // (tree, node) → global leaf slot; slot → owning tree (its output
    // slot selects the margin AND the target quantile α)
    var nSlots = 0
    val slotTree = ArrayBuffer[Int]()
    val leafSlot: Array[Array[Int]] = roundTrees.zipWithIndex.map {
      case (t, ti) =>
        val m = Array.fill(t.numNodes)(-1)
        var i = 0
        while (i < t.numNodes) {
          if (t.feature(i) < 0) { m(i) = nSlots; nSlots += 1; slotTree += ti }
          i += 1
        }
        m
    }
    val slotTreeArr = slotTree.toArray
    val sc = data.sparkContext
    val bcTrees = sc.broadcast(roundTrees)
    val bcSlots = sc.broadcast(leafSlot)

    // ---- pass 0: per-slot (Σw, min, max) of residuals ----
    val z0 = new Array[Double](nSlots * 3)
    var s = 0
    while (s < nSlots) {
      z0(s * 3 + 1) = Double.PositiveInfinity
      z0(s * 3 + 2) = Double.NegativeInfinity
      s += 1
    }
    val stats = data.aggregate(z0)(
      (acc, blk) => {
        val ts = bcTrees.value; val ls = bcSlots.value
        val kb = blk.k
        var i = 0
        while (i < blk.n) {
          val off = i * blk.nf
          val w = blk.weights(i).toDouble
          var t = 0
          while (t < ts.length) {
            // each tree refreshes against ITS OWN output's margin — for
            // multi-quantile (one tree per α) slot t%k trees see m(cls)
            val r: Double =
              (blk.labels(i) - blk.margins(i * kb + treeCls(t))).toDouble
            val slot = routeSlot(ts(t), ls(t), blk.bins, off)
            acc(slot * 3) += w
            if (r < acc(slot * 3 + 1)) acc(slot * 3 + 1) = r
            if (r > acc(slot * 3 + 2)) acc(slot * 3 + 2) = r
            t += 1
          }
          i += 1
        }
        acc
      },
      (a, c) => {
        var i = 0
        while (i < nSlots) {
          a(i * 3) += c(i * 3)
          if (c(i * 3 + 1) < a(i * 3 + 1)) a(i * 3 + 1) = c(i * 3 + 1)
          if (c(i * 3 + 2) > a(i * 3 + 2)) a(i * 3 + 2) = c(i * 3 + 2)
          i += 1
        }
        a
      })

    val target = new Array[Double](nSlots)
    val lo = new Array[Double](nSlots)
    val hi = new Array[Double](nSlots)
    val wBelow = new Array[Double](nSlots)
    val value = Array.fill(nSlots)(Double.NaN) // resolved quantile
    val keepOld = new Array[Boolean](nSlots)
    s = 0
    while (s < nSlots) {
      val w = stats(s * 3)
      val mn = stats(s * 3 + 1); val mx = stats(s * 3 + 2)
      if (w <= 0) keepOld(s) = true // unroutable leaf: keep as trained
      else if (mn == mx) value(s) = mn
      else {
        target(s) = alphas(treeCls(slotTreeArr(s))) * w
        lo(s) = Double.NegativeInfinity; hi(s) = mx; wBelow(s) = 0.0
      }
      s += 1
    }

    // ---- refinement passes ----
    var guard = 0
    var unresolved = (0 until nSlots)
      .filter(i => !keepOld(i) && value(i).isNaN).toArray
    while (unresolved.nonEmpty && guard < 64) {
      guard += 1
      val act = unresolved
      val slotPos = Array.fill(nSlots)(-1)
      act.zipWithIndex.foreach { case (sl, i) => slotPos(sl) = i }
      // edges: interior points of the slot's finite span; pass 1 spans
      // [min, max] (lo is −∞), later passes span (lo, hi]
      val edges: Array[Array[Double]] = act.map { sl =>
        val a = if (lo(sl).isNegInfinity) stats(sl * 3 + 1) else lo(sl)
        val b = hi(sl)
        Array.tabulate(B - 1)(i => a + (i + 1) * (b - a) / B)
      }
      val bcEdges = sc.broadcast(edges)
      val bcLo = sc.broadcast(act.map(lo))
      val bcHi = sc.broadcast(act.map(hi))
      val bcPos = sc.broadcast(slotPos)
      val width = B + 2 // hist + interval min + interval max
      val z = new Array[Double](act.length * width)
      var i = 0
      while (i < act.length) {
        z(i * width + B) = Double.PositiveInfinity
        z(i * width + B + 1) = Double.NegativeInfinity
        i += 1
      }
      val h = data.aggregate(z)(
        (acc, blk) => {
          val ts = bcTrees.value; val ls = bcSlots.value
          val pos = bcPos.value
          val kb = blk.k
          var i = 0
          while (i < blk.n) {
            val off = i * blk.nf
            val w = blk.weights(i).toDouble
            var t = 0
            while (t < ts.length) {
              val r: Double =
                (blk.labels(i) - blk.margins(i * kb + treeCls(t))).toDouble
              val slot = routeSlot(ts(t), ls(t), blk.bins, off)
              val pi = pos(slot)
              if (pi >= 0 && r > bcLo.value(pi) && r <= bcHi.value(pi)) {
                val e = bcEdges.value(pi)
                // j = #(edges < r): first index with e(idx) >= r
                var l = 0; var u = e.length
                while (l < u) {
                  val mid = (l + u) >>> 1
                  if (e(mid) < r) l = mid + 1 else u = mid
                }
                val base = pi * width
                acc(base + l) += w
                if (r < acc(base + B)) acc(base + B) = r
                if (r > acc(base + B + 1)) acc(base + B + 1) = r
              }
              t += 1
            }
            i += 1
          }
          acc
        },
        (a, c) => {
          var i = 0
          while (i < a.length) {
            val off = i % width
            if (off == B) { if (c(i) < a(i)) a(i) = c(i) }
            else if (off == B + 1) { if (c(i) > a(i)) a(i) = c(i) }
            else a(i) += c(i)
            i += 1
          }
          a
        })
      bcEdges.destroy(); bcLo.destroy(); bcHi.destroy(); bcPos.destroy()
      act.zipWithIndex.foreach { case (sl, pi) =>
        val base = pi * width
        val mnI = h(base + B); val mxI = h(base + B + 1)
        if (mnI == mxI) value(sl) = mnI // single float left: the answer
        else {
          var cum = wBelow(sl)
          var j = 0
          while (j < B && cum + h(base + j) < target(sl)) {
            cum += h(base + j); j += 1
          }
          if (j >= B) value(sl) = mxI // numeric guard; cannot happen
          else {
            val e = edges(pi)
            lo(sl) = if (j == 0) lo(sl) else e(j - 1)
            hi(sl) = if (j == B - 1) hi(sl) else e(j)
            wBelow(sl) = cum
          }
        }
      }
      unresolved = unresolved.filter(i => value(i).isNaN)
    }
    unresolved.foreach(sl => value(sl) = hi(sl)) // guard exhausted
    bcTrees.destroy(); bcSlots.destroy()

    roundTrees.zipWithIndex.map { case (t, ti) =>
      val v = t.value.clone()
      var i = 0
      while (i < t.numNodes) {
        val sl = leafSlot(ti)(i)
        if (sl >= 0 && !keepOld(sl)) v(i) = (eta * value(sl)).toFloat
        i += 1
      }
      new RegTree(t.feature, t.thresholdBin, t.threshold, t.defaultLeft,
        t.left, t.right, v, t.gain, t.cover, t.catSplit, t.catBits)
    }
  }

  /**
   * The boosting loop — analog of the reference's `_train` round loop
   * (main.py:1061-1337), with the driver playing the tracker role.
   *
   * @param train  binned row blocks carrying current margins (will be
   *               persisted/replaced per round)
   * @param evals  named eval sets in the same representation
   * @param releaseInputs false when `train`/`evals` are caller-owned
   *               caches (a reused [[graft.api.GraftBoost.BinnedMatrix]])
   *               that must survive this run for the next one — every
   *               unpersist is then guarded on input identity
   */
  def boost(
      train: RDD[TrainBlock],
      evals: Seq[(String, RDD[TrainBlock])],
      bins: Binner.Bins,
      p: TrainParams,
      callbacks: Seq[TrainingCallback] = Nil,
      initModel: Option[GraftModel] = None,
      spark: Option[org.apache.spark.sql.SparkSession] = None,
      distributedCallbacks: Seq[DistributedCallback] = Nil,
      releaseInputs: Boolean = true,
      knownRows: Long = -1L)
      : TrainResult = {
    val inputSet = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[RDD[TrainBlock], java.lang.Boolean]())
    if (!releaseInputs) {
      inputSet.add(train); evals.foreach(e => inputSet.add(e._2))
    }
    // intermediate (margin-advanced) RDDs always free; caller-owned
    // input caches never do
    def release(r: RDD[TrainBlock]): Unit =
      if (!inputSet.contains(r)) r.unpersist(blocking = false)
    def persistIfFresh(r: RDD[TrainBlock]): RDD[TrainBlock] =
      if (r.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
        r.persist(p.storageLevel)
      else r
    val obj = Objectives.resolve(p)
    require(p.customObjective.forall(_.name.startsWith("custom:")),
      "customObjective.name must start with \"custom:\" (model save/load " +
        "round-trips through Objectives.forName)")
    require(p.booster == "gbtree" || p.booster == "dart",
      s"unknown booster '${p.booster}' (gbtree | dart; gblinear " +
        "trains via GraftLinear)")
    require(p.growPolicy == "depthwise" || p.growPolicy == "lossguide",
      s"unknown growPolicy '${p.growPolicy}' (depthwise | lossguide)")
    require(p.maxLeaves >= 0,
      s"maxLeaves must be >= 0 (0 = unbounded), got ${p.maxLeaves}")
    require(p.maxCatToOnehot >= 1,
      s"maxCatToOnehot must be >= 1, got ${p.maxCatToOnehot}")
    require(p.maxDepth > 0 ||
        (p.growPolicy == "lossguide" && p.maxLeaves > 0),
      "maxDepth=0 (unbounded) requires growPolicy=lossguide with " +
        "maxLeaves > 0 to bound the tree")
    require(p.processType == "default" || p.processType == "update",
      s"unknown processType '${p.processType}' (default | update)")
    if (p.processType == "update")
      return refreshModel(train, evals, bins, p, obj, initModel,
        releaseInputs, knownRows)
    val dart = p.booster == "dart"
    if (dart) {
      require(p.rateDrop >= 0.0 && p.rateDrop <= 1.0,
        s"rateDrop must be in [0,1], got ${p.rateDrop}")
      require(p.skipDrop >= 0.0 && p.skipDrop <= 1.0,
        s"skipDrop must be in [0,1], got ${p.skipDrop}")
      require(p.sampleType == "uniform" || p.sampleType == "weighted",
        s"sampleType must be uniform|weighted, got '${p.sampleType}'")
      require(p.normalizeType == "tree" || p.normalizeType == "forest",
        s"normalizeType must be tree|forest, got '${p.normalizeType}'")
    }
    val k = obj.numOutputs
    val trees = ArrayBuffer[RegTree]()
    initModel.foreach(m => trees ++= m.trees)
    // DART weight per tree — SAMPLING bookkeeping only ("weighted"
    // sample_type probabilities): the weights themselves are baked into
    // the stored leaf values at every rescale, so predict/save/SHAP see
    // plain trees. A resumed dart model SEEDS its stored cumulative
    // weights (r10) so weighted drop probabilities continue where
    // training left off (xgboost's DART resume semantics); models
    // without stored weights (gbtree init, pre-r10 saves) start at 1.0
    // — their values already carry all past rescales either way.
    val dartWeights = ArrayBuffer[Double]()
    initModel.filter(_.dartWeights.length == trees.length)
      .foreach(m => dartWeights ++= m.dartWeights)
    while (dartWeights.length < trees.length) dartWeights += 1.0
    val broadcasts = ArrayBuffer[org.apache.spark.broadcast.Broadcast[_]]()

    var data = persistIfFresh(train)
    // duplicate names would collapse into one history entry and
    // interleave two metric series — early stopping (which reads the
    // last set's last value) would then compare alternating datasets
    // (same guard as the linear booster)
    require(evals.map(_._1).distinct.size == evals.size,
      s"duplicate eval set names: ${evals.map(_._1).mkString(", ")}")
    var evalData = evals.map { case (n, r) =>
      (n, persistIfFresh(r))
    }
    // Continued training (C4): fold the init model's trees into the
    // margins BEFORE the round loop — otherwise new trees fit gradients
    // that ignore the init model while the final ensemble sums both
    // (advisor r1, Trainer.scala:404). Requires the same Binner cuts the
    // init model was trained with (deterministic for same data + seed).
    // DART skips the fold-in: its margins are rebuilt fresh each round
    // over the whole tree buffer (init trees included), because dropped
    // trees rescale retroactively.
    // round-count arithmetic (startRound below) floor-divides the tree
    // count for BOTH boosters — a mismatched init model must fail fast
    // in dart mode too, where a miscounted startRound would silently
    // shift the (seed, round)-deterministic drop-set sequence
    initModel.filter(_.trees.nonEmpty).foreach { m =>
      require(m.trees.length % (k * p.numParallelTree) == 0,
        s"init model has ${m.trees.length} trees, not a multiple of " +
          s"numOutputs*numParallelTree = ${k * p.numParallelTree}")
      // shape compatibility (review r9): a single-output objective makes
      // the multiple-of check above vacuous (k = 1 divides everything),
      // so a multiclass init model would silently fold every class tree
      // into one margin, and a wider init model would AIOOBE on the
      // executor at bins(feature(i)). Objective NAME is deliberately
      // not compared — xgboost's xgb_model semantics allow continuing
      // raw margins under a different objective.
      require(m.numOutputs == k,
        s"init model has ${m.numOutputs} output(s) per round, the " +
          s"objective ${obj.name} trains $k — resume with a matching " +
          "objective/numClass")
      require(m.numFeatures == bins.numFeatures,
        s"init model was trained on ${m.numFeatures} feature(s), this " +
          s"data has ${bins.numFeatures}")
      // xgboost-JSON imports carry a -1 sentinel in thresholdBin (the
      // JSON has no bin-space thresholds); continued training folds the
      // init model in via BINNED traversal, which would misroute — an
      // imported model is inference-only. Optimal-partition categorical
      // nodes ALSO store thresholdBin = -1 but route via catBits over
      // bin codes (routeSlot above), so they are resumable and exempt.
      require(m.trees.forall(t => (0 until t.numNodes)
          .forall(i => t.feature(i) < 0 || t.isPartitionNode(i) ||
            t.thresholdBin(i) >= 0)),
        "init model was imported from xgboost JSON and has no bin-space " +
          "thresholds — imported models are inference-only (predict/" +
          "contribs/leaves); train a fresh model or resume from a " +
          "parquet-saved graft model")
    }
    initModel.filter(_.trees.nonEmpty).filter(_ => !dart).foreach { m =>
      val bcInit = data.sparkContext.broadcast(m.trees)
      broadcasts += bcInit
      val base = data
      val upd = applyTrees(base, bcInit, k)
        .persist(p.storageLevel)
      upd.foreachPartition(_ => ())
      evalData = evalData.map { case (n, r) =>
        // shared eval (the dtrain idiom): same fold, same RDD — alias
        // the folded train RDD rather than recomputing the just-
        // unpersisted base through a duplicate chain
        if (r eq base) (n, upd)
        else {
          val u = applyTrees(r, bcInit, k)
            .persist(p.storageLevel)
          u.foreachPartition(_ => ())
          release(r)
          (n, u)
        }
      }
      release(base)
      data = upd
    }
    // A3 total_n (main.py:1333-1335). The caller usually already
    // counted the input (GraftBoost.train's strategy count / the fused
    // path's block fold) — reuse that EXACT value instead of paying one
    // more full-cache job per train (prepare/pack drop no rows, so the
    // two counts are the same number by construction).
    val totalN = if (knownRows >= 0L) knownRows else countRows(data)

    // C8 beforeTrain: one lightweight job over the cached partitions
    if (distributedCallbacks.nonEmpty) {
      val dcbs = distributedCallbacks
      data.foreachPartition { (_: Iterator[TrainBlock]) =>
        val r = DistributedCallback.rank()
        dcbs.foreach(_.beforeTrain(r))
      }
    }

    val customByName = p.customMetrics.map(m => m.name -> m).toMap
    val metricNames = {
      val base =
        if (p.evalMetric.nonEmpty) p.evalMetric
        else if (p.customMetrics.nonEmpty) Nil
        else Seq(Metrics.defaultMetric(obj.name, p))
      base ++ p.customMetrics.map(_.name).filterNot(base.contains)
    }
    val evalsResult = scala.collection.mutable.LinkedHashMap[String,
      Map[String, ArrayBuffer[Double]]]()
    evalData.foreach { case (n, _) =>
      evalsResult(n) = metricNames.map(m => m -> ArrayBuffer[Double]()).toMap
    }

    var bestScore = Double.NaN
    var bestRound = -1
    var stop = false
    var round = 0
    // C6: all training jobs run under one job group so a hard StopEvent
    // can kill in-flight stages; the catch below turns the cancellation
    // into a clean return of the model built so far
    val sc = data.sparkContext
    val jobGroup = s"graft-train-${java.util.UUID.randomUUID()}"
    sc.setJobGroup(jobGroup, "graft boosting rounds",
      interruptOnCancel = true)
    val stopEvents = callbacks.collect { case s: StopEvent => s }
    stopEvents.foreach(_.bindCancel(() => sc.cancelJobGroup(jobGroup)))
    // margin-update RDD of the previous round, unpersisted lazily once
    // the current round's gradient pass has materialized on top of it
    // (saves one full data pass per round vs eager materialization)
    var prevData: Option[RDD[TrainBlock]] = None
    // checkpoint-resume arithmetic (C4): each completed round appended
    // numParallelTree*k trees (advisor r1: `/k` alone miscounted forests)
    val startRound = trees.length / (k * p.numParallelTree)
    val initTreeCount = trees.length // for partial-round trim on hard stop
    var curGrads: Option[RDD[GradBlock]] = None
    // Pointwise gradients are a cheap narrow map over the cached margin
    // RDD — recomputing them inside each level's histogram job costs a
    // few sigmoid/softmax evaluations per row, while PERSISTING them
    // costs a full extra cached copy of the dataset per round (old-gen
    // churn that showed up as the r3 train slowdown). Only ranking
    // gradients — which buffer whole partitions to walk qid groups —
    // are worth caching across the round's level jobs.
    val cacheGrads = obj.needsGroups
    // DART per-round state, visible to the hard-stop catch: snapshot of
    // the tree buffer taken BEFORE this round's retroactive rescale so
    // an aborted round can be rolled back (gbtree only appends, so its
    // trim arithmetic suffices; dart also mutates earlier trees).
    var dartPreRound: Array[RegTree] = null
    var dartPreWeights: Array[Double] = null
    // DART per-round resources, tracked in vars so BOTH the in-loop
    // cleanup and the hard-stop catch can release them. Unlike gbtree
    // (which broadcasts only the round's ~k new trees, O(R) total data),
    // dart broadcasts the full kept/post-rescale ensemble every round —
    // accumulating those to end-of-training would hold O(R²) tree
    // copies, so each is destroyed as soon as its round's jobs finish
    // (advisor r8). By then the margin/metric results are materialized
    // and the backing RDDs unpersisted, so no live lineage can need the
    // broadcast again.
    var dartBcKept: org.apache.spark.broadcast.Broadcast[Array[(Int, RegTree)]] = null
    var dartBcAll: org.apache.spark.broadcast.Broadcast[Array[(Int, RegTree)]] = null
    var dartRoundData: RDD[TrainBlock] = null
    var dartEvalView: Seq[RDD[TrainBlock]] = null
    while (round < p.numRounds && !stop) try {
      // DART: pick this round's dropped-tree set on the driver —
      // deterministic in (seed, round), so partitioning/retries cannot
      // change it (the xgboost DropTrees analog).
      val dropIdx: Array[Int] =
        if (dart && trees.nonEmpty)
          chooseDropSet(dartWeights, p, startRound + round)
        else Array.empty[Int]
      if (dart) {
        dartPreRound = trees.toArray
        dartPreWeights = dartWeights.toArray
      }
      // DART gradient base: margins rebuilt FRESH over the kept trees,
      // layered on the immutable init-margin RDD (`data` is never
      // advanced in dart mode). Margins cannot be carried incrementally
      // — dropped trees rescale retroactively — and a float carried sum
      // minus the dropped predictions would not cancel exactly. xgboost
      // DART re-predicts the ensemble every round too; this is the
      // documented DART cost profile, one kept-ensemble pass per round.
      val roundData =
        if (!dart || trees.isEmpty) data
        else {
          val dropSet = dropIdx.toSet
          val kept = Array.range(0, trees.length).filterNot(dropSet)
          if (kept.isEmpty) data // whole ensemble dropped: margins ARE
                                 // the init margins — no copy needed
          else {
            dartBcKept = sc.broadcast(kept.map(i => (i % k, trees(i))))
            val rd = addTreePreds(data, dartBcKept)
              .persist(p.storageLevel)
            dartRoundData = rd
            rd.foreachPartition(_ => ())
            rd
          }
        }
      val gradsRaw = gradients(roundData, obj, startRound + round, p)
      val grads =
        if (cacheGrads) {
          val g = gradsRaw.persist(p.storageLevel)
          curGrads = Some(g)
          g
        } else gradsRaw
      // layout: class-inner so GraftModel's (t % k) class mapping holds
      // for any numParallelTree: [pt0·c0, pt0·c1, …, pt1·c0, …].
      // All trees of the round grow in ONE fused job per level.
      // per-round learning rate (LearningRateScheduler analog); global
      // round index keeps a resumed schedule aligned with the full run
      val etaRound = p.etaSchedule
        .map(f => f(startRound + round)).getOrElse(p.eta)
      require(etaRound > 0, s"etaSchedule returned $etaRound for " +
        s"round ${startRound + round}; learning rates must be positive")
      val pTree = p.copy(eta = etaRound / p.numParallelTree)
      val nTrees = p.numParallelTree * k
      val builtTrees = buildTrees(grads, bins, pTree,
        Array.tabulate(nTrees)(i => mix(p.seed, startRound + round, 7919 + i)),
        Array.tabulate(nTrees)(_ % k))
      // adaptive leaf refresh (xgboost UpdateTreeLeaf): the L1 family
      // resets each leaf to η·Q_α of its residuals before the commit
      // (α per output slot — multi-quantile trains one tree per α)
      val roundTrees = obj.leafRefreshAlphas match {
        case Some(as) => refreshLeaves(roundData, builtTrees, as,
          Array.tabulate(nTrees)(_ % k), pTree.eta)
        case None => builtTrees
      }
      // the tree builds above materialized `data` (via the gradient
      // map) — the previous round's cache is now safe to drop
      prevData.foreach(release)
      prevData = None
      if (cacheGrads) { grads.unpersist(blocking = false); curGrads = None }

      if (!dart) {
        trees ++= roundTrees

        val bcTrees = data.sparkContext.broadcast(roundTrees)
        broadcasts += bcTrees
        val newData = applyTrees(data, bcTrees, k)
          .persist(p.storageLevel)
        if ((round + 1) % 50 == 0) {
          newData.localCheckpoint()
          newData.foreachPartition(_ => ()) // force the lineage truncation
        }
        prevData = Some(data)
        data = newData

        val newEvals = evalData.map { case (n, r) =>
          // an eval set that IS the training RDD (the GraftBoost
          // evals=[(dtrain,...)] reuse): the advanced TRAIN RDD is
          // bit-identical to the advanced eval (same trees, same
          // margins) — alias it instead of computing and caching a
          // duplicate chain. The train side owns its lifecycle
          // (prevData unpersists AFTER the next round materializes the
          // child; unpersisting the shared base here would force a
          // full lineage recompute of the training data at round+1).
          if (prevData.exists(_ eq r)) (n, data)
          else {
            val updated = applyTrees(r, bcTrees, k)
              .persist(p.storageLevel)
            if ((round + 1) % 50 == 0) updated.localCheckpoint()
            updated.foreachPartition(_ => ())
            release(r)
            (n, updated)
          }
        }
        evalData = newEvals
      } else {
        // DART commit: normalize (xgboost NormalizeTrees) — "tree":
        // new trees weighted 1/(k+lr), the k dropped rescaled by
        // k/(k+lr); "forest": both scaled by 1/(1+lr); lr =
        // eta/treesPerRound. Weights bake into stored values (one
        // double multiply, one float rounding per node).
        val kd = dropIdx.length
        val (dropScale, newWeight) =
          if (kd == 0) (1.0, 1.0)
          else {
            val lrNorm = etaRound / roundTrees.length
            if (p.normalizeType == "forest") {
              val d = 1.0 + lrNorm; (1.0 / d, 1.0 / d)
            } else { val d = kd + lrNorm; (kd / d, 1.0 / d) }
          }
        if (kd > 0) dropIdx.foreach { i =>
          trees(i) = scaleTreeValues(trees(i), dropScale)
          dartWeights(i) *= dropScale
        }
        val finalNew =
          if (kd == 0) roundTrees
          else roundTrees.map(scaleTreeValues(_, newWeight))
        trees ++= finalNew
        var j = 0
        while (j < finalNew.length) { dartWeights += newWeight; j += 1 }
        // the round's trees are built and committed — the per-round
        // margin cache and the kept-ensemble broadcast behind it are
        // dead (nothing downstream reads roundData; eval margins are
        // rebuilt from evalData + the post-rescale ensemble below)
        if (roundData ne data) {
          roundData.unpersist(blocking = false)
          dartRoundData = null
        }
        if (dartBcKept != null) { dartBcKept.destroy(); dartBcKept = null }
      }

      // DART: eval margins are also rebuilt fresh over the full
      // (post-rescale) ensemble — the carried eval RDDs stay at their
      // init margins. Persisted only for this round's metric jobs.
      val evalView =
        if (!dart || trees.isEmpty || evalData.isEmpty) evalData
        else {
          dartBcAll = sc.broadcast(
            Array.tabulate(trees.length)(i => (i % k, trees(i))))
          val v = evalData.map { case (n, r) =>
            (n, addTreePreds(r, dartBcAll)
              .persist(p.storageLevel))
          }
          dartEvalView = v.map(_._2)
          v
        }

      // eval-metric aggregation (A2 analog)
      val roundMetrics = scala.collection.mutable.LinkedHashMap[String, Double]()
      evalView.foreach { case (n, r) =>
        val rows = rowsOf(r)
        metricNames.foreach { mn =>
          // rank:* objectives evaluate auc PER QID GROUP (weighted mean
          // of per-group Mann-Whitney, xgboost's ranking-auc semantics);
          // binary objectives keep the global histogram auc
          val groupish = Metrics.isGroupMetric(mn) ||
            (mn == "auc" && obj.needsGroups)
          val v =
            if (!customByName.contains(mn) && groupish) {
              // ndcg/map/auc walk qid groups — the rank layout keeps
              // groups partition-contiguous: one shuffle-free pass
              require(obj.needsGroups, s"$mn needs a rank:* objective " +
                "(qid-contiguous evaluation partitions)")
              Metrics.computeGroup(mn, groupRowsOf(r))
            } else if (!customByName.contains(mn) &&
              Metrics.isBoundsMetric(mn)) {
              // survival metrics read (lower, upper) off the block
              // (label doubles as the lower bound)
              Metrics.computeBounds(mn, obj, boundsRowsOf(r))
            } else Metrics.compute(mn, obj, rows, customByName)
          evalsResult(n)(mn) += v
          roundMetrics(s"$n-$mn") = v
        }
      }

      // early stopping on the LAST eval set + LAST metric (xgboost rule)
      if (p.earlyStoppingRounds > 0 && evalData.nonEmpty) {
        val lastEval = evalData.last._1
        val lastMetric = metricNames.last
        val cur = evalsResult(lastEval)(lastMetric).last
        val better = bestScore.isNaN ||
          (if (Metrics.maximize(lastMetric, customByName)) cur > bestScore
           else cur < bestScore)
        if (better) { bestScore = cur; bestRound = round }
        else if (round - bestRound >= p.earlyStoppingRounds) stop = true
      }

      // checkpoint (A6/C4 analog of _save_checkpoint_callback main.py:612)
      if (p.checkpointEvery > 0 && p.checkpointPath.isDefined &&
          (round + 1) % p.checkpointEvery == 0) {
        spark.foreach { s =>
          currentModel(trees, obj, p, bins, dartWeights).save(s, p.checkpointPath.get)
        }
      }

      callbacks.foreach { cb =>
        val stopNow = cb match {
          case m: ModelAwareCallback => m.afterIterationWithModel(
            startRound + round, roundMetrics.toMap,
            () => currentModel(trees, obj, p, bins, dartWeights))
          case _ =>
            cb.afterIteration(startRound + round, roundMetrics.toMap)
        }
        if (stopNow) stop = true
      }
      if (dart && (evalView ne evalData)) {
        evalView.foreach(_._2.unpersist(blocking = false))
        dartEvalView = null
      }
      if (dartBcAll != null) { dartBcAll.destroy(); dartBcAll = null }
      round += 1
    } catch {
      // a hard StopEvent cancelled the job group mid-round: drop the
      // partial round and return the model built so far (the reference
      // returns the last checkpoint on stop). `trees ++= roundTrees`
      // may already have run when the cancel landed in the margin-update
      // or metric jobs — trim back to the last COMPLETED round so model
      // length and roundsCompleted agree (advisor r2).
      case _: Throwable if stopEvents.exists(_.isSet) =>
        curGrads.foreach(_.unpersist(blocking = false))
        // DART: release whatever the aborted round had in flight — its
        // per-round margin cache, eval views, and ensemble broadcasts
        // are local vals inside the try, so the vars are the only
        // handles left (advisor r8: roundData leaked one cached copy
        // per hard stop). destroy() may race the in-flight cancelled
        // jobs, so failures are swallowed — the JVM is reclaiming
        // anyway.
        if (dartRoundData != null) {
          dartRoundData.unpersist(blocking = false); dartRoundData = null
        }
        if (dartEvalView != null) {
          dartEvalView.foreach(_.unpersist(blocking = false))
          dartEvalView = null
        }
        if (dartBcKept != null) {
          scala.util.Try(dartBcKept.destroy()); dartBcKept = null
        }
        if (dartBcAll != null) {
          scala.util.Try(dartBcAll.destroy()); dartBcAll = null
        }
        // DART: the aborted round may have already RESCALED earlier
        // trees (not just appended) — roll the buffer back to its
        // start-of-round snapshot before the append-only trim below
        if (dart && dartPreRound != null) {
          trees.clear(); trees ++= dartPreRound
          dartWeights.clear(); dartWeights ++= dartPreWeights
        }
        val keep = initTreeCount + round * k * p.numParallelTree
        if (trees.length > keep) trees.takeInPlace(keep)
        stop = true
    }
    sc.clearJobGroup() // post-loop jobs must not inherit the cancel group

    // C8 afterTrain, before the caches go away
    if (distributedCallbacks.nonEmpty) {
      val dcbs = distributedCallbacks
      data.foreachPartition { (_: Iterator[TrainBlock]) =>
        val r = DistributedCallback.rank()
        dcbs.foreach(_.afterTrain(r))
      }
    }

    release(data)
    prevData.foreach(release)
    evalData.foreach(e => release(e._2))
    // all per-round results are materialized — the round broadcasts are
    // no longer reachable from any live lineage (advisor r1: leak)
    broadcasts.foreach(_.destroy())
    TrainResult(currentModel(trees, obj, p, bins, dartWeights),
      evalsResult.map { case (n, m) => (n, m) }.toMap, totalN, round,
      bestIteration = if (p.earlyStoppingRounds > 0) bestRound else -1,
      bestScore = if (p.earlyStoppingRounds > 0) bestScore else Double.NaN)
  }

  /** Add each tree's contribution to the carried margins (class =
    * t % k). Emits a new margin generation per block; the static
    * columns (bins/labels/weights/qids/uppers) are shared by reference
    * with the input block ([[TrainBlock.withMargins]]). */
  private def applyTrees(
      rdd: RDD[TrainBlock],
      bcTrees: org.apache.spark.broadcast.Broadcast[Array[RegTree]],
      k: Int): RDD[TrainBlock] =
    rdd.mapPartitions({ it =>
      val ts = bcTrees.value
      it.map { b =>
        val m2 = b.margins.clone()
        val nf = b.nf
        var i = 0
        while (i < b.n) {
          val off = i * nf
          var t = 0
          while (t < ts.length) {
            m2(i * k + t % k) += ts(t).predictBinned(b.bins, off, MissingBin)
            t += 1
          }
          i += 1
        }
        b.withMargins(m2)
      }
    }, preservesPartitioning = true)

  /** DART variant of [[applyTrees]]: each pair is (classIdx, tree), so a
    * kept-subset of the ensemble (with gaps) still routes every tree to
    * its original class slot — `t % k` over a filtered array would not. */
  private def addTreePreds(
      rdd: RDD[TrainBlock],
      bcTrees: org.apache.spark.broadcast.Broadcast[Array[(Int, RegTree)]])
      : RDD[TrainBlock] =
    rdd.mapPartitions({ it =>
      val ts = bcTrees.value
      it.map { b =>
        val m2 = b.margins.clone()
        val nf = b.nf; val k = b.k
        var i = 0
        while (i < b.n) {
          val off = i * nf
          var t = 0
          while (t < ts.length) {
            m2(i * k + ts(t)._1) +=
              ts(t)._2.predictBinned(b.bins, off, MissingBin)
            t += 1
          }
          i += 1
        }
        b.withMargins(m2)
      }
    }, preservesPartitioning = true)

  /** Copy of `t` with every node value × `s` (leaf values are what
    * predict reads; internal entries scale harmlessly). Split structure
    * and gain/cover stats are shared unchanged — DART rescaling changes
    * tree WEIGHT, not the splits that produced the stats. */
  private def scaleTreeValues(t: RegTree, s: Double): RegTree =
    if (s == 1.0) t
    else {
      val v = new Array[Float](t.value.length)
      var i = 0
      while (i < v.length) { v(i) = (t.value(i) * s).toFloat; i += 1 }
      new RegTree(t.feature, t.thresholdBin, t.threshold, t.defaultLeft,
        t.left, t.right, v, t.gain, t.cover, t.catSplit, t.catBits)
    }

  /** DART per-round dropped-tree selection (the xgboost DropTrees
    * analog): deterministic in (p.seed, round) so task retries and
    * repartitioning cannot change the drop set. Semantics follow
    * xgboost's dart params:
    *  - with prob `skipDrop` the whole dropout is skipped (round adds
    *    its trees exactly like gbtree);
    *  - "uniform": each tree dropped i.i.d. with prob `rateDrop`;
    *  - "weighted": tree i dropped with prob rateDrop·n·wᵢ/Σw (same
    *    expected drop count, mass-proportional selection);
    *  - `oneDrop`: if nothing was dropped (and the round wasn't
    *    skipped), force one tree — weighted draw under "weighted",
    *    uniform otherwise. */
  private def chooseDropSet(weights: ArrayBuffer[Double], p: TrainParams,
      round: Int): Array[Int] = {
    val n = weights.length
    if (n == 0 || (p.rateDrop == 0.0 && !p.oneDrop)) return Array.empty
    val rng = new java.util.Random(mix(p.seed, round, 104729))
    if (p.skipDrop > 0.0 && rng.nextDouble() < p.skipDrop)
      return Array.empty
    val dropped = ArrayBuffer[Int]()
    if (p.sampleType == "weighted") {
      var total = 0.0
      var i = 0
      while (i < n) { total += weights(i); i += 1 }
      i = 0
      while (i < n) {
        val pi =
          if (total <= 0.0) p.rateDrop
          else math.min(1.0, p.rateDrop * n * weights(i) / total)
        if (rng.nextDouble() < pi) dropped += i
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        if (rng.nextDouble() < p.rateDrop) dropped += i
        i += 1
      }
    }
    if (dropped.isEmpty && p.oneDrop) {
      if (p.sampleType == "weighted") {
        var total = 0.0
        var i = 0
        while (i < n) { total += weights(i); i += 1 }
        if (total <= 0.0) dropped += rng.nextInt(n)
        else {
          var r = rng.nextDouble() * total
          i = 0
          while (i < n - 1 && r >= weights(i)) { r -= weights(i); i += 1 }
          dropped += i
        }
      } else dropped += rng.nextInt(n)
    }
    dropped.toArray
  }

  /**
   * xgboost `process_type=update` + `updater=refresh`: keep every
   * tree's STRUCTURE and re-fit its statistics (and, with
   * `refresh_leaf`, its leaf values) against the CURRENT data — the
   * standard "recalibrate an old model on fresh data" workflow the
   * reference reaches by forwarding these params verbatim
   * (main.py:1341-1398).
   *
   * Semantics (xgboost's): round r re-fits the init model's round-r
   * trees from gradients at the current margin, then margins advance
   * with the REFRESHED trees — so later rounds see the updated fit.
   * Per-node cover (Σ hessian) and internal-node gain are recomputed;
   * leaves become −η·T(G)/(H+λ); nodes no row routes to keep their
   * trained values/stats.
   *
   * Scale shape: one [[gradients]] map + ONE flat-array `aggregate`
   * per round (per-node G/H accumulated along each row's root→leaf
   * path — histogram-free, array size = Σ nodes × 2), then a narrow
   * margin-advance map. No shuffles anywhere; driver state is
   * tree-sized.
   */
  private def refreshModel(
      train: RDD[TrainBlock],
      evals: Seq[(String, RDD[TrainBlock])],
      bins: Binner.Bins,
      p: TrainParams,
      obj: Objective,
      initModel: Option[GraftModel],
      releaseInputs: Boolean = true,
      knownRows: Long = -1L): TrainResult = {
    def release(r: RDD[TrainBlock]): Unit =
      if (releaseInputs || !(r eq train)) r.unpersist(blocking = false)
    val k = obj.numOutputs
    val m = initModel.filter(_.trees.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "process_type=update re-fits an EXISTING model: pass a " +
          "non-empty initModel (xgboost requires xgb_model here too)"))
    require(evals.isEmpty,
      "process_type=update takes no eval sets — score the refreshed " +
        "model with predict")
    require(p.monotoneConstraints.isEmpty,
      "process_type=update does not re-apply monotone clamps; " +
        "refresh an unconstrained model")
    // dart models refresh like gbtree (xgboost refreshes dart trees
    // identically, weight applied at predict): re-fit the RAW leaf
    // −η·T(G)/(H+λ), then re-apply the stored cumulative weight w_t so
    // the baked-leaf convention (value ≈ raw · weight) is preserved.
    // Uses the r10+ dartWeights bookkeeping; a pre-r10 dart save has
    // empty weights and is indistinguishable from gbtree (treated as
    // all-1.0, same as predict/export do).
    require(m.numOutputs == k,
      s"init model has ${m.numOutputs} output(s), objective " +
        s"${obj.name} expects $k")
    require(m.numFeatures == bins.numFeatures,
      s"init model was trained on ${m.numFeatures} feature(s), this " +
        s"data has ${bins.numFeatures}")
    require(m.trees.forall(t => (0 until t.numNodes).forall(i =>
        t.feature(i) < 0 || t.isPartitionNode(i) ||
          t.thresholdBin(i) >= 0)),
      "init model was imported from xgboost JSON (no bin-space " +
        "thresholds) — imported models are inference-only")
    require(p.numRounds <= m.numRounds,
      s"process_type=update refreshes existing rounds only: " +
        s"numRounds ${p.numRounds} > model rounds ${m.numRounds}")
    val updaters =
      if (p.updater.trim.isEmpty) Seq("refresh")
      else p.updater.split(',').map(_.trim).toSeq
    updaters.foreach(u => require(u == "refresh" || u == "prune",
      s"unknown updater '$u' (refresh | prune)"))
    if (updaters.contains("prune"))
      require(m.trees.forall(_.hasStats),
        "updater=prune needs per-node gain stats; this model was " +
          "saved without them (pre-r3 save)")
    val tpr = m.treesPerRound
    val sc = train.sparkContext
    var data =
      if (train.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
        train.persist(p.storageLevel)
      else train
    val totalN = if (knownRows >= 0L) knownRows else countRows(data)
    val outTrees = m.trees.clone()
    var prevData: Option[RDD[TrainBlock]] = None
    // margin-advance broadcasts stay referenced by every LATER round's
    // lineage (task closures serialize the full DAG) — destroy only
    // after the last job has run
    val liveBc = ArrayBuffer[org.apache.spark.broadcast.Broadcast[_]]()
    var round = 0
    while (round < p.numRounds) {
      val etaRound = p.etaSchedule.map(f => f(round)).getOrElse(p.eta)
      // same per-tree shrinkage the original training applied
      val pLeaf = p.copy(eta = etaRound / math.max(m.numParallelTree, 1))
      updaters.foreach {
        case "prune" =>
          // driver-only structure transform on the CURRENT stats (the
          // trained gains, or the re-fit gains if refresh ran first)
          var j = 0
          while (j < tpr) {
            outTrees(round * tpr + j) =
              pruneTree(outTrees(round * tpr + j), p.gamma)
            j += 1
          }
        case "refresh" => refreshPass()
      }
      def refreshPass(): Unit = {
      val grads = gradients(data, obj, round, p)
      val roundTrees = outTrees.slice(round * tpr, round * tpr + tpr)
      val offsets = new Array[Int](roundTrees.length + 1)
      var ti = 0
      while (ti < roundTrees.length) {
        offsets(ti + 1) = offsets(ti) + roundTrees(ti).numNodes
        ti += 1
      }
      val bcTrees = sc.broadcast(roundTrees)
      val agg = grads.aggregate(new Array[Double](offsets.last * 2))(
        (acc, blk) => {
          val ts = bcTrees.value
          val kb = blk.k; val nf = blk.nf
          val rowBins = blk.bins; val gh = blk.gh
          var r = 0
          while (r < blk.n) {
            val off = r * nf
            var t = 0
            while (t < ts.length) {
              val tree = ts(t)
              // class-inner layout: tree j of a round owns output j % k
              val g = gh(r * 2 * kb + 2 * (t % k)).toDouble
              val h = gh(r * 2 * kb + 2 * (t % k) + 1).toDouble
              var i = 0
              var walking = true
              while (walking) {
                val base = (offsets(t) + i) * 2
                acc(base) += g; acc(base + 1) += h
                if (tree.feature(i) < 0) walking = false
                else {
                  val b = rowBins(off + tree.feature(i)) & 0xFF
                  i = if (b == MissingBin) {
                    if (tree.defaultLeft(i)) tree.left(i) else tree.right(i)
                  } else if (if (tree.isPartitionNode(i))
                      ((tree.catBits(i)(b >> 6) >>> (b & 63)) & 1L) == 1L
                    else if (tree.isCatNode(i)) b == tree.thresholdBin(i)
                    else b <= tree.thresholdBin(i)) tree.left(i)
                  else tree.right(i)
                }
              }
              t += 1
            }
            r += 1
          }
          acc
        },
        (a, c) => {
          var i = 0
          while (i < a.length) { a(i) += c(i); i += 1 }
          a
        })
      bcTrees.destroy()
      ti = 0
      while (ti < roundTrees.length) {
        val tree = roundTrees(ti)
        // dart: bake the stored cumulative weight back into the re-fit
        // value (the trainer's baked-leaf convention); 1.0 for gbtree
        val wT = if (m.dartWeights.isEmpty) 1.0
          else m.dartWeights(round * tpr + ti)
        val n = tree.numNodes
        val value = tree.value.clone()
        val gain =
          if (tree.hasStats) tree.gain.clone() else new Array[Float](n)
        val cover =
          if (tree.hasStats) tree.cover.clone() else new Array[Float](n)
        var i = 0
        while (i < n) {
          val base = (offsets(ti) + i) * 2
          val sumG = agg(base); val sumH = agg(base + 1)
          if (sumH > 0) {
            cover(i) = sumH.toFloat
            // internal nodes carry their would-be-leaf weight (the
            // trainer stores the same), so a later prune pass
            // collapses onto a CURRENT-data weight
            if (p.refreshLeaf)
              value(i) = (leafWeight(sumG, sumH, pLeaf) * wT).toFloat
            if (tree.feature(i) >= 0) {
              val lb = (offsets(ti) + tree.left(i)) * 2
              val rb = (offsets(ti) + tree.right(i)) * 2
              gain(i) = (score(agg(lb), agg(lb + 1), pLeaf) +
                score(agg(rb), agg(rb + 1), pLeaf) -
                score(sumG, sumH, pLeaf)).toFloat
            }
          } // no routed rows: keep the trained value/stats
          i += 1
        }
        outTrees(round * tpr + ti) = new RegTree(tree.feature,
          tree.thresholdBin, tree.threshold, tree.defaultLeft,
          tree.left, tree.right, value, gain, cover, tree.catSplit,
          tree.catBits)
        ti += 1
      }
      // L1-family parity: xgboost invokes the objective's
      // UpdateTreeLeaf hook after EVERY updater pass, refresh included
      // — MAE/quantile leaves reset to η·Q_α of the CURRENT residuals
      // (same adaptive machinery training uses), overriding the
      // generic −η·G/(H+λ) re-fit above
      if (p.refreshLeaf) obj.leafRefreshAlphas.foreach { as =>
        val adapted = refreshLeaves(data,
          outTrees.slice(round * tpr, round * tpr + tpr), as,
          Array.tabulate(tpr)(_ % k), pLeaf.eta)
        var j = 0
        while (j < adapted.length) {
          val t = adapted(j)
          // dart: the adaptive hook sets RAW leaves (η·Q_α); re-apply
          // the stored weight like xgboost's predict-time weight_drop
          val wT = if (m.dartWeights.isEmpty) 1.0
            else m.dartWeights(round * tpr + j)
          if (wT != 1.0) {
            var i = 0
            while (i < t.numNodes) {
              if (t.feature(i) < 0) t.value(i) = (t.value(i) * wT).toFloat
              i += 1
            }
          }
          outTrees(round * tpr + j) = t; j += 1
        }
      }
      } // refreshPass
      // margins advance with the REFRESHED trees (xgboost update order)
      val bcNew =
        sc.broadcast(outTrees.slice(round * tpr, round * tpr + tpr))
      liveBc += bcNew
      val nd = applyTrees(data, bcNew, k)
        .persist(p.storageLevel)
      nd.foreachPartition(_ => ())
      prevData.foreach(release)
      prevData = Some(data)
      data = nd
      round += 1
    }
    prevData.foreach(release)
    release(data)
    liveBc.foreach(_.destroy())
    // xgboost process_type=update COMMITS only the num_boost_round
    // updated rounds (all trees move to trees_to_update; the
    // un-refreshed tail is dropped) — a prefix refresh must not return
    // stale tail trees that would shift predictions
    val kept = p.numRounds * tpr
    TrainResult(
      new GraftModel(outTrees.take(kept), obj.name,
        if (obj.numOutputs <= 1) 0 else obj.numOutputs, p.baseScore,
        MissingBin, bins.numFeatures, m.numParallelTree,
        m.dartWeights.take(kept), m.featureNames),
      Map.empty, totalN, p.numRounds)
  }

  /**
   * xgboost TreePruner: recursively collapse split nodes whose gain
   * is below `gamma` (min_split_loss) AND whose children are (possibly
   * just-collapsed) leaves, bottom-up, then compact the node arrays to
   * the reachable set. The collapsed node keeps its stored node weight
   * (its would-be-leaf value — what the trainer stores at internal
   * nodes and what a refresh pass re-fits), so predictions after the
   * prune are the weights the stats justify. Pure driver transform.
   */
  private def pruneTree(t: RegTree, gamma: Double): RegTree = {
    val leafified = new Array[Boolean](t.numNodes)
    def collapse(i: Int): Boolean = // returns "i is (now) a leaf"
      if (t.feature(i) < 0) true
      else {
        val l = collapse(t.left(i)); val r = collapse(t.right(i))
        if (l && r && t.gain(i) < gamma) { leafified(i) = true; true }
        else false
      }
    collapse(0)
    if (!leafified.exists(identity)) return t
    // compact to the reachable prefix-order node set
    val order = ArrayBuffer[Int]()
    val map = Array.fill(t.numNodes)(-1)
    def visit(i: Int): Unit = {
      map(i) = order.length; order += i
      if (t.feature(i) >= 0 && !leafified(i)) {
        visit(t.left(i)); visit(t.right(i))
      }
    }
    visit(0)
    val n = order.length
    val feature = new Array[Int](n)
    val thresholdBin = new Array[Int](n)
    val threshold = new Array[Float](n)
    val defaultLeft = new Array[Boolean](n)
    val left = new Array[Int](n); val right = new Array[Int](n)
    val value = new Array[Float](n)
    val gain = new Array[Float](n); val cover = new Array[Float](n)
    val anyCat = t.catSplit.nonEmpty
    val anyBits = t.catBits.nonEmpty
    val catSplit = if (anyCat) new Array[Boolean](n) else Array.empty[Boolean]
    val catBits =
      if (anyBits) new Array[Array[Long]](n) else Array.empty[Array[Long]]
    var j = 0
    while (j < n) {
      val old = order(j)
      val leaf = t.feature(old) < 0 || leafified(old)
      feature(j) = if (leaf) -1 else t.feature(old)
      thresholdBin(j) = if (leaf) -1 else t.thresholdBin(old)
      threshold(j) = if (leaf) 0f else t.threshold(old)
      defaultLeft(j) = !leaf && t.defaultLeft(old)
      left(j) = if (leaf) -1 else map(t.left(old))
      right(j) = if (leaf) -1 else map(t.right(old))
      value(j) = t.value(old)
      gain(j) = if (leaf) 0f else t.gain(old)
      cover(j) = t.cover(old)
      if (anyCat) catSplit(j) = !leaf && t.catSplit(old)
      if (anyBits) catBits(j) = if (leaf) null else t.catBits(old)
      j += 1
    }
    new RegTree(feature, thresholdBin, threshold, defaultLeft, left,
      right, value, gain, cover,
      if (anyCat && catSplit.contains(true)) catSplit else Array.empty,
      if (anyBits && catBits.exists(_ != null)) catBits else Array.empty)
  }

  private def currentModel(trees: ArrayBuffer[RegTree], obj: Objective,
      p: TrainParams, bins: Binner.Bins,
      dartWeights: ArrayBuffer[Double] = ArrayBuffer.empty): GraftModel =
    // the stored class count follows the OBJECTIVE, not the raw param:
    // a caller passing numClass = 2 with a single-output objective
    // (binary logistic trains one tree per round) must not produce a
    // model that thinks it has two outputs and routes alternate trees
    // to a phantom class
    // numOutputs, not p.numClass: softmax has numOutputs == numClass,
    // but multi-quantile is a k-output REGRESSION with numClass unset
    new GraftModel(trees.toArray, obj.name,
      if (obj.numOutputs <= 1) 0 else obj.numOutputs, p.baseScore,
      MissingBin, bins.numFeatures, p.numParallelTree,
      // hard-stop rollback may leave more weights than kept trees —
      // the weight buffer is append-ordered, so truncate to match
      if (p.booster == "dart") dartWeights.take(trees.length).toArray
      else Array.empty)
}
