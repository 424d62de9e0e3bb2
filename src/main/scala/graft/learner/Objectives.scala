package graft.learner

/**
 * Training objectives — grad/hess functions analogous to the xgboost
 * objectives the reference forwards (reference: xgboost_ray/sklearn.py
 * 708-719 selects binary:logistic vs multi:softprob; rank:pairwise in
 * RayXGBRanker sklearn.py:920-1083; custom objective hook
 * sklearn.py:511-515).
 *
 * Pointwise objectives emit per-row (grad, hess) from (margin, label).
 * Listwise (ranking) objectives compute gradients over a whole query
 * group and therefore get the group's margins/labels at once — the
 * trainer guarantees a qid group never straddles partitions.
 */
trait Objective extends Serializable {
  def name: String
  /** Number of margin outputs per row (K for softmax family, else 1). */
  def numOutputs: Int
  /** Initial raw margin from base_score (xgboost inverse-link). */
  def initMargin(baseScore: Double): Float
  /** margin(s) → user-facing prediction(s). */
  def transform(margin: Array[Float]): Array[Float]
  /**
   * Fill grad/hess (length numOutputs) for one row.
   * Pointwise objectives implement this; ranking overrides groupGradients.
   */
  def gradHess(margin: Array[Float], label: Float,
      grad: Array[Float], hess: Array[Float]): Unit
  /** Whether gradient computation needs whole-qid groups. */
  def needsGroups: Boolean = false
  /** Whether gradients consume (label_lower, label_upper) survival
    * bounds instead of a point label (matrix.py:333-343). */
  def needsBounds: Boolean = false
  /** Survival-style gradient from interval bounds (needsBounds = true). */
  def gradHessBounds(margin: Array[Float], lower: Float, upper: Float,
      grad: Array[Float], hess: Array[Float]): Unit =
    throw new UnsupportedOperationException(s"$name takes point labels")
  /** Ranking-style gradient over one query group (margins flat, 1 output). */
  def groupGradients(margins: Array[Float], labels: Array[Float],
      weights: Array[Float], grad: Array[Float], hess: Array[Float],
      lo: Int, hi: Int): Unit =
    throw new UnsupportedOperationException(s"$name is pointwise")

  /** Capped variant (TrainParams.pairCap): at most `pairCap` sampled
    * lower-labelled partners per row, deterministic in `pairSeed`.
    * pairCap <= 0 falls through to the exact all-pairs form; pointwise
    * objectives and custom listwise objectives that don't override it
    * simply ignore the cap. */
  def groupGradients(margins: Array[Float], labels: Array[Float],
      weights: Array[Float], grad: Array[Float], hess: Array[Float],
      lo: Int, hi: Int, pairCap: Int, pairSeed: Long): Unit =
    groupGradients(margins, labels, weights, grad, hess, lo, hi)
  /** Whether gradients need a per-round GLOBAL pre-pass over the whole
    * dataset (Cox partial likelihood: risk-set sums couple every row).
    * When true the trainer runs [[globalPass]] once per round and
    * feeds its result to [[gradHessGlobal]]. */
  def needsGlobalPass: Boolean = false
  /** The per-round pre-pass: reduce whatever global state gradients
    * need into one DRIVER value. Must stay small — it ships to
    * executors inside the stage closure (which Spark torrent-broadcasts
    * per stage and cleans up with it). */
  def globalPass(
      rows: org.apache.spark.rdd.RDD[(Array[Float], Float, Float)])
      : Serializable =
    throw new UnsupportedOperationException(s"$name has no global pass")
  /** Per-row gradient consuming the [[globalPass]] result. */
  def gradHessGlobal(aux: Serializable, margin: Array[Float],
      label: Float, grad: Array[Float], hess: Array[Float]): Unit =
    gradHess(margin, label, grad, hess)
  /** xgboost UpdateTreeLeaf (adaptive trees): when Some(αs), every new
    * tree's leaves are RESET after construction to η·Q_α of the leaf's
    * (label − margin-of-its-output) residuals, α indexed by the tree's
    * output slot — reg:absoluteerror (α = 0.5) and reg:quantileerror
    * (one α per output), exactly the objectives xgboost refreshes.
    * Without the refresh, constant-hessian L1-family leaves are
    * −η·ΣG/(n+λ) ∈ [−η, η] and barely move the margin. */
  def leafRefreshAlphas: Option[Array[Double]] = None
}

object Objectives {
  @inline private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /**
   * Ordered discordant-pair enumeration shared by the ranking
   * objectives: calls `f(i, j)` for pairs with labels(i) > labels(j).
   * pairCap <= 0 enumerates ALL pairs (the exact default). With a cap,
   * each row i pairs with at most `pairCap` lower-labelled partners
   * sampled WITHOUT replacement, deterministically in (pairSeed, i) —
   * O(g·cap) total instead of O(g²), the xgboost
   * `lambdarank_num_pair_per_sample` analog (like xgboost, sampled
   * gradients are not rescaled). Partner candidates are the prefix of
   * the label-ascending order strictly below i's label, so the sample
   * space is identical on any partitioning. The prefix is built under
   * IEEE semantics to match the exact path's `labels(i) > labels(j)`
   * test: -0.0f is folded to 0.0f before sorting/keying (IEEE treats
   * them as equal; Scala's total ordering and boxed-Float identity do
   * not), and NaN-labelled rows are excluded on both sides (IEEE `>`
   * is false whenever either operand is NaN, so the exact path emits
   * no pair touching a NaN).
   */
  private def forEachDiscordantPair(labels: Array[Float], lo: Int,
      hi: Int, pairCap: Int, pairSeed: Long)(f: (Int, Int) => Unit)
      : Unit = {
    if (pairCap <= 0) {
      var i = lo
      while (i < hi) {
        var j = lo
        while (j < hi) {
          if (labels(i) > labels(j)) f(i, j)
          j += 1
        }
        i += 1
      }
      return
    }
    // fold -0.0f to 0.0f so keying agrees with IEEE ==; NaN passes
    // through (callers filter it before keying)
    @inline def ieeeKey(l: Float): Float = if (l == 0.0f) 0.0f else l
    // label-ascending, index-tiebroken candidate order (content-pinned
    // by the trainer's sortByQid row order); NaN labels excluded — the
    // exact path never pairs them in either role
    val byLabel = Array.range(lo, hi)
      .filter(j => !java.lang.Float.isNaN(labels(j)))
      .sortBy(j => (ieeeKey(labels(j)), j))
    val m = byLabel.length
    // rows with a strictly smaller label form a prefix; its length per
    // distinct label = the first occurrence index of that label
    val firstIdx = new java.util.HashMap[java.lang.Float, Integer]()
    var p = 0
    while (p < m) {
      val l = java.lang.Float.valueOf(ieeeKey(labels(byLabel(p))))
      if (!firstIdx.containsKey(l)) firstIdx.put(l, p)
      p += 1
    }
    var i = lo
    while (i < hi) {
      val cnt =
        if (java.lang.Float.isNaN(labels(i))) 0
        else firstIdx.get(java.lang.Float.valueOf(ieeeKey(labels(i))))
          .intValue()
      if (cnt > 0) {
        val take = math.min(pairCap, cnt)
        if (take == cnt) {
          var q = 0
          while (q < cnt) { f(i, byLabel(q)); q += 1 }
        } else {
          val rng = new java.util.Random(
            pairSeed ^ (0x9e3779b97f4a7c15L * (i - lo + 1)))
          if (take * 2 >= cnt) {
            // dense sample: partial Fisher-Yates on the prefix copy
            val idx = java.util.Arrays.copyOfRange(byLabel, 0, cnt)
            var q = 0
            while (q < take) {
              val r = q + rng.nextInt(cnt - q)
              val t = idx(q); idx(q) = idx(r); idx(r) = t
              f(i, idx(q))
              q += 1
            }
          } else {
            // sparse sample: rejection on a small seen-set
            val seen = new java.util.HashSet[Integer]()
            var got = 0
            while (got < take) {
              val r = rng.nextInt(cnt)
              if (seen.add(Integer.valueOf(r))) {
                f(i, byLabel(r)); got += 1
              }
            }
          }
        }
      }
      i += 1
    }
  }

  /** reg:squarederror — grad = pred - label, hess = 1. */
  final class SquaredError extends Objective {
    val name = "reg:squarederror"
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      g(0) = m(0) - y; h(0) = 1.0f
    }
  }

  /** reg:absoluteerror — grad = sign(pred - label); hess lower-bounded. */
  final class AbsoluteError extends Objective {
    val name = "reg:absoluteerror"
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      g(0) = math.signum(m(0) - y); h(0) = 1.0f // constant-hessian MAE
    }
    override def leafRefreshAlphas: Option[Array[Double]] =
      Some(Array(0.5))
  }

  /** binary:logistic — prob output; margin space is the logit. */
  final class Logistic(rawOutput: Boolean = false) extends Objective {
    val name = if (rawOutput) "binary:logitraw" else "binary:logistic"
    val numOutputs = 1
    def initMargin(b: Double): Float =
      math.log(b / (1.0 - b)).toFloat // logit(base_score); 0.5 → 0
    def transform(m: Array[Float]): Array[Float] =
      if (rawOutput) m else Array(sigmoid(m(0)).toFloat)
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val p = sigmoid(m(0))
      g(0) = (p - y).toFloat
      h(0) = math.max(p * (1.0 - p), 1e-16).toFloat
    }
  }

  /** multi:softprob / multi:softmax — K trees per round, softmax grads. */
  final class Softmax(k: Int, prob: Boolean) extends Objective {
    require(k >= 2, s"multi objective needs num_class>=2, got $k")
    val name = if (prob) "multi:softprob" else "multi:softmax"
    val numOutputs = k
    def initMargin(b: Double): Float = 0.0f
    def transform(m: Array[Float]): Array[Float] = {
      val p = softmax(m)
      if (prob) p
      else { // argmax class id
        var best = 0; var i = 1
        while (i < k) { if (p(i) > p(best)) best = i; i += 1 }
        Array(best.toFloat)
      }
    }
    private def softmax(m: Array[Float]): Array[Float] = {
      var mx = Float.NegativeInfinity
      var i = 0
      while (i < k) { if (m(i) > mx) mx = m(i); i += 1 }
      val e = new Array[Float](k); var s = 0.0
      i = 0
      while (i < k) { val v = math.exp(m(i) - mx); e(i) = v.toFloat; s += v; i += 1 }
      i = 0
      while (i < k) { e(i) = (e(i) / s).toFloat; i += 1 }
      e
    }
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val p = softmax(m)
      val yi = y.toInt
      var c = 0
      while (c < k) {
        val pc = p(c)
        g(c) = if (c == yi) (pc - 1.0).toFloat else pc
        h(c) = math.max(2.0 * pc * (1.0 - pc), 1e-16).toFloat
        c += 1
      }
    }
  }

  /**
   * count:poisson — Poisson NLL with a log link (margin is log-rate,
   * prediction exp(margin)): grad = exp(m) − y, hess = exp(m + d) with
   * d = max_delta_step (xgboost stabilizes Poisson the same way,
   * defaulting d to 0.7 when the user sets none — the inflated hessian
   * bounds the Newton step for near-empty leaves).
   */
  final class Poisson(maxDeltaStep: Double = 0.7) extends Objective {
    val name = "count:poisson"
    val numOutputs = 1
    def initMargin(b: Double): Float = math.log(b).toFloat
    def transform(m: Array[Float]): Array[Float] =
      Array(math.exp(m(0)).toFloat)
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val e = math.exp(m(0).toDouble)
      g(0) = (e - y).toFloat
      h(0) = math.exp(m(0).toDouble + maxDeltaStep).toFloat
    }
  }

  /** reg:gamma — gamma deviance with a log link: grad = 1 − y·exp(−m),
    * hess = y·exp(−m). Labels must be strictly positive. */
  final class GammaDeviance extends Objective {
    val name = "reg:gamma"
    val numOutputs = 1
    def initMargin(b: Double): Float = math.log(b).toFloat
    def transform(m: Array[Float]): Array[Float] =
      Array(math.exp(m(0)).toFloat)
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val yem = y * math.exp(-m(0).toDouble)
      g(0) = (1.0 - yem).toFloat
      h(0) = math.max(yem, 1e-16).toFloat
    }
  }

  /**
   * reg:tweedie — compound-Poisson deviance with variance power
   * ρ ∈ (1, 2) and a log link:
   *   grad = −y·e^{(1−ρ)m} + e^{(2−ρ)m}
   *   hess = −y·(1−ρ)·e^{(1−ρ)m} + (2−ρ)·e^{(2−ρ)m}
   * ρ→1 recovers Poisson, ρ→2 gamma. Useful for zero-inflated
   * non-negative targets (insurance-style counts·severity).
   */
  final class Tweedie(rho: Double = 1.5) extends Objective {
    require(rho > 1.0 && rho < 2.0,
      s"tweedie_variance_power must be in (1,2), got $rho")
    val name = "reg:tweedie"
    val numOutputs = 1
    def initMargin(b: Double): Float = math.log(b).toFloat
    def transform(m: Array[Float]): Array[Float] =
      Array(math.exp(m(0)).toFloat)
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val md = m(0).toDouble
      val a = math.exp((1.0 - rho) * md)
      val b = math.exp((2.0 - rho) * md)
      g(0) = (-y * a + b).toFloat
      h(0) = math.max(-y * (1.0 - rho) * a + (2.0 - rho) * b,
        1e-16).toFloat
    }
  }

  /** reg:pseudohubererror — smooth-Huber regression (xgboost
    * PseudoHuberError with huber_slope δ): z = pred − label,
    * grad = z/√(1+(z/δ)²), hess = 1/(1+(z/δ)²)^{3/2} — quadratic near
    * zero, linear (bounded-gradient) in the tails, so label outliers
    * cannot dominate a leaf the way squared error lets them.
    * base_score is the initial margin directly. */
  final class PseudoHuber(slope: Double = 1.0) extends Objective {
    require(slope > 0, s"huber_slope must be positive: $slope")
    val name = "reg:pseudohubererror"
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val z = (m(0) - y).toDouble
      val scale = 1.0 + (z / slope) * (z / slope)
      val root = math.sqrt(scale)
      g(0) = (z / root).toFloat
      h(0) = (1.0 / (scale * root)).toFloat
    }
  }

  /** reg:quantileerror — pinball (quantile) regression at α (xgboost
    * 2.x QuantileRegression, quantile_alpha): residual err = label −
    * pred; grad = −α when err ≥ 0 else (1−α); hess = 1 (the loss is
    * piecewise linear; xgboost likewise substitutes a unit hessian).
    * The fitted margin estimates the α-quantile of label | features.
    * base_score is the initial margin directly (xgboost's automatic
    * label-quantile base_score applies only when base_score is unset;
    * pass your own for parity with a pinned xgboost run). */
  /** Single- or MULTI-quantile pinball regression (xgboost 2.x
    * `quantile_alpha` accepts a list): one tree per α per round (the
    * one-output-per-tree multi-target strategy), each output fitting
    * its own pinball gradient and refreshing its leaves to its own
    * residual quantile. The multi form encodes its αs in the objective
    * name (`reg:quantileerror@0.1,0.5,0.9`) so save/load round-trips. */
  final class QuantileError(val alphas: Seq[Double]) extends Objective {
    def this(alpha: Double = 0.5) = this(Seq(alpha))
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      s"quantile_alpha values must be in (0,1): ${alphas.mkString(",")}")
    require(alphas.distinct.length == alphas.length,
      s"duplicate quantile_alpha values: ${alphas.mkString(",")}")
    val name =
      if (alphas.length == 1) "reg:quantileerror"
      else s"reg:quantileerror@${alphas.mkString(",")}"
    val numOutputs = alphas.length
    private val aArr = alphas.toArray
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      var c = 0
      while (c < aArr.length) {
        g(c) = if (y - m(c) >= 0f) (-aArr(c)).toFloat
          else (1.0 - aArr(c)).toFloat
        h(c) = 1.0f
        c += 1
      }
    }
    override def leafRefreshAlphas: Option[Array[Double]] = Some(aArr)
  }

  /** binary:hinge — SVM-style hinge subgradient on y ∈ {0,1} mapped to
    * s ∈ {−1,+1}: rows inside the hinge (s·m < 1) get grad = −s, unit
    * hessian; SATISFIED rows (s·m ≥ 1) get grad = 0 and an epsilon
    * hessian (xgboost uses h ≈ 0 there, not 1 — a unit hessian would
    * inflate leaf denominators with rows that carry no gradient,
    * shrinking every leaf toward 0 as the margin fit improves).
    * Predictions are hard 0/1 (margin sign), matching xgboost. The
    * base_score is used directly as the initial margin. */
  final class Hinge extends Objective {
    val name = "binary:hinge"
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] =
      Array(if (m(0) > 0f) 1f else 0f)
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = {
      val s = if (y > 0.5f) 1f else -1f
      if (s * m(0) < 1f) { g(0) = -s; h(0) = 1f }
      else { g(0) = 0f; h(0) = 1e-16f }
    }
  }

  /**
   * survival:aft — accelerated-failure-time objective over the FULL
   * xgboost distribution family (`aft_loss_distribution` = normal |
   * logistic | extreme, with `aft_loss_distribution_scale` = sigma),
   * consuming (label_lower_bound, label_upper_bound) interval labels
   * (reference: matrix.py:333-343 carries the bounds to xgb.DMatrix;
   * the loss itself is the published AFT-in-XGBoost formulation,
   * Barnwal/Cho/Hocking 2020).
   *
   * Margin is in LOG-time; predictions are exp(margin) (time domain).
   * base_score is interpreted directly in the margin (log-time) domain.
   * With z = (ln y − m)/σ and error density f:
   *  - uncensored: loss = −ln f(z); grad = (f′/f)(z)/σ, hess =
   *    −(f′/f)′(z)/σ² — normal reduces to the squared-error-on-ln(y)
   *    pair (−z/σ, 1/σ²), logistic to ((1−2s)/σ, 2s(1−s)/σ²) with
   *    s = sigmoid(z), extreme (Gumbel) to ((1−eᶻ)/σ, eᶻ/σ²).
   *  - censored: loss = −ln(F(z_u) − F(z_l)); grad = (f(z_u) −
   *    f(z_l))/(σ·d), hess = −(f′(z_u) − f′(z_l))/(σ²·d) + grad²
   *    with d = F(z_u) − F(z_l).
   * Extreme's eᶻ is evaluated with z capped at 30 so a wildly
   * mis-predicted row yields a huge-but-finite hessian, not Inf/NaN.
   */
  final class Aft(dist: String = "normal", sigma: Double = 1.0)
      extends Objective {
    require(sigma > 0, "aft sigma must be positive")
    require(dist == "normal" || dist == "logistic" || dist == "extreme",
      s"aft distribution must be normal|logistic|extreme, got '$dist'")
    val name = "survival:aft"
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] =
      Array(math.exp(m(0)).toFloat)
    override def needsBounds: Boolean = true
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = gradHessBounds(m, y, y, g, h)

    // z capped before exp so extreme's eᶻ stays finite
    @inline private def ez(z: Double): Double = math.exp(math.min(z, 30.0))

    @inline private def pdf(z: Double): Double =
      if (z.isInfinite) 0.0
      else dist match {
        case "normal" => math.exp(-0.5 * z * z) / math.sqrt(2.0 * math.Pi)
        case "logistic" => val s = 1.0 / (1.0 + math.exp(-z)); s * (1.0 - s)
        case _ => val e = ez(z); e * math.exp(-e) // extreme (Gumbel)
      }
    @inline private def cdf(z: Double): Double =
      if (z == Double.PositiveInfinity) 1.0
      else if (z == Double.NegativeInfinity) 0.0
      else dist match {
        case "normal" => 0.5 * (1.0 +
          org.apache.commons.math3.special.Erf.erf(z / math.sqrt(2.0)))
        case "logistic" => 1.0 / (1.0 + math.exp(-z))
        case _ => 1.0 - math.exp(-ez(z))
      }
    /** f′(z) (pdf derivative), 0 at ±∞ for all three families. */
    @inline private def dpdf(z: Double): Double =
      if (z.isInfinite) 0.0
      else dist match {
        case "normal" => -z * pdf(z)
        case "logistic" =>
          val s = 1.0 / (1.0 + math.exp(-z)); s * (1.0 - s) * (1.0 - 2.0 * s)
        case _ => pdf(z) * (1.0 - ez(z))
      }

    /**
     * Negative log likelihood of one row — the `aft-nloglik` eval
     * metric (xgboost's default for survival:aft). Uncensored rows use
     * the proper time-domain density −ln(f(z)/(σ·t)) (the 1/(σt)
     * Jacobian of z = (ln t − m)/σ); censored rows −ln(F(z_u) − F(z_l)).
     * Probabilities floor at 1e-12 like xgboost's kMinLogLik guard.
     */
    def nloglik(m: Float, lower: Float, upper: Float): Double = {
      val lnL = if (lower > 0 && !lower.isInfinite) math.log(lower.toDouble)
        else Double.NegativeInfinity
      val lnU = if (upper.isNaN || upper.isInfinite) Double.PositiveInfinity
        else if (upper > 0) math.log(upper.toDouble)
        else Double.NegativeInfinity
      if (lnL == lnU) {
        val z = (lnL - m) / sigma
        -math.log(math.max(pdf(z), 1e-12)) + math.log(sigma) + lnL
      } else {
        val zU = (lnU - m) / sigma
        val zL = (lnL - m) / sigma
        -math.log(math.max(cdf(zU) - cdf(zL), 1e-12))
      }
    }

    override def gradHessBounds(m: Array[Float], lower: Float,
        upper: Float, g: Array[Float], h: Array[Float]): Unit = {
      val lnL = if (lower > 0 && !lower.isInfinite) math.log(lower.toDouble)
        else Double.NegativeInfinity
      val lnU = if (upper.isNaN || upper.isInfinite) Double.PositiveInfinity
        else if (upper > 0) math.log(upper.toDouble)
        else Double.NegativeInfinity
      if (lnL == lnU) { // uncensored: −ln f(z)
        val z = (lnL - m(0)) / sigma
        dist match {
          case "normal" =>
            g(0) = (-z / sigma).toFloat
            h(0) = (1.0 / (sigma * sigma)).toFloat
          case "logistic" =>
            val s = 1.0 / (1.0 + math.exp(-z))
            g(0) = ((1.0 - 2.0 * s) / sigma).toFloat
            h(0) = math.max(2.0 * s * (1.0 - s) / (sigma * sigma),
              1e-16).toFloat
          case _ =>
            val e = ez(z)
            g(0) = ((1.0 - e) / sigma).toFloat
            h(0) = math.max(e / (sigma * sigma), 1e-16).toFloat
        }
      } else {          // censored: −ln(F(z_u) − F(z_l))
        val zU = (lnU - m(0)) / sigma
        val zL = (lnL - m(0)) / sigma
        val d = math.max(cdf(zU) - cdf(zL), 1e-15)
        val grad = (pdf(zU) - pdf(zL)) / (sigma * d)
        val hess = -(dpdf(zU) - dpdf(zL)) / (sigma * sigma * d) +
          grad * grad
        g(0) = grad.toFloat
        h(0) = math.max(hess, 1e-16).toFloat
      }
    }
  }

  /** [[CoxPh]]'s per-round risk tables: distinct event/censoring times
    * ascending, with Breslow prefix sums A(t) = Σ_{events i: t_i ≤ t}
    * w_i/S(t_i) and B(t) = Σ w_i/S(t_i)² over the weighted risk-set
    * sums S(t) = Σ_{t_j ≥ t} w_j·e^{m_j}. Driver-sized: 3 doubles per
    * DISTINCT time. */
  final case class CoxTables(times: Array[Double], a: Array[Double],
      b: Array[Double]) extends Serializable {
    /** Index of the largest time ≤ t (−1 when t precedes them all). */
    def lookup(t: Double): Int = {
      var lo = 0; var hi = times.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans
    }
  }

  /**
   * survival:cox — Cox proportional-hazards regression via the Breslow
   * partial likelihood (the remaining xgboost survival objective next
   * to [[Aft]]). Label convention is xgboost's: y > 0 is an EVENT at
   * time y; y < 0 is right-CENSORED at |y|; y == 0 is invalid. Margin
   * is the log hazard ratio; predictions are exp(margin) (the hazard
   * ratio, xgboost's cox output).
   *
   * The partial likelihood couples every row through risk-set sums
   * S(t) — a per-row gradient cannot be computed locally. Instead of
   * xgboost's single-node time-sorted scan, the distributed shape is:
   * one map-side-combined `reduceByKey` over DISTINCT times per round
   * (collecting 3 doubles per distinct time to the driver, where the
   * suffix/prefix tables are exact sequential double sums), then a
   * per-row binary-search lookup inside the normal gradient map. With
   * T distinct times the driver state is O(T) — capped at 2M (48 MB;
   * genuinely continuous time columns at larger scale should be
   * quantized, which is standard practice for Cox at scale and changes
   * only tie granularity). Per-time sums combine in partition order,
   * so tables are partitioning-stable to ulps — the same documented
   * float-order caveat as the gradient-histogram treeAggregate.
   * Gradients: with r = e^m,
   *   g = −δ + r·A(t),   h = r·A(t) − r²·B(t)  (floored at 1e-16);
   * the trainer multiplies by the ROW weight afterwards, while the
   * weights inside S/A/B enter through the pre-pass.
   */
  final class CoxPh extends Objective {
    val name = "survival:cox"
    val numOutputs = 1
    def initMargin(b: Double): Float = math.log(b).toFloat
    def transform(m: Array[Float]): Array[Float] =
      Array(math.exp(m(0)).toFloat)
    override def needsGlobalPass: Boolean = true
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit =
      throw new UnsupportedOperationException(
        "survival:cox gradients need the per-round global pass")

    /** Bounded e^m — a wildly mispredicted row must not overflow the
      * shared risk sums. */
    @inline private def expm(m: Double): Double =
      math.exp(math.min(m, 30.0))

    val MaxDistinctTimes = 2000000

    override def globalPass(
        rows: org.apache.spark.rdd.RDD[(Array[Float], Float, Float)])
        : Serializable = riskTables(rows)

    def riskTables(
        rows: org.apache.spark.rdd.RDD[(Array[Float], Float, Float)])
        : CoxTables = {
      val byTime = rows.map { case (m, y, w) =>
        require(y != 0f, "survival:cox labels must be non-zero " +
          "(y > 0 event at y; y < 0 right-censored at |y|)")
        val t = math.abs(y).toDouble
        val r = w.toDouble * expm(m(0).toDouble)
        val ev = if (y > 0) w.toDouble else 0.0
        (t, (r, ev))
      }.reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2))
        .collect()
      require(byTime.length <= MaxDistinctTimes,
        s"survival:cox saw ${byTime.length} distinct times (cap " +
          s"$MaxDistinctTimes) — quantize the time column")
      val sorted = byTime.sortBy(_._1)
      val n = sorted.length
      val times = sorted.map(_._1)
      // suffix risk sums S(t_i) = Σ_{j >= i} r_j
      val s = new Array[Double](n)
      var acc = 0.0
      var i = n - 1
      while (i >= 0) { acc += sorted(i)._2._1; s(i) = acc; i -= 1 }
      // prefix Breslow terms over event times
      val a = new Array[Double](n)
      val b = new Array[Double](n)
      var aAcc = 0.0; var bAcc = 0.0
      i = 0
      while (i < n) {
        val ev = sorted(i)._2._2
        if (ev > 0 && s(i) > 0) {
          aAcc += ev / s(i); bAcc += ev / (s(i) * s(i))
        }
        a(i) = aAcc; b(i) = bAcc
        i += 1
      }
      CoxTables(times, a, b)
    }

    override def gradHessGlobal(aux: Serializable, m: Array[Float],
        y: Float, g: Array[Float], h: Array[Float]): Unit = {
      val tab = aux.asInstanceOf[CoxTables]
      val t = math.abs(y).toDouble
      val idx = tab.lookup(t)
      val aT = if (idx >= 0) tab.a(idx) else 0.0
      val bT = if (idx >= 0) tab.b(idx) else 0.0
      val r = expm(m(0).toDouble)
      val delta = if (y > 0) 1.0 else 0.0
      g(0) = (r * aT - delta).toFloat
      h(0) = math.max(r * aT - r * r * bT, 1e-16).toFloat
    }

    /** Mean Breslow partial NLL over event weight — the `cox-nloglik`
      * eval metric: Σ_{events} w·(ln S(t_i) − m_i) / Σ_{events} w,
      * with S from the SAME weighted risk tables gradients use. */
    def nloglik(
        rows: org.apache.spark.rdd.RDD[(Array[Float], Float, Float)])
        : Double = {
      // rebuild ln S(t) per distinct time (suffix of the same sums)
      val byTime = rows.map { case (m, y, w) =>
        (math.abs(y).toDouble,
          (w.toDouble * expm(m(0).toDouble), 0.0))
      }.reduceByKey((a, b) => (a._1 + b._1, 0.0))
        .collect().sortBy(_._1)
      val n = byTime.length
      val times = byTime.map(_._1)
      val lnS = new Array[Double](n)
      var acc = 0.0
      var i = n - 1
      while (i >= 0) { acc += byTime(i)._2._1; lnS(i) = math.log(acc); i -= 1 }
      val tab = CoxTables(times, lnS, new Array[Double](n))
      val (nll, w) = rows.map { case (m, y, wt) =>
        if (y > 0) {
          val idx = tab.lookup(y.toDouble)
          ((tab.a(idx) - m(0).toDouble) * wt, wt.toDouble)
        } else (0.0, 0.0)
      }.reduce { case ((a1, b1), (a2, b2)) => (a1 + a2, b1 + b2) }
      if (w == 0) 0.0 else nll / w
    }
  }

  /**
   * rank:pairwise — LambdaRank-style pairwise logistic loss over each qid
   * group (all (winner, loser) pairs). Needs qid-contiguous partitions
   * (reference sorts by qid for exactly this reason, matrix.py:70-102).
   */
  final class PairwiseRank extends Objective {
    val name = "rank:pairwise"
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    override def needsGroups: Boolean = true
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit =
      throw new UnsupportedOperationException("rank:pairwise needs groups")
    override def groupGradients(margins: Array[Float], labels: Array[Float],
        weights: Array[Float], grad: Array[Float], hess: Array[Float],
        lo: Int, hi: Int): Unit =
      groupGradients(margins, labels, weights, grad, hess, lo, hi,
        pairCap = 0, pairSeed = 0L)

    override def groupGradients(margins: Array[Float], labels: Array[Float],
        weights: Array[Float], grad: Array[Float], hess: Array[Float],
        lo: Int, hi: Int, pairCap: Int, pairSeed: Long): Unit = {
      // per-row accumulation in DOUBLE, rounded to float ONCE at the
      // end (r16, the LambdaRank rule below): the per-pair float
      // increments are exact doubles, and in the moderate-margin
      // regime the oracles exercise (addends within a ~2^29 dynamic
      // range, totals ≪ 2^53) their double sums are exact — so a
      // row's gradient is independent of pair-iteration order AND
      // set-replayable (Σ = count·constant per (label, feature)
      // class), which the ml_rank round-2 oracle exploits. At extreme
      // margins the 1e-16 hessian floor sits > 53 bits below the
      // ~0.25-scale addends, so those sums can round and become
      // order-dependent in the last ulp; the bit-identical-cap
      // invariant is pinned on the former regime. Float accumulation
      // would round at every pair add regardless.
      val n = hi - lo
      val ga = new Array[Double](n)
      val ha = new Array[Double](n)
      forEachDiscordantPair(labels, lo, hi, pairCap, pairSeed) { (i, j) =>
        val s = sigmoid(margins(i) - margins(j)) // i ranks above j
        val w = weights(i) * weights(j)
        val gg = ((s - 1.0) * w).toFloat         // push m_i up
        val hh = math.max(s * (1.0 - s) * w, 1e-16).toFloat
        ga(i - lo) += gg; ga(j - lo) -= gg
        ha(i - lo) += hh; ha(j - lo) += hh
      }
      var x = lo
      while (x < hi) {
        grad(x) = ga(x - lo).toFloat; hess(x) = ha(x - lo).toFloat
        x += 1
      }
    }
  }

  /**
   * LambdaMART pair weighting (Burges, "From RankNet to LambdaRank to
   * LambdaMART"): the classic rank:ndcg / rank:map semantics — every
   * label-discordant pair (i, j) contributes the RankNet gradient
   * scaled by |Δmetric| for swapping i and j in the CURRENT ranking.
   * Shared machinery for the two listwise objectives below.
   *
   * Determinism: the current ranking sorts by (margin desc, position
   * asc); position is the intra-group index, which
   * [[graft.data.Sharding.sortByQid]] pins to a content-derived order,
   * so gradients are identical on any partitioning and SQL-replayable.
   * Per-row gradients accumulate in DOUBLE and round to float once,
   * so pair-iteration order cannot leak float-association noise.
   */
  sealed abstract class LambdaRank extends Objective {
    val numOutputs = 1
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    override def needsGroups: Boolean = true
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit =
      throw new UnsupportedOperationException(s"$name needs groups")

    /** |Δmetric| for swapping ranked positions pi and pj (0-based)
      * holding labels li, lj; `rank` gives the position of each group
      * row. Implementations may precompute per-group state in
      * `prepareGroup`. */
    protected def swapDelta(li: Float, lj: Float, pi: Int,
        pj: Int): Double
    /** Per-group precomputation hook; returns false to skip the group
      * (degenerate metric, e.g. IDCG = 0 → no gradient). */
    protected def prepareGroup(labels: Array[Float],
        order: Array[Int]): Boolean

    override def groupGradients(margins: Array[Float],
        labels: Array[Float], weights: Array[Float], grad: Array[Float],
        hess: Array[Float], lo: Int, hi: Int): Unit =
      groupGradients(margins, labels, weights, grad, hess, lo, hi,
        pairCap = 0, pairSeed = 0L)

    override def groupGradients(margins: Array[Float],
        labels: Array[Float], weights: Array[Float], grad: Array[Float],
        hess: Array[Float], lo: Int, hi: Int, pairCap: Int,
        pairSeed: Long): Unit = {
      val n = hi - lo
      if (n <= 1) return
      // current ranking: margin desc, position asc (deterministic)
      val order = Array.tabulate(n)(identity)
      // insertion-stable sort by margin desc
      val sorted = order.sortBy(i => (-margins(lo + i), i))
      val rankOf = new Array[Int](n)
      var p = 0
      while (p < n) { rankOf(sorted(p)) = p; p += 1 }
      val gLabels = Array.tabulate(n)(i => labels(lo + i))
      if (!prepareGroup(gLabels, sorted)) return
      val gd = new Array[Double](n)
      val hd = new Array[Double](n)
      // ONE weight per query group (xgboost's ranking-weight model —
      // a group weight, not per-pair row-weight products; the eval
      // metrics use the same first-row convention)
      val gw = weights(lo).toDouble
      forEachDiscordantPair(labels, lo, hi, pairCap, pairSeed) {
        (ai, aj) =>
          val i = ai - lo; val j = aj - lo
          val delta = swapDelta(labels(ai), labels(aj),
            rankOf(i), rankOf(j))
          if (delta > 0.0) {
            val s = sigmoid(margins(ai) - margins(aj))
            val w = gw * delta
            val gg = (s - 1.0) * w
            val hh = math.max(s * (1.0 - s) * w, 1e-16)
            gd(i) += gg; gd(j) -= gg
            hd(i) += hh; hd(j) += hh
          }
      }
      var i = 0
      while (i < n) {
        grad(lo + i) = gd(i).toFloat
        hess(lo + i) = hd(i).toFloat
        i += 1
      }
    }
  }

  /** rank:ndcg — |ΔNDCG| pair weights with the xgboost exponential
    * gain 2^label − 1 and log2 position discounts, normalized by the
    * group's IDCG. */
  final class LambdaRankNdcg extends LambdaRank {
    val name = "rank:ndcg"
    private var invIdcg: Double = 0.0
    @inline private def gain(l: Float): Double =
      math.pow(2.0, l.toDouble) - 1.0
    @inline private def disc(pos: Int): Double =
      1.0 / (math.log(pos + 2.0) / math.log(2.0))
    protected def prepareGroup(labels: Array[Float],
        order: Array[Int]): Boolean = {
      val ideal = labels.sortBy(-_)
      var idcg = 0.0
      var p = 0
      while (p < ideal.length) { idcg += gain(ideal(p)) * disc(p); p += 1 }
      invIdcg = if (idcg > 0.0) 1.0 / idcg else 0.0
      invIdcg > 0.0
    }
    protected def swapDelta(li: Float, lj: Float, pi: Int,
        pj: Int): Double =
      math.abs((gain(li) - gain(lj)) * (disc(pi) - disc(pj))) * invIdcg
  }

  /** rank:map — |ΔMAP| pair weights on binary relevance: the exact
    * average-precision change from swapping a relevant row at rank pi
    * with an irrelevant one at rank pj, computed from the ranked
    * relevance prefix sums. Non-binary labels are rejected (xgboost's
    * map metric contract). */
  final class LambdaRankMap extends LambdaRank {
    val name = "rank:map"
    private var nRel: Int = 0
    private var relPrefix: Array[Int] = Array.empty // rels in ranks [0, p)
    private var relAt: Array[Boolean] = Array.empty
    private var invSum: Array[Double] = Array.empty // Σ 1/(q+1), rel q < p
    protected def prepareGroup(labels: Array[Float],
        order: Array[Int]): Boolean = {
      require(labels.forall(l => l == 0f || l == 1f),
        "rank:map needs binary relevance labels (0/1)")
      val n = order.length
      relAt = new Array[Boolean](n)
      relPrefix = new Array[Int](n + 1)
      invSum = new Array[Double](n + 1)
      var p = 0
      while (p < n) {
        relAt(p) = labels(order(p)) > 0.5f
        relPrefix(p + 1) = relPrefix(p) + (if (relAt(p)) 1 else 0)
        invSum(p + 1) = invSum(p) + (if (relAt(p)) 1.0 / (p + 1.0) else 0.0)
        p += 1
      }
      nRel = relPrefix(n)
      nRel > 0
    }
    /** AP term at a relevant rank p is r(p)/(p+1) with r(p) = rels in
      * [0, p]. Swapping the relevance bits at ranks a < b (one side
      * relevant, the other not — guaranteed for a label-discordant
      * pair) changes: the endpoint terms, and each relevant rank
      * strictly inside (a, b) by ∓1/(p+1) — the interior total is an
      * O(1) prefix-sum lookup. */
    protected def swapDelta(li: Float, lj: Float, pi: Int,
        pj: Int): Double = {
      val (a, b) = if (pi < pj) (pi, pj) else (pj, pi)
      var delta = 0.0
      val interior = invSum(b) - invSum(a + 1)
      if (relAt(a) && !relAt(b)) {
        // relevant falls from a to b: its own term shifts, every
        // interior relevant loses one prefix rel
        delta -= (relPrefix(a) + 1.0) / (a + 1.0)
        delta += relPrefix(b).toDouble / (b + 1.0)
        delta -= interior
      } else if (!relAt(a) && relAt(b)) {
        // relevant rises from b to a: mirror image
        delta += (relPrefix(a) + 1.0) / (a + 1.0)
        delta -= (relPrefix(b) + 1.0) / (b + 1.0)
        delta += interior
      }
      math.abs(delta) / nRel
    }
  }

  /**
   * Inference-side stand-in for a user-supplied custom objective (E6):
   * margins pass through untransformed — the same contract as xgboost,
   * where predictions under a custom `obj` are raw margins. Lets a model
   * trained with `TrainParams.customObjective` be saved, re-loaded and
   * predicted without shipping the user's closure.
   */
  final class RawIdentity(val name: String, k: Int) extends Objective {
    val numOutputs: Int = math.max(k, 1)
    def initMargin(b: Double): Float = b.toFloat
    def transform(m: Array[Float]): Array[Float] = m
    def gradHess(m: Array[Float], y: Float, g: Array[Float],
        h: Array[Float]): Unit = throw new UnsupportedOperationException(
      s"$name: custom objective closure not available (inference-only)")
  }

  /** Effective objective for a parameter set: the custom hook wins
    * (reference sklearn.py:511-515 `obj=` passthrough). */
  def resolve(p: TrainParams): Objective =
    p.customObjective.getOrElse(p.objective match {
      case "survival:aft" => new Aft(p.aftDistribution, p.aftSigma)
      case "survival:cox" => new CoxPh
      case "count:poisson" =>
        // xgboost forces max_delta_step to 0.7 for Poisson when unset
        new Poisson(if (p.maxDeltaStep > 0) p.maxDeltaStep else 0.7)
      case "reg:tweedie" => new Tweedie(p.tweedieVariancePower)
      case "reg:pseudohubererror" => new PseudoHuber(p.huberSlope)
      case "reg:quantileerror" =>
        if (p.quantileAlphas.nonEmpty) new QuantileError(p.quantileAlphas)
        else new QuantileError(p.quantileAlpha)
      case other => forName(other, p.numClass)
    })

  def forName(name: String, numClass: Int): Objective = name match {
    case "reg:squarederror" | "reg:linear" => new SquaredError
    case "reg:absoluteerror" => new AbsoluteError
    case "binary:logistic" => new Logistic()
    case "binary:logitraw" => new Logistic(rawOutput = true)
    case "multi:softprob" => new Softmax(numClass, prob = true)
    case "multi:softmax" => new Softmax(numClass, prob = false)
    case "rank:pairwise" => new PairwiseRank
    case "rank:ndcg" => new LambdaRankNdcg
    case "rank:map" => new LambdaRankMap
    case "survival:aft" => new Aft()
    case "survival:cox" => new CoxPh
    case "count:poisson" => new Poisson()
    case "reg:gamma" => new GammaDeviance
    case "reg:tweedie" => new Tweedie() // transform is ρ-free (exp)
    case "binary:hinge" => new Hinge
    case "reg:pseudohubererror" => new PseudoHuber()
    case "reg:quantileerror" => new QuantileError()
    // multi-quantile models carry their αs in the name (save/load)
    case q if q.startsWith("reg:quantileerror@") =>
      new QuantileError(q.stripPrefix("reg:quantileerror@")
        .split(',').map(_.toDouble).toSeq)
    case c if c.startsWith("custom:") => new RawIdentity(c, numClass)
    case other => throw new IllegalArgumentException(
      s"unknown objective '$other'")
  }
}
