package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * Exact-TreeSHAP conformance: the polynomial walk must reproduce the
 * brute-force Shapley values of the tree's conditional-expectation
 * game (the definition xgboost's default `pred_contribs=True`
 * computes — reference forwards the kwarg at main.py:1750-1806).
 */
class ShapSpec extends SparkTestBase {
  import spark.implicits._

  /** Cover-weighted conditional expectation E[f(x) | x_S] — the game
    * TreeSHAP plays: features in S follow x, others average by cover. */
  private def condExp(t: RegTree, x: Array[Float], s: Set[Int]): Double = {
    def rec(i: Int): Double =
      if (t.feature(i) < 0) t.value(i).toDouble
      else if (s.contains(t.feature(i))) {
        val v = x(t.feature(i))
        val go = if (v.isNaN) {
          if (t.defaultLeft(i)) t.left(i) else t.right(i)
        } else if (v <= t.threshold(i)) t.left(i) else t.right(i)
        rec(go)
      } else (t.cover(t.left(i)) * rec(t.left(i)) +
        t.cover(t.right(i)) * rec(t.right(i))) / t.cover(i)
    rec(0)
  }

  /** Brute-force Shapley value per feature (2^F subset enumeration). */
  private def bruteShap(t: RegTree, x: Array[Float], nf: Int)
      : Array[Double] = {
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val all = (0 until nf).toSet
    Array.tabulate(nf) { i =>
      val others = (all - i).subsets().toSeq
      others.map { s =>
        val w = fact(s.size) * fact(nf - s.size - 1) / fact(nf)
        w * (condExp(t, x, s + i) - condExp(t, x, s))
      }.sum
    }
  }

  /** Hand-built tree: flat arrays + uniform cover bookkeeping. */
  private def tree(feature: Array[Int], threshold: Array[Float],
      left: Array[Int], right: Array[Int], value: Array[Float],
      cover: Array[Float]): RegTree =
    new RegTree(feature, feature.map(_ => 0), threshold,
      feature.map(_ => false), left, right, value,
      feature.map(_ => 0f), cover)

  // XOR over two binary features: the canonical interaction-bearing
  // tree where Saabas and SHAP disagree
  private val xorTree = tree(
    feature = Array(0, 1, 1, -1, -1, -1, -1),
    threshold = Array(0.5f, 0.5f, 0.5f, 0f, 0f, 0f, 0f),
    left = Array(1, 3, 5, -1, -1, -1, -1),
    right = Array(2, 4, 6, -1, -1, -1, -1),
    value = Array(0.5f, 0.5f, 0.5f, 0f, 1f, 1f, 0f),
    cover = Array(4f, 2f, 2f, 1f, 1f, 1f, 1f))

  test("shapWalk matches brute-force Shapley on the XOR tree and " +
      "diverges from Saabas there") {
    for ((a, b) <- Seq((0f, 0f), (0f, 1f), (1f, 0f), (1f, 1f))) {
      val x = Array(a, b)
      val phi = new Array[Double](2)
      val exp = xorTree.shapWalk(x, phi)
      assert(math.abs(exp - 0.5) < 1e-12) // E[f] = 0.5 by symmetry
      val brute = bruteShap(xorTree, x, 2)
      for (f <- 0 until 2)
        assert(math.abs(phi(f) - brute(f)) < 1e-12,
          s"x=($a,$b) f=$f shap=${phi(f)} brute=${brute(f)}")
      // local accuracy: Σφ + E == f(x) exactly (double rounding only)
      assert(math.abs(phi.sum + exp - xorTree.predictRaw(x)) < 1e-12)
      // XOR splits credit evenly between the two features…
      assert(math.abs(phi(0) - phi(1)) < 1e-12)
      // …while Saabas puts ALL of it on the second split (x1)
      val saabas = new Array[Double](2)
      xorTree.contribWalk(x, saabas)
      assert(math.abs(saabas(0)) < 1e-12 && math.abs(saabas(1)) === 0.5,
        s"Saabas on XOR should be (0, ±0.5), got ${saabas.toSeq}")
      assert(math.abs(phi(1) - saabas(1)) > 0.2,
        "SHAP must diverge from Saabas on an interaction-bearing tree")
    }
  }

  test("shapWalk handles a feature repeated on one path (UNWIND)") {
    // f0 at the root AND again inside the left child; uneven covers
    val t = tree(
      feature = Array(0, 0, 1, -1, -1, -1, -1),
      threshold = Array(4f, 2f, 1f, 0f, 0f, 0f, 0f),
      left = Array(1, 3, 5, -1, -1, -1, -1),
      right = Array(2, 4, 6, -1, -1, -1, -1),
      value = Array(0f, 0f, 0f, -3f, 7f, 2f, 11f),
      cover = Array(10f, 6f, 4f, 5f, 1f, 3f, 1f))
    for (x <- Seq(Array(1f, 0f), Array(3f, 2f), Array(5f, 0f),
        Array(5f, 2f), Array(Float.NaN, 2f))) {
      val phi = new Array[Double](2)
      val exp = t.shapWalk(x, phi)
      val brute = bruteShap(t, x, 2)
      for (f <- 0 until 2)
        assert(math.abs(phi(f) - brute(f)) < 1e-10,
          s"x=${x.toSeq} f=$f shap=${phi(f)} brute=${brute(f)}")
      assert(math.abs(phi.sum + exp - t.predictRaw(x)) < 1e-10)
    }
  }

  test("shapWalk matches brute-force Shapley on TRAINED trees " +
      "(randomized rows, NaN included)") {
    val rng = new scala.util.Random(53)
    val rows = (1 to 400).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      val c = rng.nextDouble()
      (a, b, c, 3 * a + 2 * a * b - c)
    }
    val df = rows.toDF("a", "b", "c", "y").repartition(3)
    val m = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 3,
        maxDepth = 4, seed = 11)).model
    assert(m.trees.forall(_.hasStats))
    val probes = (1 to 12).map(_ => Array(
      rng.nextFloat(), rng.nextFloat(), rng.nextFloat())) :+
      Array(Float.NaN, 0.5f, 0.5f)
    for (t <- m.trees; x <- probes) {
      val phi = new Array[Double](3)
      val exp = t.shapWalk(x, phi)
      val brute = bruteShap(t, x, 3)
      for (f <- 0 until 3)
        assert(math.abs(phi(f) - brute(f)) < 1e-9,
          s"f=$f shap=${phi(f)} brute=${brute(f)}")
      assert(math.abs(phi.sum + exp - t.predictRaw(x)) < 1e-9)
    }
  }

  test("GraftModel.shapContribs: class blocks sum exactly to margins " +
      "(multi-class local accuracy)") {
    val rng = new scala.util.Random(17)
    val rows = (1 to 300).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, if (a > 0.6) 2.0 else if (b > 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("a", "b", "y").repartition(2)
    val m = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "multi:softprob", numClass = 3,
        numRounds = 3, maxDepth = 3, seed = 5)).model
    val w = m.numFeatures + 1
    for (_ <- 1 to 20) {
      val x = Array(rng.nextFloat(), rng.nextFloat())
      val phi = m.shapContribs(x)
      val margins = m.margins(x)
      for (c <- 0 until 3) {
        val blockSum = (0 until w).map(i => phi(c * w + i).toDouble).sum
        assert(math.abs(blockSum - margins(c)) < 1e-4,
          s"class $c block sum $blockSum vs margin ${margins(c)}")
      }
    }
  }

  test("predictContrib defaults to exact SHAP and runs under " +
      "codegen-only mode; approxContribs=true selects Saabas") {
    val rng = new scala.util.Random(29)
    val rows = (1 to 200).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 2 * a * b + a) // interaction term forces divergence
    }
    val df = rows.toDF("a", "b", "y").repartition(2)
    val m = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 4,
        maxDepth = 4, seed = 3)).model
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val shap = GraftBoost.predictContrib(m, df, DMatrixSpec("y"))
        .select("a", "b", "contribs").collect()
      val saabas = GraftBoost.predictContrib(m, df, DMatrixSpec("y"),
        approxContribs = true)
        .select("a", "b", "contribs").collect()
      var diverged = false
      shap.zip(saabas).foreach { case (rs, ra) =>
        val cs = rs.getSeq[Float](2); val ca = ra.getSeq[Float](2)
        // both satisfy the sum contract…
        assert(math.abs(cs.map(_.toDouble).sum -
          ca.map(_.toDouble).sum) < 1e-4)
        // …and the DataFrame path reproduces the direct model call
        val x = Array(rs.getDouble(0).toFloat, rs.getDouble(1).toFloat)
        val direct = m.shapContribs(x)
        cs.indices.foreach(i => assert(cs(i) === direct(i)))
        if (math.abs(cs(0) - ca(0)) > 1e-3) diverged = true
      }
      assert(diverged,
        "SHAP and Saabas must differ on an interaction-bearing model")
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("predictContrib/predictInteractions honor a per-row base " +
      "margin: bias slot carries it and blocks still close to the " +
      "margin predict reports") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 150).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 2 * a * b + a, rng.nextDouble().toFloat)
    }
    val df = rows.toDF("a", "b", "y", "bm").repartition(2)
    val spec = DMatrixSpec(labelCol = Seq("y"),
      baseMarginCol = Some("bm"), ignore = Seq("bm"))
    val m = GraftBoost.train(df.drop("bm"), DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 3,
        maxDepth = 3, seed = 5)).model
    val joined = GraftBoost.predictContrib(m, df, spec)
      .join(GraftBoost.predict(m, df, spec, outputMargin = true)
        .withColumnRenamed("prediction", "margin")
        .select("a", "b", "margin"), Seq("a", "b"))
      .select("a", "b", "contribs", "margin", "bm").collect()
    joined.foreach { r =>
      val c = r.getSeq[Float](2)
      assert(math.abs(c.map(_.toDouble).sum - r.getDouble(3)) < 1e-3,
        s"contribs ${c.mkString(",")} must sum to margin ${r.getDouble(3)}")
      // the bias slot moved by exactly bm − initMargin vs the plain walk
      val x = Array(r.getDouble(0).toFloat, r.getDouble(1).toFloat)
      val expected = m.shapContribs(x).last +
        (r.getFloat(4) - m.initMargin)
      assert(math.abs(c.last - expected) < 1e-5)
    }
    val inter = GraftBoost.predictInteractions(m, df, spec)
      .join(GraftBoost.predict(m, df, spec, outputMargin = true)
        .withColumnRenamed("prediction", "margin")
        .select("a", "b", "margin"), Seq("a", "b"))
      .select("interactions", "margin").collect()
    inter.foreach { r =>
      val v = r.getSeq[Float](0)
      assert(math.abs(v.map(_.toDouble).sum - r.getDouble(1)) < 1e-3,
        "interaction total must equal the base-margin-adjusted margin")
    }
  }

  test("shapInteractions: XOR splits its effect onto the off-diagonal " +
      "(closed form), Saabas puts it on one main effect") {
    val m = new GraftModel(Array(xorTree), "reg:squarederror", 0, 0.5,
      255, 2)
    val w = 3
    for ((a, b) <- Seq((0f, 0f), (0f, 1f), (1f, 0f), (1f, 1f))) {
      val x = Array(a, b)
      val v = m.shapInteractions(x).map(_.toDouble)
      val fx = xorTree.predictRaw(x)
      // closed form: Φ(0,1) = (f − E)/2 with zero main effects
      val expOff = (fx - 0.5) / 2.0
      assert(math.abs(v(0 * w + 1) - expOff) < 1e-6,
        s"x=($a,$b) off-diag ${v(0 * w + 1)} vs $expOff")
      assert(math.abs(v(0 * w + 0)) < 1e-6, "main effect must vanish")
      assert(math.abs(v(1 * w + 1)) < 1e-6)
      // symmetry + row sums reproduce the exact SHAP contribs
      val contribs = m.shapContribs(x)
      for (i <- 0 until w) {
        assert(math.abs(v(i * w + 1) - v(1 * w + i)) < 1e-9)
        val rowSum = (0 until w).map(j => v(i * w + j)).sum
        assert(math.abs(rowSum - contribs(i)) < 1e-5,
          s"row $i sum $rowSum vs contrib ${contribs(i)}")
      }
      // and the Saabas variant disagrees on the MAIN-EFFECT cells (on
      // symmetric XOR its off-diagonals coincide with the Shapley
      // interaction index, but its row sums are the Saabas contribs,
      // so the diagonals carry spurious ±0.25 main effects where the
      // exact decomposition has zero)
      val sa = m.interactions(x).map(_.toDouble)
      if (a == 1f && b == 1f)
        assert(math.abs(sa(0 * w + 0) - v(0 * w + 0)) > 0.1,
          s"Saabas diag ${sa(0 * w + 0)} should diverge from exact " +
            s"${v(0 * w + 0)} on x=(1,1)")
    }
  }

  test("shapInteractions matches the brute-force Shapley interaction " +
      "index on trained trees") {
    val rng = new scala.util.Random(67)
    val rows = (1 to 400).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      val c = rng.nextDouble()
      (a, b, c, 4 * a * b - 2 * b * c + a)
    }
    val df = rows.toDF("a", "b", "c", "y").repartition(3)
    val m = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 2,
        maxDepth = 4, seed = 19)).model
    val nf = 3; val w = nf + 1
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    // Shapley interaction index over the ensemble's game (sum of the
    // per-tree conditional-expectation games)
    def vGame(x: Array[Float], s: Set[Int]): Double =
      m.trees.map(t => condExp(t, x, s)).sum
    for (_ <- 1 to 6) {
      val x = Array(rng.nextFloat(), rng.nextFloat(), rng.nextFloat())
      val got = m.shapInteractions(x).map(_.toDouble)
      for (i <- 0 until nf; j <- (i + 1) until nf) {
        val rest = ((0 until nf).toSet - i) - j
        val brute = rest.subsets().toSeq.map { s =>
          val wt = fact(s.size) * fact(nf - s.size - 2) /
            (2.0 * fact(nf - 1))
          wt * (vGame(x, s + i + j) - vGame(x, s + i) -
            vGame(x, s + j) + vGame(x, s))
        }.sum
        assert(math.abs(got(i * w + j) - brute) < 1e-6,
          s"($i,$j): got ${got(i * w + j)} brute $brute")
      }
      // row sums == exact SHAP contribs; total == margin
      val contribs = m.shapContribs(x)
      var total = 0.0
      for (i <- 0 until w) {
        val rowSum = (0 until w).map(j => got(i * w + j)).sum
        total += rowSum
        assert(math.abs(rowSum - contribs(i)) < 1e-4)
      }
      assert(math.abs(total - m.margins(x)(0)) < 1e-3)
    }
  }

  test("predictInteractions defaults to exact SHAP under codegen and " +
      "keeps Saabas behind approxInteractions=true") {
    val rng = new scala.util.Random(83)
    val rows = (1 to 200).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a * b)
    }
    val df = rows.toDF("a", "b", "y").repartition(2)
    val m = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 3,
        maxDepth = 3, seed = 7)).model
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val shap = GraftBoost.predictInteractions(m, df, DMatrixSpec("y"))
        .select("a", "b", "interactions").collect()
      var diverged = false
      shap.foreach { r =>
        val v = r.getSeq[Float](2)
        assert(v.size === 9)
        val x = Array(r.getDouble(0).toFloat, r.getDouble(1).toFloat)
        val direct = m.shapInteractions(x)
        v.indices.foreach(i => assert(v(i) === direct(i)))
        if (math.abs(v(1) - m.interactions(x)(1)) > 1e-4) diverged = true
      }
      assert(diverged,
        "exact SHAP interactions must differ from Saabas on an " +
          "interaction-bearing model")
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("shapWalk without cover stats fails fast with guidance") {
    val bare = new RegTree(Array(0, -1, -1), Array(0, 0, 0),
      Array(1f, 0f, 0f), Array(false, false, false),
      Array(1, -1, -1), Array(2, -1, -1), Array(0f, 1f, 2f))
    val e = intercept[IllegalStateException] {
      bare.shapWalk(Array(0.5f), new Array[Double](1))
    }
    assert(e.getMessage.contains("cover"))
  }
}
