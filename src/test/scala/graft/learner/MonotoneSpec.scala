package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.learner.RegTree
import graft.data.DMatrixSpec
import org.apache.spark.sql.functions._

/**
 * Monotone-constraint semantics (xgboost `monotone_constraints`, part
 * of the params the reference forwards; reference conformance surface:
 * xgboost_ray/tests/test_sklearn.py:957 test_constraint_parameters).
 */
class MonotoneSpec extends SparkTestBase {
  import spark.implicits._

  // noisy signal, increasing overall but with a strong local dip — an
  // unconstrained tree WILL fit the dip (asserted below)
  private def dippedDf = {
    val rng = new scala.util.Random(5)
    (0 until 4000).map { _ =>
      val x = rng.nextDouble() * 10
      val dip = if (x > 4 && x < 6) -3.0 else 0.0
      (x, x + dip + rng.nextGaussian() * 0.1)
    }.toDF("x", "y")
  }

  private def gridPreds(df: org.apache.spark.sql.DataFrame,
      constraints: Seq[Int]): Array[Double] = {
    val res = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 20,
        maxDepth = 4, seed = 2, monotoneConstraints = constraints))
    val grid = (0 until 200).map(i => (i * 0.05, 0.0)).toDF("x", "y")
    GraftBoost.predict(res.model, grid, DMatrixSpec("y"))
      .orderBy("x").select("prediction").collect().map(_.getDouble(0))
  }

  test("+1 constraint makes predictions non-decreasing where the " +
      "unconstrained model dips") {
    val df = dippedDf
    val un = gridPreds(df, Nil)
    val dips = un.sliding(2).count(p => p(1) < p(0) - 1e-9)
    assert(dips > 0, "fixture too easy: unconstrained model is already" +
      " monotone, the constraint assertion below would prove nothing")
    val con = gridPreds(df, Seq(1))
    con.sliding(2).foreach { p =>
      assert(p(1) >= p(0) - 1e-9, s"decrease: ${p(0)} -> ${p(1)}")
    }
  }

  test("-1 constraint mirrors: non-increasing predictions") {
    val df = dippedDf.select(col("x"), (-col("y")).as("y"))
    val con = gridPreds(df, Seq(-1))
    con.sliding(2).foreach { p =>
      assert(p(1) <= p(0) + 1e-9, s"increase: ${p(0)} -> ${p(1)}")
    }
  }

  test("interaction constraints: no root-to-leaf path mixes features " +
      "from different groups") {
    // y = x0·x1 NEEDS the interaction; groups {0},{1} forbid it
    val rng = new scala.util.Random(13)
    val df = (0 until 3000).map { _ =>
      val x0 = rng.nextDouble() * 2 - 1
      val x1 = rng.nextDouble() * 2 - 1
      (x0, x1, x0 * x1)
    }.toDF("x0", "x1", "y")
    val res = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 8,
        maxDepth = 4, seed = 4,
        interactionConstraints = Seq(Seq(0), Seq(1))))
    // structural proof: walk every tree, collect path feature sets
    def paths(t: RegTree, i: Int, acc: Set[Int]): Seq[Set[Int]] =
      if (t.feature(i) < 0) Seq(acc)
      else {
        val a2 = acc + t.feature(i)
        paths(t, t.left(i), a2) ++ paths(t, t.right(i), a2)
      }
    res.model.trees.foreach { t =>
      paths(t, 0, Set.empty).foreach { pf =>
        assert(!(pf.contains(0) && pf.contains(1)),
          s"path uses both constrained features: $pf")
      }
    }
    // the unconstrained control DOES mix them (fixture is meaningful)
    val un = GraftBoost.train(df, DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 8,
        maxDepth = 4, seed = 4))
    val mixed = un.model.trees.exists(t =>
      paths(t, 0, Set.empty).exists(pf => pf.contains(0) && pf.contains(1)))
    assert(mixed, "unconstrained model never mixed features — fixture " +
      "proves nothing")
  }

  test("scale_pos_weight shifts predictions toward the rare positive " +
      "class; 1.0 leaves the model unchanged") {
    // 5% positives
    val rng = new scala.util.Random(21)
    val df = (0 until 4000).map { _ =>
      val x = rng.nextDouble()
      val y = if (rng.nextDouble() < (if (x > 0.5) 0.09 else 0.01)) 1.0
        else 0.0
      (x, y)
    }.toDF("x", "label")
    def meanPred(spw: Double): Double = {
      val res = GraftBoost.train(df, DMatrixSpec("label"),
        TrainParams(objective = "binary:logistic", numRounds = 10,
          maxDepth = 3, seed = 6, scalePosWeight = spw))
      GraftBoost.predict(res.model, df, DMatrixSpec("label"))
        .agg(avg("prediction")).head.getDouble(0)
    }
    val base = meanPred(1.0)
    val weighted = meanPred(10.0)
    assert(weighted > base * 2,
      s"spw=10 mean pred $weighted vs base $base — no shift")
    // golden: spw=1.0 must take the un-gated code path bit-identically
    assert(meanPred(1.0) === base)
  }

  test("max_delta_step caps leaf magnitudes; 0 leaves the model " +
      "unchanged") {
    val df = dippedDf.limit(1000)
    def leaves(mds: Double): Array[Float] = {
      val res = GraftBoost.train(df, DMatrixSpec("y"),
        TrainParams(objective = "reg:squarederror", numRounds = 3,
          maxDepth = 3, seed = 8, maxDeltaStep = mds))
      res.model.trees.flatMap(t =>
        t.value.indices.collect { case i if t.feature(i) == -1 =>
          t.value(i) })
    }
    val capped = leaves(0.5)
    // cap applies to the raw weight; stored value is eta * capped
    val bound = 0.3 * 0.5 + 1e-6
    assert(capped.forall(v => math.abs(v) <= bound),
      s"max |leaf| = ${capped.map(math.abs).max}")
    val un = leaves(0.0)
    assert(un.exists(v => math.abs(v) > bound),
      "fixture never exceeds the cap — test proves nothing")
  }

  test("empty constraints leave the learned model unchanged " +
      "(default-path golden)") {
    val df = dippedDf.limit(800)
    val p0 = TrainParams(objective = "reg:squarederror", numRounds = 5,
      maxDepth = 3, seed = 9)
    val a = GraftBoost.train(df, DMatrixSpec("y"), p0).model
    val b = GraftBoost.train(df, DMatrixSpec("y"),
      p0.copy(monotoneConstraints = Seq(0))).model
    val ga = GraftBoost.predict(a, df, DMatrixSpec("y"))
      .agg(sum("prediction")).head.getDouble(0)
    val gb = GraftBoost.predict(b, df, DMatrixSpec("y"))
      .agg(sum("prediction")).head.getDouble(0)
    assert(ga === gb)
  }
}
