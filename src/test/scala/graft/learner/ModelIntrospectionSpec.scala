package graft.learner

import graft.SparkTestBase
import graft.api.GraftBoost
import graft.data.DMatrixSpec

/**
 * `GraftModel.treesToDataFrame` — the xgboost `trees_to_dataframe`
 * introspection surface (stock users inspect split structure / gain /
 * cover through it; the reference hands back the stock booster,
 * main.py:1747). Conventions under test follow xgboost: leaves carry
 * their value in the `gain` column with feature="Leaf"; `yes`/`no`/
 * `missing` are "tree-node" id strings; one-hot categorical nodes put
 * the code in `category` and null in `split`.
 */
class ModelIntrospectionSpec extends SparkTestBase {
  import spark.implicits._

  private def regDf(n: Int = 2000, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (a, b, 3 * a - 2 * b + 0.3 * rng.nextGaussian())
    }.toDF("a", "b", "y")
  }

  test("featureImportancesNamed keys by training column names (r11), " +
      "f0..fN when unnamed, and matches the positional vector") {
    val m = GraftBoost.train(regDf(), DMatrixSpec("y"),
      TrainParams(numRounds = 3, maxDepth = 3, seed = 11)).model
    val named = m.featureImportancesNamed("gain")
    val pos = m.featureImportances("gain")
    assert(named.keySet === Set("a", "b"))
    assert(named("a") === pos(0) && named("b") === pos(1))
    val bare = m.withFeatureNames(Nil).featureImportancesNamed()
    assert(bare.keySet === Set("f0", "f1"))
  }

  test("node table is complete and structurally consistent: one row " +
      "per node, child/missing ids resolve, leaf rows carry values") {
    val m = GraftBoost.train(regDf().repartition(4), DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 3,
        maxDepth = 3, seed = 11)).model
    val df = m.treesToDataFrame(spark)
    val rows = df.collect()
    assert(rows.length === m.trees.map(_.numNodes).sum)
    val byId = rows.map(r => r.getString(2) -> r).toMap
    rows.foreach { r =>
      val leaf = r.getString(3) == "Leaf"
      if (leaf) {
        assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) &&
          r.isNullAt(7), "leaves have no split/children/missing")
        val t = m.trees(r.getInt(0))
        assert(r.getDouble(8) === t.value(r.getInt(1)).toDouble,
          "leaf value rides the gain column (xgboost convention)")
      } else {
        assert(byId.contains(r.getString(5)) &&
          byId.contains(r.getString(6)), "yes/no ids must resolve")
        assert(r.getString(7) === r.getString(5) ||
          r.getString(7) === r.getString(6),
          "missing goes to one of the two children")
        assert(!r.isNullAt(8) && r.getDouble(8) > 0.0,
          "split rows carry positive gain")
      }
      assert(!r.isNullAt(9) && r.getDouble(9) > 0.0, "cover > 0")
    }
    // cover conservation: each split's cover equals its children's sum
    rows.filter(_.getString(3) != "Leaf").foreach { r =>
      val c = byId(r.getString(5)).getDouble(9) +
        byId(r.getString(6)).getDouble(9)
      assert(math.abs(r.getDouble(9) - c) <= 1e-3 * c,
        "hessian routed through a split equals its children's (float)")
    }
  }

  test("feature names: stored training names print by default (r11), " +
      "explicit names override, unnamed models fall back to f<idx>, " +
      "wrong arity fails fast") {
    val m = GraftBoost.train(regDf(), DMatrixSpec("y"),
      TrainParams(objective = "reg:squarederror", numRounds = 1,
        maxDepth = 2, seed = 3)).model
    val stored = m.treesToDataFrame(spark).select("feature")
      .as[String].collect().toSet
    assert(stored.subsetOf(Set("a", "b", "Leaf")))
    val named = m.treesToDataFrame(spark, Seq("alpha", "beta"))
      .select("feature").as[String].collect().toSet
    assert(named.subsetOf(Set("alpha", "beta", "Leaf")))
    val bare = m.withFeatureNames(Nil).treesToDataFrame(spark)
      .select("feature").as[String].collect().toSet
    assert(bare.subsetOf(Set("f0", "f1", "Leaf")))
    intercept[IllegalArgumentException] {
      m.treesToDataFrame(spark, Seq("only_one"))
    }
  }

  test("one-hot categorical splits surface the category code in " +
      "`category` with a null `split`") {
    val rng = new scala.util.Random(5)
    val df = (1 to 1500).map { _ =>
      val c = rng.nextInt(3).toDouble
      val x = rng.nextDouble()
      (c, x, (if (c == 1.0) 50.0 else 0.0) + x)
    }.toDF("cat", "x", "y")
    val m = GraftBoost.train(df, DMatrixSpec(labelCol = Seq("y"),
      categoricalCols = Seq("cat")),
      TrainParams(objective = "reg:squarederror", numRounds = 1,
        maxDepth = 1, seed = 1)).model
    val root = m.treesToDataFrame(spark).where(col("node") === 0)
      .collect().head
    assert(root.getString(3) === "cat",
      "stored training column name prints for the categorical split")
    assert(root.isNullAt(4), "categorical split has no numeric split")
    assert(root.getString(10) === "1",
      "the planted +50 offset makes code 1 the one-hot partition")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
