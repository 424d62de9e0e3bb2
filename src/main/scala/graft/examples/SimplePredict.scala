package graft.examples

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.{GraftModel, TrainParams}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Inference-only quickstart — analog of the reference's
 * `examples/simple_predict.py`: load an EXISTING model artifact
 * (there, `xgb.Booster(model_file="simple.xgb")`; here, an
 * xgboost-JSON file via [[GraftModel.loadXgbJson]] — the same format
 * stock xgboost writes), run the distributed predict, and assert it
 * matches single-node scoring exactly (the reference's
 * `assert_array_equal(pred_xgb, pred_ray)`).
 *
 *   sbt "runMain graft.examples.SimplePredict /root/testdata/sf0.001"
 */
object SimplePredict {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val modelPath =
      args.lift(1).getOrElse("/tmp/graft-simple/simple.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-simple-predict")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
          .as("label"))
    val spec = DMatrixSpec("label")

    // the reference insists simple.py ran first; offline we
    // bootstrap the artifact once so the example is self-contained
    if (!new java.io.File(modelPath).exists()) {
      println(s"Model file not found — training once to $modelPath")
      Option(new java.io.File(modelPath).getParentFile)
        .foreach(_.mkdirs())
      GraftBoost.train(df, spec,
        TrainParams(objective = "binary:logistic", numRounds = 10,
          maxDepth = 4, seed = 3), numWorkers = 4)
        .model.saveXgbJson(modelPath)
    } else println("Model file found locally.")

    val bst = GraftModel.loadXgbJson(modelPath)
    val pred = GraftBoost.predict(bst, df, spec)

    // distributed predict == single-node scoring, bit-for-bit: score a
    // sample of rows on the driver through the same model and compare
    val sample = pred.limit(500).select("l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "prediction").collect()
    var checked = 0
    sample.foreach { r =>
      val x = Array(r.getDouble(0).toFloat, r.getDouble(1).toFloat,
        r.getDouble(2).toFloat, r.getDouble(3).toFloat)
      val local = bst.predict(x)(0).toDouble
      require(local == r.getDouble(4),
        s"distributed ${r.getDouble(4)} != local $local on row $checked")
      checked += 1
    }
    println(s"OK: $checked sampled predictions equal single-node " +
      "scoring bit-for-bit")
    pred.select(avg("prediction").as("mean_prediction")).show()
    spark.stop()
  }
}
