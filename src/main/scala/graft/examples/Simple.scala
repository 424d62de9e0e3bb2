package graft.examples

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.TrainParams
import org.apache.spark.sql.SparkSession

/**
 * End-to-end smoke example — analog of the reference's
 * examples/simple.py: load a table, train a classifier, predict, print
 * eval history. Runs on the driver-provided sf0.001 testdata.
 *
 *   sbt "runMain graft.examples.Simple"
 */
object Simple {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-simple")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // binary target: "was this order line returned?" from numeric cols
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linenumber").cast("double").as("l_linenumber"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"))

    val spec = DMatrixSpec("label")
    val res = GraftBoost.train(df, spec,
      TrainParams(objective = "binary:logistic", numRounds = 20,
        maxDepth = 5, seed = 1),
      evals = Seq(("train", df)), numWorkers = 4)

    println(s"rows=${res.totalN} rounds=${res.roundsCompleted}")
    res.evalsResult.foreach { case (name, ms) =>
      ms.foreach { case (m, hist) =>
        println(s"$name-$m: first=${hist.head} last=${hist.last}")
      }
    }
    val pred = GraftBoost.predict(res.model, df, spec)
    pred.select(avg(when((col("prediction") > 0.5) === (col("label") === 1.0),
      1.0).otherwise(0.0)).as("accuracy")).show()
    spark.stop()
  }
}
