package graft.examples

import graft.api.GraftBoost
import graft.data.DMatrixSpec
import graft.learner.TrainParams
import graft.ml.GraftGridSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Hyperparameter search quickstart — analog of the reference's
 * `examples/simple_tune.py`: sample a Tune-style search space (`eta`
 * loguniform 1e-4..1e-1, `subsample` uniform 0.5..1.0, `max_depth`
 * randint 1..9, simple_tune.py:45-47), train each candidate with a
 * held-out eval set, rank on eval error, then save and re-score the
 * best model (simple_tune.py:66-77's load-best-checkpoint step).
 *
 * The reference's breast-cancer table isn't shipped offline; the
 * driver testdata's lineitem plays its role (binary target: was the
 * line returned). The 75/25 split is a deterministic hash split
 * (CorpusPipeline.assignSplit's convention) so the search replays
 * bit-for-bit.
 *
 * Because every sampled candidate shares the binning inputs, the
 * search trains against ONE materialized [[GraftBoost.BinnedMatrix]]
 * under the hood (r13): prepare→bin→pack runs once for the whole
 * sweep, not once per trial — the RayDMatrix load-once-per-actor
 * semantics (reference matrix.py:703-716).
 *
 *   sbt "runMain graft.examples.SimpleTune /root/testdata/sf0.001 8"
 */
object SimpleTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val numSamples = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-simple-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
          .as("label"),
        // deterministic 75/25 split: same row -> same side, always
        (pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(4)) === 0)
          .as("is_val"))
    val train = df.where(!col("is_val")).drop("is_val")
    val valDf = df.where(col("is_val")).drop("is_val")
    val spec = DMatrixSpec("label")

    val base = TrainParams(objective = "binary:logistic",
      numRounds = 10, seed = 17,
      evalMetric = Seq("logloss", "error"))
    val grid = GraftGridSearch.sample(base, numSamples, seed = 17,
      etaLogUniform = Some((1e-4, 1e-1)),
      subsampleUniform = Some((0.5, 1.0)),
      maxDepthRandInt = Some((1, 9)))

    val result = GraftGridSearch.fit(train, spec, grid, valDf,
      numWorkers = 8)
    result.trials.sortBy(_.score).foreach { t =>
      println(f"eta=${t.params.eta}%.5f subsample=${t.params.subsample}%.3f " +
        f"maxDepth=${t.params.maxDepth} -> val ${t.metric}=${t.score}%.4f")
    }
    println(f"Best validation ${result.bestTrial.metric}: " +
      f"${result.bestScore}%.4f (eta=${result.bestParams.eta}%.5f, " +
      f"subsample=${result.bestParams.subsample}%.3f, " +
      f"maxDepth=${result.bestParams.maxDepth})")

    // save + reload the winner, then score it once more on the
    // holdout — the analog of loading the best trial's checkpoint
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tuned").toString
    result.bestResult.model.save(spark, dir)
    val loaded = graft.learner.GraftModel.load(spark, dir)
    val acc = GraftBoost.predict(loaded, valDf, spec)
      .select(avg(when((col("prediction") > 0.5) === (col("label") === 1.0),
        1.0).otherwise(0.0)).as("acc")).head().getDouble(0)
    println(f"Reloaded best model holdout accuracy: $acc%.4f")
    spark.stop()
  }
}
