package graft.examples

import graft.api.GraftBoost
import graft.data.{DMatrixSpec, DataLoader}
import graft.learner.TrainParams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/**
 * HIGGS quickstart — analog of the reference's `examples/higgs.py`:
 * load `HIGGS.csv.gz` (UCI #280: no header, label first, 28 float
 * features), train `binary:logistic` with logloss+error eval history,
 * time the run, save the model. The reference names the columns
 * `label, feature-01..feature-28` and feeds the csv.gz path straight
 * to its matrix (higgs.py:43-60); here the same path goes through
 * [[DataLoader.load]] (extension-sniffed gzipped CSV scan) and
 * [[GraftBoost.train]].
 *
 * This container has no network, so when the file is absent a
 * deterministic HIGGS-SHAPED file is synthesized first (same schema,
 * gzipped, headerless) — point the first arg at a real download of
 * the UCI file to run the genuine benchmark.
 *
 *   sbt "runMain graft.examples.Higgs"                 # synth 100k rows
 *   sbt "runMain graft.examples.Higgs /data/HIGGS.csv.gz 100"
 */
object Higgs {
  /** higgs.py:43 — "label" + feature-01..feature-28. */
  val ColNames: Seq[String] =
    "label" +: (1 to 28).map(i => f"feature-$i%02d")

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-higgs/HIGGS.csv.gz")
    val rounds = args.lift(1).map(_.toInt).getOrElse(20)
    val synthRows = args.lift(2).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-higgs")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(path).exists()) {
      println(s"HIGGS dataset not found — synthesizing $synthRows " +
        s"HIGGS-shaped rows to $path")
      synthesize(path, synthRows)
    } else println("HIGGS dataset found locally.")

    // explicit schema = the reference's `names=colnames` (no header
    // row in the UCI file); the gz codec is handled by the scan
    val schema = StructType(ColNames.map(StructField(_, DoubleType)))
    val df = DataLoader.load(spark, Seq(path), schema = Some(schema),
      csvHeader = false)

    val start = System.nanoTime()
    val res = GraftBoost.train(df, DMatrixSpec("label"),
      TrainParams(objective = "binary:logistic", numRounds = rounds,
        maxDepth = 6, eta = 0.3,
        evalMetric = Seq("logloss", "error"), seed = 7),
      evals = Seq(("train", df)), numWorkers = 8)
    val taken = (System.nanoTime() - start) / 1e9
    println(f"TRAIN TIME TAKEN: $taken%.2f seconds")

    val out = new java.io.File(path).toPath.resolveSibling("higgs.json")
    res.model.saveXgbJson(out.toString)
    val err = res.evalsResult("train")("error")
    println(f"Final training error: ${err.last}%.4f " +
      f"(round 1: ${err.head}%.4f) — model saved to $out")
    spark.stop()
  }

  /** Deterministic HIGGS-shaped csv.gz: 28 gaussian features, label
    * from a noisy nonlinear rule (so trees have real signal to find).
    * Driver-side by design — it stands in for the reference's
    * `urllib.urlretrieve` download, not for a pipeline operator. */
  private def synthesize(path: String, rows: Int): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val rng = new scala.util.Random(280) // UCI dataset number
    val w = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(
        new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(f)), "UTF-8"), 1 << 20))
    try {
      var i = 0
      while (i < rows) {
        val x = Array.fill(28)(rng.nextGaussian())
        val sig = 1.2 * x(0) - 0.8 * x(1) + 0.9 * x(2) * x(3) +
          0.5 * math.abs(x(4)) - 0.3 + 0.8 * rng.nextGaussian()
        val label = if (sig > 0) 1.0 else 0.0
        val sb = new StringBuilder(512)
        sb.append(label)
        var j = 0
        while (j < 28) { sb.append(','); sb.append(x(j).toFloat); j += 1 }
        w.println(sb.result())
        i += 1
      }
    } finally w.close()
  }
}
