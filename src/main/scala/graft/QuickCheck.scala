package graft
import org.apache.spark.sql.SparkSession
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").count()
      println(s"QC $q rows=$n")
    }
    spark.stop()
  }
}
