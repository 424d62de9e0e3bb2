package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for optimization work; not wired into
  * any harness. */
object Probe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // mirror Profiler.correlations' aggregate
    val qCols = cols.map(c => {
      val d = col(c).cast("double")
      when(isnan(d), lit(null))
        .otherwise(floor(d * 1048576.0 + 0.5).cast("long"))
        .cast("decimal(19,0)").as(s"__q_$c")
    })
    val qdf = df.select(qCols: _*)
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (i, j)
    val aggExprs = pairs.zipWithIndex.flatMap { case ((i, j), p) =>
      val a = col(s"__q_${cols(i)}")
      val b = col(s"__q_${cols(j)}")
      val both = a.isNotNull && b.isNotNull
      Seq(count(when(both, 1)).as(s"n_$p"),
        sum(when(both, a)).as(s"sa_$p"),
        sum(when(both, b)).as(s"sb_$p"),
        sum(when(both, a * b)).as(s"sab_$p"),
        sum(when(both, a * a)).as(s"saa_$p"),
        sum(when(both, b * b)).as(s"sbb_$p"))
    }
    val agg = qdf.agg(aggExprs.head, aggExprs.tail: _*)
    println(agg.queryExecution.executedPlan.toString.take(2000))
    (1 to 3).foreach { i => t(s"corr agg $i") { agg.head() } }
    // long-based variant for comparison (NOT exact at scale, probe only)
    val lCols = cols.map(c => {
      val d = col(c).cast("double")
      when(isnan(d), lit(null))
        .otherwise(floor(d * 1048576.0 + 0.5).cast("long")).as(s"__q_$c")
    })
    val ldf = df.select(lCols: _*)
    val aggL = pairs.zipWithIndex.flatMap { case ((i, j), p) =>
      val a = col(s"__q_${cols(i)}")
      val b = col(s"__q_${cols(j)}")
      val both = a.isNotNull && b.isNotNull
      Seq(count(when(both, 1)).as(s"n_$p"),
        sum(when(both, a)).as(s"sa_$p"),
        sum(when(both, b)).as(s"sb_$p"),
        sum(when(both, (a * b).cast("decimal(38,0)"))).as(s"sab_$p"),
        sum(when(both, (a * a).cast("decimal(38,0)"))).as(s"saa_$p"),
        sum(when(both, (b * b).cast("decimal(38,0)"))).as(s"sbb_$p"))
    }
    val agg2 = ldf.agg(aggL.head, aggL.tail: _*)
    (1 to 3).foreach { i => t(s"corr agg long-in $i") { agg2.head() } }
    spark.stop()
  }
}
