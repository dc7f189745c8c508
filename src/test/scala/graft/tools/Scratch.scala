package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc runner for new gate queries during development. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_cluster", "q_decontaminate", "q_stratified_sample",
        "q_weighted_mix", "q_cohort_retention", "q_funnel",
        "q_quantile_bucket", "q_corr_stats")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"===== $n  (${(System.nanoTime() - t0) / 1e9}s)")
      df.show(8, truncate = false)
      println(s"rows=${df.count()}")
    }
    spark.stop()
  }
}
