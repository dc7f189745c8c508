package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Stage profiler for the curation flagship + count/collect queries
  * (dev tool, not part of the driver contract).
  */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val d = graft.table(spark, dir, "documents").select($"doc_id", $"text")
    time("warmup count")(d.count())
    time("quality alone")(d.select(TextFunctions.qualityScore($"text")).count())
    time("langId alone")(d.select(TextFunctions.langId($"text")).count())
    time("quality+langId+filter")(
      d.withColumn("quality", TextFunctions.qualityScore($"text"))
        .withColumn("lang", TextFunctions.langId($"text"))
        .filter($"quality" >= 0.3 && $"lang" === "en").count())
    val w = Window.partitionBy(TextFunctions.fingerprint($"text"))
      .orderBy($"doc_id")
    time("fingerprint window")(
      d.withColumn("__rn", row_number().over(w)).filter($"__rn" === 1).count())
    time("q_curate_corpus x2")(
      { graft.SparkEntry.queries("q_curate_corpus")(spark, dir).count()
        graft.SparkEntry.queries("q_curate_corpus")(spark, dir).count() })
    time("q_curate_neardup")(
      graft.SparkEntry.queries("q_curate_neardup")(spark, dir).count())
    time("q_count_verify")(
      graft.SparkEntry.queries("q_count_verify")(spark, dir).count())
    time("q_count_verify again")(
      graft.SparkEntry.queries("q_count_verify")(spark, dir).count())
    time("q_collect_agg")(
      graft.SparkEntry.queries("q_collect_agg")(spark, dir).count())
    time("q_dedup_exact")(
      graft.SparkEntry.queries("q_dedup_exact")(spark, dir).count())
    time("q_dedup_ngram")(
      graft.SparkEntry.queries("q_dedup_ngram")(spark, dir).count())
    spark.stop()
  }
}
