package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ad-hoc perceptron-stage profiler (dev tool): where do q_perceptron's
  * ~4.5s at sf0.1 actually go — feats build, round jobs, or output?
  */
object Profile8 {
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

    val docs = graft.table(spark, dir, "documents")
      .withColumn("is_en", $"lang" === "en")
    time("warmup count")(docs.count())
    val nBuckets = 64
    val featsPlan = docs.select(col("doc_id").as("doc_id"),
        when(col("is_en"), 1L).otherwise(-1L).as("y"),
        explode(TextFunctions.words(col("text"))).as("term"))
      .withColumn("b",
        conv(substring(md5(col("term")), 7, 2), 16, 10).cast("long")
          % nBuckets)
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("tf"))
    time("feats build (no persist)")(featsPlan.count())
    val feats = featsPlan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("feats persist")(feats.count())
    val wDf = broadcast(Seq((-999L, 0L)).toDF("b", "w"))
    val mis = feats.join(wDf, Seq("b"), "left")
      .groupBy(col("doc_id"), col("y"))
      .agg((coalesce(sum(col("tf") * coalesce(col("w"), lit(0L))),
        lit(0L)) + 0L).as("m"))
      .filter(col("y") * col("m") <= 0)
      .select(col("doc_id"), col("y"))
    time("margins+filter alone")(mis.count())
    val d3 = feats.join(mis.select("doc_id"), "doc_id")
        .select(col("b"), (col("y") * col("tf")).as("v"))
      .unionAll(mis.select(lit(-1L).as("b"), col("y").as("v")))
      .unionAll(mis.select(lit(-2L).as("b"), lit(1L).as("v")))
      .groupBy(col("b")).agg(sum(col("v")).as("d"))
    time("3-branch round job")(d3.collect().length.toLong)
    time("3-branch round job x2")(d3.collect().length.toLong)
    println(d3.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("ReusedExchange") ||
        l.contains("Scan") || l.contains("Join"))
      .mkString("\n"))
    time("full perceptronTrain")(graft.operators.Corpus.perceptronTrain(
      docs, "doc_id", "is_en", "text", TextFunctions.words).count())
    feats.unpersist()
    spark.stop()
  }
}
