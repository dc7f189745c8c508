package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Ad-hoc stage profiler for the dedup pipelines (dev tool, not part of
  * the driver contract): times each sub-stage in isolation.
  */
object Profile {
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
    time("normalize")(d.select(TextFunctions.normalizeText($"text")).count())
    time("words+explode")(d.select(explode(TextFunctions.words($"text"))).count())
    time("shingles+explode")(
      d.select(explode(TextFunctions.shingles($"text", 5))).count())
    val sh = Dedup.docShingles(d, "text", "doc_id", 5)
    time("docShingles distinct")(sh.count())
    val shP = sh.persist()
    time("persist materialize")(shP.count())
    time("sizes agg")(shP.groupBy($"id").count().count())
    time("self-join pairs")(
      shP.as("a").join(shP.as("b"), col("a.sh") === col("b.sh") &&
        col("a.id") < col("b.id")).count())
    time("minhash 9 aggs")(
      Dedup.minhashSignatures(d, "text", "doc_id", 5, 3, 3).count())
    time("full ngram pairs")(
      Dedup.ngramJaccardPairs(d, "text", "doc_id", 5, 0.6).count())
    shP.unpersist()
    spark.stop()
  }
}
