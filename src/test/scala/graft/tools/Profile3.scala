package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Graph}

/** Sub-stage profiler for q_dedup_cluster (dev tool). */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    def dupCorpus = {
      import spark.implicits._
      graft.SparkEntry.queries  // force init
      graft.table(spark, dir, "documents").select($"doc_id", $"text")
    }
    time("warmup")(dupCorpus.count())
    val q = graft.SparkEntry.queries("q_dedup_cluster")
    time("q_dedup_cluster full")(q(spark, dir).count())
    time("q_dedup_cluster again")(q(spark, dir).count())
    // stages
    val pairs = Dedup.ngramJaccardPairs(
      graft.SparkEntry.dupCorpusForProfiling(spark, dir), "text", "doc_id", 5, 0.6)
    time("pairs alone")(pairs.count())
    time("cc on cached pairs") {
      val p = pairs.persist()
      p.count()
      val n = Graph.connectedComponents(p, "id_a", "id_b").count()
      p.unpersist(); n
    }
    spark.stop()
  }
}
