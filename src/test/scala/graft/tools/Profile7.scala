package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage profiler for the prefix-filtered ngramJaccardPairs (dev tool):
  * times each sub-stage of the round-4 rewrite in isolation.
  * Run: Test/runMain graft.tools.Profile7 [sfDir]
  */
object Profile7 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val d = graft.SparkEntry.dupCorpusForProfiling(spark, dir)
    time("warmup corpus count")(d.count())
    val sh0 = Dedup.docShingles(d, "text", "doc_id", 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docShingles persist")(sh0.count())
    val dfreq = sh0.groupBy(col("sh")).agg(count(lit(1)).as("dfreq"))
    time("dfreq agg")(dfreq.count())
    val sizes = sh0.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    time("sizes agg")(sizes.count())
    val rankW = Window.partitionBy(col("id")).orderBy(col("dfreq"), col("sh"))
    val tauN = 599L
    val prefix = sh0.join(dfreq, "sh")
      .withColumn("pos", row_number().over(rankW))
      .join(sizes, "id")
      .filter(col("pos") <= col("sz") - expr(s"($tauN * sz + 999) div 1000") + 1)
      .select(col("id"), col("sh"), col("sz"))
      .persist()
    time("prefix build")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
          col("a.sz") <= col("b.sz") / 0.6 &&
          col("b.sz") <= col("a.sz") / 0.6)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct().persist()
    time("cand self-join+distinct")(cand.count())
    val arrs = sh0.groupBy(col("id"))
      .agg(sort_array(collect_list(col("sh"))).as("toks")).persist()
    time("arrs collect_list")(arrs.count())
    time("verify joins+intersect")(
      cand.join(arrs.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
        .join(arrs.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .filter(col("inter") > 0).count())
    time("full pipeline end2end")(
      Dedup.ngramJaccardPairs(d, "text", "doc_id", 5, 0.6).count())
    time("full pipeline again")(
      Dedup.ngramJaccardPairs(d, "text", "doc_id", 5, 0.6).count())
    spark.stop()
  }
}
