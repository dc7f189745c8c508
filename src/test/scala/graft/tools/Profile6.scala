package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q_winnow_pairs (round 3). */
object Profile6 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $label"); r
    }
    import graft.plans.TextNativeFunctions
    import graft.functions.TextFunctions
    val corpus = graft.SparkEntry.dupCorpusForProfiling(spark, dir)
    val fps = corpus.select($"doc_id".as("id"),
      explode(TextNativeFunctions.winnowFingerprints(
        TextFunctions.normalizeText($"text"), 8, 5)).as("fp"))
    time("warm fp extraction")(println(fps.count()))
    time("fp extraction")(println(fps.count()))
    val dfc = fps.groupBy($"fp").agg(count(lit(1)).as("df"))
      .filter($"df" <= 20)
    time("df agg")(println(dfc.count()))
    val rare = fps.join(dfc, "fp")
    time("rare join")(println(rare.count()))
    val sizes = rare.groupBy($"id").agg(count(lit(1)).as("sz"))
    time("sizes agg")(println(sizes.count()))
    val joinable = rare.filter($"df" >= 2).select($"id", $"fp")
    val pairs = joinable.as("a").join(joinable.as("b"),
        $"a.fp" === $"b.fp" && $"a.id" < $"b.id")
      .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    time("pair join+agg")(println(pairs.count()))
    time("full operator")(println(graft.operators.Dedup.winnowPairs(
      corpus, "text", "doc_id", 8, 5, 1, 2, 20L).count()))
    time("full operator again")(println(graft.operators.Dedup.winnowPairs(
      corpus, "text", "doc_id", 8, 5, 1, 2, 20L).count()))
    spark.stop()
  }
}
