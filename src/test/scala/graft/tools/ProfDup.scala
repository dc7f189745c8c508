package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times duplicateSpans sub-stages at sf0.1 (the q_dup_spans plan). */
object ProfDup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft._
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val corpus = SparkEntry.dupCorpusForProfiling(spark, dir)
    import spark.implicits._
    val gs = plans.TextNativeFunctions.wordShingles(
      functions.TextFunctions.words($"text"), 5)
    val grams = corpus.select($"doc_id".as("id"), gs.as("gs"))
      .select($"id", posexplode($"gs").as(Seq("pos", "g")))
    time("gram explode count")(grams.count())
    val dup = grams.groupBy($"g").agg(count(lit(1)).as("n")).filter($"n" >= 2)
    time("dup gram count")(dup.count())
    time("full operator")(operators.Corpus.duplicateSpans(corpus, "text",
      "doc_id", functions.TextFunctions.words, 5).count())
    time("full operator 2nd")(operators.Corpus.duplicateSpans(corpus, "text",
      "doc_id", functions.TextFunctions.words, 5).count())
    spark.stop()
  }
}
