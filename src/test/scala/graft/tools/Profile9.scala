package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object Profile9 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p9] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    import spark.implicits._
    val warm = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("is_en", $"lang" === "en")
    time("warm sf0.001 train")(graft.operators.Corpus.perceptronTrain(
      warm, "doc_id", "is_en", "text", TextFunctions.words).count())
    val docs = graft.table(spark, dir, "documents")
      .withColumn("is_en", $"lang" === "en")
    for (i <- 1 to 3)
      time(s"sf0.1 train #$i")(graft.operators.Corpus.perceptronTrain(
        docs, "doc_id", "is_en", "text", TextFunctions.words).count())
    spark.stop()
  }
}
