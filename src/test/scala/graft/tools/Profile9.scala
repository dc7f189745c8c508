package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
object Profile9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p9] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    def dup(dir: String) = {
      import org.apache.spark.sql.functions._
      val d = graft.table(spark, dir, "documents")
      // approximate SparkEntry.dupCorpus: reuse documents as-is
      d.select(col("doc_id"), col("text"))
    }
    time("warm sf0.001")(Dedup.minhashJaccardEstimates(dup("/root/testdata/sf0.001"), "text", "doc_id", 5, 3, 3).count())
    for (i <- 1 to 3)
      time(s"sf0.1 #$i")(Dedup.minhashJaccardEstimates(dup("/root/testdata/sf0.1"), "text", "doc_id", 5, 3, 3).count())
    spark.stop()
  }
}
