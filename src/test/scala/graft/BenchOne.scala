package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("benchone").getOrCreate()
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val names = args.toSeq
    for (n <- names; i <- 1 to 3) {
      // the Bench sweep discipline: drop dead cached datasets and
      // localCheckpoint blocks between runs so iterations time the
      // query, not block-manager churn from the previous one
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"$n iter$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
