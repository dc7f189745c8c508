package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the string-similarity joins (dev tool). */
object Profile4 {
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
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val p = graft.table(spark, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_name")
    val a = p.toDF("key_a", "brand", "name_a")
    val b = p.toDF("key_b", "brand", "name_b")
    time("warmup")(p.count())
    val joined = a.join(b, Seq("brand")).filter($"key_a" < $"key_b")
    time("join only (pair count)")(joined.count())
    time("join + length band")(
      joined.filter(abs(length($"name_a") - length($"name_b")) <= 2).count())
    time("join + jw + filter")(
      joined.withColumn("jw",
        round(graft.plans.StringSimFunctions.jaroWinkler($"name_a", $"name_b"), 4))
        .filter($"jw" >= 0.88).count())
    time("join + jw + filter (2nd)")(
      joined.withColumn("jw",
        round(graft.plans.StringSimFunctions.jaroWinkler($"name_a", $"name_b"), 4))
        .filter($"jw" >= 0.88).count())
    time("join + band + lev3 + filter")(
      joined.filter(abs(length($"name_a") - length($"name_b")) <= 2)
        .withColumn("dist", levenshtein($"name_a", $"name_b", 2).cast("long"))
        .filter($"dist" >= 0).count())
    for (i <- 1 to 2)
      time(s"jw_gte(0.8799) #$i")(
        joined.withColumn("jw",
          round(graft.plans.StringSimFunctions.jaroWinklerGte(
            $"name_a", $"name_b", 0.8799), 4))
          .filter($"jw" >= 0.88).count())
    for (i <- 1 to 2)
      time(s"native banded lev #$i")(
        joined.filter(abs(length($"name_a") - length($"name_b")) <= 2)
          .withColumn("dist", graft.plans.StringSimFunctions
            .bandedLevenshtein($"name_a", $"name_b", 2))
          .filter($"dist" >= 0).count())
    spark.stop()
  }
}
