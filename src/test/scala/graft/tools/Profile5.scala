package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q_assortativity (round 3). */
object Profile5 {
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
    val li = graft.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    val a = li.toDF("ok", "pa"); val b = li.toDF("ok", "pb")
    val pairs = a.join(b, Seq("ok")).filter($"pa" < $"pb").select($"pa", $"pb")
    time("pairs raw count")(println(pairs.count()))
    val und = pairs.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("distinct+persist")(println(und.count()))
    val deg = und.select(explode(array($"pa", $"pb")).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("deg"))
    time("deg agg")(println(deg.count()))
    val ep = und
      .join(deg.select($"p".as("pa"), $"deg".as("da")), "pa")
      .join(deg.select($"p".as("pb"), $"deg".as("db")), "pb")
      .agg(count(lit(1)), sum($"da" * $"db"))
    time("edge-deg joins + agg")(ep.collect())
    time("full operator")(
      graft.operators.Graph.degreeAssortativity(pairs, "pa", "pb").collect())
    // variant: broadcast-hinted degree joins
    val epB = und
      .join(broadcast(deg.select($"p".as("pa"), $"deg".as("da"))), "pa")
      .join(broadcast(deg.select($"p".as("pb"), $"deg".as("db"))), "pb")
      .agg(count(lit(1)), sum($"da" * $"db"))
    time("edge-deg joins broadcast")(epB.collect())
    // variant: order-local pair expansion, no self-join
    val pairs2 = li.groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"l_partkey")).as("ps"))
      .select(explode(flatten(transform($"ps", (x, i) =>
        transform(slice($"ps", i + 2, size($"ps")), y =>
          struct(x.as("pa"), y.as("pb")))))).as("e"))
      .select($"e.pa", $"e.pb")
    time("order-local pair expansion raw")(println(pairs2.count()))
    val und2 = pairs2.distinct()
    time("order-local + distinct")(println(und2.count()))
    time("full operator on order-local pairs")(
      graft.operators.Graph.degreeAssortativity(pairs2, "pa", "pb").collect())
    spark.stop()
  }
}
