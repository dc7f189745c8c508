package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions
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
      val d = graft.table(spark, dir, "documents")
      d.select(col("doc_id"), col("text"))
    }
    time("warm sf0.001")(Dedup.minhashJaccardEstimates(dup("/root/testdata/sf0.001"), "text", "doc_id", 5, 3, 3).count())
    for (i <- 1 to 3)
      time(s"sf0.1 full #$i")(Dedup.minhashJaccardEstimates(dup("/root/testdata/sf0.1"), "text", "doc_id", 5, 3, 3).count())
    // staged breakdown of the round-6 BASELINE pipeline shape
    // (distinct+persist raw hashes, grouped-min signatures, banded
    // double-join) — kept for comparison against the shipped in-row
    // collect_set/array_min/array_intersect plan timed above; these
    // stage timings do NOT decompose the current plan
    val df = dup("/root/testdata/sf0.1")
    val mod = 1L << 48
    for (i <- 1 to 2) {
      val raw = df.select(col("doc_id").as("id"),
        explode(TextFunctions.shingles(col("text"), 5)).as("sh"))
      time(s"  raw-explode-only #$i")(raw.count())
      val hashed = raw.select(col("id"),
        conv(substring(md5(col("sh").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("hb"))
      time(s"  +md5/conv #$i")(hashed.count())
      val sh = hashed.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"  +distinct+persist #$i")(sh.count())
      val sig = sh.groupBy(col("id"))
        .agg(min((col("hb") * lit(1L)) % lit(mod)).as("mh0"),
          (1 until 9).map(s => min((col("hb") * lit(2L * s + 1)) % lit(mod)).as(s"mh$s")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"  sig-from-cache #$i")(sig.count())
      val banded = sig.select(col("id"), explode(array((0 until 3).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", (0 until 3).map(r => col(s"mh${b * 3 + r}")): _*)
            .cast("binary")).as("bh"))
      }: _*)).as("bd"))
        .select(col("id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      time(s"  banded+cand #$i")(cand.count())
      val agree = (0 until 9).map(j =>
        when(col(s"a.mh$j") === col(s"b.mh$j"), 1L).otherwise(0L)).reduce(_ + _)
      val withAgree = cand
        .join(sig.as("a"), col("id_a") === col("a.id"))
        .join(sig.as("b"), col("id_b") === col("b.id"))
        .select(col("id_a"), col("id_b"), agree.as("n_agree"))
      time(s"  withAgree #$i")(withAgree.count())
      val inter = withAgree.select(col("id_a"), col("id_b"))
        .join(sh.select(col("id").as("id_a"), col("hb")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("hb")), Seq("id_b", "hb"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ic"))
      time(s"  inter #$i")(inter.count())
      sig.unpersist(); sh.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
