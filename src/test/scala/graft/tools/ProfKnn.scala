package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for q_knn_eval (r9 VERDICT #1 root-cause): the
  * 2000-vector sf0.1 corpus gives 4M pairs — kernel work is sub-second,
  * so any multi-second reading is stage overhead. Times each plan
  * prefix separately, twice (JIT-warm second reading is the signal).
  */
object ProfKnn {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.table(spark, dir, "embeddings")
    def t(name: String)(f: => Unit): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    import graft.operators.Similarity
    t("full knnClassifyEval") {
      Similarity.knnClassifyEval(e, "vec_id", "label", "embedding", 5).count()
    }
    // stage prefixes replicated from the operator (same exprs)
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * 10000 + 0.5).cast("double"))
    val q = e.filter(pmod(col("vec_id").cast("long"), lit(1L)) === 0)
      .select(col("vec_id").cast("long").as("qid"),
        col("label").cast("long").as("qlab"), quant(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").cast("long").as("cid"),
      quant(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("packed", -(Similarity.sqDist(col("qv"), col("cv")) *
        math.pow(2, 20) + col("cid").cast("double")))
    t("pair join + count") { scored.count() }
    val top = scored.groupBy(col("qid"), col("qlab"))
      .agg(graft.plans.TopKBy.topkBy(col("packed"), col("cid"), 5).as("top"))
    t("pair join + topk agg") { top.count() }
    val ex = top.select(col("qid"), col("qlab"), explode(col("top")).as("t"))
      .select(col("qid"), col("qlab"), col("t.id").as("nid"))
    val lab = e.select(col("vec_id").cast("long").as("nid"),
      col("label").cast("long").as("nlab"))
    val votes = ex.join(broadcast(lab), "nid")
      .groupBy(col("qid"), col("qlab"), col("nlab"))
      .agg(count(lit(1)).as("cnt"))
    t("packed forced (sum over 4M pairs)") {
      scored.agg(sum(col("packed"))).collect()
    }
    t("sqdist only forced") {
      c.join(broadcast(q), col("qid") =!= col("cid"))
        .agg(sum(Similarity.sqDist(col("qv"), col("cv")))).collect()
    }
    t("+ explode only") { ex.count() }
    t("+ votes") { votes.count() }
    val noBc = ex.join(lab, "nid")
      .groupBy(col("qid"), col("qlab"), col("nlab"))
      .agg(count(lit(1)).as("cnt"))
    t("+ votes (no broadcast hint)") { noBc.count() }
    println("[prof] votes plan:")
    votes.explain("formatted")
    spark.stop()
  }
}
