package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 rehearsal data: 10× key-offset replication of sf0.1 into
  * /tmp/graft_sf1 (SURVEY §7 scale rehearsal; VERDICT r4 #3).
  *
  * NOT a gate input — the driver's sf dirs stay the only correctness
  * inputs. This exists so the bench tail can be timed at 10× the bench
  * sf and any super-linear operator caught before it matters at 100 TB.
  *
  * Replication design: replica i offsets every join key by i·K where K
  * is the table's key range rounded up to a multiple of 27720
  * (= lcm 1..11), so `key % m` patterns for every small modulus — the
  * gate corpus planting rules (doc_id % 10 / % 7), samplers, query-side
  * mods — hold identically in every replica. Dimension tables
  * (region/nation) are shared, so FK fan-in grows 10× like a real
  * scale-up. Document text is word-permuted per replica (deterministic
  * md5 order, word multiset preserved) so replicas are NOT near-dups of
  * each other: shingle/minhash/setsim workloads grow linearly like a
  * real corpus, not quadratically like a copy-paste corpus.
  */
object ScaleUp {
  private val Lcm = 27720L

  private def off(maxKey: Long): Long = (maxKey / Lcm + 1) * Lcm

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }
    def maxOf(df: DataFrame, c: String): Long =
      off(df.agg(max(col(c))).head.getLong(0))

    // shared dims: copy through unchanged
    write(read("region"), "region")
    write(read("nation"), "nation")

    val customer = read("customer")
    val orders = read("orders")
    val part = read("part")
    val supplier = read("supplier")
    val lineitem = read("lineitem")
    val events = read("events")
    val documents = read("documents")
    val embeddings = read("embeddings")
    val (cK, oK, pK, sK) = (maxOf(customer, "c_custkey"),
      maxOf(orders, "o_orderkey"), maxOf(part, "p_partkey"),
      maxOf(supplier, "s_suppkey"))
    val (eK, uK) = (maxOf(events, "event_id"), maxOf(events, "user_id"))
    val dK = maxOf(documents, "doc_id")
    val vK = maxOf(embeddings, "vec_id")

    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => f(df, i)).reduce(_ unionByName _)

    write(rep(customer)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + i * cK)), "customer")
    write(rep(supplier)((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + i * sK)), "supplier")
    write(rep(part)((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + i * pK)), "part")
    write(rep(orders)((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + i * oK)
      .withColumn("o_custkey", col("o_custkey") + i * cK)), "orders")
    write(rep(lineitem)((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + i * oK)
      .withColumn("l_partkey", col("l_partkey") + i * pK)
      .withColumn("l_suppkey", col("l_suppkey") + i * sK)), "lineitem")
    write(rep(events)((d, i) => d
      .withColumn("event_id", col("event_id") + i * eK)
      .withColumn("user_id", col("user_id") + i * uK)), "events")
    // per-(doc, position, replica) deterministic word permutation:
    // multiset preserved, contiguous shingles destroyed for i>0 →
    // replicas aren't near-dups. The hash MUST include doc_id and
    // position: a per-replica global word order would sort every doc
    // sharing the (small synthetic) vocabulary into near-identical
    // sequences and DENSIFY the near-dup graph instead of scaling it
    // (first version of this tool did exactly that — the sf1 pair
    // graph exploded and the triangle stage ran unbounded).
    write(rep(documents)((d, i) => {
      val txt =
        if (i == 0) col("text")
        else concat_ws(" ", transform(
          array_sort(transform(split(col("text"), " "),
            (w, p) => struct(
              md5(concat_ws("_", w, p.cast("string"), lit(i.toString),
                col("doc_id").cast("string"))).as("h"),
              w.as("w")))),
          s => s.getField("w")))
      d.withColumn("doc_id", col("doc_id") + i * dK)
        .withColumn("text", txt)
    }), "documents")
    write(rep(embeddings)((d, i) =>
      d.withColumn("vec_id", col("vec_id") + i * vK)), "embeddings")
    spark.stop()
  }
}
