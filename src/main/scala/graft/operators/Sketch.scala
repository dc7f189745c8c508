package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the mergeable fixed-size frequency summary beside H6's HLL
  * (distincts) and H17's Bloom (membership): d hash rows × w buckets
  * of exact integer counts, point estimate = min over rows, always an
  * OVERESTIMATE (one-sided error ≤ 2N/w with prob ≥ 1 − (1/2)^d).
  * The 100 TB story: the sketch is d·w integers regardless of input
  * size, per-partition buildable and unionable by cell-wise addition
  * — the shape a 1000-executor frequency monitor ships to the driver.
  *
  * Engine-portable by construction (unlike the HLL binary, which
  * needs a tolerance gate): bucket_i(key) = first-12-hex md5 of
  * "cm<i>|<key>" mod w — the [[Sampling]] md5 determinism argument —
  * so the full cell TABLE and every estimate are hash-gateable
  * integers on any engine/partitioning.
  */
object Sketch {

  private def bucket(i: Int, key: org.apache.spark.sql.Column,
                     w: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(concat(lit(s"cm$i|"),
      key.cast("string")).cast("binary")), 1, 12), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Build the d×w cell table: ONE explode(d) + keyed count — map-side
    * combined, at most d·w cells out at any input size.
    *
    * @return (row_i, bucket, cnt) — only non-zero cells (a cell absent
    *         from the table reads 0).
    */
  def countMinBuild(df: DataFrame, keyCol: String, d: Int = 4,
                    w: Int = 256): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2,
      s"countMin: d=$d (1..16), w=$w (≥2)")
    val cells = explode(array((0 until d).map(i =>
      struct(lit(i).as("row_i"), bucket(i, col(keyCol), w).as("bucket")))
      : _*)).as("cell")
    df.select(cells)
      .groupBy(col("cell.row_i").as("row_i"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries`' keys: min over the d rows of the
    * key's cell counts. The sketch is d·w rows — broadcast, never a
    * shuffle side; absent cells coalesce to 0.
    *
    * @return (key, est) — est ≥ true count, = for keys whose every
    *         cell is collision-free.
    */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame,
                       keyCol: String, d: Int = 4,
                       w: Int = 256): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2,
      s"countMin: d=$d (1..16), w=$w (≥2)")
    // buckets derive from the RENAMED key attribute — the projection
    // below stages the rename first
    val keyCells = explode(array((0 until d).map(i =>
      struct(lit(i).as("row_i"), bucket(i, col("key"), w).as("bucket")))
      : _*)).as("cell")
    queries.select(col(keyCol).as("key"))
      .distinct()
      .select(col("key"), keyCells)
      .select(col("key"), col("cell.row_i").as("row_i"),
        col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row_i", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
