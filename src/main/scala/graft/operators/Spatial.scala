package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D spatial joins on integer coordinates via uniform grid blocking
  * (the geohash-bucketed join pattern, SURVEY.md §2.H family). Exact:
  * the grid only BOUNDS the candidate set; membership is decided by
  * exact integer squared distance, so results are bit-identical to a
  * brute-force cross join.
  */
object Spatial {

  /** All-pairs radius self-join: every unordered point pair within
    * Euclidean distance `radius`, found without a cross join.
    *
    * Grid blocking with cell side = radius guarantees completeness:
    * any pair within r differs by ≤ r per axis, i.e. by ≤ 1 cell per
    * axis, so joining each point's HOME cell against the other side
    * expanded to its 3×3 neighborhood covers every qualifying pair.
    * Cell ids use floor division (pmod-adjusted — truncating `div`
    * would split cells at negative coordinates).
    *
    * Scale shape: the join shuffles on cell id; per-cell work is
    * density-bounded (9 × points-per-cell candidates), never |n|².
    * Each unordered pair surfaces EXACTLY once — the a_id < b_id
    * filter keeps only the smaller-id-home ordering, and an expanded
    * point's 9 cells are distinct, so no dedup pass is needed.
    * Distance is exact BIGINT arithmetic end to end.
    *
    * @return (a_id, b_id, dist2) with a_id < b_id and
    *         dist2 = (ax−bx)² + (ay−by)² ≤ radius².
    */
  def gridRadiusJoin(points: DataFrame, idCol: String, xCol: String,
                     yCol: String, radius: Long): DataFrame = {
    require(radius > 0)
    def cell(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(radius))) / radius).cast("long")
    val p = points.select(col(idCol).as("pid"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val home = p.select(col("pid"), col("x"), col("y"),
      cell(col("x")).as("cx"), cell(col("y")).as("cy"))
    val offs = Seq(-1L, 0L, 1L)
    val expanded = home.select(col("pid").as("qid"), col("x").as("qx"),
        col("y").as("qy"), col("cx").as("hx"), col("cy").as("hy"))
      .withColumn("dx", explode(lit(offs.toArray)))
      .withColumn("dy", explode(lit(offs.toArray)))
      .select(col("qid"), col("qx"), col("qy"),
        (col("hx") + col("dx")).as("cx"), (col("hy") + col("dy")).as("cy"))
    val d2 = (col("x") - col("qx")) * (col("x") - col("qx")) +
      (col("y") - col("qy")) * (col("y") - col("qy"))
    home.join(expanded, Seq("cx", "cy"))
      .filter(col("pid") < col("qid") && d2 <= radius * radius)
      .select(col("pid").as("a_id"), col("qid").as("b_id"),
        d2.as("dist2"))
  }
}
