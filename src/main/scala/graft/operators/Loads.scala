package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Load-phase semantics of the reference (src/load.py), re-expressed as
  * distributed set operations.
  *
  * The reference implements "incremental append" as COUNT(existing) +
  * `LIMIT new OFFSET existing` (load.py:152-199) — that requires a global
  * total order and a single writer, which is exactly what does NOT scale.
  * The scale-correct semantic is a key anti-join: hash-partitioned on the
  * key, no total order, no driver state, works identically on 1000
  * executors.
  */
object Loads {

  /** Rows of `incoming` whose key is not present in `existing`
    * (load.py:152 get_new_rows_from_mysql, re-expressed). A `left_anti`
    * join is shuffle-partitioned on the key; when `existing`'s key set is
    * small Catalyst/AQE broadcasts it automatically.
    */
  def incrementalNew(incoming: DataFrame, existing: DataFrame,
                     keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** SCD1 upsert (the reference's ON DUPLICATE KEY UPDATE, extract.py:328
    * / transform.py:265): union base + updates, keep the highest-version
    * row per key. One shuffle on the key; ties broken deterministically
    * by version descending.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** SCD2 history: keep EVERY version of a key, with validity interval
    * columns derived from the next version's start (lead over the key's
    * version order) — the warehouse-standard "slowly changing dimension
    * type 2" shape the reference's destructive upsert cannot answer
    * ("what was this row worth last month?"). One shuffle on the key;
    * the window is per-key, never global.
    */
  def scd2History(history: DataFrame, keys: Seq[String],
                  versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol))
    history
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Row-count reconciliation across tables (load.py:317 verify_counts):
    * one row per table with its count. Counts run as independent
    * partial-aggregated jobs; the union is metadata-sized.
    */
  def countReport(tables: Map[String, DataFrame]): DataFrame =
    tables.toSeq.sortBy(_._1).map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("tbl"),
        col("n_rows"))
    }.reduce(_ unionByName _)
}
