import org.apache.spark.sql.{DataFrame, SparkSession}

/** graft — a Spark-native analytics/ETL engine with the capabilities of
  * the reference banking ETL pipeline (see SURVEY.md), re-expressed as
  * declarative DataFrame operators so Catalyst/Tungsten handle physical
  * planning, pushdown, and codegen.
  */
package object graft {

  /** All "today"-relative derivations (age, tenure) are pinned to a fixed
    * reference date so results are deterministic and oracle-checkable.
    * The reference pipeline uses `date.today()` (transform.py:217) which
    * is unreproducible; a production deployment passes the batch date.
    */
  val BatchDate = "2026-08-12"

  /** Load one of the driver-generated parquet tables from an sf dir.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet
    * reader only accepts as a long (spark.sql.legacy.parquet.nanosAsLong);
    * we re-materialize it as a proper microsecond timestamp column with
    * exact integer division (`div`), no double round-trip.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
