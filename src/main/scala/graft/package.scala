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
    * Some generations of `events.parquet` carry TIMESTAMP(NANOS), which
    * Spark's parquet reader only accepts as a long
    * (spark.sql.legacy.parquet.nanosAsLong) — in that case we
    * re-materialize `ts` as a proper microsecond timestamp with exact
    * integer division (`div`), no double round-trip. Other generations
    * use TIMESTAMP(MICROS), which Spark reads natively; detect which by
    * the type `ts` actually arrives as rather than assuming either.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        // TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ; cast to the
        // session-UTC TimestampType every downstream operator was built
        // against (identity on the underlying micros under UTC)
        df.withColumn("ts", df("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
