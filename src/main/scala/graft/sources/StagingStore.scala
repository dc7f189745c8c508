package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction for the staging / transformed / production
  * layers (SURVEY §2.A4). The reference hard-wires MySQL + PostgreSQL;
  * graft keeps the computation storage-agnostic behind this trait so a
  * deployment picks parquet paths, a JDBC warehouse, or a table format
  * without touching any operator.
  */
trait StagingStore {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, mode: SaveMode): Unit
  /** SCD1 upsert by key (the reference's ON DUPLICATE KEY UPDATE). */
  def upsert(df: DataFrame, table: String, keys: Seq[String]): Unit
}

/** Parquet-directory store — the default in this environment. */
final class ParquetStagingStore(root: String) extends StagingStore {
  private def path(table: String) = s"$root/$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(path(table))

  override def upsert(df: DataFrame, table: String, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val merged =
      try {
        val cur = read(spark, table)
        graft.operators.Loads.upsert(
          cur.withColumn("__v", org.apache.spark.sql.functions.lit(0)),
          df.withColumn("__v", org.apache.spark.sql.functions.lit(1)),
          keys, "__v").drop("__v")
      } catch { case _: Throwable => df }
    val tmp = path(table) + "_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path(table))
  }
}

/** JDBC warehouse store — thin wrapper over Spark's jdbc source/sink
  * (partitioned reads via predicates, batched writes). NOT exercised in
  * this zero-egress container (no database reachable); the parquet
  * store backs all tests. Upsert portability note: plain JDBC has no
  * cross-engine MERGE, so upsert = read + merge + overwrite, same
  * semantics as the parquet path.
  */
final class JdbcStagingStore(url: String, props: Properties)
    extends StagingStore {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  override def upsert(df: DataFrame, table: String, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val merged =
      try {
        val cur = read(spark, table)
        graft.operators.Loads.upsert(
          cur.withColumn("__v", org.apache.spark.sql.functions.lit(0)),
          df.withColumn("__v", org.apache.spark.sql.functions.lit(1)),
          keys, "__v").drop("__v")
      } catch { case _: Throwable => df }
    merged.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
  }
}
