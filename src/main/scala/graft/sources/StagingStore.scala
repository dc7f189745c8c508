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
    // absence is an explicit existence check — a failing read of an
    // EXISTING table must abort the upsert, not degrade it into an
    // overwrite with only the incoming batch
    val merged = ParquetIo.readIfExists(spark, path(table)) match {
      case Some(cur) =>
        graft.operators.Loads.upsert(
          cur.withColumn("__v", org.apache.spark.sql.functions.lit(0)),
          df.withColumn("__v", org.apache.spark.sql.functions.lit(1)),
          keys, "__v").drop("__v")
      case None => df
    }
    ParquetIo.replace(merged, path(table))
  }
}

/** JDBC warehouse store — thin wrapper over Spark's jdbc source/sink
  * (partitioned reads via predicates, batched writes). Exercised for
  * real against embedded Derby (ships with Spark) in
  * SchedulerStoreSpec: append/read roundtrip, ON-DUPLICATE-KEY upsert
  * semantics, and the reference's three-layer staging→transformed→
  * production flow with count verification. Upsert portability note:
  * plain JDBC has no cross-engine MERGE, so upsert = read + merge +
  * overwrite, same semantics as the parquet path.
  */
final class JdbcStagingStore(url: String, props: Properties)
    extends StagingStore {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Missing-table is decided via JDBC metadata (DatabaseMetaData
    * .getTables), not by catching the read failure — a transient
    * connection error must abort, not silently drop the current rows.
    */
  private def tableExists(table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      // unquoted identifiers are stored case-folded per engine (Derby/
      // DB2/Oracle upper, Postgres lower): fold the same way or the
      // metadata probe misses an existing table and the upsert
      // silently degrades into an overwrite with only the new batch
      val name =
        if (md.storesUpperCaseIdentifiers()) table.toUpperCase
        else if (md.storesLowerCaseIdentifiers()) table.toLowerCase
        else table
      val rs = md.getTables(null, null, name, null)
      try rs.next() finally rs.close()
    } finally conn.close()
  }

  /** URL-routed upsert: MySQL/MariaDB plans `ON DUPLICATE KEY UPDATE`,
    * PostgreSQL `ON CONFLICT … DO UPDATE` — single-statement native
    * upserts batched from the executors ([[JdbcUpsert]]), no read-back
    * of the target and no truncate window. Every other engine takes
    * the portable read + merge + overwrite path below (same SCD1
    * semantics, proven on embedded Derby in SchedulerStoreSpec).
    */
  override def upsert(df: DataFrame, table: String, keys: Seq[String]): Unit =
    JdbcUpsert.dialectOf(url) match {
      case "mysql" | "postgres" if tableExists(table) =>
        val cols = df.schema.fieldNames.toSeq
        val sql =
          if (JdbcUpsert.dialectOf(url) == "mysql")
            JdbcUpsert.mysqlSql(table, cols, keys)
          else JdbcUpsert.postgresSql(table, cols, keys)
        JdbcUpsert.runSingle(df, url, props, sql, keys)
      case "mysql" | "postgres" =>
        // first batch: create + append, then add the key constraint —
        // Spark's JDBC sink never emits one, and without it PG's
        // ON CONFLICT errors and MySQL's ODKU silently duplicates on
        // every subsequent upsert
        write(df, table, SaveMode.ErrorIfExists)
        JdbcUpsert.execDdl(url, props,
          JdbcUpsert.primaryKeySql(JdbcUpsert.dialectOf(url), table, keys))
      case _ => mergeOverwriteUpsert(df, table, keys)
    }

  private def mergeOverwriteUpsert(df: DataFrame, table: String,
                                   keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val merged =
      if (tableExists(table)) {
        val cur = read(spark, table)
        graft.operators.Loads.upsert(
          cur.withColumn("__v", org.apache.spark.sql.functions.lit(0)),
          df.withColumn("__v", org.apache.spark.sql.functions.lit(1)),
          keys, "__v").drop("__v")
      } else df
    // merged lazily reads the table being overwritten — materialize it
    // BEFORE the truncate or the write would see its own destruction
    val out = merged.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    out.count()
    try {
      // plain JDBC has no cross-engine MERGE: Overwrite truncates and
      // rewrites; stronger atomicity needs a warehouse-side staging
      // table + MERGE, outside portable-JDBC scope
      out.write.mode(SaveMode.Overwrite).option("truncate", "true")
        .jdbc(url, table, props)
    } finally out.unpersist()
  }
}
