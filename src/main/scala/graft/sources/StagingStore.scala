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
  // unquoted identifiers are stored case-folded per engine (Derby/
  // DB2/Oracle upper, Postgres lower): fold the same way or the
  // metadata probe misses an existing table and the upsert
  // silently degrades into an overwrite with only the new batch
  private def foldCase(md: java.sql.DatabaseMetaData, name: String): String =
    if (md.storesUpperCaseIdentifiers()) name.toUpperCase
    else if (md.storesLowerCaseIdentifiers()) name.toLowerCase
    else name

  private def tableExists(table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      val rs = md.getTables(null, null, foldCase(md, table), null)
      try rs.next() finally rs.close()
    } finally conn.close()
  }

  /** Does `table` carry a unique constraint on EXACTLY the key set?
    * The native upserts are only upserts under one: without it,
    * PostgreSQL `ON CONFLICT (keys)` fails loudly (42P10) but MySQL
    * `ON DUPLICATE KEY UPDATE` silently INSERTS a duplicate row on
    * every replay — and tables created by [[write]] or by the portable
    * merge+overwrite path never have one (Spark's JDBC sink emits no
    * constraints). Probed via DatabaseMetaData: the declared PRIMARY
    * KEY first, then any unique index whose column set equals the keys
    * (set equality, case-folded — a SUBSET would make distinct keys
    * collide, a SUPERSET would let same-key rows duplicate).
    */
  private[graft] def hasUniqueKey(table: String,
                                  keys: Seq[String]): Boolean = {
    val want = keys.map(_.toLowerCase).toSet
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      val name = foldCase(md, table)
      val pk = scala.collection.mutable.Buffer.empty[String]
      val prs = md.getPrimaryKeys(null, null, name)
      try while (prs.next()) pk += prs.getString("COLUMN_NAME")
      finally prs.close()
      if (pk.nonEmpty && pk.map(_.toLowerCase).toSet == want) return true
      val byIndex =
        scala.collection.mutable.Map.empty[String,
          scala.collection.mutable.Buffer[String]]
      val irs = md.getIndexInfo(null, null, name, true, false)
      try while (irs.next()) {
        val iname = irs.getString("INDEX_NAME")
        val c = irs.getString("COLUMN_NAME")
        if (iname != null && c != null)
          byIndex.getOrElseUpdate(iname,
            scala.collection.mutable.Buffer.empty[String]) += c
      } finally irs.close()
      byIndex.values.exists(_.map(_.toLowerCase).toSet == want)
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
      case d @ ("mysql" | "postgres") if tableExists(table) =>
        // the native statements are only upserts when the key set is
        // unique-constrained; a table without one (created by write()
        // or the portable path) must not take this branch — repair the
        // constraint first, and if the existing DATA already violates
        // it, fall back to the portable merge (which dedups by key)
        if (!hasUniqueKey(table, keys)) {
          val repaired =
            try {
              JdbcUpsert.execDdl(url, props,
                JdbcUpsert.primaryKeySql(d, table, keys))
              true
            } catch { case _: java.sql.SQLException => false }
          if (!repaired) { mergeOverwriteUpsert(df, table, keys); return }
        }
        val cols = df.schema.fieldNames.toSeq
        val sql =
          if (d == "mysql") JdbcUpsert.mysqlSql(table, cols, keys)
          else JdbcUpsert.postgresSql(table, cols, keys)
        JdbcUpsert.runSingle(df, url, props, sql, keys)
      case d @ ("mysql" | "postgres") =>
        // first batch: create + append, then add the key constraint —
        // Spark's JDBC sink never emits one, and without it PG's
        // ON CONFLICT errors and MySQL's ODKU silently duplicates on
        // every subsequent upsert. Validate the batch BEFORE the write
        // (null or intra-batch duplicate keys would make the PK DDL
        // fail after the data landed), and if the DDL still fails,
        // drop the half-built table so the next call re-bootstraps
        // instead of native-upserting against a constraint-less table.
        JdbcUpsert.requireUpsertableBatch(df, keys)
        write(df, table, SaveMode.ErrorIfExists)
        try JdbcUpsert.execDdl(url, props,
          JdbcUpsert.primaryKeySql(d, table, keys))
        catch {
          case t: Throwable =>
            try JdbcUpsert.execDdl(url, props, s"DROP TABLE $table")
            catch { case _: Throwable => () } // original error propagates
            throw t
        }
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
