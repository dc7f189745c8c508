package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Dialect-native JDBC upserts (SURVEY §2.A4 production path).
  *
  * The reference's warehouse load is MySQL `INSERT … ON DUPLICATE KEY
  * UPDATE` (extract.py:210-270, load.py); its PostgreSQL production
  * layer has the `ON CONFLICT` analog. graft's portable JDBC path
  * (read + merge + overwrite, [[JdbcStagingStore.upsert]]) carries the
  * same SCD1 semantics on any engine, but at warehouse scale the
  * native single-statement upsert is the right physical form: no full
  * read-back of the target, no truncate window, per-partition batched
  * writes straight from the executors.
  *
  * SQL-text generation is pure and unit-tested (no live server in this
  * environment — VERDICT r4 §missing #1); the executor plumbing
  * (partition fan-out, prepared-statement batching, null binding) is
  * integration-tested for real against embedded Derby through the
  * portable two-statement fallback, which shares every line of that
  * plumbing with the native dialects except the SQL text itself.
  *
  * Scale notes: each partition opens one connection and writes in
  * `batchSize` batches inside a transaction — the standard Spark JDBC
  * sink shape (one writer per partition, `repartition(n)` upstream
  * controls warehouse connection fan-in). Idempotent by construction:
  * re-running an upsert batch converges (same keys → same final rows),
  * which is what makes it safe under task retries.
  */
object JdbcUpsert {

  /** MySQL/MariaDB `ON DUPLICATE KEY UPDATE`. Parameters bind in
    * `cols` order. `VALUES(c)` (not the 8.0.20+ row-alias form) for
    * the widest server compatibility. An all-key table degrades to a
    * no-op self-assignment — MySQL requires ≥1 assignment and a full
    * key match means there is nothing to update.
    */
  def mysqlSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    requireShape(cols, keys)
    val nonKeys = cols.filterNot(keys.contains)
    val sets =
      if (nonKeys.isEmpty) s"`${keys.head}` = `${keys.head}`"
      else nonKeys.map(c => s"`$c` = VALUES(`$c`)").mkString(", ")
    // table name raw (never quoted): Spark's jdbc sink pastes dbtable
    // verbatim into CREATE TABLE, so the caller's string may carry
    // schema qualification and must match what Spark created
    s"INSERT INTO $table (${cols.map(c => s"`$c`").mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON DUPLICATE KEY UPDATE $sets"
  }

  /** PostgreSQL `ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`.
    * Parameters bind in `cols` order. An all-key table is `DO NOTHING`
    * (the row already exists in full).
    */
  def postgresSql(table: String, cols: Seq[String],
                  keys: Seq[String]): String = {
    requireShape(cols, keys)
    val nonKeys = cols.filterNot(keys.contains)
    val action =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        nonKeys.map(c => s""""$c" = EXCLUDED."$c"""").mkString(", ")
    s"""INSERT INTO $table (${cols.map(c => s""""$c"""").mkString(", ")}) """ +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"""ON CONFLICT (${keys.map(k => s""""$k"""").mkString(", ")}) $action"""
  }

  /** Portable fallback step 1: `UPDATE … SET nonKeys WHERE keys`;
    * parameters bind nonKeys-then-keys ([[updateParamCols]]).
    * ANSI double-quoted COLUMN identifiers: Spark's JDBC sink CREATEs
    * columns quoted (case-exact), so an unquoted reference would
    * case-fold on Derby/PG/Oracle and miss them; the table name stays
    * raw because the sink pastes dbtable verbatim.
    */
  def updateSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    requireShape(cols, keys)
    val nonKeys = cols.filterNot(keys.contains)
    require(nonKeys.nonEmpty, "update-else-insert needs a non-key column")
    s"""UPDATE $table SET ${nonKeys.map(c => s""""$c" = ?""").mkString(", ")} """ +
      s"""WHERE ${keys.map(k => s""""$k" = ?""").mkString(" AND ")}"""
  }

  def updateParamCols(cols: Seq[String], keys: Seq[String]): Seq[String] =
    cols.filterNot(keys.contains) ++ keys

  /** Portable fallback step 2: plain insert, parameters in `cols` order. */
  def insertSql(table: String, cols: Seq[String]): String =
    s"""INSERT INTO $table (${cols.map(c => s""""$c"""").mkString(", ")}) """ +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

  private def requireShape(cols: Seq[String], keys: Seq[String]): Unit = {
    require(keys.nonEmpty && cols.nonEmpty, "need columns and keys")
    require(keys.forall(cols.contains), s"keys $keys must be a subset of $cols")
  }

  /** Dialect DDL adding the upsert keys as the PRIMARY KEY — the
    * native upsert paths REQUIRE a unique constraint (PostgreSQL
    * `ON CONFLICT` errors 42P10 without one; MySQL ODKU silently
    * duplicates), and Spark's JDBC sink never emits one on CREATE, so
    * the bootstrap branch must add it explicitly.
    */
  def primaryKeySql(dialect: String, table: String,
                    keys: Seq[String]): String = {
    require(keys.nonEmpty, "need key columns")
    dialect match {
      case "mysql" =>
        s"ALTER TABLE $table ADD PRIMARY KEY " +
          s"(${keys.map(k => s"`$k`").mkString(", ")})"
      case "postgres" =>
        s"ALTER TABLE $table ADD PRIMARY KEY " +
          s"""(${keys.map(k => s""""$k"""").mkString(", ")})"""
      case other =>
        throw new IllegalArgumentException(s"no native PK DDL for $other")
    }
  }

  /** Driver-side DDL execution (bootstrap constraint, not data). */
  def execDdl(url: String, props: Properties, sql: String): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }

  /** Bootstrap pre-flight: the first batch becomes the table the PK
    * DDL is added to, so a null key or an intra-batch duplicate key
    * would land in the data and THEN fail the `ADD PRIMARY KEY` —
    * leaving a constraint-less table behind. Validate up front (two
    * cheap aggregates over the batch) and fail with row evidence
    * before anything is written.
    */
  def requireUpsertableBatch(df: DataFrame, keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val nullKeyed = df
      .filter(keys.map(k => col(k).isNull).reduce(_ || _)).limit(1).count()
    require(nullKeyed == 0L,
      s"upsert bootstrap: batch has a NULL in a key column ${keys
        .mkString("(", ", ", ")")} — NULL never equi-matches, so the " +
        "row could never update in place")
    val dup = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dup == 0L,
      s"upsert bootstrap: batch has duplicate keys ${keys
        .mkString("(", ", ", ")")} — the PRIMARY KEY DDL would fail " +
        "after the data landed; dedup the batch (e.g. Loads.upsert) first")
  }

  /** NULL in a key column breaks upsert semantics everywhere (`k = ?`
    * never matches NULL; unique indexes treat NULLs as distinct), so
    * every replay would duplicate the row — fail loudly instead.
    */
  private def requireKeysNonNull(row: Row, schema: StructType,
                                 keys: Seq[String]): Unit =
    keys.foreach { k =>
      if (row.isNullAt(schema.fieldIndex(k)))
        throw new IllegalArgumentException(
          s"null upsert key '$k': NULL never equi-matches, so the row " +
            "can never update in place and every replay would duplicate it")
    }

  /** URL → dialect tag ("mysql" | "postgres" | "generic"). */
  def dialectOf(url: String): String =
    if (url.startsWith("jdbc:mysql:") || url.startsWith("jdbc:mariadb:"))
      "mysql"
    else if (url.startsWith("jdbc:postgresql:")) "postgres"
    else "generic"

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case ByteType => java.sql.Types.TINYINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case BooleanType => java.sql.Types.BOOLEAN
    case DateType => java.sql.Types.DATE
    case TimestampType => java.sql.Types.TIMESTAMP
    case BinaryType => java.sql.Types.BINARY
    case _: DecimalType => java.sql.Types.NUMERIC
    case _ => java.sql.Types.VARCHAR
  }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType,
                   paramCols: Seq[String]): Unit =
    paramCols.zipWithIndex.foreach { case (c, i) =>
      val fi = schema.fieldIndex(c)
      val v = row.get(fi)
      if (v == null) ps.setNull(i + 1, jdbcType(schema(fi).dataType))
      else ps.setObject(i + 1, v)
    }

  /** Single-statement dialect upsert (MySQL / PostgreSQL): one
    * connection per partition, batched, transactional per partition.
    */
  def runSingle(df: DataFrame, url: String, props: Properties,
                sql: String, keys: Seq[String],
                batchSize: Int = 500): Unit = {
    val schema = df.schema
    val paramCols = schema.fieldNames.toSeq
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var n = 0
            it.foreach { row =>
              requireKeysNonNull(row, schema, keys)
              bind(ps, row, schema, paramCols)
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) ps.executeBatch()
            }
            if (n % batchSize != 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } catch {
          // swallow a rollback failure: the ORIGINAL error must
          // propagate, not the secondary one from a dying connection
          case t: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw t
        } finally conn.close()
      }
    }
  }

  /** Portable two-statement upsert (update, insert if 0 rows touched)
    * — the engine-agnostic fallback, and the path that exercises the
    * executor plumbing against embedded Derby in SchedulerStoreSpec.
    * Per-row update-count check, so no batching on the update leg.
    */
  def runUpdateInsert(df: DataFrame, url: String, props: Properties,
                      table: String, keys: Seq[String]): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    val upSql = updateSql(table, cols, keys)
    val upCols = updateParamCols(cols, keys)
    val inSql = insertSql(table, cols)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(upSql)
          val in = conn.prepareStatement(inSql)
          try {
            it.foreach { row =>
              requireKeysNonNull(row, schema, keys)
              bind(up, row, schema, upCols)
              if (up.executeUpdate() == 0) {
                bind(in, row, schema, cols)
                in.executeUpdate()
              }
            }
            conn.commit()
          } finally { up.close(); in.close() }
        } catch {
          // swallow a rollback failure: the ORIGINAL error must
          // propagate, not the secondary one from a dying connection
          case t: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw t
        } finally conn.close()
      }
    }
  }
}
