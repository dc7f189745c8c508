package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent batch publishing — exactly-once REPROCESSING semantics
  * for a batch pipeline, keyed by a caller-supplied batch id (a Kafka
  * offset range, a file drop name, a scheduler run id). The reference
  * pipeline re-runs by counting rows (load.py's LIMIT/OFFSET), which
  * double-loads as soon as a run repeats; here a re-run of ANY prefix
  * of history is a no-op.
  *
  * Protocol (write-ahead-data, record-last):
  *  1. already in the ledger? → skip (the fast path for replays);
  *  2. write the batch under `target/batch=<id>` via temp + rename
  *     (atomic visibility, partial writes never readable);
  *  3. append the id to the ledger (a parquet append — the COMMIT
  *     point).
  *
  * Crash analysis: a crash after (2) but before (3) leaves a data dir
  * the ledger doesn't know — the re-run REWRITES it (same id, same
  * rename-swap, content replaced not duplicated) and then records it;
  * readers who go through [[read]] only see LEDGERED batches, so the
  * half-published batch was never visible. The directory layout is
  * plain partitioned parquet — at 100 TB this is a metastore
  * partition-add, and the ledger is the transaction log every lake
  * format grows.
  */
object BatchLedger {

  private def ledgerPath(target: String) = s"$target/_ledger"
  private def batchPath(target: String, id: String) = s"$target/batch=$id"

  def committedIds(spark: SparkSession, target: String): Set[String] =
    ParquetIo.readIfExists(spark, ledgerPath(target))
      .map(_.select(col("batch_id")).collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)

  /** Publish `df` as batch `id`. Returns true if this call published,
    * false if the ledger already had it (idempotent replay).
    */
  def publish(spark: SparkSession, df: DataFrame, target: String,
              id: String): Boolean = {
    require(!id.contains("/") && !id.contains("="),
      s"batch id must be path-safe: $id")
    if (committedIds(spark, target).contains(id)) return false
    // (2) data first, atomically visible under its batch dir
    ParquetIo.replace(df, batchPath(target, id))
    // (3) ledger append is the commit point
    import spark.implicits._
    val row = Seq(id).toDF("batch_id")
    row.write.mode("append").parquet(ledgerPath(target))
    true
  }

  /** Read ONLY ledgered batches — a half-published batch (crash
    * between data write and ledger append) is invisible until its
    * re-run commits it.
    */
  def read(spark: SparkSession, target: String): DataFrame = {
    val ids = committedIds(spark, target)
    require(ids.nonEmpty, s"no committed batches under $target")
    val paths = ids.toSeq.sorted.map(batchPath(target, _))
    spark.read.parquet(paths: _*)
  }

  /** True if `id`'s data directory exists but the ledger doesn't have
    * it — the crash-window state [[publish]] heals on re-run.
    */
  def orphaned(spark: SparkSession, target: String, id: String): Boolean = {
    val p = new Path(batchPath(target, id))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && !committedIds(spark, target).contains(id)
  }
}
