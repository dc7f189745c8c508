package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Processed-file tracking — the reference's `etl_file_tracker` table
  * (src/extract.py:115-270): a file is skipped when its (name, content
  * hash) was already processed; a changed file (same name, new hash)
  * is re-processed.
  *
  * Scale design: hashes are computed DISTRIBUTED via the `binaryFile`
  * source (`md5(content)` per file on executors), not by streaming
  * bytes through the driver as the reference does (extract.py:210).
  * The state itself is a small parquet table; the "which files are
  * new" question is an anti-join on (file_name, file_hash).
  */
class FileTracker(spark: SparkSession, statePath: String) {

  private val stateSchema = "file_name STRING, file_hash STRING, " +
    "record_count LONG, processed_at TIMESTAMP"

  /** Absent state (first run) → empty frame; a read FAILURE on existing
    * state propagates — swallowing it would make every processed file
    * look new and re-ingest the world.
    */
  def state(): DataFrame =
    ParquetIo.readIfExists(spark, statePath)
      .map(_.select("file_name", "file_hash", "record_count", "processed_at"))
      .getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(stateSchema)))

  /** (file_name, file_hash, length) for every file under `glob`,
    * hashed on executors. A glob matching nothing yields an empty frame
    * (the reference logs-and-continues on missing entity files,
    * extract.py:530-532).
    */
  def listWithHashes(glob: String): DataFrame = {
    // expand the glob up front and hand binaryFile CONCRETE paths: a
    // raw glob goes through FileStreamSink.hasMetadata, which probes
    // the literal glob string as a file and warn-logs a
    // FileNotFoundException stack trace on every normal run
    val p = new org.apache.hadoop.fs.Path(glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).getOrElse(
      Array.empty[org.apache.hadoop.fs.FileStatus])
    if (matches.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "file_name STRING, file_hash STRING, length LONG"))
    else
      spark.read.format("binaryFile")
        .load(matches.map(_.getPath.toString).toIndexedSeq: _*)
        .select(
          element_at(split(col("path"), "/"), -1).as("file_name"),
          md5(col("content")).as("file_hash"),
          col("length"))
  }

  /** Files under `glob` not yet processed with their current content. */
  def newFiles(glob: String): DataFrame =
    listWithHashes(glob)
      .join(state().select("file_name", "file_hash"),
        Seq("file_name", "file_hash"), "left_anti")

  /** Record files as processed (upsert by file_name: latest hash wins). */
  def markProcessed(files: DataFrame, counts: Map[String, Long]): Unit = {
    val countsDf = files.sparkSession.createDataFrame(
      counts.toSeq.map { case (f, n) => (f, n) })
      .toDF("file_name", "record_count")
    val incoming = files.select("file_name", "file_hash")
      .join(countsDf, Seq("file_name"), "left")
      .na.fill(0L, Seq("record_count"))
      .withColumn("processed_at", current_timestamp())
    val merged = graft.operators.Loads.upsert(
      state().withColumn("__v", lit(0)),
      incoming.withColumn("__v", lit(1)),
      Seq("file_name"), "__v").drop("__v")
    // small state table (O(#files), not O(rows)): single-file rewrite
    // through ParquetIo's rename swap — crash-safe, self-healing
    ParquetIo.replace(merged, statePath, coalesceTo = 1)
  }
}
