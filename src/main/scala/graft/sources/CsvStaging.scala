package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Raw-preserving CSV staging reader — the extract phase of the
  * reference (src/extract.py:82-516) re-expressed for a distributed
  * engine.
  *
  * Reference semantics kept:
  *  - every column lands as a raw STRING (no type coercion at staging);
  *  - the column set must match the declared schema exactly
  *    (extract.py:380,438 column-mismatch guard);
  *  - rows with null/empty primary key are dropped (extract.py:387);
  *  - duplicate primary keys keep the LAST occurrence in file order
  *    (extract.py:389 drop_duplicates keep='last');
  *  - the numeric-digits sort key (extract.py:272) is derived as a
  *    COLUMN — the reference's global pre-insert sort is replaced by
  *    an orderable key, because a total order is a single-writer
  *    bottleneck at 100 TB.
  *
  * Scale notes: "keep last per key" is a window over the key — one
  * shuffle, no driver state. File order within a file is preserved by
  * pairing each row with its byte offset via the csv reader's
  * partition-local order (monotonically_increasing_id is monotone
  * within and across file splits in read order).
  */
object CsvStaging {

  /** `perFileRows`: raw row count per source FILE (the tracker's
    * record_count must be per file, not the glob total — a multi-file
    * glob would otherwise record the sum against every file). Small by
    * construction: O(#files).
    */
  final case class StagingResult(data: DataFrame, totalRows: Long,
                                 invalidKeyRows: Long, dedupedRows: Long,
                                 perFileRows: Map[String, Long] = Map.empty)

  def schemaFor(columns: Seq[String]): StructType =
    StructType(columns.map(c => StructField(c, StringType, nullable = true)))

  /** Read CSVs into raw-string staging form. Fails fast if the file
    * header doesn't carry exactly `columns` (any order).
    */
  def read(spark: SparkSession, path: String, columns: Seq[String],
           primaryKey: String): StagingResult = {
    // expand a glob up front: a raw glob string goes through
    // FileStreamSink.hasMetadata, which probes the literal glob as a
    // file and warn-logs a FileNotFoundException trace per read
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expanded = Option(fs.globStatus(hp))
      .filter(_.nonEmpty)
      .map(_.map(_.getPath.toString).toIndexedSeq)
      .getOrElse(Seq(path)) // no match: keep the original error path
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(expanded: _*)

    val got = raw.columns.toSet
    require(got == columns.toSet,
      s"column mismatch: csv has ${got.toSeq.sorted}, expected ${columns.sorted}")

    val ordered = raw.select(columns.map(col): _*)
      .withColumn("__file_order", monotonically_increasing_id())

    val keyed = ordered.filter(col(primaryKey).isNotNull &&
      trim(col(primaryKey)) =!= "")

    // keep-last per key, by file order (reference keep='last')
    val w = Window.partitionBy(col(primaryKey))
      .orderBy(col("__file_order").desc)
    val deduped = keyed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__file_order")
      .withColumn("numeric_sort_key", numericSortKey(col(primaryKey)))

    val perFile = ordered
      .groupBy(element_at(split(input_file_name(), "/"), -1).as("file_name"))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val total = perFile.valuesIterator.sum
    val valid = keyed.count()
    val kept = deduped.count()
    StagingResult(deduped, total, total - valid, valid - kept, perFile)
  }

  /** The reference's `_extract_numeric_id`: all digits of the id glued
    * together, 0 when none. Null-safe, overflow-guarded to 18 digits.
    */
  def numericSortKey(c: org.apache.spark.sql.Column) =
    coalesce(substring(regexp_replace(c, "[^0-9]", ""), 0, 18).cast("long"),
      lit(0L))
}
