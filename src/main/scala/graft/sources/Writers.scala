package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Output-side helpers (SURVEY.md §2.A3) — how graft lays data out so
  * DOWNSTREAM reads stay fast at 100 TB:
  *
  *  - `writePartitioned`: hive-style directory partitioning on low-
  *    cardinality keys → partition pruning turns predicates into
  *    directory listings (verified in WritersSpec via PartitionFilters);
  *    `sortWithinPartitions` gives parquet min/max row-group statistics
  *    their selectivity.
  *  - `writeBucketed`: pre-shuffled bucketed table on a join key → a
  *    later equi-join or aggregation on that key runs SHUFFLE-FREE.
  *    This is the batch analog of co-partitioned storage; at cluster
  *    scale it is how repeated fact-fact joins avoid re-shuffling
  *    terabytes every run.
  */
object Writers {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(df.col): _*)
    sorted.write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** D14: predicate-scoped partition overwrite (Delta's
    * `replaceWhere` / Spark's dynamic partition overwrite, the
    * idempotent-backfill primitive): replace EXACTLY the partitions
    * the incoming batch touches, leave every other partition's bytes
    * untouched — re-running a day's backfill converges instead of
    * appending duplicates, and a full-table Overwrite (which would
    * delete the other 10 years at 100 TB) is impossible by
    * construction.
    *
    * Uses Spark's native dynamic partitionOverwriteMode for the swap
    * (staged per-partition directory replace, atomic per partition);
    * the batch is REQUIRED to be partition-complete: a guard fails
    * loudly if `df` carries null partition values (they'd land in the
    * __HIVE_DEFAULT_PARTITION__ bucket and silently clobber it).
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "overwritePartitions needs partition columns")
    val nulls = df.filter(partitionCols.map(c => col(c).isNull)
      .reduce(_ || _)).limit(1).count()
    require(nulls == 0,
      s"overwritePartitions: null values in partition columns " +
        s"${partitionCols.mkString(",")} — fix upstream, a null would " +
        "silently replace the default partition")
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** ORC export/import — the second columnar interchange format Spark
    * ships natively (same predicate-pushdown + column-pruning story as
    * parquet; min/max + bloom stripe statistics). Partitioning and
    * sort-within options mirror [[writePartitioned]].
    */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil,
               sortCols: Seq[String] = Nil,
               mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(df.col): _*)
    val w = sorted.write.mode(mode)
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV export (the reference's transform-phase `export_csv`,
    * transform.py:493): header + configurable null sentinel. One file
    * per partition; `coalesce` upstream if a single file is required.
    */
  def writeCsv(df: DataFrame, path: String, nullValue: String = "NA",
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("nullValue", nullValue)
      .csv(path)

  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** Z-order layout write: bucketize two columns to 16-bit ranks,
    * Morton-interleave (plans.ZOrder2, codegen'd), range-sort by the
    * curve position, write. Every output file then covers a tight
    * bounding box in BOTH dimensions, so parquet min/max stats prune
    * scans filtered on EITHER column — the multi-dimensional
    * clustering a plain sort can't give. `repartitionByRange` on the
    * curve key is the only shuffle; rank bounds come from one
    * approxQuantile pass.
    *
    * Ranks use quantile boundaries (not linear scaling) so skewed
    * columns still spread across the curve evenly.
    */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
                  nFiles: Int = 64): Unit = {
    import graft.plans.LayoutFunctions.zorder2
    import org.apache.spark.sql.functions._
    val probs = (1 until 256).map(_ / 256.0).toArray
    val Array(qa, qb) = df.stat.approxQuantile(Array(colA, colB), probs, 0.01)
    def rank(c: String, qs: Array[Double]) =
      qs.distinct.foldLeft(lit(0L)) { (acc, q) =>
        acc + when(col(c).cast("double") > q, 1L).otherwise(0L)
      }
    val keyed = df.withColumn("__z",
      zorder2(rank(colA, qa), rank(colB, qb)))
    keyed.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Small-file compaction — the operational fix for the classic
    * 100 TB failure mode: incremental/streaming appends leave
    * thousands of kilobyte parquet files per directory, and every
    * downstream scan then pays a task per file plus a footer read per
    * task. Rewrites a parquet directory into ⌈bytes / targetBytes⌉
    * files sized for the scan path, then swaps it in rename-based:
    * write tmp → rename(dir→bak) → rename(tmp→dir) → delete bak. A
    * crash inside the two-rename window leaves dir absent with bak
    * intact; the next compact() call detects that state and restores
    * bak before proceeding, so no crash point loses data. Directories
    * with hive-partition subdirectories are refused (a whole-directory
    * rewrite would flatten the layout).
    *
    * Sizing uses the FILE listing, not a data scan: compaction reads
    * each byte exactly once. `coalesce` (not `repartition`) merges
    * files without a shuffle.
    *
    * @return (filesBefore, filesAfter)
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new Path(dir + "__bak")
    // crash-window repair: a crash between rename(dir→bak) and
    // rename(tmp→dir) leaves dir absent but bak intact — recover it
    // before doing anything else, so the directory is never lost
    if (!fs.exists(path) && fs.exists(bak)) fs.rename(bak, path)
    val listing = fs.listStatus(path)
    // a hive-partitioned layout (key=value subdirectories) would be
    // silently FLATTENED by a whole-directory rewrite — refuse; compact
    // each leaf partition directory individually instead
    val subdirs = listing.filter(_.isDirectory).map(_.getPath.getName)
    if (subdirs.nonEmpty)
      throw new IllegalArgumentException(
        s"compact: $dir contains subdirectories (${subdirs.take(3).mkString(", ")}…) — " +
          "a whole-directory rewrite would flatten the partition layout; " +
          "compact each leaf partition directory instead")
    val parts = listing
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(dir + "__compact_tmp")
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compact: cannot move $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore; compaction failed, data intact
      throw new java.io.IOException(s"compact: cannot swap in $tmp")
    }
    fs.delete(bak, true)
    (parts.length, nFiles)
  }
}
