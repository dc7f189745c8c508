package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping via a min/max manifest — the lakehouse
  * pattern (Delta/Iceberg file statistics) on plain parquet
  * directories.
  *
  * Parquet row-group min/max stats already prune WITHIN a file, but
  * the scan still has to list the directory and read every footer. At
  * 100 TB a table is ~10⁶ files, so listing + footer reads alone cost
  * minutes per query. A manifest (one row per file: min/max of the
  * clustering columns) moves that pruning to PLANNING time: one tiny
  * parquet read decides which files a range predicate can touch, and
  * the scan is constructed over only those. Combined with
  * [[Writers.zorderWrite]] / range-partitioned writes (tight per-file
  * bounding boxes), a selective predicate reads a handful of files out
  * of a million.
  *
  * The manifest lives UNDER the data directory as `_graft_manifest`
  * — Spark's file index hides underscore-prefixed paths, so plain
  * `spark.read.parquet(dir)` of the data is unaffected.
  *
  * Pruning is sound for NULL-REJECTING range predicates only (min/max
  * ignore nulls, and `c BETWEEN lo AND hi` never matches null) — the
  * same contract as parquet row-group stats.
  */
object DataSkipping {

  def manifestPath(dir: String): String = dir + "/_graft_manifest"

  /** Build/replace the manifest for `cols`: one scan of only those
    * columns (column pruning keeps it cheap), grouped by the file each
    * row came from via the `_metadata` hidden column. On a cluster
    * this is a map-side-combinable aggregate over file-count rows —
    * in a production write path the same stats fall out of the write
    * task for free; this rebuilds them for directories written by
    * anyone.
    */
  def writeManifest(spark: SparkSession, dir: String,
                    cols: Seq[String]): Long = {
    require(cols.nonEmpty, "need at least one column to index")
    val df = spark.read.parquet(dir)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val m = df
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
    m.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(manifestPath(dir))
    spark.read.parquet(manifestPath(dir)).count()
  }

  /** Files whose [min,max] interval on `c` intersects [lo, hi] — the
    * candidate set for a `c BETWEEN lo AND hi` predicate. Driver-side
    * collect is file-count-sized (exactly what Delta's log replay
    * collects), never data-sized.
    */
  def candidateFiles(spark: SparkSession, dir: String, c: String,
                     lo: Column, hi: Column): Array[String] =
    spark.read.parquet(manifestPath(dir))
      .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .select("file").collect().map(_.getString(0)).sorted

  /** Range read with file skipping: plan the scan over only the
    * manifest-selected files, then re-apply the exact predicate (file
    * grain is coarse; row grain still filters inside survivors).
    * Result ≡ `spark.read.parquet(dir).filter(between)` for any
    * null-rejecting range predicate — asserted in WritersSpec.
    */
  def readRange(spark: SparkSession, dir: String, c: String,
                lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(spark, dir, c, lo, hi)
    val base =
      if (files.isEmpty)
        // keep the schema without touching data files
        spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }
}
