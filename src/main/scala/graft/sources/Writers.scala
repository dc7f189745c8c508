package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
