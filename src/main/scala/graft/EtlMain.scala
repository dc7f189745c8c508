package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.pipeline.BankEtl
import graft.sources.FileTracker

/** CLI entrypoint — the reference's `main.py --mode full` equivalent:
  * run the bank ETL (extract → transform → incremental load) over a CSV
  * directory into parquet production tables, with file-level tracking.
  *
  * Usage: runMain graft.EtlMain <csvDir> <outDir> [batchDate]
  *
  * Per-entity production tables land at <outDir>/<entity>; the file
  * tracker state at <outDir>/_file_tracker. Re-running against an
  * unchanged CSV dir loads nothing (incremental semantics), exactly
  * like the reference's re-run behavior.
  */
object EtlMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EtlMain <csvDir> <outDir> [batchDate]")
    val Array(csvDir, outDir) = args.take(2)
    val batchDate = if (args.length > 2) args(2) else BatchDate

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tracker = new FileTracker(spark, s"$outDir/_file_tracker")

    BankEtl.schemas.foreach { entity =>
      val glob = s"$csvDir/${entity.name}*.csv"
      val pending = tracker.newFiles(glob)
      val nPending = pending.count()
      if (nPending == 0) {
        println(s"[etl] ${entity.name}: no new files, skipping")
      } else {
        val staged = BankEtl.extract(spark, glob, entity)
        val transformed = BankEtl.transform(entity.name, staged.data, batchDate)
        val target = s"$outDir/${entity.name}"
        val existing = sources.ParquetIo.readIfExists(spark, target)
          .map(_.select(entity.primaryKey))
          .getOrElse(transformed.limit(0).select(entity.primaryKey))
        val newRows = BankEtl.loadIncremental(transformed, existing,
          entity.primaryKey)
        val loaded = newRows.cache().count()
        // production tables are directory-partitioned on their analysis
        // dimension so downstream predicates prune (see Writers)
        val partCols = entity.name match {
          case "customers" => Seq("customer_segment")
          case "loans" => Seq("risk_category")
          case "transactions" => Seq("transaction_category")
          case _ => Nil
        }
        if (loaded > 0) {
          if (partCols.nonEmpty)
            graft.sources.Writers.writePartitioned(newRows, target, partCols,
              mode = SaveMode.Append)
          else newRows.write.mode(SaveMode.Append).parquet(target)
        }
        newRows.unpersist()
        // per-FILE raw counts (not the glob total against every file)
        tracker.markProcessed(pending, staged.perFileRows)
        println(s"[etl] ${entity.name}: csv_rows=${staged.totalRows} " +
          s"invalid_pk=${staged.invalidKeyRows} deduped=${staged.dedupedRows} " +
          s"new_loaded=$loaded")
      }
    }

    // health report (reference test.py): per-table row counts
    val tables = BankEtl.schemas.flatMap { e =>
      sources.ParquetIo.readIfExists(spark, s"$outDir/${e.name}").map(e.name -> _)
    }.toMap
    if (tables.nonEmpty)
      operators.Loads.countReport(tables).collect().foreach { r =>
        println(s"[health] ${r.getAs[String]("tbl")}: ${r.getAs[Long]("n_rows")} rows")
      }
    spark.stop()
  }
}
