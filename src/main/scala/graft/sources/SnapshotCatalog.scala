package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** H34: MULTI-table atomic publish — the cross-table transaction a
  * warehouse load needs that single-table versioning ([[VersionedTable]])
  * cannot give: publishing customers v7 and orders v7 separately lets a
  * reader join customers v7 against orders v6 and see FK orphans that
  * never existed.
  *
  * The classic manifest-pointer design (Iceberg's snapshot list,
  * Delta's _last_checkpoint, reduced to its essentials on plain
  * storage):
  *
  *  - each table's data lands as a normal [[VersionedTable]] version —
  *    individually atomic (temp + rename) but UNREFERENCED: readers
  *    never resolve a table directly;
  *  - then ONE manifest file `_snapshots/s=K` (lines `table=version`)
  *    is committed via temp + rename — the single atomic operation
  *    that makes the whole cross-table set visible at once;
  *  - readers resolve (snapshot → table → version) through the newest
  *    manifest (or a pinned one — cross-table time travel for free).
  *
  * A crash between table writes leaves orphan versions, never a torn
  * snapshot: the manifest either lists the complete set or does not
  * exist. [[vacuum]] sweeps orphans and expired snapshots; retention
  * must out-live the longest reader, the same contract as
  * [[VersionedTable.prune]].
  */
object SnapshotCatalog {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir(root: String) = new Path(root, "_snapshots")

  /** Snapshot ids present, ascending. */
  def snapshots(spark: SparkSession, root: String): Seq[Long] = {
    val d = snapDir(root)
    val f = fs(spark, d)
    if (!f.exists(d)) return Nil
    f.listStatus(d).toSeq
      .filter(s => s.getPath.getName.startsWith("s="))
      .map(_.getPath.getName.drop(2).toLong).sorted
  }

  /** The table → version map of one snapshot. */
  def manifest(spark: SparkSession, root: String,
               snapshot: Long): Map[String, Long] = {
    val p = new Path(snapDir(root), s"s=$snapshot")
    val f = fs(spark, p)
    require(f.exists(p), s"snapshot $snapshot not found under $root")
    val in = f.open(p)
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { l =>
          val Array(t, v) = l.split("=", 2)
          t -> v.toLong
        }.toMap
    } finally in.close()
  }

  /** Publish a cross-table snapshot; returns the snapshot id. Table
    * writes happen first (atomic each, invisible until referenced);
    * the manifest rename is the commit point.
    */
  def publish(root: String, tables: Map[String, DataFrame]): Long = {
    require(tables.nonEmpty, "empty snapshot")
    val spark = tables.head._2.sparkSession
    val staged = tables.map { case (name, df) =>
      name -> VersionedTable.write(df, new Path(root, name).toString)
    }
    val next = snapshots(spark, root).lastOption.getOrElse(0L) + 1
    val d = snapDir(root)
    val f = fs(spark, d)
    f.mkdirs(d)
    val tmp = new Path(d, s"__s_tmp_$next")
    val out = f.create(tmp, false)
    try out.write(staged.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v\n" }.mkString.getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(d, s"s=$next")
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(
        s"snapshot publish: cannot commit $dest (concurrent writer?)")
    next
  }

  /** Read one table at a pinned snapshot (newest when None). Always
    * resolves THROUGH a manifest — unreferenced (orphan) versions are
    * invisible by construction.
    */
  def read(spark: SparkSession, root: String, tableName: String,
           snapshot: Option[Long] = None): DataFrame = {
    val ss = snapshots(spark, root)
    require(ss.nonEmpty, s"no snapshots under $root")
    val s = snapshot.getOrElse(ss.last)
    val m = manifest(spark, root, s)
    require(m.contains(tableName),
      s"table $tableName not in snapshot $s (${m.keys.toSeq.sorted})")
    VersionedTable.read(spark, new Path(root, tableName).toString,
      Some(m(tableName)))
  }

  /** Drop all but the newest `keep` snapshots, then delete every table
    * version no surviving manifest references — this is what sweeps
    * both expired history AND the orphans a crashed publish left.
    *
    * @return (dropped snapshot ids, deleted table-version count)
    */
  def vacuum(spark: SparkSession, root: String,
             keep: Int): (Seq[Long], Int) = {
    val ss = snapshots(spark, root)
    val drop = ss.dropRight(keep)
    val keepSs = ss.takeRight(keep)
    val f = fs(spark, new Path(root))
    drop.foreach(s => f.delete(new Path(snapDir(root), s"s=$s"), true))
    val referenced: Set[(String, Long)] = keepSs
      .flatMap(s => manifest(spark, root, s).toSeq).toSet
    val tableNames = f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != "_snapshots")
      .map(_.getPath.getName)
    var deleted = 0
    tableNames.foreach { t =>
      VersionedTable.versions(spark, new Path(root, t).toString)
        .filterNot(v => referenced((t, v)))
        .foreach { v =>
          f.delete(new Path(new Path(root, t), s"v=$v"), true)
          deleted += 1
        }
    }
    (drop, deleted)
  }
}
