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
    *
    * Concurrency (optimistic multi-writer, the [[VersionedTable.write]]
    * protocol at the manifest level): the manifest is staged under a
    * writer-unique temp name, and the snapshot id is assigned by a
    * rename that fails if `s=next` already exists. Blind publishers
    * that lose the race rebase onto the new latest+1 and retry — the
    * staged table versions stay valid, only the pointer moves.
    *
    * @param expectedParent compare-and-swap: commit only if the newest
    *        snapshot still equals this. On mismatch the staged
    *        manifest is withdrawn and
    *        [[java.util.ConcurrentModificationException]] thrown; the
    *        already-written table versions stay orphaned (invisible to
    *        every reader) until [[vacuum]] sweeps them — a torn
    *        cross-table set is never observable either way.
    */
  def publish(root: String, tables: Map[String, DataFrame],
              expectedParent: Option[Long] = None,
              maxAttempts: Int = 5): Long = {
    require(tables.nonEmpty, "empty snapshot")
    require(maxAttempts >= 1)
    val spark = tables.head._2.sparkSession
    val staged = tables.map { case (name, df) =>
      name -> VersionedTable.write(df, new Path(root, name).toString)
    }
    val d = snapDir(root)
    val f = fs(spark, d)
    f.mkdirs(d)
    val bytes = staged.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v\n" }.mkString.getBytes("UTF-8")
    @scala.annotation.tailrec
    def commit(attempt: Int): Long = {
      val last = snapshots(spark, root).lastOption.getOrElse(0L)
      expectedParent.foreach { p =>
        if (last != p)
          throw new java.util.ConcurrentModificationException(
            s"snapshot publish: expected parent s=$p but latest is " +
              s"s=$last under $root — rebase and retry (staged table " +
              "versions stay orphaned until vacuum)")
      }
      val tmp = new Path(d, s"__s_tmp_${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      val dest = new Path(d, s"s=${last + 1}")
      if (f.rename(tmp, dest)) last + 1
      else {
        f.delete(tmp, false)
        if (attempt + 1 < maxAttempts) commit(attempt + 1)
        else throw new java.io.IOException(
          s"snapshot publish: lost the commit race $maxAttempts times " +
            s"under $root")
      }
    }
    commit(0)
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
             keep: Int, tmpRetentionMs: Long = 24L * 3600 * 1000): (Seq[Long], Int) = {
    // Only temp debris OLDER than the retention window is swept: a
    // live concurrent publisher's staged __v_tmp_/__s_tmp_ dirs are
    // seconds-to-minutes old, so vacuum no longer races its data away
    // mid-CAS (r9 ADVICE); genuinely crashed-writer debris ages past
    // the window and is still reclaimed.
    val tmpCutoff = System.currentTimeMillis() - tmpRetentionMs
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
      // crashed-writer temp debris (a CAS loser cleans up after itself,
      // a killed one cannot) — invisible to readers, but disk isn't free.
      f.listStatus(new Path(root, t)).toSeq
        .filter(s => s.getPath.getName.startsWith("__v_tmp_") &&
          s.getModificationTime < tmpCutoff)
        .foreach(s => f.delete(s.getPath, true))
    }
    val sd = snapDir(root)
    if (f.exists(sd))
      f.listStatus(sd).toSeq
        .filter(s => s.getPath.getName.startsWith("__s_tmp_") &&
          s.getModificationTime < tmpCutoff)
        .foreach(s => f.delete(s.getPath, false))
    (drop, deleted)
  }
}
