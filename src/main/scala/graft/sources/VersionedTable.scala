package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned table on plain parquet — snapshot isolation and time
  * travel without a table format dependency.
  *
  * Every write lands in a fresh `v=N` subdirectory: data is written to
  * a temp dir first and RENAMED into place, so a version is either
  * fully visible or absent (readers can never observe a partial
  * write). Old versions are immutable — a reader pinned to v=K is
  * unaffected by any later write, which is exactly the snapshot
  * isolation a long-running 100 TB job needs while ingestion
  * continues. The version listing is the directory listing (no
  * manifest to corrupt); retention is an explicit [[prune]].
  *
  * This is deliberately the smallest useful slice of the
  * Delta/Iceberg feature set: append-only version history + atomic
  * publish + time travel. It composes with [[DataSkipping]] (write a
  * manifest per version directory) and [[Writers.compact]] (compact a
  * version in place before publishing).
  */
object VersionedTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Versions present, ascending (empty for a fresh/absent dir). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val f = fs(spark, p)
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.drop(2).toLong).sorted
  }

  /** Publish `df` as the next version; returns the version number.
    * Write → rename: the new version appears atomically.
    *
    * Concurrency (optimistic, the Iceberg/Delta commit protocol
    * reduced to its essentials): data lands under a WRITER-UNIQUE temp
    * dir, so concurrent writers never interleave bytes; the version
    * NUMBER is assigned at commit time by a rename that fails if the
    * destination exists. A writer that loses the race retries with the
    * new latest+1 — the data needs no re-staging because a version is
    * just content; crash-torn states stay invisible (temp dirs never
    * match the `v=` listing filter) and are swept by
    * [[SnapshotCatalog.vacuum]] or the next [[prune]].
    *
    * @param expectedParent compare-and-swap: commit only if the latest
    *        version still equals this (read-modify-write safety — an
    *        upsert derived FROM v=K must not silently clobber a
    *        concurrent v=K+1). On mismatch the temp data is deleted
    *        and [[java.util.ConcurrentModificationException]] is
    *        thrown: re-derive from the new latest and retry. None =
    *        blind append, losers rebase onto the next id automatically.
    */
  def write(df: DataFrame, dir: String,
            expectedParent: Option[Long] = None,
            maxAttempts: Int = 5): Long = {
    require(maxAttempts >= 1)
    val spark = df.sparkSession
    val tmp = new Path(dir, s"__v_tmp_${java.util.UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val f = fs(spark, tmp)
    @scala.annotation.tailrec
    def commit(attempt: Int): Long = {
      val last = versions(spark, dir).lastOption.getOrElse(0L)
      expectedParent.foreach { p =>
        if (last != p) {
          f.delete(tmp, true)
          throw new java.util.ConcurrentModificationException(
            s"versioned write: expected parent v=$p but latest is " +
              s"v=$last under $dir — re-derive and retry")
        }
      }
      val dest = new Path(dir, s"v=${last + 1}")
      if (f.rename(tmp, dest)) last + 1
      else if (attempt + 1 < maxAttempts) commit(attempt + 1)
      else {
        f.delete(tmp, true)
        throw new java.io.IOException(
          s"versioned write: lost the commit race $maxAttempts times " +
            s"under $dir")
      }
    }
    commit(0)
  }

  /** Read a pinned version, or the latest when `version` is None.
    * Deletion-vector versions ([[softDelete]]) resolve transparently:
    * the base version is read and the chained deleted-key sets are
    * anti-joined (broadcast — DVs are delete-request-sized, never
    * data-sized).
    */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no versions under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    resolve(spark, dir, v, 0)
  }

  private def dvBaseFile(dir: String, v: Long) =
    new Path(new Path(dir, s"v=$v"), "_dv_base")

  /** (base version, key column) when v is a deletion-vector version. */
  private def dvInfo(spark: SparkSession, dir: String,
                     v: Long): Option[(Long, String)] = {
    val p = dvBaseFile(dir, v)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .next()
        finally in.close()
      val Array(b, k) = line.split("\t", 2)
      Some((b.toLong, k))
    }
  }

  private def resolve(spark: SparkSession, dir: String, v: Long,
                      depth: Int): DataFrame = {
    require(depth <= 64,
      s"deletion-vector chain deeper than 64 under $dir — compact")
    dvInfo(spark, dir, v) match {
      case None =>
        spark.read.parquet(new Path(dir, s"v=$v").toString)
      case Some((base, keyCol)) =>
        import org.apache.spark.sql.functions.broadcast
        val keys = spark.read.parquet(
          new Path(new Path(dir, s"v=$v"), "dv").toString)
        resolve(spark, dir, base, depth + 1)
          .join(broadcast(keys), Seq(keyCol), "left_anti")
    }
  }

  /** D12: merge-on-read delete (Delta deletion vectors / Iceberg
    * equality deletes reduced to essentials): publish a new version
    * that holds ONLY the deleted-key set plus a pointer to its base
    * version — at 100 TB a thousand-row delete must not rewrite the
    * table, and with immutable versions it must not touch the base
    * either. Readers resolve the chain transparently ([[read]]);
    * [[compact]] folds a long chain back into a full rewrite on YOUR
    * schedule, not the delete's. For GDPR-grade HARD erasure use
    * [[eraseKeys]] — a DV hides rows, the bytes remain until compact +
    * prune.
    *
    * Same commit protocol as [[write]]: staged under a writer-unique
    * temp dir, version assigned by rename CAS.
    */
  /** Resolve the caller's key frame to the single `keyCol` column —
    * BY NAME when present; a multi-column frame without it fails
    * loudly instead of silently deleting by whichever column happens
    * to be first (r9 ADVICE).
    */
  private def keyFrame(keys: DataFrame, keyCol: String): DataFrame =
    if (keys.columns.contains(keyCol)) keys.select(keyCol)
    else {
      require(keys.columns.length == 1,
        s"key frame columns [${keys.columns.mkString(",")}] contain no " +
          s"'$keyCol' — pass a single-column frame or name the key column")
      keys.select(keys.columns.head).toDF(keyCol)
    }

  def softDelete(spark: SparkSession, dir: String, keyCol: String,
                 keys: DataFrame, expectedParent: Option[Long] = None,
                 maxAttempts: Int = 5): Long = {
    require(maxAttempts >= 1)
    require(!keyCol.contains("\t"), "key column name cannot contain tab")
    val tmp = new Path(dir, s"__v_tmp_${java.util.UUID.randomUUID()}")
    keyFrame(keys, keyCol).distinct()
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(tmp, "dv").toString)
    val f = fs(spark, tmp)
    @scala.annotation.tailrec
    def commit(attempt: Int): Long = {
      val last = versions(spark, dir).lastOption.getOrElse(0L)
      require(last >= 1, s"softDelete: no base version under $dir")
      expectedParent.foreach { p =>
        if (last != p) {
          f.delete(tmp, true)
          throw new java.util.ConcurrentModificationException(
            s"softDelete: expected parent v=$p but latest is v=$last " +
              s"under $dir — re-derive and retry")
        }
      }
      // (re)point the DV at the CURRENT latest — a CAS loser must not
      // silently hide the racing writer's version behind a stale base
      val mp = new Path(tmp, "_dv_base")
      if (f.exists(mp)) f.delete(mp, false)
      val out = f.create(mp, false)
      try out.write(s"$last\t$keyCol".getBytes("UTF-8"))
      finally out.close()
      val dest = new Path(dir, s"v=${last + 1}")
      if (f.rename(tmp, dest)) last + 1
      else if (attempt + 1 < maxAttempts) commit(attempt + 1)
      else {
        f.delete(tmp, true)
        throw new java.io.IOException(
          s"softDelete: lost the commit race $maxAttempts times under " +
            dir)
      }
    }
    commit(0)
  }

  /** Fold the current view (base minus every chained deletion vector)
    * into one full version — the merge-on-read debt repayment.
    * @return the new full version number.
    */
  def compact(spark: SparkSession, dir: String): Long =
    write(read(spark, dir), dir)

  /** Drop all but the newest `keep` versions. Readers pinned to a
    * pruned version fail on their NEXT read — retention must exceed
    * the longest reader, same contract as Delta's VACUUM.
    */
  def prune(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    val vs = versions(spark, dir)
    val drop = vs.dropRight(keep)
    val kept = vs.takeRight(keep)
    // a surviving deletion-vector version must not lose its base:
    // refuse rather than leave an unreadable chain ([[compact]] first)
    kept.foreach { v =>
      dvInfo(spark, dir, v).foreach { case (base, _) =>
        require(!drop.contains(base),
          s"prune: surviving DV version v=$v references base v=$base " +
            s"which would be dropped — compact($dir) first")
      }
    }
    val f = fs(spark, new Path(dir))
    drop.foreach(v => f.delete(new Path(dir, s"v=$v"), true))
    drop
  }

  /** Right-to-erasure (GDPR art. 17): publish a new version with all
    * rows for `keys` removed, then prune history so erased rows no
    * longer exist in ANY readable version. Two deliberate properties:
    *
    *  - the delete is a broadcast anti join (keys are the erasure
    *    request — human-scale, never data-scale), so the rewrite is
    *    one full scan + write, the unavoidable minimum on immutable
    *    storage;
    *  - erasure is only complete once the old versions are GONE —
    *    publishing the filtered version alone still leaves the data
    *    time-travelable, so this method prunes to exactly the
    *    versions ≥ the erasure version unless `keepHistory` asks to
    *    defer (e.g. to let long readers drain first).
    *
    * @return (new version, rows removed)
    */
  def eraseKeys(spark: SparkSession, dir: String, keyCol: String,
                keys: DataFrame, keepHistory: Boolean = false): (Long, Long) = {
    import org.apache.spark.sql.functions.broadcast
    val cur = read(spark, dir)
    val before = cur.count()
    val next = cur.join(
      broadcast(keyFrame(keys, keyCol)),
      Seq(keyCol), "left_anti")
    val v = write(next, dir)
    val removed = before - read(spark, dir, Some(v)).count()
    if (!keepHistory) prune(spark, dir, keep = 1)
    (v, removed)
  }
}
