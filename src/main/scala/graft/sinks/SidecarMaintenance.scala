package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The index family's shared DELTA-COMMIT protocol: mutate a parquet
  * sidecar directory by ADDING a batch of new rows (written as fresh
  * parquet files, preserving any partition-directory layout) and
  * DELETING a named set of existing sidecar files — without ever
  * rewriting the untouched remainder. This is what makes persisted
  * index maintenance O(delta): a refresh appends the new corpus
  * files' rows and rewrites ONLY the sidecar files that carried a
  * vanished corpus file's rows ([[Purge]]'s minimal-rewrite
  * discipline, generalized from the data table to its sidecars — and
  * the same per-file-partial layout [[InvertedIndex]]'s
  * `_termstats`/`_doclen` pioneered).
  *
  * Crash contract (single-writer, the family's standing assumption —
  * same as the K2 merge swap and [[Purge]]):
  *  1. new rows are staged under `.maint-staging` (dot-prefixed, so
  *     readers of the sidecar never see them) and sealed with a
  *     commit marker;
  *  2. a JOURNAL listing the doomed files is written at the sidecar
  *     root (`_maint_journal`, underscore-prefixed — invisible to
  *     parquet reads);
  *  3. doomed files are deleted, staged files move in (file renames
  *     preserving their partition-relative paths), journal and
  *     staging vanish.
  * [[recover]] — called on entry by every maintenance operation —
  * finishes a journaled swap (marker present: deletes and moves are
  * idempotent) or rolls one back (no marker: originals are all still
  * in place, staging is garbage). Every crash point therefore lands
  * in exactly one of two states: the old sidecar, or the new one.
  * Readers racing a live swap can see a torn view for the duration
  * of step 3 only — the window the single-writer contract already
  * accepts; [[requireClean]] lets read paths refuse loudly when a
  * CRASHED (not racing) maintenance run left a journal behind.
  *
  * 100 TB posture: bytes written per commit = staged batch +
  * survivors of the doomed files. A refresh that appends 1 GB to a
  * 100 TB corpus writes ~1 GB of sidecar, whatever the corpus size —
  * the O(corpus) rewrite this protocol replaces is the difference
  * between "refresh per micro-batch" being a design and a disaster.
  * The cost shifted to: small sidecar files accumulate per commit —
  * [[compact]] repacks a partition-dir's accumulation through the
  * SAME journaled protocol, invoked periodically (streaming drivers
  * compact on a batch cadence).
  */
object SidecarMaintenance {

  private[graft] val CommitMarker = "_GRAFT_MAINT_COMMIT"
  private[graft] def stagingPath(dir: String) = new Path(dir, ".maint-staging")
  private[graft] def journalPath(dir: String) = new Path(dir, "_maint_journal")

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // partition directories may legitimately start with `_` (e.g.
  // `__cell=3`) — Spark's own hidden-path rule exempts names
  // containing `=`, and so must this walk
  private def visible(p: Path): Boolean = {
    val n = p.getName
    n.contains("=") || (!n.startsWith("_") && !n.startsWith("."))
  }

  /** Every visible data file under `dir`, any partition depth. */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fsFor(spark, dir)
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.filter(s => visible(s.getPath)).flatMap { s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s.getPath.toString)
      }
    walk(new Path(dir)).sorted
  }

  /** Add `newRows` (laid out under `partCols` directories) and drop
    * `doomed` (absolute sidecar file paths) as ONE recoverable
    * commit. Caller shapes `newRows`' partitioning/order (salting,
    * range-sort) before the call; rows must carry `partCols`. */
  def commitDelta(
      spark: SparkSession,
      dir: String,
      newRows: Option[DataFrame],
      doomed: Seq[String],
      partCols: Seq[String]): Unit = {
    if (newRows.isEmpty && doomed.isEmpty) return
    val fs = fsFor(spark, dir)
    val staging = stagingPath(dir)
    fs.delete(staging, true)
    newRows match {
      case Some(rows) =>
        val w = rows.write.mode(SaveMode.Overwrite)
        (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
          .parquet(staging.toString)
      case None => fs.mkdirs(staging)
    }
    fs.create(new Path(staging, CommitMarker)).close()
    val out = fs.create(journalPath(dir))
    out.write(doomed.mkString("\n").getBytes("UTF-8"))
    out.close()
    finishSwap(fs, dir)
  }

  /** Completes or rolls back an interrupted [[commitDelta]] — the
    * [[Purge.recover]] contract on a sidecar dir. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = fsFor(spark, dir)
    if (!fs.exists(new Path(dir))) return
    val journal = journalPath(dir)
    val staging = stagingPath(dir)
    if (fs.exists(journal)) {
      if (fs.exists(new Path(staging, CommitMarker))) finishSwap(fs, dir)
      else { fs.delete(staging, true); fs.delete(journal, false) }
    } else if (fs.exists(staging)) {
      fs.delete(staging, true)
    }
  }

  /** Read paths' loud-failure guard: a journal with no live writer
    * means a maintenance run crashed mid-swap and the sidecar may be
    * torn — refuse rather than serve partial rows. */
  def requireClean(spark: SparkSession, dir: String): Unit =
    require(!fsFor(spark, dir).exists(journalPath(dir)),
      s"interrupted maintenance journal at ${journalPath(dir)} — " +
        "run refresh (or recover) before querying")

  /** Repack the sidecar's per-commit file accumulation: rewrite the
    * WHOLE current content (shaped by `layout`, e.g. coalesced per
    * partition) through the same journaled commit. O(sidecar) by
    * design — the periodic amortizer for [[commitDelta]]'s
    * small-file growth, not the per-refresh path. */
  def compact(
      spark: SparkSession,
      dir: String,
      partCols: Seq[String])(
      layout: DataFrame => DataFrame): Unit = {
    recover(spark, dir)
    val files = dataFiles(spark, dir)
    if (files.isEmpty) return
    val all = spark.read.option("basePath", dir).parquet(files: _*)
    commitDelta(spark, dir, Some(layout(all)), files, partCols)
  }

  private def finishSwap(fs: FileSystem, dir: String): Unit = {
    val journal = journalPath(dir)
    val staging = stagingPath(dir)
    val in = fs.open(journal)
    val doomed = scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\n").filter(_.nonEmpty)
    in.close()
    doomed.foreach { f =>
      val p = new Path(f)
      if (fs.exists(p)) fs.delete(p, false)
    }
    // move staged data files in, preserving partition-relative paths
    // (part-file names carry per-job UUIDs, so cross-commit
    // collisions cannot happen; move-if-absent makes replay a no-op)
    def move(p: Path, rel: Seq[String]): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (visible(st.getPath)) {
          if (st.isDirectory) move(st.getPath, rel :+ name)
          else {
            val destDir = rel.foldLeft(new Path(dir))(new Path(_, _))
            fs.mkdirs(destDir)
            val dest = new Path(destDir, name)
            if (!fs.exists(dest)) fs.rename(st.getPath, dest)
          }
        }
      }
    move(staging, Seq.empty)
    fs.delete(journal, false)
    fs.delete(staging, true)
  }
}
