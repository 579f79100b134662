package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Cross-table atomic commit: N staged table versions become visible
  * all-or-nothing. The single-table K2 swap ([[MergeUpsert]]) keeps
  * ONE table crash-consistent; pipelines routinely move several
  * stores in one logical step — a fact table and its maintained
  * aggregate state, a split written as clean + quarantine, a promote
  * touching two zones — where a crash between per-table swaps would
  * leave readers a MIXED version set. This is the lake-level analogue
  * of a multi-table transaction log commit (what Delta/Iceberg do
  * inside one table's log, lifted across tables), built from the same
  * primitives the engine already trusts: parquet `_SUCCESS` write
  * commitment, atomic rename, atomic marker-file create.
  *
  * Protocol (journaled two-phase):
  *
  *  1. PREPARE — every result writes to `<table>__txstage`
  *     (overwrite; `_SUCCESS` marks each staging complete). Nothing
  *     visible changes; a crash here leaves only dead stagings.
  *  2. COMMIT POINT — the table list is journaled at
  *     `<journalDir>/txn.journal`, then `<journalDir>/txn.commit` is
  *     created. The marker create is the atomic instant: before it
  *     the transaction rolls back, after it it rolls forward.
  *  3. APPLY — per table: live → `<table>__txprev`, staging → live.
  *  4. CLEANUP — prev dirs and the journal are removed.
  *
  * [[recover]] (idempotent; also run at the head of every
  * [[commitAll]]) heals any predecessor: journal without marker →
  * restore every table from its prev if needed and delete stagings;
  * journal with marker → finish every unfinished swap. Per-table
  * crash states mirror the single-table `recoverSwap` reasoning —
  * each table is in exactly one of (not started | between renames |
  * done), and each case has one safe move.
  *
  * Readers see the same brief per-table unavailability window the
  * single-table swap has (a rename pair), but never a committed
  * partial SET of tables. Writers must serialize externally (one
  * committer per journalDir) — same contract as every sink here.
  *
  * FILESYSTEM CONTRACT: the protocol's atomicity rests on atomic
  * directory rename and atomic marker-file create, i.e. HDFS-like
  * semantics (HDFS, local FS, Azure ABFS). On object stores whose
  * "rename" is copy+delete (plain S3/GCS), the three clean per-table
  * crash states stop being the only reachable states and the
  * recovery reasoning does not hold — run the journal and tables on
  * a rename-atomic store (or an atomic layer like S3+EMRFS-consistent
  * views / a table format) there. Every table must also live on the
  * SAME filesystem as the journal — renames cannot cross
  * filesystems — which [[commitAll]] and [[recover]] enforce by URI.
  */
object TxnCommit {

  private val StageSuffix = "__txstage"
  private val PrevSuffix = "__txprev"

  private def journalPath(dir: String) = new Path(dir, "txn.journal")
  private def markerPath(dir: String) = new Path(dir, "txn.commit")

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Renames cannot cross filesystems, and the commit-point ordering
    * only means something when journal and tables share one: resolve
    * every table's filesystem and require it IS the journal's. */
  private def requireOneFilesystem(
      spark: SparkSession,
      journalFs: FileSystem,
      journalDir: String,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      val tfs = fsOf(spark, t)
      require(tfs.getUri == journalFs.getUri,
        s"txn table $t resolves to filesystem ${tfs.getUri}, but the " +
          s"journal at $journalDir is on ${journalFs.getUri} — the " +
          "two-phase swap's renames must all run on ONE rename-atomic " +
          "filesystem")
    }

  /** Writes every (result, tablePath) pair and swaps them in
    * all-or-nothing. `journalDir` must be stable across runs — it is
    * where a successor finds the evidence to heal a crash. */
  def commitAll(
      spark: SparkSession,
      staged: Seq[(DataFrame, String)],
      journalDir: String): Unit = {
    require(staged.nonEmpty, "commitAll needs at least one table")
    require(staged.map(_._2).distinct.length == staged.length,
      "commitAll: duplicate table path in one transaction")
    recover(spark, journalDir)
    val fs = fsOf(spark, journalDir)
    requireOneFilesystem(spark, fs, journalDir, staged.map(_._2))

    // PREPARE: all stagings complete before anything becomes visible
    staged.foreach { case (df, table) =>
      val st = new Path(table + StageSuffix)
      if (fs.exists(st)) fs.delete(st, true)
      df.write.mode(SaveMode.Overwrite).parquet(st.toString)
    }

    // COMMIT POINT
    fs.mkdirs(new Path(journalDir))
    val j = fs.create(journalPath(journalDir), true)
    try j.write(staged.map(_._2).mkString("\n").getBytes("UTF-8"))
    finally j.close()
    fs.create(markerPath(journalDir), false).close()

    applyForward(fs, staged.map(_._2))
    fs.delete(markerPath(journalDir), false)
    fs.delete(journalPath(journalDir), false)
  }

  /** Rolls every table to its staged version; idempotent per table
    * (the three states of the rename pair each have one safe move). */
  private def applyForward(fs: FileSystem, tables: Seq[String]): Unit = {
    tables.foreach { table =>
      val target = new Path(table)
      val st = new Path(table + StageSuffix)
      val prev = new Path(table + PrevSuffix)
      def stagedCommitted = fs.exists(new Path(st, "_SUCCESS"))
      if (fs.exists(st) && stagedCommitted) {
        if (fs.exists(target)) {
          if (fs.exists(prev)) fs.delete(prev, true)
          if (!fs.rename(target, prev))
            sys.error(s"txn apply failed: could not move $target aside")
        }
        if (!fs.rename(st, target))
          sys.error(s"txn apply failed: could not promote $st")
      }
      // st absent (or uncommitted debris) with target present: this
      // table's swap already finished in a prior attempt
      if (fs.exists(prev)) fs.delete(prev, true)
    }
  }

  /** Heals a crashed transaction at `journalDir`: no journal → no-op;
    * journal without the commit marker → ROLL BACK (every table
    * restored from its prev if its swap had started, stagings
    * dropped); journal + marker → ROLL FORWARD (finish every swap).
    * Safe to call any number of times. */
  def recover(spark: SparkSession, journalDir: String): Unit = {
    val fs = fsOf(spark, journalDir)
    val jp = journalPath(journalDir)
    if (!fs.exists(jp)) return
    val in = fs.open(jp)
    val tables =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    requireOneFilesystem(spark, fs, journalDir, tables)
    if (fs.exists(markerPath(journalDir))) {
      applyForward(fs, tables)
      fs.delete(markerPath(journalDir), false)
    } else {
      tables.foreach { table =>
        val target = new Path(table)
        val st = new Path(table + StageSuffix)
        val prev = new Path(table + PrevSuffix)
        if (!fs.exists(target) && fs.exists(prev)) {
          if (!fs.rename(prev, target))
            sys.error(s"txn rollback failed: could not restore $prev")
        }
        if (fs.exists(st)) fs.delete(st, true)
        if (fs.exists(prev)) fs.delete(prev, true)
      }
    }
    fs.delete(jp, false)
    ()
  }
}
