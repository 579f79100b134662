package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
    // journal BEFORE marker: the journal write is multi-byte and not
    // atomic, so it must land while a crash still rolls BACK (no
    // marker → recover discards staging+journal, originals intact).
    // The marker create — an atomic empty-file create — is the one
    // and only commit point; after it, recover rolls FORWARD off a
    // journal that is known complete.
    val out = fs.create(journalPath(dir))
    out.write(doomed.mkString("\n").getBytes("UTF-8"))
    out.close()
    fs.create(new Path(staging, CommitMarker)).close()
    finishSwap(fs, dir)
  }

  /** A refresh's file-set arithmetic, shared by every index family
    * member (IVF cells, LSH buckets, PQ codes, inverted postings,
    * retrieval stats): which corpus files the sidecar covers, which
    * SIDECAR files carry each (the rewrite-targeting map), diffed
    * against the corpus' current file set. Built by [[planDelta]]
    * in one column-pruned pass; consumed by [[applyDelta]]. */
  final case class DeltaPlan(
      pairs: Array[(String, String)],
      vanished: Set[String],
      fresh: Seq[String]) {
    def isEmpty: Boolean = fresh.isEmpty && vanished.isEmpty
    /** Sidecar files that carry a vanished corpus file's rows — the
      * ONLY sidecar files the delta rewrites. */
    def doomed: Seq[String] =
      pairs.filter(p => vanished(p._1)).map(_._2).distinct.sorted
  }

  /** Heals any interrupted commit, then plans the delta between the
    * sidecar's covered file set and `current`. The coverage map
    * comes from the `_coverage` cache when it verifies against the
    * directory's actual file set (a file-count-sized driver read —
    * no corpus-scaled scan), else from one column-pruned scan. */
  def planDelta(
      spark: SparkSession,
      dir: String,
      current: Set[String]): DeltaPlan = {
    recover(spark, dir)
    val pairs = readCoverage(spark, dir).getOrElse {
      // heal LAZILY: bootstrap and compaction don't pay an extra
      // scan — the first refresh after them does this one fallback
      // scan and every refresh from then on plans for free
      val scanned = scanPairs(spark, dir)
      writeCoverage(spark, dir, scanned)
      scanned
    }
    val indexed = pairs.map(_._1).toSet
    DeltaPlan(pairs, indexed -- current, (current -- indexed).toSeq.sorted)
  }

  // ── coverage cache ──────────────────────────────────────────────
  // planDelta's (corpus file → sidecar file) map, persisted at the
  // sidecar root so a refresh PLANS from a file-count-sized read
  // instead of scanning the sidecar's `file` column (O(rows) — the
  // last corpus-scaled read on the maintenance path). STRICTLY a
  // cache, never truth: it is trusted only when its recorded sidecar
  // file set matches the directory's actual data files, so any crash
  // point, torn write, bootstrap/compaction rewrite, or out-of-band
  // change fails the check and planDelta falls back to the scan —
  // healing the cache in place, so only the FIRST plan after such an
  // event pays the scan (delta-commits advance it incrementally).
  // Correctness never depends on it.

  private[graft] def coveragePath(dir: String) = new Path(dir, "_coverage")

  private def relPath(dir: String, f: String): String = {
    val base = new Path(dir).toUri.getPath.stripSuffix("/")
    new Path(f).toUri.getPath.stripPrefix(base).stripPrefix("/")
  }

  private def scanPairs(
      spark: SparkSession, dir: String): Array[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select(col("file"), col("_metadata.file_path").as("__sfile"))
      .distinct().as[(String, String)].collect()
  }

  // In-JVM memo of the LAST coverage written or read per sidecar
  // dir, keyed by the sidecar file-set signature it describes. A
  // streaming driver refreshing every micro-batch then validates
  // with ONE directory listing instead of re-reading and re-parsing
  // the corpus-file-count-sized manifest each batch. Safe under any
  // writer topology: a signature mismatch (another process moved the
  // sidecar) just misses and falls through to the manifest/scan.
  private val covMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (Set[String], Array[(String, String)])]()

  /** Test hook: simulate a fresh driver JVM (memo empty, only the
    * on-disk manifest to go on). */
  private[graft] def clearCoverageMemo(): Unit = covMemo.clear()

  private def readCoverage(
      spark: SparkSession, dir: String): Option[Array[(String, String)]] = {
    val actual = dataFiles(spark, dir).map(relPath(dir, _)).toSet
    val memo = covMemo.get(dir)
    if (memo != null && memo._1 == actual) return Some(memo._2)
    val fs = fsFor(spark, dir)
    val p = coveragePath(dir)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val pairs = txt.split("\n").filter(_.nonEmpty).flatMap { line =>
      line.split("\t") match {
        case Array(corpus, sfile) => Some(corpus -> sfile)
        case _ => None // torn line — the set check below rejects
      }
    }
    if (pairs.map(p => relPath(dir, p._2)).toSet == actual) {
      covMemo.put(dir, (actual, pairs))
      Some(pairs)
    } else None
  }

  private def writeCoverage(
      spark: SparkSession, dir: String,
      pairs: Array[(String, String)]): Unit = {
    val fs = fsFor(spark, dir)
    val tmp = new Path(dir, "._coverage.tmp")
    val out = fs.create(tmp, true)
    out.write(pairs.map(p => p._1 + "\t" + p._2).mkString("\n")
      .getBytes("UTF-8"))
    out.close()
    fs.delete(coveragePath(dir), false)
    if (fs.rename(tmp, coveragePath(dir)))
      covMemo.put(dir,
        (pairs.map(p => relPath(dir, p._2)).toSet, pairs))
    else fs.delete(tmp, false)
  }


  /** The sidecar rows the delta KEEPS (everything but vanished
    * files' rows) — what pre-mutation layout guards check the fresh
    * rows against. */
  def keptRows(spark: SparkSession, dir: String, plan: DeltaPlan): DataFrame = {
    import spark.implicits._
    spark.read.parquet(dir).join(
      broadcast(plan.vanished.toSeq.toDF("file")), Seq("file"), "left_anti")
  }

  /** Executes a [[planDelta]]: survivor rows of the doomed sidecar
    * files (read by explicit path list — delta-sized, never the
    * whole sidecar) union the caller's fresh rows, shaped by
    * `layout`, and commit with the doomed deletions as ONE
    * recoverable delta. No-op on an empty plan. */
  def applyDelta(
      spark: SparkSession,
      dir: String,
      plan: DeltaPlan,
      freshRows: Option[DataFrame],
      partCols: Seq[String],
      layout: DataFrame => DataFrame): Unit = {
    import spark.implicits._
    if (plan.isEmpty) return
    val doomed = plan.doomed
    val survivors =
      if (doomed.isEmpty) None
      else Some(spark.read.option("basePath", dir).parquet(doomed: _*)
        .join(broadcast(plan.vanished.toSeq.toDF("file")),
          Seq("file"), "left_anti"))
    val newRows = (survivors.toSeq ++ freshRows.toSeq)
      .reduceOption(_.unionByName(_)).map(layout)
    commitDelta(spark, dir, newRows, doomed, partCols)
    // advance the coverage cache: untouched sidecar files keep their
    // pairs; only the files this commit created are scanned
    // (delta-sized). A crash before this line just leaves the cache
    // stale — the next planDelta detects that and falls back.
    val doomedRel = doomed.map(relPath(dir, _)).toSet
    val untouched = plan.pairs.filterNot(p => doomedRel(relPath(dir, p._2)))
    val untouchedRel = untouched.map(p => relPath(dir, p._2)).toSet
    val created = dataFiles(spark, dir)
      .filterNot(f => untouchedRel(relPath(dir, f)))
    val createdPairs =
      if (created.isEmpty) Array.empty[(String, String)]
      else spark.read.option("basePath", dir).parquet(created: _*)
        .select(col("file"), col("_metadata.file_path").as("__sfile"))
        .distinct().as[(String, String)].collect()
    writeCoverage(spark, dir, untouched ++ createdPairs)
  }

  /** Spread a partition-dir write across `writeSalt` tasks PER
    * partition value while keeping the `part=` directory layout —
    * without the salt, write parallelism is capped at the
    * partition-value count (nCells / 2^planes tasks). */
  private[sinks] def saltedByPartition(
      rows: DataFrame,
      partCol: String,
      cols: Seq[String],
      writeSalt: Int,
      saltCol: String = "vec_id"): DataFrame = {
    val sel = rows.select(cols.map(col): _*)
    val parts =
      if (writeSalt <= 1) sel.repartition(col(partCol))
      else sel.repartition( // explicit count — AQE must not re-coalesce
        sel.sparkSession.sessionState.conf.numShufflePartitions,
        col(partCol), pmod(xxhash64(col(saltCol)), lit(writeSalt.toLong)))
    // id-sorted within each written file so parquet row-group stats
    // stay tight on the id column even after compaction repacks many
    // batches — the refresh guard's kept-side range filter prunes on
    // those stats. partCol leads the sort: the partitionBy writer
    // requires partition-column order and would otherwise re-sort,
    // discarding the id order.
    parts.sortWithinPartitions(col(partCol), col(saltCol))
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
