package graft.sinks

import graft.core.LakeStorage
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** K1 — parquet append to WORK (reference
  * `shared_etls/etls/cloud_utils.py:438-475`). Plain append-mode
  * parquet write; failures surface (the reference wraps in
  * try/raise ValueError — we let the Spark exception propagate).
  */
object ParquetAppend {
  def write(df: DataFrame, workPath: String): Unit =
    df.write.mode(SaveMode.Append).parquet(workPath)

  /** Hive-style partitioned append (SURVEY.md §4: optional WORK
    * layout) — downstream reads that filter on the partition columns
    * (the promote incremental path, the P5 recovery probe) then
    * prune directories instead of scanning the zone. */
  def writePartitioned(df: DataFrame, workPath: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*).parquet(workPath)
}

/** K2 — MERGE into TRUSTED (reference `cloud_utils.py:478-532`):
  * Delta-style `lake.sk = df.sk` upsert —
  * `.whenMatchedUpdateAll().whenNotMatchedInsertAll()`.
  *
  * No Delta jar ships in this environment, so the merge is realized
  * as `trusted ANTI-JOIN updates ON sk  UNION ALL  updates`, written
  * atomically (write-new-then-swap): matched rows are fully replaced
  * by the update row, unmatched trusted rows survive, new rows
  * insert. Precondition (guaranteed by T4 upstream): `updates` has
  * unique sk.
  *
  * Scale posture (100 TB): the only shuffle is the anti-join on sk.
  * By default no join hint is given — AQE picks a broadcast anti-join
  * at runtime when the update batch is small (the common incremental
  * case: shuffle-free map-side filter over the trusted scan) and a
  * shuffled hash join when it isn't (a full-resync promote where
  * `updates` IS the dataset — force-broadcasting that would OOM the
  * cluster). Set `broadcastUpdates = true` only when the caller
  * KNOWS the batch is small and wants to skip AQE's first shuffle.
  */
object MergeUpsert {

  /** Pure merge semantics on DataFrames (oracle-testable). */
  def merged(
      trusted: DataFrame,
      updates: DataFrame,
      key: String = "sk",
      broadcastUpdates: Boolean = false): DataFrame = {
    val upd = if (broadcastUpdates) broadcast(updates) else updates
    trusted
      .join(upd.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
  }

  /** Schema-evolution merge: like [[merged]], but the sides may
    * disagree on columns. The output schema is the union — trusted's
    * columns in their order, then updates-only columns appended in
    * update order — with the missing side filled by typed NULLs:
    * rows not in this batch get NULL for a newly-added column, and a
    * batch that predates a column upserts NULL into it. Columns
    * EVOLVE by addition only: a column present on both sides must
    * have the identical type — silent coercion on a 100 TB table is
    * how upstream type drift corrupts years of data, so type change
    * is a loud error, never a cast.
    *
    * The widening is a projection on each side (zero extra shuffles
    * — the plan under it is exactly [[merged]]'s anti-join). */
  def mergedEvolved(
      trusted: DataFrame,
      updates: DataFrame,
      key: String = "sk",
      broadcastUpdates: Boolean = false): DataFrame = {
    require(trusted.columns.contains(key) && updates.columns.contains(key),
      s"merge key $key must exist on both sides")
    trusted.schema.filter(f => updates.columns.contains(f.name)).foreach { f =>
      val u = updates.schema(f.name).dataType
      require(u == f.dataType,
        s"column ${f.name}: trusted ${f.dataType.simpleString} vs updates " +
          s"${u.simpleString} — schema evolution adds columns, never changes types")
    }
    val added = updates.schema.filterNot(f => trusted.columns.contains(f.name))
    val widenedTrusted = added.foldLeft(trusted)((df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType)))
    val missing = trusted.schema.filterNot(f => updates.columns.contains(f.name))
    val widenedUpdates = missing.foldLeft(updates)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
      .select(widenedTrusted.columns.toIndexedSeq.map(col): _*)
    merged(widenedTrusted, widenedUpdates, key, broadcastUpdates)
  }

  /** Partition-aware K2 for a hive-partitioned TRUSTED table: only
    * the partitions an update batch actually touches are read,
    * merged, and swapped — the rest of the table is never scanned or
    * rewritten. This is the difference between an O(batch) and an
    * O(table) merge at 100 TB: a daily upsert touching 3 of 3000
    * date-partitions does 0.1% of the full-rewrite work.
    *
    * Protocol: compute the merged rows for the affected partitions
    * into `<trusted>__staging/<part>=v/…`, then swap each affected
    * partition directory (rename-aside, promote, drop old) — the same
    * crash-recoverable two-rename dance as the whole-table path,
    * applied per partition. Unaffected partition directories are
    * untouched (their files keep their identity).
    *
    * Precondition: rows never move between partitions on update
    * (the partition column is part of the row identity) — same
    * assumption hive-style partitioned upserts make everywhere.
    */
  def mergeIntoPartitioned(
      spark: SparkSession,
      trustedPath: String,
      updates: DataFrame,
      key: String = "sk",
      partitionCol: String = "part",
      zorderBy: Seq[String] = Nil,
      zorderFiles: Int = 0): Unit = {
    val storage = LakeStorage(spark)
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(trustedPath + "__staging")
    // Aside-copies live in a SIBLING root, never inside the table —
    // a leftover inside the table directory would be discovered as a
    // bogus partition by every subsequent read.
    val prevRoot = new Path(trustedPath + "__prev")

    recoverPartitionSwap(fs, new Path(trustedPath), staging, prevRoot)

    if (!storage.exists(trustedPath)) {
      clusteredForPartitions(updates, partitionCol, zorderBy, zorderFiles)
        .write.partitionBy(partitionCol).parquet(trustedPath)
      return
    }

    val affected = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    require(!affected.contains(null),
      s"null $partitionCol in update batch: partitioned merge requires non-null partition values")
    if (affected.isEmpty) return

    val trustedAffected = spark.read.parquet(trustedPath)
      .where(col(partitionCol).isin(affected: _*)) // partition pruning
    val mergedRows = merged(trustedAffected, updates, key)
    stageAndSwapPartitions(spark, trustedPath, mergedRows, affected,
      partitionCol, zorderBy, zorderFiles)
  }

  /** Delete-aware partition-bound apply: [[appliedChanges]] scoped to
    * only the partitions the change batch touches — the composition
    * of the CDC apply with the O(batch)-not-O(table) discipline of
    * [[mergeIntoPartitioned]]. At 100 TB this is the operator a
    * change-log consumer actually runs: a daily log touching 3 of
    * 3000 date-partitions reads, rewrites, and swaps 0.1% of the
    * table; deletes land because the anti-join removes every touched
    * key before surviving upserts union back in.
    *
    * Preconditions: change payload carries `partitionCol`, rows never
    * move between partitions (a 'D' must carry the partition the key
    * lives in — it addresses the row), and the payload schema matches
    * the table. Bootstrapping applies the log to an empty side, so
    * winning deletes simply don't land. */
  def applyChangesIntoPartitioned(
      spark: SparkSession,
      trustedPath: String,
      changes: DataFrame,
      key: String = "sk",
      seqCols: Seq[String] = Seq("seq"),
      opCol: String = "op",
      partitionCol: String = "part"): Unit = {
    val storage = LakeStorage(spark)
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(trustedPath + "__staging")
    val prevRoot = new Path(trustedPath + "__prev")
    recoverPartitionSwap(fs, new Path(trustedPath), staging, prevRoot)

    if (!storage.exists(trustedPath)) {
      val payload = changes.drop((opCol +: seqCols): _*)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payload.schema)
      appliedChanges(empty, changes, key, seqCols, opCol)
        .write.partitionBy(partitionCol).parquet(trustedPath)
      return
    }

    val affected = changes.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    require(!affected.contains(null),
      s"null $partitionCol in change batch: partitioned apply requires non-null partition values")
    if (affected.isEmpty) return

    val trustedAffected = spark.read.parquet(trustedPath)
      .where(col(partitionCol).isin(affected: _*)) // partition pruning
    val applied = appliedChanges(trustedAffected, changes, key, seqCols, opCol)
    stageAndSwapPartitions(spark, trustedPath, applied, affected,
      partitionCol, Nil, 0)
  }

  private def clusteredForPartitions(
      rows: DataFrame,
      partitionCol: String,
      zorderBy: Seq[String],
      zorderFiles: Int): DataFrame =
    if (zorderBy.isEmpty) rows
    else {
      val n =
        if (zorderFiles > 0) zorderFiles
        else rows.sparkSession.sessionState.conf.numShufflePartitions
      ZOrder.clusterPartitioned(rows, partitionCol, zorderBy, n)
    }

  /** Shared tail of the partition-scoped writers: stage the computed
    * rows hive-partitioned (optionally z-clustered within each
    * partition), then swap each affected partition directory via the
    * crash-recoverable rename dance. */
  private def stageAndSwapPartitions(
      spark: SparkSession,
      trustedPath: String,
      rows: DataFrame,
      affected: Seq[Any],
      partitionCol: String,
      zorderBy: Seq[String],
      zorderFiles: Int): Unit = {
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(trustedPath + "__staging")
    val prevRoot = new Path(trustedPath + "__prev")

    if (fs.exists(staging)) fs.delete(staging, true)
    clusteredForPartitions(rows, partitionCol, zorderBy, zorderFiles)
      .write.partitionBy(partitionCol).parquet(staging.toString)

    if (fs.exists(prevRoot)) fs.delete(prevRoot, true)
    fs.mkdirs(prevRoot)
    affected.foreach { v =>
      // Hive-escapes the value exactly as the parquet writer did —
      // spaces/colons/slashes in partition values map to %xx on disk.
      val dir = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partitionCol, v.toString)
      val src = new Path(staging, dir)
      val dst = new Path(trustedPath, dir)
      val prev = new Path(prevRoot, dir)
      if (fs.exists(dst) && !fs.rename(dst, prev))
        sys.error(s"partition swap failed: could not move $dst aside")
      if (fs.exists(src)) {
        if (!fs.rename(src, dst))
          sys.error(s"partition swap failed: could not promote $src")
      }
      // else: the batch emptied this partition (delete-only winners) —
      // moving the old directory aside IS the apply; a crash before
      // the aside root drops restores it, and re-running the batch
      // re-empties it (at-least-once on the batch, same as every swap)
    }
    fs.delete(prevRoot, true)
    fs.delete(staging, true)
    ()
  }

  /** Crash recovery for the per-partition swap: any partition present
    * in the aside root but missing from the table is restored; then
    * leftover staging/aside roots are dropped. (A partition present
    * in BOTH places means the promote completed — the aside copy is
    * stale and deleted with its root.) */
  private[sinks] def recoverPartitionSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      target: Path, staging: Path, prevRoot: Path): Unit = {
    if (fs.exists(prevRoot)) {
      fs.listStatus(prevRoot).foreach { st =>
        val dst = new Path(target, st.getPath.getName)
        if (!fs.exists(dst)) {
          if (!fs.rename(st.getPath, dst))
            sys.error(s"partition recovery failed: could not restore ${st.getPath}")
        }
      }
      fs.delete(prevRoot, true)
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    ()
  }

  /** Suffix infix for retained pre-merge snapshots:
    * `<trusted>__prev_<epochMillis>`. Like `__staging`/`__prev`, these
    * are SIBLINGS of the table directory, never inside it. */
  val PrevSnapshotInfix = "__prev_"

  /** Full K2: read trusted (if present), merge, write-new-then-swap.
    *
    * Atomicity protocol (SURVEY.md §7.5 #3): write the merged result
    * to `<trusted>__staging`, then swap via two renames with the old
    * data preserved at `<trusted>__prev` until the swap completes.
    * Every call starts with [[recoverSwap]], which finishes or rolls
    * back an interrupted swap — so a crash at any rename boundary
    * leaves the table recoverable and the NEXT merge sees a complete
    * table, never an empty target that would make it mistake the
    * update batch for the whole dataset.
    *
    * Retention (reference `cloud_utils.py:523`,
    * `delta_retention_hours=72`): with `retainPrevHours` set, the
    * pre-merge table survives the swap as a timestamped
    * `<trusted>__prev_<millis>` snapshot instead of being deleted —
    * a rollback window after a bad merge ([[rollbackToPrev]]).
    * Snapshots older than the window are GC'd at the start of the
    * next retained merge. A crash between the promote and the
    * snapshot rename loses only that one snapshot (recovery deletes
    * a stale `__prev` once the target exists) — never table data.
    *
    * `evolveSchema=true` routes through [[mergedEvolved]]: an update
    * batch may carry new columns (table widens, absent rows NULL) or
    * miss recent ones (NULL upserted) — type changes still reject.
    *
    * `zorderBy` clusters the merged table along the z-curve over the
    * given columns INSIDE the staging write the merge already pays
    * for — one extra range exchange + sort on the z-value, never a
    * second full rewrite (running [[Compaction.compactWork]] after
    * the swap would read and write the table twice). The swap
    * protocol is unchanged, so the maintained layout is exactly as
    * crash-recoverable as the unclustered one. At 100 TB this is how
    * TRUSTED stays queryable as it grows: every merge re-tightens
    * the parquet footer ranges on the query columns, and point/range
    * predicates on ANY clustered column keep skipping most files
    * ([[ZOrder]] doc for the stats math). `zorderFiles` caps the
    * output file count; 0 derives it from the session's shuffle
    * parallelism.
    */
  def mergeInto(
      spark: SparkSession,
      trustedPath: String,
      updates: DataFrame,
      key: String = "sk",
      broadcastUpdates: Boolean = false,
      retainPrevHours: Option[Double] = None,
      evolveSchema: Boolean = false,
      zorderBy: Seq[String] = Nil,
      zorderFiles: Int = 0): Unit = {
    val storage = LakeStorage(spark)
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(trustedPath + "__staging")
    val prev = new Path(trustedPath + "__prev")
    val target = new Path(trustedPath)

    recoverSwap(fs, target, staging, prev)
    retainPrevHours.foreach(gcPrevSnapshots(fs, trustedPath, _))

    val result =
      if (storage.exists(trustedPath)) {
        val trusted = spark.read.parquet(trustedPath)
        if (evolveSchema) mergedEvolved(trusted, updates, key, broadcastUpdates)
        else merged(trusted, updates, key, broadcastUpdates)
      } else updates

    writeAndSwap(fs, trustedPath, result, retainPrevHours, zorderBy, zorderFiles)
  }

  /** Delete-aware merge semantics: fold an ordered I/U/D change log
    * ([[graft.operators.Cdc.latestPerKey]] — each key's LAST change
    * wins), then apply the winners to `trusted`: a winning 'D'
    * removes the key, a winning I/U replaces its row, untouched
    * trusted rows survive. The read direction of K2 extended with
    * the delete semantics [[merged]] can't express — `changes` here
    * is exactly what [[graft.operators.Cdc.changeFeed]] emits (plus
    * a sequence column), so a table is replicable from another
    * table's feeds.
    *
    * Same plan shape as [[merged]] plus the fold's one key shuffle:
    * the anti-join is on ALL touched keys (delete AND upsert
    * winners — one join, not two), then surviving upsert payloads
    * union in.
    */
  def appliedChanges(
      trusted: DataFrame,
      changes: DataFrame,
      key: String = "sk",
      seqCols: Seq[String] = Seq("seq"),
      opCol: String = "op"): DataFrame = {
    val latest = graft.operators.Cdc.latestPerKey(changes, Seq(key), seqCols)
    val upserts = latest.where(col(opCol) =!= "D").drop((opCol +: seqCols): _*)
    trusted
      .join(latest.select(col(key)), Seq(key), "left_anti")
      .unionByName(upserts)
  }

  /** [[appliedChanges]] against the stored TRUSTED table, behind the
    * identical staging/swap/retention discipline as [[mergeInto]].
    * Bootstrapping (no table yet) applies the log to an empty
    * trusted side: winners that are deletes simply don't land.
    * Change payload schema must match the table (schema evolution is
    * [[mergeInto]]'s `evolveSchema` concern; a changelog that also
    * evolves schema should bootstrap through that path first).
    */
  def applyChangesInto(
      spark: SparkSession,
      trustedPath: String,
      changes: DataFrame,
      key: String = "sk",
      seqCols: Seq[String] = Seq("seq"),
      opCol: String = "op",
      retainPrevHours: Option[Double] = None): Unit = {
    val storage = LakeStorage(spark)
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, new Path(trustedPath),
      new Path(trustedPath + "__staging"), new Path(trustedPath + "__prev"))
    retainPrevHours.foreach(gcPrevSnapshots(fs, trustedPath, _))

    // change payload schema == table schema by contract (scaladoc
    // above), so the table read takes it EXPLICITLY (top-level
    // nullable, what a parquet round trip reports) — this is the
    // per-micro-batch hot path of the streaming CDC apply, and the
    // schema-inference job the bare read pays per batch is pure
    // overhead (guide §5: no driver-side jobs for known metadata)
    val payload = changes.drop((opCol +: seqCols): _*)
    val tableSchema = ParquetMemo.nullableTop(payload.schema)
    val trusted =
      if (storage.exists(trustedPath))
        spark.read.schema(tableSchema).parquet(trustedPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payload.schema)
    writeAndSwap(fs, trustedPath,
      appliedChanges(trusted, changes, key, seqCols, opCol), retainPrevHours)
  }

  /** The K2 commit protocol: overwrite staging, rename the live
    * table aside, promote staging, then drop or snapshot the old
    * table per retention. Crash-recoverable on either side of the
    * promote via [[recoverSwap]] at the next writer's entry. */
  private def writeAndSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      trustedPath: String,
      result: DataFrame,
      retainPrevHours: Option[Double],
      zorderBy: Seq[String] = Nil,
      zorderFiles: Int = 0): Unit = {
    val staging = new Path(trustedPath + "__staging")
    val prev = new Path(trustedPath + "__prev")
    val target = new Path(trustedPath)

    val toWrite =
      if (zorderBy.isEmpty) result
      else {
        val n =
          if (zorderFiles > 0) zorderFiles
          else result.sparkSession.sessionState.conf.numShufflePartitions
        ZOrder.cluster(result, zorderBy, n)
      }
    if (fs.exists(staging)) fs.delete(staging, true)
    toWrite.write.mode(SaveMode.Overwrite).parquet(staging.toString)

    if (fs.exists(prev)) fs.delete(prev, true)
    if (fs.exists(target)) {
      if (!fs.rename(target, prev))
        sys.error(s"merge swap failed: could not move $target aside")
    }
    if (!fs.rename(staging, target))
      sys.error(s"merge swap failed: could not promote $staging")
    if (fs.exists(prev)) {
      if (retainPrevHours.isDefined) {
        val snap = new Path(
          trustedPath + PrevSnapshotInfix + System.currentTimeMillis())
        if (!fs.rename(prev, snap))
          sys.error(s"merge retention failed: could not snapshot $prev")
      } else fs.delete(prev, true)
    }
  }

  /** (epochMillis, path) of retained pre-merge snapshots, newest
    * first. */
  def prevSnapshots(
      fs: org.apache.hadoop.fs.FileSystem,
      trustedPath: String): Seq[(Long, Path)] = {
    val table = new Path(trustedPath)
    val parent = table.getParent
    val prefix = table.getName + PrevSnapshotInfix
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .filter(_.getPath.getName.startsWith(prefix))
      .flatMap { st =>
        st.getPath.getName.stripPrefix(prefix).toLongOption
          .map(ts => (ts, st.getPath))
      }
      .sortBy(-_._1)
  }

  private def gcPrevSnapshots(
      fs: org.apache.hadoop.fs.FileSystem,
      trustedPath: String,
      retainHours: Double): Unit = {
    val cutoff = System.currentTimeMillis() - (retainHours * 3600 * 1000).toLong
    prevSnapshots(fs, trustedPath)
      .filter(_._1 < cutoff)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Roll the table back to its newest retained pre-merge snapshot
    * (undo of the last bad merge). Runs through the same
    * write-then-swap protocol as the merge itself — the snapshot is
    * staged (it already carries the parquet `_SUCCESS` commit marker)
    * and promoted with [[recoverSwap]] covering every crash point.
    * The rolled-back-FROM state is itself retained as a new snapshot,
    * so a mistaken rollback is also undoable. (A crash in the narrow
    * window after the snapshot is staged but before the table moves
    * aside consumes that snapshot without effect — recovery keeps the
    * intact table and deletes the stage; older snapshots remain.) */
  /** Time-travel read: the table as it stood at `epochMillis`.
    *
    * Each retained merge snapshots the PRE-merge table at swap time
    * (`__prev_<swapMillis>`), so the state at time t is the snapshot
    * of the FIRST merge that completed after t — or the live table
    * if no merge has completed since. Resolution is merge-granular
    * and the horizon is the retention window: a t older than the
    * oldest surviving snapshot resolves to that oldest snapshot (the
    * earliest state still on disk), loudly — callers wanting an
    * error instead should check [[prevSnapshots]] bounds themselves.
    * Snapshots are immutable completed tables (they carry the
    * parquet `_SUCCESS` marker), so the read needs no lock against
    * concurrent merges. */
  def snapshotAsOf(
      spark: SparkSession,
      trustedPath: String,
      epochMillis: Long): DataFrame = {
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val later = prevSnapshots(fs, trustedPath) // newest first
      .filter(_._1 > epochMillis)
    later.lastOption match {
      case Some((_, p)) => spark.read.parquet(p.toString)
      case None => spark.read.parquet(trustedPath)
    }
  }

  def rollbackToPrev(spark: SparkSession, trustedPath: String): Unit = {
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(trustedPath + "__staging")
    val prev = new Path(trustedPath + "__prev")
    val target = new Path(trustedPath)
    recoverSwap(fs, target, staging, prev)
    val snaps = prevSnapshots(fs, trustedPath)
    require(snaps.nonEmpty, s"no retained __prev_ snapshot beside $trustedPath")
    val (_, newest) = snaps.head
    if (fs.exists(staging)) fs.delete(staging, true)
    if (!fs.rename(newest, staging))
      sys.error(s"rollback failed: could not stage $newest")
    if (fs.exists(target)) {
      if (!fs.rename(target, prev))
        sys.error(s"rollback swap failed: could not move $target aside")
    }
    if (!fs.rename(staging, target))
      sys.error(s"rollback swap failed: could not promote $staging")
    if (fs.exists(prev)) {
      val snap = new Path(trustedPath + PrevSnapshotInfix + System.currentTimeMillis())
      if (!fs.rename(prev, snap))
        sys.error(s"rollback retention failed: could not snapshot $prev")
    }
  }

  /** Crash recovery for the write-then-swap protocol. Interrupted
    * states and their resolutions:
    *  - target missing, staging present (crashed between the two
    *    renames, or before the first): the staging result was fully
    *    written (parquet commit protocol), so complete the swap;
    *  - target missing, no staging, prev present (staging was already
    *    promoted away or lost): roll back to the old table;
    *  - target present: last swap completed — drop leftovers.
    */
  private[sinks] def recoverSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      target: Path, staging: Path, prev: Path): Unit = {
    // _SUCCESS gates the promote: a staging dir without the commit
    // marker is a half-written bootstrap write, not a swap candidate.
    def stagingCommitted = fs.exists(new Path(staging, "_SUCCESS"))
    if (!fs.exists(target)) {
      if (fs.exists(staging) && stagingCommitted) {
        if (!fs.rename(staging, target))
          sys.error(s"merge recovery failed: could not promote $staging")
        if (fs.exists(prev)) fs.delete(prev, true)
      } else if (fs.exists(prev)) {
        if (fs.exists(staging)) fs.delete(staging, true)
        if (!fs.rename(prev, target))
          sys.error(s"merge recovery failed: could not restore $prev")
      }
    } else if (fs.exists(prev)) {
      fs.delete(prev, true)
    }
    ()
  }
}
