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
  * When `updates` is small relative to `trusted` (the common
  * incremental case) we broadcast it, turning the anti-join into a
  * shuffle-free map-side filter over the trusted scan; otherwise AQE
  * plans a shuffled hash join. `broadcastUpdates = None` → decide by
  * row-count estimate against the session's autoBroadcast threshold.
  */
object MergeUpsert {

  /** Pure merge semantics on DataFrames (oracle-testable). */
  def merged(
      trusted: DataFrame,
      updates: DataFrame,
      key: String = "sk",
      broadcastUpdates: Boolean = true): DataFrame = {
    val upd = if (broadcastUpdates) broadcast(updates) else updates
    trusted
      .join(upd.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
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
      partitionCol: String = "part"): Unit = {
    val storage = LakeStorage(spark)
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    if (!storage.exists(trustedPath)) {
      updates.write.partitionBy(partitionCol).parquet(trustedPath)
      return
    }

    val affected = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.isEmpty) return

    val trustedAffected = spark.read.parquet(trustedPath)
      .where(col(partitionCol).isin(affected: _*)) // partition pruning
    val mergedRows = merged(trustedAffected, updates, key)

    val staging = new Path(trustedPath + "__staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    mergedRows.write.partitionBy(partitionCol).parquet(staging.toString)

    affected.foreach { v =>
      val dir = s"$partitionCol=$v"
      val src = new Path(staging, dir)
      val dst = new Path(trustedPath, dir)
      val prev = new Path(trustedPath, dir + "__prev")
      if (fs.exists(prev)) fs.delete(prev, true)
      if (fs.exists(dst) && !fs.rename(dst, prev))
        sys.error(s"partition swap failed: could not move $dst aside")
      if (!fs.rename(src, dst))
        sys.error(s"partition swap failed: could not promote $src")
      if (fs.exists(prev)) fs.delete(prev, true)
    }
    fs.delete(staging, true)
    ()
  }

  /** Full K2: read trusted (if present), merge, write-new-then-swap.
    *
    * Atomicity protocol (SURVEY.md §7.5 #3): write the merged result
    * to `<trusted>__staging`, then swap via two renames with the old
    * data preserved at `<trusted>__prev` until the swap completes —
    * a crash between the renames leaves either the old or the new
    * directory recoverable, never a half-written table.
    */
  def mergeInto(
      spark: SparkSession,
      trustedPath: String,
      updates: DataFrame,
      key: String = "sk",
      broadcastUpdates: Boolean = true): Unit = {
    val storage = LakeStorage(spark)
    val fs = new Path(trustedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(trustedPath + "__staging")
    val prev = new Path(trustedPath + "__prev")
    val target = new Path(trustedPath)

    val result =
      if (storage.exists(trustedPath)) {
        val trusted = spark.read.parquet(trustedPath)
        merged(trusted, updates, key, broadcastUpdates)
      } else updates

    if (fs.exists(staging)) fs.delete(staging, true)
    result.write.mode(SaveMode.Overwrite).parquet(staging.toString)

    if (fs.exists(prev)) fs.delete(prev, true)
    if (fs.exists(target)) {
      if (!fs.rename(target, prev))
        sys.error(s"merge swap failed: could not move $target aside")
    }
    if (!fs.rename(staging, target))
      sys.error(s"merge swap failed: could not promote $staging")
    if (fs.exists(prev)) fs.delete(prev, true)
  }
}
