package graft.operators

import graft.core.{Clock, DatasetRef, LakePaths}
import graft.sinks.MergeUpsert
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Incremental WORK → TRUSTED promotion: process only the WORK files
  * that appeared since the last promote, not the whole zone.
  *
  * The full-zone promote (reference behavior, `utils.py:754-819`)
  * re-reads and re-transforms ALL staged data on every run — fine
  * for a one-shot resync, O(zone) for a continuously-fed lake. This
  * variant tracks a high-water mark (max file modification time
  * already promoted, stored next to the trusted table) and feeds the
  * promote chain only files above it: each run costs O(new data),
  * which is the difference between minutes and hours on a
  * continuously-staged 100 TB zone. K2's upsert makes re-processing
  * safe, so the failure mode of a lost watermark is wasted work,
  * never wrong data.
  *
  * Boundary semantics: files with mtime equal to the stored watermark
  * are considered already promoted. A writer still appending when the
  * listing runs can produce a file with an older mtime that the NEXT
  * run then skips — run promotes against quiesced ingest (the
  * resync-then-promote flow of the reference) or partition the WORK
  * zone by batch for stronger guarantees.
  */
object IncrementalPromote {

  final case class Result(filesProcessed: Int, rowsMerged: Long, newWatermark: Long)

  private def watermarkPath(lake: LakePaths, ref: DatasetRef): Path =
    new Path(lake.trusted(ref) + "__promote_watermark")

  private def readWatermark(spark: SparkSession, p: Path): Long = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeWatermark(spark: SparkSession, p: Path, v: Long): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    ()
  }

  def run(
      spark: SparkSession,
      ref: DatasetRef,
      lake: LakePaths,
      skIds: Seq[String],
      hyphen: Boolean = false,
      clock: Clock = Clock.System,
      deterministic: Boolean = true): Result = {
    val workPath = new Path(lake.work(ref))
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wmPath = watermarkPath(lake, ref)
    val watermark = readWatermark(spark, wmPath)

    val newFiles = fs.listStatus(workPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .filter(_.getModificationTime > watermark)
    if (newFiles.isEmpty) return Result(0, 0L, watermark)

    val batch = spark.read.parquet(newFiles.map(_.getPath.toString).toIndexedSeq: _*)
    val curated = Promote.transform(batch, skIds, hyphen, clock, deterministic)
    MergeUpsert.mergeInto(spark, lake.trusted(ref), curated)

    val newWm = newFiles.map(_.getModificationTime).max
    writeWatermark(spark, wmPath, newWm)
    Result(newFiles.length, curated.count(), newWm)
  }
}
