package graft.app

import graft.core.{Clock, DatasetRef, LakePaths, LakeStorage}
import graft.ingest.{IngestLoop, StatusReporter}
import graft.operators.Promote
import graft.planner._
import graft.planner.Intervals.Interval
import graft.sinks.{MergeUpsert, ParquetAppend}
import graft.sources.{JdbcSource, MongoLikeSource}
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}

/** §3 entry points — the four resync flows of the reference plus the
  * promote flow, as one parameterized job.
  *
  * Reference archetypes: `resync_date/etls/carga_date.py` (JDBC +
  * date pc), `resync_int/etls/carga_int.py` (JDBC + int pc), the two
  * `mongodb_carga` scripts (document source, retry without checkpoint
  * recovery), and the promote path
  * `shared_etls/etls/utils.py:754-819` + `cloud_utils.py:478-532`.
  */
object ResyncJob {

  /** Range-extraction boundary semantics per source family:
    *  - JDBC pushes half-open `[start, end)` SQL (S1);
    *  - document sources filter INCLUSIVE `between` (S4), so with the
    *    P6 end+1 compensation consecutive chunks overlap at the
    *    boundary — expected, healed by T4 dedup at promote
    *    (SURVEY.md §2.5 P6).
    */
  trait RangedSource {
    def readRange(spark: SparkSession, pc: String, startIncl: String, endExcl: String): DataFrame
    def minValue(spark: SparkSession, pc: String): Any
    def maxIntWithMargin(spark: SparkSession, pc: String): Long
  }

  final case class JdbcRanged(src: JdbcSource, dataset: String) extends RangedSource {
    def readRange(spark: SparkSession, pc: String, startIncl: String, endExcl: String): DataFrame =
      src.readRange(spark, dataset, pc, startIncl, endExcl)
    def minValue(spark: SparkSession, pc: String): Any = src.minValue(spark, dataset, pc)
    def maxIntWithMargin(spark: SparkSession, pc: String): Long =
      src.maxIntWithMargin(spark, dataset, pc)
  }

  /** Document-store semantics over the parquet-backed source: the
    * inclusive upper bound is `endExcl` itself (P6 already extended
    * it), reproducing the reference's boundary overlap.
    *
    * `schema` carries the §1.4 three-tier resolution result (the
    * reference resolves it BEFORE boundary queries,
    * `mongodb_carga_date.py:102-110`): when present, inference is
    * disabled on every ranged read — at 100 TB an inference pass is a
    * full extra collection scan. */
  final case class MongoRanged(
      src: MongoLikeSource,
      schema: Option[org.apache.spark.sql.types.StructType] = None) extends RangedSource {
    def readRange(spark: SparkSession, pc: String, startIncl: String, endExcl: String): DataFrame =
      src.readRange(spark, pc, startIncl, endExcl, schema)
    def minValue(spark: SparkSession, pc: String): Any = src.minValue(spark, pc, schema)
    def maxIntWithMargin(spark: SparkSession, pc: String): Long =
      src.maxIntWithMargin(spark, pc, schema)
  }

  /** Adapter-seam variant of [[MongoRanged]]: identical S4–S6
    * semantics, but the reader behind the URI is whatever
    * [[graft.sources.DocStoreAdapters]] has registered for its scheme
    * — the real mongo-spark connector in production, the parquet
    * stand-in here. The resync flows are agnostic either way. */
  final case class DocRanged(
      src: graft.sources.DocStoreSource,
      schema: Option[org.apache.spark.sql.types.StructType] = None) extends RangedSource {
    def readRange(spark: SparkSession, pc: String, startIncl: String, endExcl: String): DataFrame =
      src.readRange(spark, pc, startIncl, endExcl, schema)
    def minValue(spark: SparkSession, pc: String): Any = src.minValue(spark, pc, schema)
    def maxIntWithMargin(spark: SparkSession, pc: String): Long =
      src.maxIntWithMargin(spark, pc, schema)
  }

  /** §1.4 resolution for the document flows: registry file → existing
    * trusted schema → None (infer). */
  def resolveSchema(
      spark: SparkSession,
      lake: LakePaths,
      ref: DatasetRef,
      registryDir: Option[String]): Option[org.apache.spark.sql.types.StructType] = {
    val tiers = registryDir.map(graft.schema.JsonFileRegistry).toSeq :+
      graft.schema.ExistingTableRegistry(spark,
        (ns, ds) => lake.trusted(ref.copy(namespace = ns, dataset = ds)))
    graft.schema.ChainedRegistry(tiers: _*).resolve(ref.namespace, ref.dataset)
  }

  /** Date-partitioned resync (carga_date flow, steps §3.1 1-9). */
  def runDate(
      spark: SparkSession,
      source: RangedSource,
      pc: String,
      ref: DatasetRef,
      lake: LakePaths,
      cliStart: Option[LocalDate] = None,
      cliEnd: Option[LocalDate] = None,
      estimatedRows: Long,
      truncateFirst: Boolean = true,
      withRecovery: Boolean = true,
      reporter: StatusReporter = StatusReporter.Noop,
      idRequest: Option[String] = None,
      sleep: Long => Unit = Thread.sleep): Unit = {

    val workPath = lake.work(ref)
    val storage = LakeStorage(spark)
    if (truncateFirst) storage.clearOrCreate(workPath) // K3 destructive init (§3.1 step 3)

    // P4 boundary resolution (§3.1 step 4)
    val bounds = Boundaries.resolveDates(
      cliStart, cliEnd,
      sourceMin = toLocalDate(source.minValue(spark, pc)),
      today = LocalDate.now())

    // P1 width + P3 intervals (§3.1 step 5)
    val span = java.time.temporal.ChronoUnit.DAYS.between(bounds.start, bounds.end)
    val width = ChunkWidth.dateChunkDays(estimatedRows, span)
    val plan = Intervals.dates(bounds.start, bounds.end, width)

    def extract(iv: Interval[LocalDate]): Unit = {
      val (s, e) = Intervals.halfOpenDates(iv) // P6 (§3.1 step 7)
      val df = source.readRange(spark, pc, s.toString, e.toString)
      ParquetAppend.write(df, workPath) // K1
    }

    // P5 recovery: probe WORK for max(pc), replan from there (§3.1 step 8)
    val recover: Option[() => Option[LocalDate]] =
      if (withRecovery) Some(() =>
        if (!storage.exists(workPath)) None
        else spark.read.parquet(workPath).select(max(col(pc))).head().get(0) match {
          case null => None
          case v => Some(toLocalDate(v))
        })
      else None

    new IngestLoop[LocalDate](reporter = reporter, sleep = sleep).run(
      // The reference threads an explicit request id through every
      // status POST (`carga_date.py:43`, `utils.py:14-27`); the
      // namespace.dataset default covers runs not driven by a
      // scheduler that assigns ids.
      idRequest = idRequest.getOrElse(s"${ref.namespace}.${ref.dataset}"),
      plan = plan,
      extract = extract,
      recover = recover,
      replan = cp => Intervals.dates(cp, bounds.end, width))
  }

  /** Shared int-flow planning: P4 boundaries (note the margin
    * round-trip — `maxIntWithMargin` already adds the +300000 margin
    * the resolver re-applies, so it is subtracted here once) + P2
    * width + P3 intervals. */
  private def planIntChunks(
      spark: SparkSession,
      source: RangedSource,
      pc: String,
      cliStart: Option[Long],
      cliEnd: Option[Long],
      estimatedRows: Long): (Boundaries.Range[Long], List[Interval[Long]]) = {
    val bounds = Boundaries.resolveInts(
      cliStart, cliEnd,
      sourceMin = toLong(source.minValue(spark, pc)),
      sourceMax = source.maxIntWithMargin(spark, pc) - Boundaries.SecurityMargin)
    (bounds, Intervals.ints(bounds.start, bounds.end,
      ChunkWidth.intChunkWidth(estimatedRows)))
  }

  /** Integer-partitioned resync (carga_int flow, §3.2). */
  def runInt(
      spark: SparkSession,
      source: RangedSource,
      pc: String,
      ref: DatasetRef,
      lake: LakePaths,
      cliStart: Option[Long] = None,
      cliEnd: Option[Long] = None,
      estimatedRows: Long,
      truncateFirst: Boolean = true,
      withRecovery: Boolean = true,
      reporter: StatusReporter = StatusReporter.Noop,
      idRequest: Option[String] = None,
      sleep: Long => Unit = Thread.sleep): Unit = {

    val workPath = lake.work(ref)
    val storage = LakeStorage(spark)
    if (truncateFirst) storage.clearOrCreate(workPath)

    val (bounds, plan) = planIntChunks(spark, source, pc, cliStart, cliEnd, estimatedRows)
    val width = ChunkWidth.intChunkWidth(estimatedRows)

    def extract(iv: Interval[Long]): Unit = {
      val (s, e) = Intervals.halfOpenInts(iv)
      ParquetAppend.write(source.readRange(spark, pc, s.toString, e.toString), workPath)
    }

    val recover: Option[() => Option[Long]] =
      if (withRecovery) Some(() =>
        if (!storage.exists(workPath)) None
        else Option(spark.read.parquet(workPath).select(max(col(pc))).head())
          .filterNot(_.isNullAt(0)).map(r => toLong(r.get(0))))
      else None

    new IngestLoop[Long](reporter = reporter, sleep = sleep).run(
      idRequest = idRequest.getOrElse(s"${ref.namespace}.${ref.dataset}"),
      plan = plan,
      extract = extract,
      recover = recover,
      replan = cp => Intervals.ints(cp, bounds.end, width))
  }

  /** Throughput variant of the int resync for JDBC sources: ONE
    * parallel read over all planner chunks (each chunk a JDBC
    * partition predicate — one DB cursor per executor slot) and one
    * K1 append, instead of the reference's sequential
    * chunk-at-a-time loop. Trades P5's per-chunk retry/checkpoint for
    * pull throughput; on failure the whole load re-runs (K3 truncate
    * + K2 upsert make that safe). Use when the source DB tolerates
    * concurrent cursors and the window is large.
    */
  def runIntParallel(
      spark: SparkSession,
      source: JdbcSource,
      dataset: String,
      pc: String,
      ref: DatasetRef,
      lake: LakePaths,
      cliStart: Option[Long] = None,
      cliEnd: Option[Long] = None,
      estimatedRows: Long,
      truncateFirst: Boolean = true): Unit = {
    val workPath = lake.work(ref)
    if (truncateFirst) LakeStorage(spark).clearOrCreate(workPath)
    val jdbc = JdbcRanged(source, dataset)
    val (_, plan) = planIntChunks(spark, jdbc, pc, cliStart, cliEnd, estimatedRows)
    val chunks = plan
      .map(Intervals.halfOpenInts)
      .map { case (a, b) => (a.toString, b.toString) }
    ParquetAppend.write(
      source.readChunksParallel(spark, dataset, pc, chunks), workPath)
  }

  /** Throughput variant of the DATE resync for JDBC sources — the
    * reference's main entry point (`carga_date.py`) pulls its
    * intervals one at a time through the driver loop; this maps the
    * P1/P3/P4 date plan onto JDBC partition predicates exactly like
    * [[runIntParallel]] does for the int archetype, so one read pulls
    * every chunk concurrently (one DB cursor per executor slot) into
    * one K1 append. Same trade as the int variant: P5's per-chunk
    * retry/checkpoint is given up for pull throughput — on failure
    * the whole load re-runs, which K3 truncate + K2 upsert make safe.
    * `today` is injectable so tests and backfills pin the open end of
    * the window.
    */
  def runDateParallel(
      spark: SparkSession,
      source: JdbcSource,
      dataset: String,
      pc: String,
      ref: DatasetRef,
      lake: LakePaths,
      cliStart: Option[LocalDate] = None,
      cliEnd: Option[LocalDate] = None,
      estimatedRows: Long,
      truncateFirst: Boolean = true,
      today: => LocalDate = LocalDate.now()): Unit = {
    val workPath = lake.work(ref)
    if (truncateFirst) LakeStorage(spark).clearOrCreate(workPath)
    val jdbc = JdbcRanged(source, dataset)
    val bounds = Boundaries.resolveDates(
      cliStart, cliEnd,
      sourceMin = toLocalDate(jdbc.minValue(spark, pc)),
      today = today)
    val span = java.time.temporal.ChronoUnit.DAYS.between(bounds.start, bounds.end)
    val width = ChunkWidth.dateChunkDays(estimatedRows, span)
    val chunks = Intervals.dates(bounds.start, bounds.end, width)
      .map(Intervals.halfOpenDates)
      .map { case (s, e) => (s.toString, e.toString) }
    ParquetAppend.write(
      source.readChunksParallel(spark, dataset, pc, chunks), workPath)
  }

  /** Promote flow (§3.4): WORK → T1 sk → T2 → T3 → T4 → K2 MERGE. */
  def promote(
      spark: SparkSession,
      ref: DatasetRef,
      lake: LakePaths,
      skIds: Seq[String],
      hyphen: Boolean = false,
      clock: Clock = Clock.System,
      deterministic: Boolean = true): Unit = {
    val work = spark.read.parquet(lake.work(ref)) // S7
    val curated = Promote.transform(work, skIds, hyphen, clock, deterministic)
    MergeUpsert.mergeInto(spark, lake.trusted(ref), curated) // K2
  }

  private def toLocalDate(v: Any): LocalDate = graft.core.Coerce.toLocalDate(v)
  private def toLong(v: Any): Long = graft.core.Coerce.toLong(v)
}
