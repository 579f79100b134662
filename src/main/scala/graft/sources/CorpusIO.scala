package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus I/O — the interchange format document corpora
  * actually arrive in (one JSON object per line, usually gzipped),
  * which the reference's lake (parquet-only — SURVEY §2.1/2.2) stops
  * short of.
  *
  * 100 TB posture:
  *  - the READ takes an EXPLICIT schema: schema inference is a whole
  *    extra pass over the corpus before the first real job, and a
  *    drifting inferred type (a numeric-looking id in one shard)
  *    silently changes downstream semantics;
  *  - malformed lines QUARANTINE instead of failing the job:
  *    PERMISSIVE mode routes each unparseable line's raw text into a
  *    `_corrupt` audit column (every schema field null), so one bad
  *    line in a billion degrades to an auditable row — callers split
  *    on [[corrupt]]/[[clean]] and persist the quarantine next to the
  *    table;
  *  - gzip per-file compression on write: line-oriented JSON is the
  *    interchange/export path, not the lake format — parquet (K1)
  *    remains the store. Files are splittable per-FILE, not
  *    per-block, so writers shard (`repartition`) before export.
  */
object CorpusIO {

  val CorruptColumn = "_corrupt"

  /** Read a JSONL directory/glob with the given schema; malformed
    * lines land with all schema fields null and the raw line in
    * `_corrupt`.
    *
    * Spark restriction: a downstream plan whose referenced columns
    * prune to ONLY `_corrupt` — e.g. `clean(df).count()`, or
    * collecting just the quarantined lines — fails analysis with
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN on a raw JSON scan. `cache()`
    * the parsed frame before quarantine-splitting, exactly as that
    * error's own guidance instructs; plans that keep any data column
    * (the round-trip query, a quarantine write of full rows) need no
    * cache. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptColumn),
      s"schema already contains the $CorruptColumn audit column")
    spark.read
      .schema(schema.add(CorruptColumn, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)
  }

  /** Parsed rows only, audit column dropped. */
  def clean(df: DataFrame): DataFrame =
    df.where(col(CorruptColumn).isNull).drop(CorruptColumn)

  /** Quarantine: the full row of every malformed line (schema fields
    * null, raw line in `_corrupt`). Whole rows, not just the raw
    * line: Spark refuses a raw-JSON scan whose referenced columns
    * are ONLY the internal corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    * project after materializing if only the lines are wanted. */
  def corrupt(df: DataFrame): DataFrame =
    df.where(col(CorruptColumn).isNotNull)

  def writeJsonl(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression).json(path)

  /** The quarantine persistence flow the read contract promises: parse
    * a JSONL corpus and land the parsed rows as parquet at `cleanPath`
    * and every malformed line — full row, raw text in `_corrupt`,
    * schema fields null — as parquet at `quarantinePath` (conventionally
    * a `<table>__quarantine` SIBLING, like the lake's `__staging` /
    * `__prev` dirs: never inside the table, where readers would
    * discover it). Returns (clean, quarantined) row counts, counted
    * from what was PERSISTED, not from the in-memory split.
    *
    * Two passes over the raw corpus by design: the alternative — one
    * pass through a cache — needs the whole corpus to fit the cache
    * tier, which is exactly what cannot be assumed at 100 TB; two
    * schema-enforced scans of line JSON are cheap, stateless, and
    * spill-free. */
  def quarantineSplit(
      spark: SparkSession,
      path: String,
      schema: StructType,
      cleanPath: String,
      quarantinePath: String): (Long, Long) = {
    val raw = readJsonl(spark, path, schema)
    clean(raw).write.mode(SaveMode.Overwrite).parquet(cleanPath)
    corrupt(raw).write.mode(SaveMode.Overwrite).parquet(quarantinePath)
    (spark.read.parquet(cleanPath).count(),
      spark.read.parquet(quarantinePath).count())
  }

  /** CSV sentinel for NULL: an unquoted `\N` (the classic
    * mysqldump/Hive convention) disambiguates NULL from the empty
    * string, which CSV otherwise conflates. */
  private val NullToken = "\\N"

  /** CSV read with the same posture as [[readJsonl]]: explicit
    * schema, PERMISSIVE quarantine into `_corrupt` (a row with the
    * wrong shape or an unparseable field degrades to an auditable
    * row), `\N` as the NULL sentinel. `enforceSchema=false` makes
    * Spark actually CHECK each file's header names against the schema
    * (the default merely skips the header and binds columns strictly
    * by position, silently misreading a column-reordered file) — CSV
    * is for TABULAR interchange; corpora with embedded newlines
    * belong in JSONL. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptColumn),
      s"schema already contains the $CorruptColumn audit column")
    spark.read
      .schema(schema.add(CorruptColumn, StringType))
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .option("nullValue", NullToken)
      .csv(path)
  }

  def writeCsv(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("compression", compression)
      .option("nullValue", NullToken)
      .csv(path)
}
