package graft

import graft.core.Clock
import graft.operators._
import graft.planner.{Boundaries, ChunkWidth, Intervals}
import graft.sinks.MergeUpsert
import java.sql.Timestamp
import java.time.temporal.ChronoUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — declared queries (SURVEY.md §2.9 D1-D9 + §7.4
  * extensions), each paired with DuckDB oracle SQL over the same
  * parquet tables. Column names are aliased identically on both
  * sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Reads a fixture table. The `events` table stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark reads as a nanos-since-epoch long
    * (Sessions sets `nanosAsLong`); every fixture value is a whole
    * microsecond, so the `div 1000` → `timestamp_micros` conversion
    * is lossless and matches the DuckDB oracle's `CAST(ts AS
    * TIMESTAMP)`.
    */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f =>
        f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Deterministic-dedup base used by D5/D8: sk over l_orderkey alone
    * (real duplicates: one sk per order, many lineitems). */
  private def dedupBase(s: SparkSession, dir: String): DataFrame =
    Dedup.bySkDeterministic(
      SurrogateKey.addSk(tbl(s, dir, "lineitem"), Seq("l_orderkey")))

  private val LineitemCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate")

  private def orderByList(cols: Seq[String]): String =
    cols.map(c => s"$c NULLS FIRST").mkString(", ")

  /** Dedup-by-sk oracle SQL fragment (deterministic T4, SURVEY.md §2.4):
    * keep the min row per sk by all non-sk columns in schema order. */
  private def dedupSql(inner: String, cols: Seq[String]): String =
    s"""SELECT * EXCLUDE (rn) FROM (
       |  SELECT *, row_number() OVER (PARTITION BY sk ORDER BY ${orderByList(cols)}) AS rn
       |  FROM ($inner)
       |) WHERE rn = 1""".stripMargin

  private val dedupBaseSql: String = dedupSql(
    "SELECT *, md5(CAST(l_orderkey AS VARCHAR)) AS sk FROM lineitem",
    LineitemCols)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("d7_promote")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1 — S1/S7 ranged extract, half-open [start, end) (P6 semantics)
    "d1_ranged_extract" -> ((s, dir) =>
      tbl(s, dir, "orders").where(
        col("o_orderdate") >= lit(ts("1995-01-01 00:00:00")) &&
          col("o_orderdate") < lit(ts("1995-04-01 00:00:00")))),

    // D2 — S2/S5 min boundary probe
    "d2_min_boundary" -> ((s, dir) =>
      tbl(s, dir, "orders").agg(min(col("o_orderdate")).as("min_pc"))),

    // D3 — S3/S6 max boundary + the reference's +300000 safety margin
    "d3_max_boundary_int" -> ((s, dir) =>
      tbl(s, dir, "orders").agg(
        (max(col("o_orderkey")) + lit(Boundaries.SecurityMargin)).as("end_boundary"))),

    // D4 — T1 surrogate key, hyphen branch (concat_ws skips NULLs)
    "d4_sk_hyphen" -> ((s, dir) =>
      SurrogateKey.addSk(tbl(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), hyphen = true)),

    // D4b — T1 plain-concat branch (NULL-propagating semantics)
    "d4b_sk_plain_null" -> ((s, dir) =>
      SurrogateKey.addSk(
        tbl(s, dir, "events").select("event_id", "user_id", "event_type"),
        Seq("user_id", "event_type"))),

    // D5 — T4 deterministic dedup of sk-keyed lineitem
    "d5_dedup_deterministic" -> ((s, dir) => dedupBase(s, dir)),

    // D6 — T3 date-quality repair over every temporal column
    "d6_quality_repair" -> ((s, dir) =>
      DateQuality.repair(tbl(s, dir, "events").select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props")))),

    // D7 — T5 full promote chain (T1 hyphen → T2 fixed clock → T3 → T4)
    "d7_promote" -> ((s, dir) =>
      Promote.transform(tbl(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), hyphen = true,
        clock = Clock.ForOracle, deterministic = true)),

    // D8 — K2 merge-upsert semantics: matched rows fully replaced,
    // unmatched trusted rows survive, new rows insert.
    "d8_merge" -> ((s, dir) => {
      val base = dedupBase(s, dir)
      val trusted = base.where(col("l_orderkey") % 2 === 0)
      val updates = base.where(col("l_orderkey") % 3 === 0)
        .withColumn("l_quantity", col("l_quantity") + 1000)
      MergeUpsert.merged(trusted, updates)
    }),

    // D9 — P1/P3/P6 chunk-tiling invariance: the union of per-interval
    // half-open extracts over the planner's chunk plan equals one full
    // scan. Boundary resolution (P4) and width selection (P1) run
    // driver-side exactly as in the ingest apps.
    "d9_chunk_invariance" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val row = orders
        .agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mx"),
          count(lit(1)).as("n"))
        .head()
      def toDate(v: Any): java.time.LocalDate = v match {
        case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
        case d: java.time.LocalDateTime => d.toLocalDate
        case i: java.time.Instant => i.atZone(java.time.ZoneOffset.UTC).toLocalDate
        case d: java.sql.Date => d.toLocalDate
        case d: java.time.LocalDate => d
      }
      val (mn, mx, n) = (toDate(row.get(0)), toDate(row.get(1)), row.getLong(2))
      val span = ChronoUnit.DAYS.between(mn, mx)
      val width = ChunkWidth.dateChunkDays(n, span)
      val chunks = Intervals.dates(mn, mx, width).map(Intervals.halfOpenDates)
      chunks.map { case (a, b) =>
        orders.where(
          col("o_orderdate") >= lit(ts(s"$a 00:00:00")) &&
            col("o_orderdate") < lit(ts(s"$b 00:00:00")))
      }.reduce(_ unionByName _)
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "d1_ranged_extract" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'""".stripMargin,

    "d2_min_boundary" ->
      "SELECT min(o_orderdate) AS min_pc FROM orders",

    "d3_max_boundary_int" ->
      "SELECT max(o_orderkey) + 300000 AS end_boundary FROM orders",

    "d4_sk_hyphen" ->
      """SELECT *, md5(concat_ws('-', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))) AS sk
        |FROM lineitem""".stripMargin,

    "d4b_sk_plain_null" ->
      """SELECT event_id, user_id, event_type,
        |  CASE WHEN user_id IS NULL OR event_type IS NULL THEN NULL
        |       ELSE md5(concat(CAST(user_id AS VARCHAR), event_type)) END AS sk
        |FROM events""".stripMargin,

    "d5_dedup_deterministic" -> dedupBaseSql,

    "d6_quality_repair" ->
      """SELECT event_id,
        |  CASE WHEN year(ts) >= 10 THEN CAST(ts AS TIMESTAMP) END AS ts,
        |  user_id, event_type, value, props
        |FROM events""".stripMargin,

    "d7_promote" -> dedupSql(
      """SELECT *, TIMESTAMP '2024-01-01 00:00:00' AS timestamp_kafka FROM (
        |  SELECT *, md5(concat_ws('-', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))) AS sk
        |  FROM lineitem)""".stripMargin,
      LineitemCols :+ "timestamp_kafka"),

    "d8_merge" ->
      s"""WITH base AS ($dedupBaseSql),
         |t AS (SELECT * FROM base WHERE l_orderkey % 2 = 0),
         |u AS (SELECT * REPLACE (l_quantity + 1000 AS l_quantity) FROM base WHERE l_orderkey % 3 = 0)
         |SELECT * FROM t WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.sk = t.sk)
         |UNION ALL SELECT * FROM u""".stripMargin,

    "d9_chunk_invariance" -> "SELECT * FROM orders",
  )
}
