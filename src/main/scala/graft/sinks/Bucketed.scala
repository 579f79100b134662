package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed lake zones: pre-shuffled storage for the joins a zone
  * serves repeatedly. A plain parquet zone pays a full shuffle of
  * BOTH sides on every key join against it; writing the zone
  * `bucketBy(n, key)` pays that shuffle ONCE at write time —
  * Spark's scan then reports `HashPartitioning(key, n)` as the
  * output partitioning, and every later equi-join or aggregation on
  * the key plans with ZERO exchanges (bucket-aligned sort-merge; the
  * in-bucket `sortBy` lets the SMJ skip its sorts too when each
  * bucket is one file).
  *
  * This is the storage-side answer to the engine's hottest join
  * shape — TRUSTED × dimension on the surrogate key, re-run every
  * promote cycle. At 100 TB the bucketed write is the same shuffle
  * the first join would have paid anyway; every subsequent join of
  * the zone is shuffle-free on that side, and two zones bucketed to
  * the SAME (key, n) co-locate: their join moves no rows at all.
  *
  * Catalog-backed by necessity: bucket metadata lives in the table
  * catalog, not the files, so the zone is addressed as a table name
  * with an explicit `path` under the lake root (external table —
  * dropping the name never deletes the bytes).
  */
object Bucketed {

  /** Write `df` as an external bucketed table at `path`. The write
    * shuffles once to `buckets` buckets on `keys` and sorts within
    * each bucket — one output file per bucket (required for the
    * scan to expose bucket ordering, and the small-file posture a
    * compacted zone wants anyway: files ≈ buckets, sized by
    * choosing `buckets` ≈ zone_bytes / target_file_bytes).
    */
  def write(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key column")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, keys.map(df.col): _*)
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The bucketed zone as a DataFrame (scan carries the bucket
    * partitioning — joins/aggs on the bucket keys plan
    * exchange-free). */
  def table(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
