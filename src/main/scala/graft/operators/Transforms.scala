package graft.operators

import graft.core.Clock
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** T1 — surrogate key (reference `shared_etls/etls/utils.py:659-701`).
  *
  * `sk = md5(concat(ids…))`, or with the hyphen separator enabled
  * `md5(concat_ws("-", ids…))`; every id column is cast to string
  * first (`utils.py:692, 699`). NULL semantics differ between the two
  * branches and are preserved bit-exactly (SURVEY.md §2.3 T1):
  * `concat` propagates NULL (any NULL input → sk NULL) while
  * `concat_ws` skips NULLs.
  */
object SurrogateKey {
  def addSk(df: DataFrame, ids: Seq[String], hyphen: Boolean = false): DataFrame = {
    // Single string id is auto-wrapped by the reference (utils.py:685-686);
    // the Seq signature subsumes that.
    val cols = ids.map(c => col(c).cast("string"))
    val skExpr =
      if (hyphen) md5(concat_ws("-", cols: _*))
      else md5(concat(cols: _*))
    df.withColumn("sk", skExpr)
  }
}

/** T2 — ingest timestamp (reference `utils.py:704-719`): one
  * driver-wall-clock literal at second precision, identical for every
  * row of the batch, cast to timestamp. Clock injected for
  * determinism (SURVEY.md §2.4).
  */
object IngestTimestamp {
  val ColumnName = "timestamp_kafka"
  // NTZ, not LTZ: the stamp is a wall-clock string with no zone, and
  // every other timestamp in the lake (parquet-sourced or oracle-side)
  // is naive — a zoned stamp here is the one arrow-level type outlier.
  def add(df: DataFrame, clock: Clock = Clock.System): DataFrame =
    df.withColumn(ColumnName, lit(clock.nowString).cast(TimestampNTZType))
}

/** T3 — date-quality repair (reference `utils.py:722-751`): for every
  * column whose type is date or timestamp,
  * `when(year(col) >= 10, col)` with no `otherwise` — dates in years
  * 0000-0009 (a classic garbage-date artifact of epoch bugs) become
  * NULL. Column discovery via the schema, matching the reference's
  * `df.dtypes` scan (`utils.py:732-736`).
  */
object DateQuality {
  def repair(df: DataFrame): DataFrame = {
    val dateCols = df.schema.fields.collect {
      case f if f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType => f.name
    }
    dateCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(year(col(c)) >= 10, col(c)))
    }
  }
}

/** T4 — dedup by surrogate key (reference `utils.py:817`:
  * `df.dropDuplicates(["sk"])`).
  *
  * The reference keeps an arbitrary partition-order-dependent row per
  * sk. Two modes (SURVEY.md §2.4):
  *   - `fast`: reference-faithful `dropDuplicates(Seq("sk"))` — one
  *     shuffle with map-side partial aggregation (Spark plans it as a
  *     first()-aggregate, so it combines before the exchange; the
  *     right choice at 100 TB when any row per key is acceptable).
  *   - `deterministic`: keep the row with the smallest
  *     `struct(all columns in schema order)` per sk, via
  *     `row_number()` over a window — total tie-break, required by
  *     the hash-compared oracle. Same single shuffle on sk, plus a
  *     per-partition sort.
  */
object Dedup {
  def bySkFast(df: DataFrame): DataFrame = df.dropDuplicates(Seq("sk"))

  /** Keep the row with the smallest `struct(order columns)` per key —
    * the same total order the previous `row_number()` window form
    * used (struct comparison is field-by-field ascending with NULLS
    * FIRST, exactly Catalyst's `asc_nulls_first` per field type), but
    * computed as a HASH AGGREGATION: `min_by` is a declarative
    * aggregate, so the map side collapses duplicate keys BEFORE the
    * exchange (guide §2.3 "aggregate before you shuffle") and the
    * per-partition total sort disappears outright. On the lineitem
    * fixture (one sk per order, ~40 lineitems each) the exchange
    * carries ~2.5% of the bytes the window shape shuffled. Ties in
    * the order struct are exact duplicate rows (every non-key column
    * participates), so which one `min_by` keeps is immaterial. */
  def bySkDeterministic(df: DataFrame, key: String = "sk"): DataFrame = {
    val orderCols = df.columns.filterNot(_ == key)
    val kept = min_by(
      struct(df.columns.map(col).toIndexedSeq: _*),
      struct(orderCols.map(col).toIndexedSeq: _*)).as("__row")
    df.groupBy(col(key)).agg(kept)
      .select(df.columns.map(c => col("__row").getField(c).as(c)).toIndexedSeq: _*)
  }
}

/** T5 — raw→curated composite (reference `utils.py:754-819`):
  * WORK read → T1 sk → T2 timestamp → T3 repair → T4 dedup, in
  * exactly that order.
  */
object Promote {
  def transform(
      work: DataFrame,
      skIds: Seq[String],
      hyphen: Boolean = false,
      clock: Clock = Clock.System,
      deterministic: Boolean = false): DataFrame = {
    val withSk = SurrogateKey.addSk(work, skIds, hyphen)
    val stamped = IngestTimestamp.add(withSk, clock)
    val repaired = DateQuality.repair(stamped)
    if (deterministic) Dedup.bySkDeterministic(repaired) else Dedup.bySkFast(repaired)
  }
}
