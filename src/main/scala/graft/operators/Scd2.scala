package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 historization: turn a change log (key, change-time,
  * state attributes) into validity intervals — the standard
  * slowly-changing-dimension build the reference's MERGE-upsert lake
  * (SURVEY.md §2.2 K2) stops short of: K2 keeps the latest row per
  * sk; this keeps the full history queryable by as-of time.
  *
  * Two window passes over ONE (key)-hash shuffle (same partitioning
  * and ordering, so Catalyst plans a single exchange):
  *
  *  1. change compression — a log row that repeats the previous
  *     row's state for the same key is a no-op and is dropped
  *     (lag-compare on the state struct);
  *  2. interval build — `valid_from` is the change time, `valid_to`
  *     is the NEXT surviving change's time (half-open, so intervals
  *     tile the key's timeline exactly), `is_current` marks the open
  *     interval.
  *
  * The result joins to facts by key + `fact.ts >= valid_from AND
  * (valid_to IS NULL OR fact.ts < valid_to)` — or directly via
  * [[graft.ext.Temporal.asOfJoin]] on `valid_from`, which is the
  * same lookup without the interval materialization.
  *
  * Ties on (key, time) are broken by `tieCol` so compression and
  * interval edges are deterministic; with multiple state changes at
  * one instant the LAST (by tie order) wins the instant, and the
  * earlier ones become zero-length intervals (valid_from ==
  * valid_to), preserved so the row count is auditable against the
  * compressed log. 100 TB posture: one hash shuffle on the key; hot
  * keys bound by their change count (dimension keys change rarely —
  * this is the cheap direction of the SCD2 problem; the expensive
  * direction, fact enrichment, is the as-of join's job).
  */
object Scd2 {

  def historize(
      changeLog: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "SCD2 needs at least one state column")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val state: Column = struct(stateCols.map(col): _*)
    val compressed = changeLog
      .withColumn("__prev_state", lag(state, 1).over(w))
      // first row per key (null prev) always survives; equal-state
      // repeats are no-ops (null-safe compare: a state of all-null
      // attrs still compresses against itself)
      .where(col("__prev_state").isNull || !(state <=> col("__prev_state")))
      .drop("__prev_state")
    compressed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
