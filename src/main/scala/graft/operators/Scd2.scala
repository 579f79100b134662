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

  /** Skew-robust SCD2: same semantics as [[historize]], but a single
    * hot key no longer serializes inside one window partition — the
    * epoch decomposition of [[graft.ext.Temporal.asOfJoinEpochs]]:
    *
    *  1. local compression within (key, epoch), with each epoch's
    *     FIRST row additionally compared against the previous
    *     nonempty epoch's carried last state (a dropped no-op run can
    *     span the boundary) — the carry is a per-(key, epoch) lag
    *     over a |keys|·|epochs|-sized summary, exactly how
    *     asOfJoinEpochs carries per-epoch latest rows;
    *  2. interval build: `valid_to` is the next surviving change's
    *     time — the local lead within (key, epoch) where one exists,
    *     else the next SURVIVING epoch's first surviving change time
    *     (a reverse carry over the tiny summary; epochs whose every
    *     row compressed away are skipped because they never enter
    *     the summary).
    *
    * Change times must be non-null. Cost: one (key, epoch) shuffle
    * + two tiny per-key summary windows + joins back — vs
    * [[historize]]'s single key shuffle; pay it when a key's change
    * log outgrows a task (SCD2 keys change rarely, so this matters
    * for event-sourced logs read as change streams, not for classic
    * dimensions).
    */
  def historizeEpochs(
      changeLog: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      stateCols: Seq[String],
      epochSeconds: Long): DataFrame = {
    require(stateCols.nonEmpty, "SCD2 needs at least one state column")
    require(epochSeconds > 0, s"epochSeconds must be positive, got $epochSeconds")
    graft.ext.Temporal.requireNoReserved(changeLog, Seq("__us", "__epoch",
      "__last_state", "__carry_state", "__prev_state", "__first_ts",
      "__next_epoch_first", "__next_ts", "__k", "__e"))
    val em = epochSeconds * 1000000L
    val state: Column = struct(stateCols.map(col): _*)
    val l = changeLog
      .withColumn("__us", graft.ext.Temporal.micros(changeLog, tsCol))
      .withColumn("__epoch", expr(s"__us div $em"))

    // carry: previous nonempty epoch's last raw state (== its last
    // surviving state: compression only drops state-preserving rows)
    val wk = Window.partitionBy(keyCol).orderBy(col("__epoch").asc)
    // key columns renamed in the summaries so the joins back can be
    // null-safe: Window.partitionBy groups NULL keys together (the
    // plain historize compresses them as one key), so the carry must
    // reach them too
    val carry = l.groupBy(col(keyCol), col("__epoch"))
      .agg(max_by(state, struct(col("__us"), col(tieCol))).as("__last_state"))
      .withColumn("__carry_state", lag(col("__last_state"), 1).over(wk))
      .select(col(keyCol).as("__k"), col("__epoch").as("__e"),
        col("__carry_state"))

    // 1. compression: local lag for non-first rows; the carried
    // state for each epoch's first row (null carry = first epoch of
    // the key → always survives, like historize's first row)
    val w = Window.partitionBy(col(keyCol), col("__epoch"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val survivors = l
      .withColumn("__prev_state", lag(state, 1).over(w))
      .join(carry, col(keyCol) <=> col("__k") && col("__epoch") === col("__e"),
        "left")
      .where(
        when(col("__prev_state").isNotNull, !(state <=> col("__prev_state")))
          .otherwise(col("__carry_state").isNull ||
            !(state <=> col("__carry_state"))))
      .drop("__prev_state", "__carry_state", "__k", "__e")

    // 2. reverse carry: next surviving epoch's first surviving time
    val nextFirst = survivors.groupBy(col(keyCol), col("__epoch"))
      .agg(min(col(tsCol)).as("__first_ts"))
      .withColumn("__next_epoch_first", lead(col("__first_ts"), 1).over(wk))
      .select(col(keyCol).as("__k"), col("__epoch").as("__e"),
        col("__next_epoch_first"))

    survivors
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .join(nextFirst,
        col(keyCol) <=> col("__k") && col("__epoch") === col("__e"), "left")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        coalesce(col("__next_ts"), col("__next_epoch_first")))
      .withColumn("is_current", col("valid_to").isNull)
      .select((changeLog.columns.toSeq ++
        Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }

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
