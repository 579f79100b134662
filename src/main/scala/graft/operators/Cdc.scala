package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Temporal.requireNoReserved

/** Change-data-capture primitives the reference's lake
  * (SURVEY.md §2.2 K2) stops short of: K2's MERGE is an
  * upsert-only latest-per-sk compaction, so a consumer can neither
  * APPLY an upstream change log that contains deletes nor OBSERVE
  * what a merge changed. `applyLog` is the missing write direction
  * (ordered I/U/D log → current snapshot); `changeFeed` is the
  * missing read direction (two snapshots → their I/U/D delta) —
  * together they make the lake's tables replicable: feed(before,
  * after) applied onto `before` reproduces `after`.
  *
  * 100 TB posture:
  *
  *  - `applyLog`: one hash shuffle on the key, then latest-per-key
  *    via `row_number` — Spark rewrites the rank-limit to a
  *    map-side `WindowGroupLimit`, so each input partition forwards
  *    at most one candidate row per key before the exchange
  *    (same shape as T4's deterministic dedup). No driver state.
  *  - `changeFeed`: one full-outer sort-merge join — exactly two
  *    exchanges, both on the key columns a downstream MERGE would
  *    shuffle on anyway. Unchanged rows are filtered join-side, so
  *    the feed's output is proportional to the churn, not the
  *    table. Skewed keys are AQE's skew-join problem, same as any
  *    key join in the engine.
  */
object Cdc {

  /** Latest-writer-wins apply of an I/U/D change log: for each key,
    * keep the payload of the last change in `seqCols` order unless
    * that change is a delete. `opCol` values: `"I"`/`"U"` upsert
    * (no distinction — both carry a full after-image), `"D"`
    * delete. The op and sequence columns are consumed (dropped from
    * the output); everything else is payload.
    *
    * Determinism contract: `seqCols` must totally order each key's
    * changes (e.g. a log sequence number, or (ts, tiebreak)).
    * Duplicate (key, seq) rows make "latest" ambiguous and the
    * output nondeterministic — same contract as every per-key
    * window operator in the engine (`tieCol` on Scd2/sessionize).
    *
    * NULL keys follow `Window.partitionBy` semantics: all-NULL-key
    * rows form one group and are applied like any other key.
    */
  def applyLog(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCols: Seq[String],
      opCol: String = "op"): DataFrame =
    latestPerKey(changes, keyCols, seqCols)
      .where(col(opCol) =!= "D")
      .drop((opCol +: seqCols): _*)

  /** The winning change per key — each key's last row in `seqCols`
    * order, op and sequence columns still attached (the shared fold
    * under [[applyLog]] and the lake's delete-aware
    * `MergeUpsert.applyChangesInto`, which needs the 'D' winners
    * too). */
  private[graft] def latestPerKey(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "change fold needs at least one key column")
    require(seqCols.nonEmpty, "change fold needs at least one sequence column")
    requireNoReserved(changes, Seq("__rn"))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Snapshot diff as a change feed: one row per key whose presence
    * or payload differs between `before` and `after`, tagged
    * `op = 'I'` (only in after), `'D'` (only in before), `'U'`
    * (in both, payload differs). Identical rows are not emitted.
    * Output columns: the keys, `op`, then the payload columns —
    * after-image for I/U, before-image for D (the standard CDC
    * delete carries what was removed).
    *
    * Schemas must match by name. Keys join null-safely (`<=>`), so
    * a NULL key matches a NULL key instead of producing a spurious
    * D+I pair; payload comparison is null-safe the same way.
    */
  def changeFeed(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "changeFeed needs at least one key column")
    require(
      before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: before [${before.columns.mkString(",")}] vs " +
        s"after [${after.columns.mkString(",")}]")
    requireNoReserved(before, Seq("__b", "__a", "op"))
    val valCols = before.columns.filterNot(keyCols.contains).toSeq

    val b = before.withColumn("__b", lit(true)).as("b")
    val a = after.withColumn("__a", lit(true)).as("a")
    val joinCond = keyCols.map(k => col(s"b.`$k`") <=> col(s"a.`$k`")).reduce(_ && _)
    val joined = b.join(a, joinCond, "full_outer")

    val op = when(col("b.__b").isNull, lit("I"))
      .when(col("a.__a").isNull, lit("D"))
      .otherwise(lit("U"))
    val changed = valCols
      .map(c => !(col(s"b.`$c`") <=> col(s"a.`$c`")))
      .foldLeft(lit(false))(_ || _)

    val keyOut = keyCols.map(k =>
      when(col("a.__a").isNotNull, col(s"a.`$k`")).otherwise(col(s"b.`$k`")).as(k))
    val valOut = valCols.map(c =>
      when(col("a.__a").isNotNull, col(s"a.`$c`")).otherwise(col(s"b.`$c`")).as(c))

    joined
      .where(col("b.__b").isNull || col("a.__a").isNull || changed)
      .select((keyOut :+ op.as("op")) ++ valOut: _*)
  }
}
