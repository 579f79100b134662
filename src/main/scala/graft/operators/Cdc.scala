package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Snapshot diff as a SIGNED delta relation — the multiset form
    * incremental view maintenance consumes (the counting algorithm
    * of Gupta/Mumick/Subrahmanian, SIGMOD '93): each inserted row
    * appears with `__sign = +1`, each deleted row with `-1`, and an
    * update contributes BOTH its before-image at `-1` and its
    * after-image at `+1`. Unchanged rows are silent, so like
    * [[changeFeed]] the output is churn-sized. Same null-safe key
    * join and schema contract as [[changeFeed]]; one full-outer
    * sort-merge join, two exchanges.
    */
  def signedDelta(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "signedDelta needs at least one key column")
    require(
      before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: before [${before.columns.mkString(",")}] vs " +
        s"after [${after.columns.mkString(",")}]")
    requireNoReserved(before, Seq("__b", "__a", "__r", "__sign"))
    val valCols = before.columns.filterNot(keyCols.contains).toSeq
    val outCols = keyCols ++ valCols

    val b = before.withColumn("__b", lit(true)).as("b")
    val a = after.withColumn("__a", lit(true)).as("a")
    val joinCond = keyCols.map(k => col(s"b.`$k`") <=> col(s"a.`$k`")).reduce(_ && _)
    val joined = b.join(a, joinCond, "full_outer")
    val changed = valCols
      .map(c => !(col(s"b.`$c`") <=> col(s"a.`$c`")))
      .foldLeft(lit(false))(_ || _)

    val afterRow = struct(
      lit(1).as("__sign") +: outCols.map(c => col(s"a.`$c`").as(c)): _*)
    val beforeRow = struct(
      lit(-1).as("__sign") +: outCols.map(c => col(s"b.`$c`").as(c)): _*)
    joined
      .where(col("b.__b").isNull || col("a.__a").isNull || changed)
      .select(explode(
        when(col("b.__b").isNull, array(afterRow))
          .when(col("a.__a").isNull, array(beforeRow))
          .otherwise(array(beforeRow, afterRow))).as("__r"))
      .select(col("__r.__sign").as("__sign") +: outCols.map(c => col(s"__r.`$c`")): _*)
  }

  /** Signed delta induced by applying an I/U/D change-log batch onto
    * a current snapshot — WITHOUT diffing snapshots: before-images
    * come from the pre-batch table probed by the batch's keys (one
    * join against a batch-sized, broadcast key set), after-images
    * from the log's own per-key fold. This is what lets a CDC apply
    * PIGGYBACK incremental view maintenance: fold the same batch
    * into TRUSTED and into any [[maintainAgg]]/[[maintainCube]]
    * state in one pass, never rescanning the table —
    * [[signedDelta]]'s full-outer diff needs both snapshots and
    * costs O(table); this costs O(batch) + one probed scan.
    *
    * An upsert that rewrites an identical payload emits its ±pair
    * anyway (the log doesn't know the old value matched); the pair
    * cancels exactly in maintenance — churn-sized noise, never
    * wrong. Winners are materialized once (eager, batch-sized):
    * they feed both the before-image probe and the after-images.
    *
    * Same determinism contract as [[applyLog]]: `seqCols` totally
    * orders each key's changes.
    */
  def logDelta(
      preTable: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val payloadCols = changes.columns.filterNot((opCol +: seqCols).contains)
    require(preTable.columns.sorted.sameElements(payloadCols.sorted),
      s"preTable schema [${preTable.columns.mkString(",")}] != log payload " +
        s"[${payloadCols.mkString(",")}]")
    requireNoReserved(preTable, Seq("__sign"))
    val winners = latestPerKey(changes, keyCols, seqCols).localCheckpoint(true)
    val keys = winners.select(keyCols.map(col): _*)
    val probeCond = keyCols
      .map(k => col(s"p.`$k`") <=> col(s"w.`$k`")).reduce(_ && _)
    val before = preTable.as("p")
      .join(broadcast(keys.as("w")), probeCond, "left_semi")
      .select(lit(-1).as("__sign") +: payloadCols.map(col): _*)
    val after = winners.where(col(opCol) =!= "D")
      .select(lit(1).as("__sign") +: payloadCols.map(col): _*)
    before.unionByName(after)
  }

  /** Signed delta of the inner equi-join `A ⋈ B` from the signed
    * deltas of each side and the PRE-batch snapshots — the bilinear
    * delta rule of incremental view maintenance:
    *
    *   Δ(A⋈B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * (joins are bilinear over signed multisets:
    * `(A+ΔA)⋈(B+ΔB) − A⋈B` expands to exactly those three terms),
    * with output signs the PRODUCT of the input signs. Feed the
    * result to [[maintainAgg]] — with `groupCols` = every view
    * column and no sum columns it maintains the view's row
    * multiset (each distinct row with its count `n`); with real
    * aggregates it maintains an aggregate OVER the join without ever
    * re-running it.
    *
    * Contract: `deltaA`/`deltaB` are [[signedDelta]] outputs against
    * `aOld`/`bOld` (the snapshots BEFORE this batch); non-key column
    * names must be disjoint across sides (the view's schema).
    * NULL join keys never match — standard inner-join semantics,
    * same as the from-scratch recompute.
    *
    * 100 TB posture: the two snapshot-side joins put the churn-sized
    * delta on one side, so AQE broadcasts it and the snapshot is
    * SCANNED, never shuffled; the cross term joins two churn-sized
    * inputs. Cost per batch is O(scan(A_old) + scan(B_old) + churn),
    * versus the full join's shuffle of both tables — and composing
    * with [[maintainAgg]] the view itself is never recomputed.
    *
    * Each delta feeds TWO terms, and a lazily-passed [[signedDelta]]
    * plan would re-run its full-outer snapshot diff once per term —
    * doubling the dominant cost (a plan audit showed exactly that:
    * four diff joins for two deltas). The deltas are therefore
    * materialized once up front (`localCheckpoint`, eager) — they
    * are churn-sized by contract, so pinning them is cheap, and all
    * three terms then reuse the computed blocks. Pass
    * `materialize = false` only when the deltas are already
    * checkpointed/persisted tables. */
  def joinDelta(
      deltaA: DataFrame,
      aOld: DataFrame,
      deltaB: DataFrame,
      bOld: DataFrame,
      on: Seq[String],
      materialize: Boolean = true): DataFrame = {
    require(on.nonEmpty, "joinDelta needs join key columns")
    Seq(deltaA -> "deltaA", deltaB -> "deltaB").foreach { case (d, nm) =>
      require(d.columns.contains("__sign"),
        s"$nm must carry __sign (build it with Cdc.signedDelta)")
    }
    requireNoReserved(aOld, Seq("__sign", "__sl", "__sr"))
    requireNoReserved(bOld, Seq("__sign", "__sl", "__sr"))
    val aPayload = aOld.columns.filterNot(on.contains)
    val bPayload = bOld.columns.filterNot(on.contains)
    val clash = aPayload.intersect(bPayload)
    require(clash.isEmpty,
      s"non-key columns ${clash.mkString(", ")} exist on both sides — " +
        "rename them; the view needs one column per name")
    val outCols = (on ++ aPayload ++ bPayload).map(col)
    val (da, db) =
      if (materialize) (deltaA.localCheckpoint(true), deltaB.localCheckpoint(true))
      else (deltaA, deltaB)

    def signed(df: DataFrame, s: String) = df.withColumnRenamed("__sign", s)
    def term(l: DataFrame, r: DataFrame): DataFrame =
      signed(l, "__sl").join(signed(r, "__sr"), on.toSeq, "inner")
        .select((col("__sl") * col("__sr")).as("__sign") +: outCols: _*)

    val aSnap = aOld.withColumn("__sign", lit(1))
    val bSnap = bOld.withColumn("__sign", lit(1))
    term(da, bSnap)
      .unionByName(term(aSnap, db))
      .unionByName(term(da, db))
  }

  /** Signed delta of the LEFT OUTER equi-join `A ⟕ B` — the one join
    * class that is NOT bilinear, because the null-extended rows carry
    * an indicator: as signed multisets,
    *
    *   A ⟕ B  =  A ⋈ B  ∪  Σ_{a∈A} [m_B(k_a) = 0] · (a, NULLs)
    *
    * where `m_B(k)` counts B's rows with key k (any NULL key
    * component ⇒ no match, standard SQL). Differencing:
    *
    *   Δ(A⟕B) = Δ(A⋈B)                                — [[joinDelta]]
    *          + Σ_{ΔA signed} [m_Bnew(k_a) = 0] · (a, NULLs)
    *          + Σ_{a∈A_old} ([m_Bnew=0] − [m_Bold=0]) · (a, NULLs)
    *
    * The second term is ΔA's own rows that stay unmatched under the
    * NEW B (matched ΔA rows are already covered by the inner delta);
    * the third fires only for keys whose match count TRANSITIONS
    * across zero — a key B's churn newly populates retracts the
    * null-extension (−1) of every old A row with that key, a key
    * B's churn empties inserts it (+1). Only keys in ΔB can
    * transition, so the term is churn-bounded by construction.
    *
    * Output schema == the view's (`on ++ A payload ++ B payload`,
    * B payload typed-NULL on extension rows) + `__sign` — feed it to
    * [[maintainAgg]] with `groupCols` = every view column for the
    * row multiset, or real aggregates for an aggregate over the
    * outer join (NULL-extended B values aggregate exactly like the
    * base view's NULLs: skipped by sum/count(c), counted by n).
    *
    * 100 TB posture: beyond [[joinDelta]]'s cost, one aggregate over
    * ΔB's keys, one B_old count probe and one A_old row probe — both
    * against the BROADCAST touched/transition key sets, so the
    * snapshots are scanned (never shuffled) and nothing re-runs the
    * join. m_new comes from `m_old + Σ ΔB signs`, so B_new is never
    * needed. The match-count table and the deltas are churn-sized
    * and materialized once (`materialize = false` only when the
    * caller already checkpointed the deltas).
    */
  def leftJoinDelta(
      deltaA: DataFrame,
      aOld: DataFrame,
      deltaB: DataFrame,
      bOld: DataFrame,
      on: Seq[String],
      materialize: Boolean = true): DataFrame = {
    require(on.nonEmpty, "leftJoinDelta needs join key columns")
    requireNoReserved(aOld, Seq("__sign", "__sl", "__sr", "__mo", "__mn", "__tsign"))
    requireNoReserved(bOld, Seq("__sign", "__sl", "__sr", "__mo", "__mn", "__tsign"))
    val (da, db) =
      if (materialize) (deltaA.localCheckpoint(true), deltaB.localCheckpoint(true))
      else (deltaA, deltaB)
    // the inner-join bilinear terms (also validates the delta/payload
    // contracts: __sign present, non-key names disjoint)
    val inner = joinDelta(da, aOld, db, bOld, on, materialize = false)
    inner.unionByName(antiExtensionDelta(
      da, aOld, db, bOld, on, touchedKeys(da, db, on),
      rightSideUnmatched = false))
  }

  /** Signed delta of the RIGHT OUTER equi-join `A ⟖ B`: the mirror of
    * [[leftJoinDelta]] — inner bilinear terms plus the null-extension
    * delta of B's unmatched rows (A payload typed-NULL). Output
    * schema stays the view's `on ++ A payload ++ B payload`. */
  def rightJoinDelta(
      deltaA: DataFrame,
      aOld: DataFrame,
      deltaB: DataFrame,
      bOld: DataFrame,
      on: Seq[String],
      materialize: Boolean = true): DataFrame = {
    require(on.nonEmpty, "rightJoinDelta needs join key columns")
    requireNoReserved(aOld, Seq("__sign", "__sl", "__sr", "__mo", "__mn", "__tsign"))
    requireNoReserved(bOld, Seq("__sign", "__sl", "__sr", "__mo", "__mn", "__tsign"))
    val (da, db) =
      if (materialize) (deltaA.localCheckpoint(true), deltaB.localCheckpoint(true))
      else (deltaA, deltaB)
    val inner = joinDelta(da, aOld, db, bOld, on, materialize = false)
    inner.unionByName(antiExtensionDelta(
      db, bOld, da, aOld, on, touchedKeys(da, db, on),
      rightSideUnmatched = true))
  }

  /** Signed delta of the FULL OUTER equi-join `A ⟗ B`: inner bilinear
    * terms plus BOTH sides' null-extension deltas. The `on` columns
    * carry the owning side's key values — exactly SQL's
    * `COALESCE(a.k, b.k)` under `USING`. Feed to [[maintainAgg]] like
    * the other join deltas. */
  def fullJoinDelta(
      deltaA: DataFrame,
      aOld: DataFrame,
      deltaB: DataFrame,
      bOld: DataFrame,
      on: Seq[String],
      materialize: Boolean = true): DataFrame = {
    require(on.nonEmpty, "fullJoinDelta needs join key columns")
    requireNoReserved(aOld, Seq("__sign", "__sl", "__sr", "__mo", "__mn", "__tsign"))
    requireNoReserved(bOld, Seq("__sign", "__sl", "__sr", "__mo", "__mn", "__tsign"))
    val (da, db) =
      if (materialize) (deltaA.localCheckpoint(true), deltaB.localCheckpoint(true))
      else (deltaA, deltaB)
    val inner = joinDelta(da, aOld, db, bOld, on, materialize = false)
    // the touched-key set is symmetric in the two deltas — compute
    // (and pin) it ONCE for both anti-extension directions
    val tk = touchedKeys(da, db, on)
    inner
      .unionByName(antiExtensionDelta(
        da, aOld, db, bOld, on, tk, rightSideUnmatched = false))
      .unionByName(antiExtensionDelta(
        db, bOld, da, aOld, on, tk, rightSideUnmatched = true))
  }

  /** The non-bilinear half of an outer-join delta: the signed change
    * of `side`'s null-extended (unmatched) rows against the churning
    * `other` side —
    *
    *   Σ_{Δside signed} [m_otherNew(k) = 0] · (row, NULLs)
    *   + Σ_{row∈sideOld} ([m_otherNew=0] − [m_otherOld=0]) · (row, NULLs)
    *
    * `m_new = m_old + Σ Δother signs`, so the new other-side snapshot
    * is never needed; both probes go against BROADCAST touched /
    * transition key sets. `rightSideUnmatched` only picks the output
    * projection (which payload gets the typed NULLs) so both outer
    * directions share one implementation. */
  /** DISTINCT non-null keys touched by either delta — churn-sized,
    * pinned once (it feeds both probes of [[antiExtensionDelta]],
    * and [[fullJoinDelta]] reuses one set for both directions). */
  private def touchedKeys(
      dA: DataFrame, dB: DataFrame, on: Seq[String]): DataFrame = {
    val keyCols = on.map(col)
    val nonNullKey = on.map(col(_).isNotNull).reduce(_ && _)
    dA.select(keyCols: _*).where(nonNullKey)
      .unionByName(dB.select(keyCols: _*).where(nonNullKey))
      .distinct().localCheckpoint(true)
  }

  private def antiExtensionDelta(
      dSide: DataFrame,
      sideOld: DataFrame,
      dOther: DataFrame,
      otherOld: DataFrame,
      on: Seq[String],
      tk: DataFrame,
      rightSideUnmatched: Boolean): DataFrame = {
    val sidePayload = sideOld.columns.filterNot(on.contains)
    val otherPayload = otherOld.columns.filterNot(on.contains)
    val keyCols = on.map(col)
    val otherNulls = otherPayload.map(c =>
      lit(null).cast(otherOld.schema(c).dataType).as(c))
    // view column order is always (on, A payload, B payload)
    val outCols =
      if (rightSideUnmatched) keyCols ++ otherNulls ++ sidePayload.map(col)
      else keyCols ++ sidePayload.map(col) ++ otherNulls
    def extended(src: DataFrame, sign: Column): DataFrame =
      src.select(sign.as("__sign") +: outCols: _*)

    // match-count table over the TOUCHED (non-null) key set:
    // m_old from one probed snapshot count, m_new = m_old + Σ Δ signs
    val nonNullKey = on.map(col(_).isNotNull).reduce(_ && _)
    val mOld = otherOld.join(broadcast(tk), on.toSeq, "left_semi")
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__mo"))
    val dOtherCnt = dOther.where(nonNullKey).groupBy(keyCols: _*)
      .agg(sum(col("__sign").cast("long")).as("__md"))
    val m = tk.join(mOld, on.toSeq, "left").join(dOtherCnt, on.toSeq, "left")
      .select(keyCols :+ coalesce(col("__mo"), lit(0L)).as("__mo") :+
        (coalesce(col("__mo"), lit(0L)) + coalesce(col("__md"), lit(0L)))
          .as("__mn"): _*)
      .localCheckpoint(true)

    // Δside rows unmatched under the NEW other side (a NULL-keyed or
    // untouched-miss row falls off the left join ⇒ coalesce to 0 ⇒
    // unmatched)
    val t1 = extended(
      dSide.join(broadcast(m.select(keyCols :+ col("__mn"): _*)), on.toSeq, "left")
        .where(coalesce(col("__mn"), lit(0L)) === 0L),
      col("__sign"))

    // transition keys: every OLD side row with that key gains (+1) or
    // loses (−1) its null-extension
    val trans = m.where(
      (col("__mo") === 0L && col("__mn") > 0L) ||
        (col("__mo") > 0L && col("__mn") === 0L))
      .select(keyCols :+
        when(col("__mn") === 0L, lit(1)).otherwise(lit(-1)).as("__tsign"): _*)
    val t2 = extended(
      sideOld.join(broadcast(trans), on.toSeq, "inner"), col("__tsign"))

    t1.unionByName(t2)
  }

  /** Stable carried type for maintained sums: max-precision decimal
    * so the state schema never drifts as deltas re-aggregate into
    * it, and the arithmetic stays exact under retraction. */
  private val SumType = "decimal(38,6)"

  /** Bootstrap aggregate state for [[maintainAgg]]: per group, the
    * row count `n`, and for each sum column `c` its non-null count
    * `nn_<c>` and exact sum `sum_<c>`. The non-null counts are what
    * make retraction faithful to SQL aggregate semantics: when the
    * last non-null value of a group is retracted the sum must
    * return to NULL, which the signed sum alone (stuck at 0) cannot
    * express. Sum columns must be exact numerics (integral or
    * decimal) — floating-point retraction is lossy by construction
    * and is rejected loudly.
    */
  def aggState(
      df: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    requireMaintainable(df, groupCols, sumCols)
    // Cast per-row BEFORE summation — the same rounding/overflow
    // discipline maintainAgg's delta path uses. Summing the native
    // type first would round scale>6 decimals once at the end (the
    // delta path rounds each row) and could overflow a long sum;
    // either way the maintained state would drift from this
    // bootstrap. Per-row rounding is retraction-safe: a row's +cast
    // and -cast round identically, so they cancel exactly.
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sumCols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          sum(col(c).cast(SumType)).cast(SumType).as(s"sum_$c"))): _*)
  }

  /** Incremental maintenance of an [[aggState]] table from a
    * [[signedDelta]]: the counting algorithm. Each signed delta row
    * is projected straight into state shape (`n = sign`,
    * `nn = sign · [c IS NOT NULL]`, `sum = sign · c`), unioned with
    * the existing state, and re-aggregated; groups whose count
    * reaches zero vanish, and a sum whose non-null count reaches
    * zero returns to NULL. Output schema == [[aggState]] schema, so
    * maintenance composes: state after batch k feeds batch k+1
    * without rescanning the base table.
    *
    * 100 TB posture: this is the whole point of the operator — the
    * fact table is NEVER rescanned. The plan is one union of
    * |groups| state rows with |churn| delta rows and a single hash
    * aggregate: exactly ONE exchange, on the group keys, with
    * map-side partial aggregation on both branches
    * (`PlanQualitySpec` pins the exchange count). Cost is
    * O(|state| + |churn|) regardless of base-table size.
    */
  def maintainAgg(
      state: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    requireMaintainable(delta, groupCols, sumCols)
    require(delta.columns.contains("__sign"),
      "delta must carry __sign (build it with Cdc.signedDelta)")
    val stateCols = groupCols ++ Seq("n") ++
      sumCols.flatMap(c => Seq(s"nn_$c", s"sum_$c"))
    require(state.columns.sorted.sameElements(stateCols.sorted),
      s"state schema [${state.columns.mkString(",")}] != expected " +
        s"[${stateCols.mkString(",")}] (build it with Cdc.aggState)")

    val deltaAsState = delta.select(
      groupCols.map(col) ++ Seq(col("__sign").cast("long").as("n")) ++
        sumCols.flatMap(c => Seq(
          when(col(c).isNotNull, col("__sign")).otherwise(0)
            .cast("long").as(s"nn_$c"),
          (col(c).cast(SumType) * col("__sign")).cast(SumType).as(s"sum_$c"))): _*)

    // coalesce over a non-null literal keeps n / nn_<c> non-nullable,
    // so the output schema equals aggState's exactly (sum() alone is
    // nullable; every surviving group aggregated >= 1 row, so the
    // fallback branch never actually fires).
    val keyOut = restoreKeyNullability(state, groupCols)
    state.select(stateCols.map(col): _*)
      .unionByName(deltaAsState.select(stateCols.map(col): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum("n"), lit(0L)).as("n"),
        sumCols.flatMap(c => Seq(
          coalesce(sum(s"nn_$c"), lit(0L)).as(s"nn_$c"),
          sum(s"sum_$c").cast(SumType).as(s"sum_$c"))): _*)
      .where(col("n") > 0)
      .select(
        keyOut ++ Seq(col("n")) ++ sumCols.flatMap(c => Seq(
          col(s"nn_$c"),
          when(col(s"nn_$c") === 0, lit(null).cast(SumType))
            .otherwise(col(s"sum_$c")).as(s"sum_$c"))): _*)
  }

  /** Group-column nullability follows the INPUT STATE's schema: a
    * delta branch built by explode / a full-outer join is marked
    * nullable, and a union would widen a non-nullable state key to
    * nullable — breaking the output == bootstrap schema contract for
    * null-free sources. AssertNotNull restores the state's declared
    * non-nullability (and fails LOUDLY if a delta ever does carry a
    * null key for such a state — silently widening a composed state
    * chain's schema would be worse). */
  private def restoreKeyNullability(
      state: DataFrame,
      groupCols: Seq[String]): Seq[org.apache.spark.sql.Column] =
    groupCols.map { g =>
      if (state.schema(g).nullable) col(g)
      else {
        import org.apache.spark.sql.graftglue.ColumnGlue
        ColumnGlue.column(
          org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
            ColumnGlue.expression(col(g)))).as(g)
      }
    }

  /** Bootstrap extrema state for [[maintainExtrema]]: per group, the
    * row count `n`, and for each extrema column `c` its non-null
    * count `nn_<c>` and exact `min_<c>` / `max_<c>`. Unlike
    * [[aggState]]'s sums, min/max do no arithmetic, so any orderable
    * column type is accepted (numerics, strings, dates, decimals).
    */
  def extremaState(
      df: DataFrame,
      groupCols: Seq[String],
      extCols: Seq[String]): DataFrame = {
    requireExtrema(df, groupCols, extCols)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        extCols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
  }

  /** Incremental maintenance of an [[extremaState]] table from a
    * [[signedDelta]]. MIN/MAX are not self-maintainable under
    * deletion (Gupta & Mumick's classification: a retracted extremum
    * says nothing about the runner-up), so no delta-only rule exists.
    * This operator does the best possible split:
    *
    *  - **Fold path** (pure delta arithmetic, no base access):
    *    insertions tighten extrema monotonically
    *    (`min' = least(min, insMin)`), and counts are signed sums —
    *    so any group whose retractions all sit STRICTLY INSIDE its
    *    current (min, max) open interval folds without touching the
    *    base table. Appends, mid-range deletes, upward re-prices:
    *    all fold.
    *  - **Recompute path**: a group is ENDANGERED iff some retracted
    *    non-null value ties or crosses a current extremum
    *    (`delMin ≤ min` or `delMax ≥ max`, which also covers the
    *    non-null count reaching zero — the last value retracted IS
    *    the min), or the group is absent from state but receives
    *    retractions (inconsistent input made loud downstream). Only
    *    those groups are re-aggregated from `baseAfter`, the
    *    post-churn snapshot.
    *
    * Output schema == [[extremaState]] schema, so maintenance
    * composes batch-to-batch like [[maintainAgg]].
    *
    * 100 TB posture: endangered groups are bounded by the churn, and
    * the recompute is `baseAfter ⋉ endangeredKeys` — a LEFT SEMI
    * against a churn-sized, broadcastable key set, so the base table
    * is scanned AT MOST once, never shuffled, and only endangered
    * groups' rows reach the aggregate. With the base clustered on
    * the group key (z-order / partitioning) the scan itself prunes.
    * The common append-heavy batch touches zero base data.
    */
  def maintainExtrema(
      state: DataFrame,
      delta: DataFrame,
      baseAfter: DataFrame,
      groupCols: Seq[String],
      extCols: Seq[String]): DataFrame = {
    requireExtrema(delta, groupCols, extCols)
    require(delta.columns.contains("__sign"),
      "delta must carry __sign (build it with Cdc.signedDelta)")
    val stateCols = groupCols ++ Seq("n") ++
      extCols.flatMap(c => Seq(s"nn_$c", s"min_$c", s"max_$c"))
    require(state.columns.sorted.sameElements(stateCols.sorted),
      s"state schema [${state.columns.mkString(",")}] != expected " +
        s"[${stateCols.mkString(",")}] (build it with Cdc.extremaState)")

    // Per-group delta summary: signed counts plus the insertion-side
    // extrema (fold inputs) and deletion-side extrema (danger test).
    val deltaAgg = delta.groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(col("__sign")), lit(0L)).as("__dn"),
        extCols.flatMap(c => Seq(
          coalesce(sum(when(col(c).isNotNull, col("__sign")).otherwise(0))
            .cast("long"), lit(0L)).as(s"__dnn_$c"),
          min(when(col("__sign") === 1, col(c))).as(s"__imin_$c"),
          max(when(col("__sign") === 1, col(c))).as(s"__imax_$c"),
          min(when(col("__sign") === -1, col(c))).as(s"__dmin_$c"),
          max(when(col("__sign") === -1, col(c))).as(s"__dmax_$c"))): _*)

    val st = state.as("s")
    val da = deltaAgg.as("d")
    val joinCond = groupCols
      .map(k => col(s"s.`$k`") <=> col(s"d.`$k`")).reduce(_ && _)
    val joined = st.join(da, joinCond, "full_outer")

    val stateAbsent = col("s.n").isNull
    val anyDelete = extCols
      .map(c => col(s"d.`__dmin_$c`").isNotNull)
      .foldLeft(lit(false))(_ || _)
    val endangered = extCols.map { c =>
      (col(s"d.`__dmin_$c`").isNotNull && col(s"s.`min_$c`").isNotNull &&
        col(s"d.`__dmin_$c`") <= col(s"s.`min_$c`")) ||
      (col(s"d.`__dmax_$c`").isNotNull && col(s"s.`max_$c`").isNotNull &&
        col(s"d.`__dmax_$c`") >= col(s"s.`max_$c`"))
    }.foldLeft(stateAbsent && anyDelete)(_ || _)

    val keySel = groupCols.map(k =>
      when(col("s.n").isNotNull, col(s"s.`$k`"))
        .otherwise(col(s"d.`$k`")).as(k))

    // Endangered group keys — churn-bounded by construction, so the
    // semi probe broadcasts. Pinned eagerly: the key set feeds one
    // join but derives from the same diff the fold reads, and a lazy
    // plan would re-run the diff for each consumer.
    val dangerKeys = joined.where(endangered)
      .select(keySel: _*).localCheckpoint(true)

    val folded = joined.where(!endangered)
      .select(
        keySel ++
          Seq((coalesce(col("s.n"), lit(0L)) + coalesce(col("d.__dn"), lit(0L)))
            .as("n")) ++
          extCols.flatMap(c => Seq(
            (coalesce(col(s"s.`nn_$c`"), lit(0L)) +
              coalesce(col(s"d.`__dnn_$c`"), lit(0L))).as(s"nn_$c"),
            least(col(s"s.`min_$c`"), col(s"d.`__imin_$c`")).as(s"min_$c"),
            greatest(col(s"s.`max_$c`"), col(s"d.`__imax_$c`")).as(s"max_$c"))): _*)
      .where(col("n") > 0)

    val dangerCond = groupCols
      .map(k => col(s"b.`$k`") <=> col(s"k.`$k`")).reduce(_ && _)
    val recomputed = extremaState(
      baseAfter.as("b")
        .join(broadcast(dangerKeys.as("k")), dangerCond, "left_semi"),
      groupCols, extCols)

    val keyOut = restoreKeyNullability(state, groupCols)
    folded.unionByName(recomputed)
      .select(keyOut ++ stateCols.filterNot(groupCols.contains).map(col): _*)
  }

  /** Count-distinct view over a maintained two-level counting state:
    * bootstrap the inner state with
    * `aggState(df, groupCols :+ valueCol, Nil)` (one row per (group,
    * value) with its multiplicity `n`), maintain it with plain
    * [[maintainAgg]] — distinct-count is NOT self-maintainable under
    * deletion, but the (group, value) multiset IS, which is exactly
    * the standard two-level counting reduction — and read the view
    * off with this projection: `n` is the group's total row count
    * (Σ multiplicities) and `nd_<c>` counts the surviving distinct
    * non-null values (`COUNT(DISTINCT c)` semantics: a group whose
    * values are all NULL reports 0, vanished values don't count
    * because maintenance dropped their rows at n = 0).
    *
    * 100 TB posture: the inner state is bounded by the number of
    * DISTINCT (group, value) pairs, not the base table; maintenance
    * is maintainAgg's single exchange on (group, value); this view
    * is one more hash aggregate on group. The base is never
    * rescanned — the delta-only property min/max can't have.
    */
  def distinctCount(
      valueState: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(valueState.columns.contains("n") &&
      valueState.columns.contains(valueCol),
      s"valueState must be an aggState over ${groupCols.mkString(",")},$valueCol")
    val keyOut = restoreKeyNullability(valueState, groupCols)
    valueState.groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum(when(col(valueCol).isNotNull, 1L).otherwise(0L)),
          lit(0L)).as(s"nd_$valueCol"))
      .select(keyOut ++ Seq(col("n"), col(s"nd_$valueCol")): _*)
  }

  /** Exact maintained top-k per group, read off the same two-level
    * counting state [[distinctCount]] uses: the (group, value)
    * multiset is self-maintainable, and the top-k BY MULTIPLICITY is
    * a rank window over its surviving rows — so the view is exact
    * under deletion, where sketch-based heavy hitters ([[graft.functions.MgSketch]])
    * only bound insert-only streams. Ties break by value ascending
    * (deterministic output, same discipline as every rank operator
    * in the engine). NULL values rank like any other (a NULL key's
    * multiplicity is still a multiplicity) — filter the state first
    * if COUNT(value)-style semantics are wanted.
    *
    * 100 TB posture: one rank window over |surviving (group, value)
    * pairs| — bounded by value cardinality, not the base table; the
    * window's exchange is on the group key, map-side rank-limited
    * (`WindowGroupLimit`), and the base is never rescanned.
    */
  def topKByCount(
      valueState: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"topKByCount needs k >= 1, got $k")
    require(valueState.columns.contains("n") &&
      valueState.columns.contains(valueCol),
      s"valueState must be an aggState over ${groupCols.mkString(",")},$valueCol")
    requireNoReserved(valueState, Seq("rank"))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("n").desc, col(valueCol).asc)
    valueState
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exact maintained discrete quantile per group, read off the same
    * two-level counting state as [[distinctCount]] / [[topKByCount]]
    * — the third view over one maintained multiset, and like the
    * others exact under deletion, where KLL-style sketches cannot
    * retract. Returns, per group, the smallest surviving value whose
    * cumulative multiplicity reaches ⌈q · total⌉ (the classic
    * type-1 / discrete quantile; q = 0.5 is the exact maintained
    * MEDIAN). NULL values are excluded, SQL-percentile style; a
    * group with only NULLs emits no row.
    *
    * 100 TB posture: one rank-window pass over |surviving (group,
    * value) pairs| — bounded by value cardinality, not the base
    * table, which is never rescanned.
    */
  def quantileByCount(
      valueState: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile q must be in (0, 1], got $q")
    require(valueState.columns.contains("n") &&
      valueState.columns.contains(valueCol),
      s"valueState must be an aggState over ${groupCols.mkString(",")},$valueCol")
    requireNoReserved(valueState, Seq("__cum", "__tot", "__target"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cumW = byGroup.orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueState.where(col(valueCol).isNotNull)
      .withColumn("__cum", sum("n").over(cumW))
      .withColumn("__target",
        ceil(lit(q) * sum("n").over(byGroup)).cast("long"))
      .where(col("__cum") >= col("__target") &&
        col("__cum") - col("n") < col("__target"))
      .select(groupCols.map(col) :+ col(valueCol).as(s"q_$valueCol"): _*)
  }

  /** Bootstrap state for a maintained CUBE / ROLLUP / GROUPING SETS
    * view: the finest [[aggState]] (ONE base-table scan), rolled up
    * in STATE SPACE into one stacked row set per grouping set,
    * tagged with a `__gid` discriminator (the set's position in
    * `sets`), absent columns NULL. Counts and non-null counts add
    * across finest groups; exact decimal sums add with SQL
    * null-skipping, so an all-null rollup's sum stays NULL without
    * special-casing. The NULL-vs-NULL ambiguity that makes raw cube
    * OUTPUT unmaintainable (a NULL group key vs a rolled-up total
    * collide) is exactly what `__gid` resolves.
    *
    * 100 TB posture: one base scan for the finest state, then
    * |finest groups| × |sets| rows through one more hash aggregate —
    * the lattice never rescans the base, unlike |sets| independent
    * bootstraps.
    */
  def cubeState(
      df: DataFrame,
      groupCols: Seq[String],
      sets: Seq[Seq[String]],
      sumCols: Seq[String]): DataFrame = {
    requireSets(df, groupCols, sets)
    // The finest state feeds |sets| union branches, and a lazy plan
    // re-runs the base scan + aggregate once per branch (the plan pin
    // caught exactly that: three FileScans for three sets). Pin it
    // eagerly — it is |groups|-sized, the same discipline as
    // joinDelta's delta materialization.
    val finest = aggState(df, groupCols, sumCols).localCheckpoint(true)
    val stacked = sets.zipWithIndex.map { case (s, i) =>
      finest.select(
        groupCols.map(g =>
          if (s.contains(g)) col(g)
          else lit(null).cast(finest.schema(g).dataType).as(g)) ++
          Seq(lit(i).as("__gid"), col("n")) ++
          sumCols.flatMap(c => Seq(col(s"nn_$c"), col(s"sum_$c"))): _*)
    }.reduce(_ unionByName _)
    val keys = (groupCols :+ "__gid").map(col)
    stacked.groupBy(keys: _*)
      .agg(
        coalesce(sum("n"), lit(0L)).as("n"),
        sumCols.flatMap(c => Seq(
          coalesce(sum(s"nn_$c"), lit(0L)).as(s"nn_$c"),
          sum(s"sum_$c").cast(SumType).as(s"sum_$c"))): _*)
  }

  /** Incremental maintenance of a [[cubeState]]: the signed delta is
    * expanded through the SAME grouping sets (linearity again — the
    * Expand is a union of projections, and projections commute with
    * signed multisets), then ONE [[maintainAgg]] pass maintains
    * every grouping set simultaneously. A group vanishing from the
    * finest set vanishes from exactly the rollup levels whose counts
    * reach zero — the counting algorithm per set, for free.
    *
    * The delta feeds |sets| expansion branches, so it is
    * materialized once up front (same eager-pin discipline as
    * [[joinDelta]] — it is churn-sized by contract).
    *
    * 100 TB posture: |delta| × |sets| rows through maintainAgg's
    * single exchange. The base is never rescanned for ANY level —
    * the property a lattice of independent materialized views would
    * need |sets| maintenance runs to get.
    */
  def maintainCube(
      state: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      sets: Seq[Seq[String]],
      sumCols: Seq[String]): DataFrame = {
    requireSets(delta, groupCols, sets)
    require(delta.columns.contains("__sign"),
      "delta must carry __sign (build it with Cdc.signedDelta)")
    val d = delta.localCheckpoint(true)
    val expanded = sets.zipWithIndex.map { case (s, i) =>
      d.select(
        groupCols.map(g =>
          if (s.contains(g)) col(g)
          else lit(null).cast(d.schema(g).dataType).as(g)) ++
          Seq(lit(i).as("__gid"), col("__sign")) ++ sumCols.map(col): _*)
    }.reduce(_ unionByName _)
    maintainAgg(state, expanded, groupCols :+ "__gid", sumCols)
  }

  private def requireSets(
      df: DataFrame,
      groupCols: Seq[String],
      sets: Seq[Seq[String]]): Unit = {
    require(sets.nonEmpty, "grouping-set maintenance needs grouping sets")
    sets.foreach { s =>
      val unknown = s.filterNot(groupCols.contains)
      require(unknown.isEmpty,
        s"grouping set columns ${unknown.mkString(", ")} not in groupCols")
    }
    require(sets.distinct.size == sets.size, "duplicate grouping sets")
    require(!df.columns.contains("__gid"),
      "column __gid collides with the grouping-set discriminator")
  }

  private def requireExtrema(
      df: DataFrame,
      groupCols: Seq[String],
      extCols: Seq[String]): Unit = {
    require(groupCols.nonEmpty, "extrema maintenance needs group columns")
    require(extCols.nonEmpty, "extrema maintenance needs extrema columns")
    val reserved = Seq("n", "__sign", "__dn") ++
      extCols.flatMap(c => Seq(s"nn_$c", s"min_$c", s"max_$c",
        s"__dnn_$c", s"__imin_$c", s"__imax_$c", s"__dmin_$c", s"__dmax_$c"))
    val clash = (groupCols ++ extCols).filter(reserved.contains)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with the " +
        "extrema state's internal names")
    extCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"extrema column $c must be orderable, got $dt")
    }
  }

  private def requireMaintainable(
      df: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
    require(groupCols.nonEmpty, "aggregate maintenance needs group columns")
    val reserved = Seq("n", "__sign") ++
      sumCols.flatMap(c => Seq(s"nn_$c", s"sum_$c"))
    val clash = (groupCols ++ sumCols).filter(reserved.contains)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with the " +
        "maintained state's internal names (n, __sign, nn_<c>, sum_<c>)")
    sumCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt match {
        case _: DecimalType => true
        case DoubleType | FloatType => false
        case _ => dt.isInstanceOf[org.apache.spark.sql.types.NumericType]
      }, s"sum column $c is $dt: retraction needs an exact numeric " +
        "(integral or decimal) — pre-cast floating point explicitly")
    }
  }
}
