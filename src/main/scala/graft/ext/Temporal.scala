package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType}

/** Temporal relational operators Spark lacks as built-ins — as-of
  * join, interval (range) join, gap sessionization — each expressed
  * as one hash shuffle plus window/join built-ins. None of them
  * enumerates candidate pairs beyond what the output needs: the
  * naive formulations (join-then-argmax for as-of, θ-join for range)
  * are quadratic per key and die at scale; these are the standard
  * linear-shuffle forms (pandas `merge_asof` / Flink temporal join
  * for as-of; bin-bucketed interval join as in Spark's own
  * range-join hints on Databricks runtime, rebuilt here on open
  * Spark).
  */
object Temporal {

  /** Micros-since-epoch of a timestamp column. `unix_micros` only
    * accepts TIMESTAMP_LTZ; the fixtures' parquet timestamps read as
    * NTZ, where the LTZ cast is lossless because the engine pins the
    * session to UTC (`Sessions.local`). */
  private[graft] def micros(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampNTZType => unix_micros(expr(s"cast(`$c` as timestamp)"))
      case _ => unix_micros(col(c))
    }

  /** Fail with the contract, not a silent shadow: the epoch
    * operators' internal plumbing owns these column names. */
  private[graft] def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.filter(reserved.contains(_))
    require(clash.isEmpty,
      s"input uses reserved internal column names: ${clash.mkString(", ")}")
  }

  /** As-of join: for every left row, the single most recent right
    * row with the same key and `right.time <= left.time` (inclusive;
    * `strict = true` uses `<`). Left rows with no candidate keep
    * null payload columns (LEFT ASOF semantics).
    *
    * Union-and-carry implementation: tag both inputs, union them,
    * and run one running `last(payload, ignoreNulls)` window per key
    * ordered by (time, side). For the inclusive variant right rows
    * sort *before* left rows at equal timestamps (so an exactly
    * concurrent right row is visible); strict flips the tie order.
    * Cost: ONE hash shuffle on the key + a per-partition sort —
    * what any sort-merge join pays — with no candidate explosion.
    *
    * 100 TB posture: scales like sort-merge join; WindowExec spills,
    * so a key's history need not fit in memory, but one hot key
    * serializes within its partition — pre-reduce the right side per
    * (key, time) to bound it. The right side MUST be unique per
    * (keys, timeCol): with duplicates, which payload survives would
    * depend on shuffle order (callers reduce first, e.g.
    * `groupBy(key, ts).agg(max_by(…))`). Right rows with a null key
    * or time are dropped (they can never be a most-recent match);
    * left rows with a null time match nothing.
    *
    * Right payload column names (everything except the keys) must
    * not collide with left column names — rename on the right input.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      strict: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains(_)).toSeq
    val clash = payloadCols.filter(left.columns.contains(_))
    require(clash.isEmpty,
      s"right payload columns collide with left: ${clash.mkString(", ")}")
    // fail with the contract, not a silent shadow: the union/window
    // plumbing owns these names
    val reserved = Set("__t", "__ord", "__is_left", "__lrow", "__rpay", "__match")
    val resClash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(resClash.isEmpty,
      s"inputs use reserved internal column names: ${resClash.mkString(", ")}")

    // At equal time the lower __ord is seen first by the running
    // window; inclusive wants the right row visible to a concurrent
    // left row, strict wants it hidden.
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)
    val lrowType = StructType(left.schema.fields)
    val rpayType = StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))

    val taggedRight = right
      .where(keys.foldLeft(col(rightTime).isNotNull)(_ && col(_).isNotNull))
      .select(
        keys.map(col) ++ Seq(
          col(rightTime).as("__t"),
          lit(rightOrd).as("__ord"),
          lit(false).as("__is_left"),
          lit(null).cast(lrowType).as("__lrow"),
          struct(payloadCols.map(col): _*).as("__rpay")): _*)

    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(leftOrd).as("__ord"),
        lit(true).as("__is_left"),
        struct(left.columns.map(col).toSeq: _*).as("__lrow"),
        lit(null).cast(rpayType).as("__rpay")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__is_left"))
      .select(
        left.columns.toSeq.map(c => col(s"__lrow.`$c`").as(c)) ++
          payloadCols.map(c => col(s"__match.`$c`").as(c)): _*)
  }

  /** Skew-robust as-of join: same semantics as [[asOfJoin]]
    * (inclusive variant), but a single hot key no longer serializes
    * inside one window partition — time is cut into `epochSeconds`
    * epochs and the key's history is processed per (key, epoch) in
    * parallel:
    *
    *  1. same-epoch pass: [[asOfJoin]] keyed by (key, epoch) — right
    *     rows only ever match left rows of their own epoch here, so
    *     partitions are (key, epoch)-sized, not key-sized;
    *  2. carry pass: the latest right row of each (key, epoch) is a
    *     |keys|·|epochs|-sized summary; an epoch-level as-of join
    *     (strict: a left row's own epoch is already covered by pass
    *     1) assigns every left epoch the newest summary row from any
    *     EARLIER epoch — the recursion bottoms out because the
    *     summary is tiny;
    *  3. coalesce: a left row takes its same-epoch match, falling
    *     back to its epoch's carry.
    *
    * Correctness: the most recent right row at-or-before t is either
    * in t's epoch (pass 1 finds exactly it) or is the globally
    * latest right row of some earlier epoch (pass 2's summary
    * retains per-epoch-latest rows, and the epoch-level as-of picks
    * the newest among earlier epochs). Cost: two shuffles of the
    * data (union + (key, epoch) window) plus window work over the
    * small summary — the price of bounding partition size by epoch
    * width instead of key history. Pick `epochSeconds` so a hot
    * key's densest epoch fits a task comfortably.
    */
  def asOfJoinEpochs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      epochSeconds: Long): DataFrame = {
    require(epochSeconds > 0, s"epochSeconds must be positive, got $epochSeconds")
    // fail with the contract, not a silent shadow (asOfJoin itself
    // guards its own __t/__ord/… names on the pass-1 call)
    val reserved = Seq("__epoch", "__best", "__carry", "__matched",
      "__us_l", "__us_r", "__repoch")
    requireNoReserved(left, reserved)
    requireNoReserved(right, reserved)
    val epochMicros = epochSeconds * 1000000L
    // the payload columns BESIDES rightTime — it is prepended
    // explicitly wherever the full payload is named below
    val payloadCols = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime).toSeq

    val l = left
      .withColumn("__us_l", micros(left, leftTime))
      .withColumn("__epoch", expr(s"__us_l div $epochMicros"))
      .drop("__us_l")
    val r = right
      .withColumn("__us_r", micros(right, rightTime))
      .withColumn("__epoch", expr(s"__us_r div $epochMicros"))
      .drop("__us_r")

    // pass 1: same-epoch as-of, parallel across a key's epochs
    val sameEpoch = asOfJoin(l, r, keys :+ "__epoch", leftTime, rightTime)

    // pass 2: per-(key, epoch) latest right row (its max-time payload),
    // then a strict epoch-level as-of to pull the newest earlier-epoch
    // summary into every left epoch
    val summary = r
      .groupBy((keys :+ "__epoch").map(col): _*)
      .agg(max_by(struct((rightTime +: payloadCols).map(col): _*), col(rightTime))
        .as("__best"))
      .select(keys.map(col) :+ col("__epoch").as("__repoch") :+ col("__best"): _*)
    val leftEpochs = l.select(keys.map(col) :+ col("__epoch"): _*).distinct()
    val carry = asOfJoin(
      leftEpochs, summary,
      keys, leftTime = "__epoch", rightTime = "__repoch", strict = true)
      .select(keys.map(col) ++ Seq(col("__epoch"),
        col("__best").as("__carry")): _*)

    // pass 3: same-epoch match wins; else the carry. The pick is at
    // ROW granularity — rightTime is non-null for every real match
    // (null-time right rows never match), so its nullness is the
    // match flag; a per-column coalesce would blend a matched row's
    // legitimately NULL payload field with the older carry row's
    // value, diverging from asOfJoin.
    val joined = sameEpoch.join(carry, keys :+ "__epoch", "left")
      .withColumn("__matched", col(rightTime).isNotNull)
    val out = (rightTime +: payloadCols).foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("__matched"), col(c)).otherwise(col(s"__carry.`$c`")))
    }
    out.drop("__carry", "__epoch", "__matched")
      .select((left.columns.toSeq ++ (rightTime +: payloadCols)).map(col): _*)
  }

  /** Interval × point range join with NO equi-key: emits every
    * (interval row, point row) pair with `point ∈ [start, end)`.
    *
    * Bin-bucketed: time is cut into fixed `binSeconds` bins; each
    * interval registers in every bin it overlaps (≤ len/bin + 1
    * entries — callers pick binSeconds ≈ the typical interval length
    * so the fan-out stays ~2), each point lands in exactly ONE bin,
    * so the bin equi-join emits every containing pair exactly once —
    * no post-join dedup — and the containment predicate only prunes.
    * A θ-join (what the naive SQL plans as: nested-loop over the
    * cross product) touches |intervals|·|points| pairs; this touches
    * only same-bin pairs, shuffles both sides once on the bin key,
    * and AQE's skew split handles hot bins.
    *
    * Bin ids use truncating `div`, which is monotone over the whole
    * long range, so containment never crosses outside the listed bin
    * span even for pre-1970 timestamps. Intervals with end ≤ start
    * are empty under half-open semantics and are dropped.
    */
  def rangeJoinBinned(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      pointCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val dup = intervals.columns.toSet intersect points.columns.toSet
    require(dup.isEmpty, // fail with the contract, not a downstream ambiguity
      s"interval and point columns collide: ${dup.mkString(", ")} — rename one side")
    val binMicros = binSeconds * 1000000L
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__us_s", micros(intervals, startCol))
      .withColumn("__us_e", micros(intervals, endCol))
      .withColumn("__bin", explode(sequence(
        expr(s"__us_s div $binMicros"),
        expr(s"(__us_e - 1) div $binMicros"))))
      .drop("__us_s", "__us_e")
    val pt = points
      .where(col(pointCol).isNotNull)
      .withColumn("__us_p", micros(points, pointCol))
      .withColumn("__bin", expr(s"__us_p div $binMicros"))
      .drop("__us_p")
    iv.join(pt, Seq("__bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval × interval overlap join with NO equi-key: emits every
    * (a row, b row) pair whose half-open intervals intersect
    * (`aStart < bEnd && bStart < aEnd`).
    *
    * Same binning as [[rangeJoinBinned]], but BOTH sides register in
    * every bin they overlap, so a pair can share several bins; the
    * pair is emitted only in the FIRST bin both occupy —
    * `bin == greatest(binOf(aStart), binOf(bStart))` — which any
    * overlapping pair is guaranteed to share (it contains
    * `max(aStart, bStart)`, which overlap places inside both
    * intervals). That keeps the join duplicate-free without a
    * distinct (which would shuffle the full pair set a second time).
    * Work is same-bin pairs only; a θ-join touches |a|·|b|.
    */
  def intervalOverlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val dup = a.columns.toSet intersect b.columns.toSet
    require(dup.isEmpty,
      s"a and b columns collide: ${dup.mkString(", ")} — rename one side")
    val binMicros = binSeconds * 1000000L
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame =
      df.where(col(e) > col(s))
        .withColumn("__us_s", micros(df, s))
        .withColumn("__us_e", micros(df, e))
        .withColumn(s"__sbin_$tag", expr(s"__us_s div $binMicros"))
        .withColumn("__bin", explode(sequence(
          col(s"__sbin_$tag"),
          expr(s"(__us_e - 1) div $binMicros"))))
        .drop("__us_s", "__us_e")
    binned(a, aStart, aEnd, "a")
      .join(binned(b, bStart, bEnd, "b"), Seq("__bin"))
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bin") === greatest(col("__sbin_a"), col("__sbin_b")))
      .drop("__bin", "__sbin_a", "__sbin_b")
  }

  /** Skew-robust gap sessionization: same semantics as
    * [[sessionize]], but a single hot key no longer serializes inside
    * one window partition — the same epoch decomposition as
    * [[asOfJoinEpochs]]:
    *
    *  1. local pass: sessionize within (key, epoch) — window
    *     partitions are (key, epoch)-sized, not key-sized;
    *  2. summary pass: per (key, epoch) the first/last event times
    *     and local session count form a |keys|·|epochs|-sized
    *     summary; a per-key window over THAT (ordered by epoch)
    *     decides for each epoch whether its first local session
    *     merges with the previous nonempty epoch's last session
    *     (boundary gap ≤ threshold — note "previous NONEMPTY": when
    *     `epochSeconds < gapSeconds` a session legitimately spans
    *     entirely empty epochs, and the lag skips them), and
    *     accumulates the global session-id offset
    *     Σ new-sessions-contributed = Σ (localCount − merged);
    *  3. renumber: join the per-epoch offset back and shift local
    *     ids. A session spanning many epochs telescopes: a fully
    *     bridged epoch contributes localCount − merged = 0 new
    *     sessions.
    *
    * Event times must be non-null (same contract as [[asOfJoin]]'s
    * time columns). Cost: one (key, epoch) shuffle of the data + a
    * tiny per-key summary window + one join back — vs [[sessionize]]'s
    * single key shuffle; pay it when a key's history outgrows a task.
    */
  def sessionizeEpochs(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long,
      epochSeconds: Long): DataFrame = {
    require(gapSeconds >= 0, s"gapSeconds must be non-negative, got $gapSeconds")
    require(epochSeconds > 0, s"epochSeconds must be positive, got $epochSeconds")
    requireNoReserved(df, Seq("__us", "__epoch", "__new_s", "__ls",
      "__first_us", "__last_us", "__n_sessions", "__merge", "__adj", "__delta",
      "__k", "__e"))
    val gm = gapSeconds * 1000000L
    val em = epochSeconds * 1000000L
    val l = df
      .withColumn("__us", micros(df, tsCol))
      .withColumn("__epoch", expr(s"__us div $em"))

    // 1. local sessionization within (key, epoch)
    val w = Window.partitionBy(col(keyCol), col("__epoch"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__us"), 1).over(w)
    val local = l
      .withColumn("__new_s",
        when(prev.isNull || col("__us") - prev > gm, 1L).otherwise(0L))
      .withColumn("__ls", sum(col("__new_s")).over(run))

    // 2. per-(key, epoch) summary; per-key window over the summary
    val summary = local.groupBy(col(keyCol), col("__epoch"))
      .agg(min(col("__us")).as("__first_us"),
        max(col("__us")).as("__last_us"),
        max(col("__ls")).as("__n_sessions"))
    val wk = Window.partitionBy(keyCol).orderBy(col("__epoch").asc)
    val runk = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevLast = lag(col("__last_us"), 1).over(wk)
    val adj = summary
      .withColumn("__merge",
        when(prevLast.isNotNull && col("__first_us") - prevLast <= gm, 1L)
          .otherwise(0L))
      .withColumn("__adj", col("__n_sessions") - col("__merge"))
      // global id of local session ls = Σ_{f<e} adj_f + ls − merge_e
      .withColumn("__delta",
        sum(col("__adj")).over(runk) - col("__adj") - col("__merge"))

    // 3. renumber — null-safe on the key: Window.partitionBy groups
    // NULL keys together (the plain form sessionizes them), so the
    // join back must match them too or they'd silently vanish
    local
      .join(adj.select(col(keyCol).as("__k"), col("__epoch").as("__e"),
          col("__delta")),
        col(keyCol) <=> col("__k") && col("__epoch") === col("__e"))
      .withColumn("session_id", col("__ls") + col("__delta"))
      .select((df.columns.toSeq :+ "session_id").map(col): _*)
  }

  /** Skew-robust frame-bounded rolling window: same semantics as a
    * per-key `ROWS BETWEEN lookback PRECEDING AND CURRENT ROW` frame
    * (`aggs` receives the WindowSpec and returns the aliased frame
    * aggregates), but a single hot key no longer serializes inside
    * one window partition — the epoch decomposition with a
    * LAST-W-ROWS CONTEXT CARRY (W = lookback + 1):
    *
    *  1. candidate set: only the last W rows of each (key, epoch)
    *     can appear in any later epoch's frames (a row with ≥ W
    *     successors inside its own epoch is out of every later
    *     frame) — extracted with a rank-limit the planner prunes
    *     map-side (`WindowGroupLimit`);
    *  2. context assignment: per key the candidates get a global
    *     (time, tie) index — a bare-key window, but over ≤ W rows
    *     per nonempty epoch, the summary scale every epoch operator
    *     here uses — and epoch e's context is the index interval
    *     (B_e − W, B_e], where B_e = candidates in epochs < e
    *     (epochs sort by time, so the index interval IS the last W
    *     rows before e); the interval explodes into W equi-join keys,
    *     never a range join;
    *  3. evaluate: union context copies (tagged, re-epoched to their
    *     target) with the data, run the frame window per (key,
    *     epoch), keep only real rows.
    *
    * Every row's frame then holds exactly its last `lookback`
    * predecessors: in-epoch predecessors directly, cross-boundary
    * ones via the carried context. Event times must be non-null.
    */
  def rollingEpochs(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      lookback: Int,
      epochSeconds: Long)(
      aggs: org.apache.spark.sql.expressions.WindowSpec => Seq[Column]): DataFrame = {
    require(lookback >= 0, s"lookback must be non-negative, got $lookback")
    require(epochSeconds > 0, s"epochSeconds must be positive, got $epochSeconds")
    requireNoReserved(df, Seq("__us", "__epoch", "__ctx", "__rk", "__idx",
      "__cnt", "__b", "__tgt", "__k", "__i"))
    val w = lookback + 1
    val em = epochSeconds * 1000000L
    val l = df
      .withColumn("__us", micros(df, tsCol))
      .withColumn("__epoch", expr(s"__us div $em"))
      .withColumn("__ctx", lit(false))

    // 1. last W rows per (key, epoch) — map-side rank-limited
    val wDesc = Window.partitionBy(col(keyCol), col("__epoch"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val cand = l.withColumn("__rk", row_number().over(wDesc))
      .where(col("__rk") <= w).drop("__rk")

    // 2. global candidate index per key (tiny input); epoch bounds
    val wkIdx = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val candIdx = cand.withColumn("__idx",
      row_number().over(wkIdx).cast("long"))
    val wk = Window.partitionBy(keyCol).orderBy(col("__epoch").asc)
    val runk = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ctxKeys = candIdx.groupBy(col(keyCol), col("__epoch"))
      .agg(count(lit(1)).as("__cnt"))
      // B_e: candidates strictly before epoch e, in (time, tie) order
      .withColumn("__b", sum(col("__cnt")).over(runk) - col("__cnt"))
      .where(col("__b") > 0)
      .select(col(keyCol), col("__epoch").as("__tgt"),
        explode(sequence(greatest(col("__b") - w + 1, lit(1L)), col("__b")))
          .as("__idx"))
    // null-safe on the key: the plain frame window treats NULL keys
    // as one group, so carried context must reach them too
    val ctx = ctxKeys
      .join(candIdx.drop("__epoch", "__ctx")
          .withColumnRenamed(keyCol, "__k").withColumnRenamed("__idx", "__i"),
        col(keyCol) <=> col("__k") && col("__idx") === col("__i"))
      .drop("__idx", "__i", "__k")
      .withColumnRenamed("__tgt", "__epoch")
      .withColumn("__ctx", lit(true))

    // 3. frame window per (key, epoch) over data + carried context
    val unioned = l.unionByName(ctx.select(l.columns.map(col).toSeq: _*))
    val frame = Window.partitionBy(col(keyCol), col("__epoch"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-lookback, Window.currentRow)
    val aggCols = aggs(frame)
    val withAggs = unioned.select(
      unioned.columns.toSeq.map(col) ++ aggCols: _*)
    val aggNames = withAggs.columns.takeRight(aggCols.length).toSeq
    withAggs.where(!col("__ctx"))
      .select((df.columns.toSeq ++ aggNames).map(col): _*)
  }

  /** Gap sessionization: per key, events ordered by (time, tie) are
    * cut into sessions wherever the gap since the previous event
    * exceeds `gapSeconds`; adds a 1-based `session_id` per key.
    * `tieCol` makes the cut deterministic when timestamps collide
    * (gap 0 ⇒ same session, so ties only affect ordering inside a
    * session, but a total order keeps downstream row-level output
    * hash-stable).
    *
    * One hash shuffle on the key + one per-partition sort; both
    * window frames share the same (partition, order) so Spark plans
    * a single exchange. This is the batch form of what
    * `session_window` does in streaming — kept as a window
    * composition so the oracle can replay it in ANSI SQL.
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 0, s"gapSeconds must be non-negative, got $gapSeconds")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__us"), 1).over(w)
    df
      .withColumn("__us", micros(df, tsCol))
      .withColumn("__new_session",
        when(prev.isNull || col("__us") - prev > gapSeconds * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(run))
      .drop("__new_session", "__us")
  }
}
