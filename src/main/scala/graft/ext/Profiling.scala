package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling and declarative quality expectations — the
  * pre-ingest audit surface a 100 TB training-data pipeline runs
  * before (and after) every promote: what does this table look like,
  * and does it satisfy the contract the downstream consumers assume?
  * The reference hard-codes its one quality rule (T3's year<10 date
  * repair, `utils.py` bad-date branch); this generalizes that idea
  * into a rule engine whose verdicts are themselves a queryable
  * DataFrame.
  *
  * 100 TB posture, by construction:
  *
  *  - [[profile]] is ONE scan: every per-column statistic folds into
  *    one global aggregation with map-side partials. In `exact` mode
  *    the multi-column distinct goes through one Expand of that same
  *    scan plus a single (value, gid)-keyed exchange that carries
  *    locally-DEDUPLICATED values — never the input rows. Pass
  *    `exact = false` to swap in HLL-style `approx_count_distinct`,
  *    collapsing the whole profile into one ordinary partial+final
  *    aggregate with no hash shuffle at all — the 100 TB setting.
  *  - [[Expectations.check]] folds ALL scalar rules (not-null, range,
  *    in-set, row-count) into one conditional-sum aggregate — one
  *    scan total regardless of rule count. Each uniqueness rule is
  *    one groupBy on its key (the shuffle a duplicate check
  *    fundamentally needs); each referential-integrity rule is a
  *    LEFT ANTI against a broadcast dimension — the fact table is
  *    scanned, never shuffled.
  */
object Profiling {

  /** Single-pass column profiler: per column, the table row count,
    * null count, exact distinct count, and min/max rendered as
    * strings (a fixed output schema across heterogeneous column
    * types; min/max are computed on the NATIVE type first — `min`
    * of a cast would order "10" < "9" — and cast after).
    *
    * `exact = false` replaces the exact distinct (Expand-based, one
    * extra projection per column) with `approx_count_distinct`
    * (HLL, default 5% relative error) — the 100 TB setting, where an
    * exact per-column distinct is rarely worth |cols|× the scan rows.
    */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s) ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        nd.as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one
      .select(explode(array(rows: _*)).as("__p"))
      .select(col("__p.*"))
  }

  /** Equi-width histogram over an integral column, in EXACT integer
    * arithmetic so bin boundaries are bit-portable across engines:
    * `bin = ((v − lo) · nBins) div (hi − lo + 1)` — no float edge
    * ever computed, every value lands in [0, nBins), the max value
    * in bin nBins−1. Two scans by construction (the textbook
    * shape): a 1-row (min, max) aggregate — bounded driver read —
    * then one binned count whose shuffle carries at most nBins
    * rows per map partition. Only non-empty bins emit (SQL GROUP BY
    * semantics); NULLs are excluded; `lo`/`hi` ride along as
    * constant columns so the caller can derive edges. */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 100000, s"histogram needs 1 <= nBins <= 100000, got $nBins")
    import org.apache.spark.sql.types._
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"histogram needs an integral column, got $valueCol: $dt " +
          "(bins are computed in exact integer arithmetic)")
    }
    val vals = df.select(col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val r = vals.agg(min("__v"), max("__v")).head()
    if (r.isNullAt(0))
      return df.sparkSession.range(0).select(
        col("id").as("bin"), col("id").as("n"),
        col("id").as("lo"), col("id").as("hi"))
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val range =
      try Math.addExact(Math.subtractExact(hi, lo), 1L)
      catch { case _: ArithmeticException => throw new IllegalArgumentException(
        s"histogram range [$lo, $hi] too wide for exact integer binning") }
    require(range - 1 <= Long.MaxValue / nBins,
      s"histogram range [$lo, $hi] x $nBins bins overflows exact integer binning")
    vals
      .groupBy(expr(s"((__v - ${lo}L) * $nBins) div ${range}L").as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", lit(lo)).withColumn("hi", lit(hi))
  }

  /** IQR outlier flagging per group — the classic Tukey fence
    * (outside [q1 − 1.5·IQR, q3 + 1.5·IQR]) over an integral metric,
    * done in INTEGER arithmetic so the verdict is bit-portable:
    * `2·v < 5·q1 − 3·q3` ⟺ `v < q1 − 1.5·(q3 − q1)` (both sides
    * doubled), with q1/q3 the exact DISCRETE quantiles (actual data
    * elements, `percentile_disc`), so no float crosses an engine
    * boundary. Returns only the outlier rows, with their group's
    * fences attached.
    *
    * Scale: the per-group exact quantile is a sort-based aggregate —
    * fine for the profiling cardinalities this targets (groups ≪
    * rows); at billions of rows per group swap the bootstrap for the
    * KLL sketch ([[graft.functions.KllSketch]], `ext_quantiles`) and
    * keep the same integer fence arithmetic. The quantile table is
    * group-sized, so the flagging join broadcasts.
    */
  def iqrOutliers(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "iqrOutliers needs group columns")
    import org.apache.spark.sql.types._
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"iqrOutliers needs an integral metric column, got $valueCol: $dt " +
          "(the Tukey fence is evaluated in exact integer arithmetic)")
    }
    val q = df.groupBy(groupCols.map(col): _*)
      .agg(
        expr(s"cast(percentile_disc(0.25) within group (order by `$valueCol`) as long)")
          .as("q1"),
        expr(s"cast(percentile_disc(0.75) within group (order by `$valueCol`) as long)")
          .as("q3"))
    val v = col(valueCol).cast("long")
    df.join(broadcast(q), groupCols, "inner")
      .where(v * 2 < q("q1") * 5 - q("q3") * 3 || v * 2 > q("q3") * 5 - q("q1") * 3)
  }
}

/** Declarative table expectations (the Deequ/Great-Expectations idea,
  * Spark-native): a rule set checked in as few passes as the rules
  * allow, yielding one verdict row per rule —
  * `(rule, target, n_violations, pass)`.
  */
object Expectations {

  sealed trait Expectation

  /** Column must contain no NULLs; violations = null count. */
  final case class ExpectNotNull(column: String) extends Expectation

  /** Non-null values must fall in [lo, hi] (inclusive); NULLs are
    * [[ExpectNotNull]]'s business, not a range violation — the same
    * split SQL CHECK constraints make. */
  final case class ExpectRange(column: String, lo: Column, hi: Column)
      extends Expectation

  /** Non-null values must be members of the set. */
  final case class ExpectInSet(column: String, values: Seq[String])
      extends Expectation

  /** Table row count must fall in [lo, hi]; violations = how far
    * outside the nearer bound the count landed. */
  final case class ExpectRowCount(lo: Long, hi: Long) extends Expectation

  /** Key columns must identify rows uniquely; violations = number of
    * EXCESS rows (Σ max(cnt−1, 0) over key groups) — 0 when unique,
    * and exactly the rows a dedup would drop when not. */
  final case class ExpectUnique(columns: Seq[String]) extends Expectation

  /** Non-null foreign keys must exist in the dimension column
    * (SQL FK semantics: NULL FK is not an RI violation). The
    * dimension is broadcast — RI checks are fact-side scans, never
    * fact-side shuffles. */
  final case class ExpectRefIntegrity(
      column: String,
      dim: DataFrame,
      dimColumn: String) extends Expectation

  private def label(e: Expectation): (String, String) = e match {
    case ExpectNotNull(c) => ("not_null", c)
    case ExpectRange(c, _, _) => ("range", c)
    case ExpectInSet(c, _) => ("in_set", c)
    case ExpectRowCount(_, _) => ("row_count", "*")
    case ExpectUnique(cs) => ("unique", cs.mkString(","))
    case ExpectRefIntegrity(c, _, d) => ("ref_integrity", s"$c->$d")
  }

  /** Check every rule against `df`. All scalar rules share ONE
    * aggregate (one scan); each unique/RI rule contributes its own
    * (small) job. Output is one row per rule in the declared order
    * is NOT guaranteed — sort on (rule, target) downstream if order
    * matters. */
  def check(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectation check needs at least one rule")
    val scalarRules = rules.collect {
      case e: ExpectNotNull => e: Expectation
      case e: ExpectRange => e: Expectation
      case e: ExpectInSet => e: Expectation
      case e: ExpectRowCount => e: Expectation
    }
    val parts = Seq.newBuilder[DataFrame]

    if (scalarRules.nonEmpty) {
      val aggs = scalarRules.zipWithIndex.map {
        case (ExpectNotNull(c), i) =>
          count(when(col(c).isNull, 1)).as(s"__v_$i")
        case (ExpectRange(c, lo, hi), i) =>
          count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1))
            .as(s"__v_$i")
        case (ExpectInSet(c, vs), i) =>
          count(when(col(c).isNotNull && !col(c).isin(vs: _*), 1)).as(s"__v_$i")
        case (ExpectRowCount(_, _), i) => lit(0L).as(s"__v_$i")
        case (e, _) => throw new IllegalStateException(s"not scalar: $e")
      }
      val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
      val rows = scalarRules.zipWithIndex.map { case (e, i) =>
        val (rule, target) = label(e)
        val viol = e match {
          case ExpectRowCount(lo, hi) =>
            greatest(lit(lo) - col("__n"), col("__n") - lit(hi), lit(0L))
          case _ => col(s"__v_$i")
        }
        struct(lit(rule).as("rule"), lit(target).as("target"),
          viol.as("n_violations"))
      }
      parts += one
        .select(explode(array(rows: _*)).as("__e"))
        .select(col("__e.*"))
    }

    rules.foreach {
      case ExpectUnique(cs) =>
        val (rule, target) = label(ExpectUnique(cs))
        parts += df.groupBy(cs.map(col): _*)
          .agg(count(lit(1)).as("__cnt"))
          .agg(coalesce(sum(col("__cnt") - 1), lit(0L)).as("n_violations"))
          .select(lit(rule).as("rule"), lit(target).as("target"),
            col("n_violations"))
      case ExpectRefIntegrity(c, dim, dc) =>
        val (rule, target) = label(ExpectRefIntegrity(c, dim, dc))
        val keys = dim.select(col(dc).as("__dim_key")).distinct()
        parts += df.where(col(c).isNotNull)
          .join(broadcast(keys), col(c) === col("__dim_key"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(rule).as("rule"), lit(target).as("target"),
            col("n_violations"))
      case _ => ()
    }

    parts.result()
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0)
  }

  /** Row-level rule evaluation — the audit column the quarantine flow
    * wants: every row gains `violations`, the comma-joined
    * `rule:target` labels of the rules it breaks (declaration order;
    * empty string = clean). Table-level [[ExpectRowCount]] has no
    * per-row meaning and is rejected loudly.
    *
    * Shapes per rule kind: scalar rules are pure per-row predicates
    * (no exchange at all); each [[ExpectUnique]] adds one count
    * window on its key (the shuffle a duplicate flag fundamentally
    * needs); each [[ExpectRefIntegrity]] adds one broadcast LEFT
    * join marker. The fact table flows through ONCE.
    */
  def flagViolations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rules.nonEmpty, "row-level check needs at least one rule")
    require(!df.columns.contains("violations"),
      "column 'violations' collides with the audit column")
    rules.foreach {
      case ExpectRowCount(_, _) => throw new IllegalArgumentException(
        "ExpectRowCount is table-level — it has no per-row violation; " +
          "check it with Expectations.check")
      case _ => ()
    }
    var cur = df
    val temps = Seq.newBuilder[String]
    val flags: Seq[Column] = rules.zipWithIndex.map { case (e, i) =>
      val (rule, target) = label(e)
      val tag = lit(s"$rule:$target")
      e match {
        case ExpectNotNull(c) => when(col(c).isNull, tag)
        case ExpectRange(c, lo, hi) =>
          when(col(c).isNotNull && (col(c) < lo || col(c) > hi), tag)
        case ExpectInSet(c, vs) =>
          when(col(c).isNotNull && !col(c).isin(vs: _*), tag)
        case ExpectUnique(cs) =>
          val t = s"__uniq_$i"
          temps += t
          cur = cur.withColumn(t,
            count(lit(1)).over(Window.partitionBy(cs.map(col): _*)))
          when(col(t) > 1, tag)
        case ExpectRefIntegrity(c, dim, dc) =>
          val t = s"__ri_$i"
          temps += t
          val keys = dim.select(col(dc).as(t)).distinct()
          cur = cur.join(broadcast(keys), cur(c) === keys(t), "left")
          when(col(c).isNotNull && col(t).isNull, tag)
        case ExpectRowCount(_, _) =>
          throw new IllegalStateException("rejected above")
      }
    }
    cur
      .withColumn("violations", concat_ws(",", flags: _*))
      .drop(temps.result(): _*)
  }

  /** Quarantine split over [[flagViolations]]: `(clean, quarantined)`
    * — same quarantine-not-crash posture as the corpus reader's
    * malformed-line split, for structured rules. The clean side drops
    * the audit column (it is empty by construction); the quarantined
    * side keeps it as the routing evidence. */
  def split(df: DataFrame, rules: Seq[Expectation]): (DataFrame, DataFrame) = {
    val flagged = flagViolations(df, rules)
    (flagged.where(col("violations") === "").drop("violations"),
      flagged.where(col("violations") =!= ""))
  }
}
