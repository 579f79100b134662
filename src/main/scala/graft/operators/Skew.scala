package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys.
  *
  * Most engine keys are hash-uniform (md5 surrogate keys, xxhash
  * buckets), so skew is rare by construction — but real corpora have
  * pathological keys (one viral document duplicated millions of
  * times, one `sk` updated in every batch). Two standard remedies:
  *
  *  - AQE skew-join splitting is ON by default
  *    (`spark.sql.adaptive.enabled` in [[graft.core.Sessions]]), which
  *    handles skewed sort-merge joins at runtime.
  *  - For skewed AGGREGATIONS where a single key overwhelms one
  *    reducer, `saltedAgg` does the classic two-phase spread:
  *    partial-aggregate on (key, salt), then final-aggregate on key.
  *    Correct for any associative-commutative aggregate.
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` must be reducible —
    * each (partialExpr, finalExpr-over-partial-column) pair, e.g.
    * `(count(*) as c, sum(c))` or `(min(x) as m, min(m))`.
    *
    * Phase 1 shuffles on (key, salt in [0, salts)) — the hot key
    * spreads over `salts` reducers; phase 2 shuffles only the
    * `keys × salts` partial rows. */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(col("__key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted exact-duplicate count: how many copies of each
    * fingerprint exist — robust to a fingerprint with millions of
    * copies. */
  def saltedDupCounts(df: DataFrame, fpCol: Column, salts: Int = 64): DataFrame =
    saltedAgg(
      df, fpCol, salts,
      partialAggs = Seq(count(lit(1)).as("__n"), min(col("doc_id")).as("__minId")),
      finalAggs = Seq(sum(col("__n")).as("n_copies"), min(col("__minId")).as("doc_id")))
      .select(col("__key").as("fp"), col("doc_id"), col("n_copies"))
}
