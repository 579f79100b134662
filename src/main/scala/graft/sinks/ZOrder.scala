package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data clustering for lake zones.
  *
  * Plain compaction ([[Compaction.compactWork]]) fixes FILE COUNT;
  * z-ordering fixes FILE CONTENT: rows are laid out along an
  * interleaved-bit space-filling curve over the chosen columns, so
  * every output file covers a small hyper-rectangle of the key space
  * and its parquet row-group min/max statistics become selective on
  * EVERY clustered column at once — a single-column sort only narrows
  * file ranges on its leading column. At 100 TB this is the
  * difference between a point-range query opening every file and
  * opening the handful whose footer ranges overlap the predicate;
  * the skipping itself is free (parquet filter pushdown against
  * footer stats — no index structure to maintain).
  *
  * Cost model, stated honestly: unlike plain compaction (which never
  * shuffles — coalesce over a size-pinned scan), clustering IS a
  * shuffle (one range exchange on the z-value plus a per-partition
  * sort). That is the entire job — moving co-queried rows into the
  * same files — and it is a one-time cost paid at rewrite, amortized
  * over every subsequent scan. Run it where you would run compaction:
  * between ingest and promote, behind the same atomic staging swap.
  *
  * Column normalization: numeric, date, and timestamp columns are
  * rank-bucketed linearly between their observed min/max into
  * `bits`-bit buckets (one 1-row stats aggregate per rewrite — the
  * only driver-side step, bounded by contract). String columns
  * cluster by `xxhash64` — equal values co-locate but RANGES do not,
  * so string predicates skip on equality, not on LIKE/BETWEEN
  * (documented trade; a collation-aware binary prefix would pin a
  * sort order the engine cannot promise across JVMs). NULLs bucket
  * to 0, co-locating with the column minimum.
  */
object ZOrder {

  private[graft] val ZCol = "__graft_z"

  /** Interleave the low `bits` bits of each bucket column: bit `j` of
    * bucket `i` lands at curve position `j * n + i` (LSB-first, so
    * high-order bits of every column dominate the curve together —
    * the Morton property that makes per-file ranges tight on all
    * columns simultaneously). */
  private[graft] def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1, "z-order needs at least one column")
    require(n * bits <= 63,
      s"$n columns x $bits bits = ${n * bits} curve bits; must fit a signed long (<= 63)")
    val terms =
      for (j <- 0 until bits; (b, i) <- buckets.zipWithIndex)
        yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** The column lifted to a double with a total order matching its
    * native one (hash order for strings — see class doc). */
  private def asDouble(df: DataFrame, name: String): Column = {
    val c = col(name)
    df.schema(name).dataType match {
      case _: NumericType => c.cast(DoubleType)
      case DateType =>
        datediff(c, lit(java.sql.Date.valueOf("1970-01-01"))).cast(DoubleType)
      case TimestampType | TimestampNTZType =>
        unix_micros(c.cast(TimestampType)).cast(DoubleType)
      case StringType => xxhash64(c).cast(DoubleType)
      case other => throw new IllegalArgumentException(
        s"cannot z-order column $name of type ${other.simpleString}")
    }
  }

  /** Rows of `df` re-laid along the z-curve over `cols`: one range
    * exchange into `numFiles` partitions, each sorted by z, the
    * helper column dropped. Content-identical to the input — layout
    * is the only thing that changes. `bits` is capped at `63 / n`
    * so the curve always fits a signed long — with many clustered
    * columns each simply contributes fewer (still its highest)
    * bits. */
  def cluster(
      df: DataFrame,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(bits >= 1, s"bits must be >= 1, got $bits")
    require(!df.columns.contains(ZCol),
      s"input must not carry the reserved column $ZCol")
    val effBits = math.min(bits, 63 / cols.size)
    require(effBits >= 1, s"too many z-order columns (${cols.size}) for a 63-bit curve")
    val doubles = cols.map(asDouble(df, _))
    val statCols = doubles.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"mn$i"), max(c).as(s"mx$i")) }
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val maxBucket = (1L << effBits) - 1
    val buckets = doubles.zipWithIndex.map { case (c, i) =>
      // all-NULL or constant column: every row buckets to 0 (the
      // column contributes nothing to the curve, correctly)
      if (stats.isNullAt(2 * i) || stats.getDouble(2 * i) == stats.getDouble(2 * i + 1))
        lit(0L)
      else {
        val mn = stats.getDouble(2 * i)
        val span = stats.getDouble(2 * i + 1) - mn
        least(lit(maxBucket), greatest(lit(0L),
          floor((coalesce(c, lit(mn)) - lit(mn)) / lit(span)
            * lit((1L << effBits).toDouble)).cast(LongType)))
      }
    }
    df.withColumn(ZCol, interleave(buckets, effBits))
      .repartitionByRange(numFiles, col(ZCol))
      .sortWithinPartitions(ZCol)
      .drop(ZCol)
  }

  /** [[cluster]] for a hive-partitioned write: rows range-partition
    * on `(partitionCol, z)` and sort the same way, so a
    * `write.partitionBy(partitionCol)` downstream emits files whose
    * z-ranges are tight WITHIN each partition directory (a task's
    * range is contiguous in (partition, z), so it spills at most two
    * partition dirs' worth of overlap). Bucket boundaries come from
    * the same single global stats pass as [[cluster]] — per-partition
    * ranges are subsets, so within-partition files still cover small
    * hyper-rectangles; one 1-row aggregate total, not one per
    * partition. */
  def clusterPartitioned(
      df: DataFrame,
      partitionCol: String,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(!cols.contains(partitionCol),
      s"partition column $partitionCol is constant within each written " +
        "directory — z-order the remaining columns")
    require(cols.nonEmpty, "z-order needs at least one column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(!df.columns.contains(ZCol),
      s"input must not carry the reserved column $ZCol")
    val effBits = math.max(1, math.min(bits, 63 / cols.size))
    val doubles = cols.map(asDouble(df, _))
    val statCols = doubles.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"mn$i"), max(c).as(s"mx$i")) }
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val maxBucket = (1L << effBits) - 1
    val buckets = doubles.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i) || stats.getDouble(2 * i) == stats.getDouble(2 * i + 1))
        lit(0L)
      else {
        val mn = stats.getDouble(2 * i)
        val span = stats.getDouble(2 * i + 1) - mn
        least(lit(maxBucket), greatest(lit(0L),
          floor((coalesce(c, lit(mn)) - lit(mn)) / lit(span)
            * lit((1L << effBits).toDouble)).cast(LongType)))
      }
    }
    df.withColumn(ZCol, interleave(buckets, effBits))
      .repartitionByRange(numFiles, col(partitionCol), col(ZCol))
      .sortWithinPartitions(partitionCol, ZCol)
      .drop(ZCol)
  }
}
