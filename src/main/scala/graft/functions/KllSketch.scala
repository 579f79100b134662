package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Simplified KLL quantile sketch (Karnin-Lang-Liberty, FOCS'16) as
  * one typed-imperative aggregate: a ladder of buffers where level i
  * items each stand for 2^i inputs; when a level overflows its
  * uniform `capacity`, it is sorted and every other item promotes to
  * level i+1 (the deterministic odd/even-alternating compactor from
  * the paper's §2 — no RNG, so a given input multiset and arrival
  * order reproduces bit-identically). Rank error is O(log²(n/c)/c)
  * with uniform capacities (the paper's geometrically-shrinking
  * levels improve the constant; uniform keeps the code obvious).
  *
  * Below `capacity` total items NO compaction ever fires, every item
  * sits at level 0 with weight 1, and the selected element is the
  * EXACT discrete quantile — the provably-exact configuration the
  * declared query is oracle-gated at (same epistemics as KMV below
  * saturation / MG below capacity). The rank rule matches DuckDB's
  * `quantile_disc`: the element at rank max(1, ceil(q·n)) in sorted
  * order (verified empirically over n ∈ {1..10}, q ∈ {0, .25, .33,
  * .5, .9, 1}); values pass through untouched, so doubles stay
  * bit-identical — no interpolation, no re-representation.
  *
  * Scale: state is ≤ capacity · levels doubles per group regardless
  * of input size, merged map-side; an exact `quantile_disc` truth at
  * 100 TB is a full sort (or an Expand over groups) — this ships a
  * bounded sketch per partition. Approximate-regime rank error is
  * ScalaTest-gated; nulls are skipped like every SQL quantile.
  */
case class KllSketch(
    child: Expression,
    capacity: Int,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Buf] {

  require(capacity >= 8, s"kll_quantile needs capacity >= 8, got $capacity")
  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // empty group → NULL, like SQL
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects a DOUBLE column, got ${other.sql}")
    }

  override def createAggregationBuffer(): KllSketch.Buf = new KllSketch.Buf()

  override def update(buf: KllSketch.Buf, input: InternalRow): KllSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], capacity)
    buf
  }

  override def merge(a: KllSketch.Buf, b: KllSketch.Buf): KllSketch.Buf = {
    a.mergeIn(b, capacity)
    a
  }

  override def eval(buf: KllSketch.Buf): Any = buf.quantile(q)

  override def serialize(buf: KllSketch.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch.Buf =
    KllSketch.Buf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketch =
    copy(child = c.head)
}

object KllSketch {

  /** Level ladder: `levels(i)` holds items of weight 2^i; `flips(i)`
    * alternates which half a compaction keeps. */
  final class Buf {
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    val flips: ArrayBuffer[Boolean] = ArrayBuffer(false)

    def add(v: Double, capacity: Int): Unit = {
      levels(0) += v
      if (levels(0).length > capacity) compact(0, capacity)
    }

    private def compact(i: Int, capacity: Int): Unit = {
      if (i + 1 >= levels.length) {
        levels += ArrayBuffer.empty[Double]
        flips += false
      }
      val lvl = levels(i)
      val sorted = lvl.toArray
      java.util.Arrays.sort(sorted)
      val start = if (flips(i)) 1 else 0
      flips(i) = !flips(i)
      var j = start
      while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
      lvl.clear()
      if (levels(i + 1).length > capacity) compact(i + 1, capacity)
    }

    def mergeIn(other: Buf, capacity: Int): Unit = {
      var i = 0
      while (i < other.levels.length) {
        if (i >= levels.length) {
          levels += ArrayBuffer.empty[Double]
          flips += false
        }
        levels(i) ++= other.levels(i)
        i += 1
      }
      i = 0
      while (i < levels.length) {
        if (levels(i).length > capacity) compact(i, capacity)
        i += 1
      }
    }

    /** Element at rank max(1, ceil(q·n)) over the weighted items —
      * DuckDB `quantile_disc` semantics. The 1e-9 backs off float
      * error in q·n when the product is an exact integer. */
    def quantile(q: Double): Any = {
      var n = 0L
      var i = 0
      while (i < levels.length) { n += levels(i).length.toLong << i; i += 1 }
      if (n == 0L) return null
      val r = math.max(1L, math.ceil(q * n - 1e-9).toLong)
      val items = ArrayBuffer.empty[(Double, Long)]
      i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      val sorted = items.sortBy(_._1)
      var cum = 0L
      var k = 0
      while (k < sorted.length) {
        cum += sorted(k)._2
        if (cum >= r) return sorted(k)._1
        k += 1
      }
      sorted.last._1
    }

    def toBytes: Array[Byte] = {
      val total = levels.map(_.length).sum
      val bb = ByteBuffer.allocate(4 + levels.length * (4 + 1) + total * 8)
      bb.putInt(levels.length)
      levels.indices.foreach { i =>
        bb.putInt(levels(i).length)
        bb.put(if (flips(i)) 1.toByte else 0.toByte)
        levels(i).foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val nLevels = bb.getInt
      val out = new Buf()
      var i = 0
      while (i < nLevels) {
        if (i >= out.levels.length) {
          out.levels += ArrayBuffer.empty[Double]
          out.flips += false
        }
        val n = bb.getInt
        out.flips(i) = bb.get() == 1.toByte
        var j = 0
        while (j < n) { out.levels(i) += bb.getDouble; j += 1 }
        i += 1
      }
      out
    }
  }

  /** Column API: discrete quantile of a double column. */
  def quantile(c: Column, q: Double, capacity: Int = 4096): Column =
    ColumnGlue.column(
      KllSketch(ColumnGlue.expression(c), capacity, q).toAggregateExpression())
}
