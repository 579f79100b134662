package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{when, xxhash64}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as one
  * typed-imperative aggregate: the buffer holds the k smallest
  * distinct derived hashes seen; the k-th smallest estimates the
  * hash-space density, so distinct ≈ (k−1)/θ where θ is the k-th
  * minimum as a fraction of the 64-bit space (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002).
  *
  * Below saturation (fewer than k distinct hashes) the buffer IS the
  * distinct set and the sketch is exact — the same
  * provably-exact-configuration trick the IVF (nProbe = nCells) and
  * PQ (candidateK = ∞) queries use lets the DuckDB
  * `COUNT(DISTINCT …)` oracle gate the full sketch machinery
  * (update → shuffle-merge → eval), while the approximate regime is
  * recall-tested in ScalaTest. (Exactness is up to 64-bit hash
  * collisions — the same birthday-bound caveat the md5 surrogate key
  * carries.)
  *
  * Scale: the buffer is ≤ k longs regardless of input size, update
  * is O(log k), merge is a bounded set union — so the plan is a
  * map-side partial aggregate per group with k·8 bytes of state,
  * where Spark's `COUNT(DISTINCT)` rewrites into an Expand + two
  * exchanges carrying every distinct value. At 100 TB the difference
  * is a full-data shuffle vs a fixed-size sketch per group.
  *
  * Input is a 64-bit hash column (the house pattern —
  * `MinHashSketch` takes shingle hashes the same way); nulls are
  * skipped, matching COUNT(DISTINCT)'s null semantics. fmix64 is
  * applied internally so estimation quality never depends on the
  * caller's hash being well-mixed; the flip by Long.MinValue makes
  * signed order coincide with unsigned hash order.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct expects a BIGINT hash column, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = MinHashSketch.fmix64(v.asInstanceOf[Long]) ^ Long.MinValue
      if (buf.size < k) buf.add(d)
      else if (d < buf.last) { buf.add(d); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // k-th minimum as an unsigned fraction of the 2^64 hash space
      val kth = buf.last.longValue
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1).toDouble / frac)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v.longValue))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(child = c.head)
}

object KmvSketch {
  /** Column API over a pre-hashed BIGINT column. */
  def sketch(hashCol: Column, k: Int): Column =
    ColumnGlue.column(
      KmvSketch(ColumnGlue.expression(hashCol), k).toAggregateExpression())

  /** Distinct-count of an arbitrary column: hashes with xxhash64,
    * mapping nulls to null first — Spark's xxhash64 folds a null
    * input into the seed (a real value), which would count nulls as
    * one extra distinct where COUNT(DISTINCT) ignores them.
    */
  def approxCountDistinct(c: Column, k: Int): Column =
    sketch(when(c.isNotNull, xxhash64(c)), k)
}
