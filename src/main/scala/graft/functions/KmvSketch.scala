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
  * Below saturation the buffer IS the distinct set and the sketch is
  * exact: eval returns the exact candidate count as long as θ is
  * still unbounded (no discard has ever fired), which holds for up
  * to 2k distinct hashes — the buffer's physical capacity — not just
  * k. This is the same
  * provably-exact-configuration trick the IVF (nProbe = nCells) and
  * PQ (candidateK = ∞) queries use lets the DuckDB
  * `COUNT(DISTINCT …)` oracle gate the full sketch machinery
  * (update → shuffle-merge → eval), while the approximate regime is
  * recall-tested in ScalaTest. (Exactness is up to 64-bit hash
  * collisions — the same birthday-bound caveat the md5 surrogate key
  * carries.)
  *
  * Scale: the buffer is O(k) longs regardless of input size, update
  * is amortized O(1), merge is a bounded set union — so the plan is
  * a map-side partial aggregate per group with bounded state, where
  * Spark's `COUNT(DISTINCT)` rewrites into an Expand + two
  * exchanges carrying every distinct value. At 100 TB the difference
  * is a full-data shuffle vs a fixed-size sketch per group.
  *
  * The buffer is a primitive open-addressing hash set with a lazy
  * prune: elements ≥ θ (the running k-th-minimum bound) are
  * rejected at the door, the set is allowed to grow to 2k, and a
  * quickselect-style prune back to the k smallest re-tightens θ.
  * The first cut used a boxed `java.util.TreeSet` and measured
  * 1.6 µs/row in the 30× ScaleCheck (13.4× wall-clock growth —
  * worse than the operators doing real shuffles); the primitive set
  * is the classic measured-bottleneck replacement. Discard safety:
  * θ is the k-th smallest seen so far, monotonically non-increasing,
  * so an element rejected at ≥ θ can never re-enter the final k
  * minima; on merge the tighter of the two θs applies (an element
  * ≥ min(θa, θb) is outranked by k elements in that side's stream
  * alone).
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
  extends TypedImperativeAggregate[KmvSketch.Buf] {

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

  override def createAggregationBuffer(): KmvSketch.Buf = new KmvSketch.Buf(k)

  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.insert(MinHashSketch.fmix64(v.asInstanceOf[Long]) ^ Long.MinValue)
    buf
  }

  override def merge(a: KmvSketch.Buf, b: KmvSketch.Buf): KmvSketch.Buf = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: KmvSketch.Buf): Any = {
    val (n, kth) = buf.result()
    // While θ is still unbounded, no element has ever been discarded
    // (by this buffer or any merged-in partial), so the buffer IS the
    // complete distinct-hash set — exact up to its 2k capacity, twice
    // the k the estimator-at-n≥k cutover would grant.
    if (buf.theta == Long.MaxValue || n < k) n.toLong
    else {
      // k-th minimum as an unsigned fraction of the 2^64 hash space
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1).toDouble / frac)
    }
  }

  override def serialize(buf: KmvSketch.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
    KmvSketch.Buf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(child = c.head)
}

object KmvSketch {

  /** Primitive open-addressing set of (flipped-to-signed-order)
    * hashes, keeping at most 2k candidates below the running θ
    * bound. 0L is the table's empty sentinel; a real 0 value is
    * tracked by `hasZero`. */
  final class Buf(k: Int) {
    // tables start tiny and double up to maxCap (≥ 4k, power of 2):
    // a per-GROUP buffer sized for k up front would cost maxCap·8
    // bytes on every group of a high-cardinality grouping, most of
    // which never see k distinct values
    private val maxCap = Integer.highestOneBit(math.max(4 * k, 16) - 1) << 1
    private var cap = math.min(64, maxCap)
    private var mask = cap - 1
    private var table = new Array[Long](cap)
    private var hasZero = false
    private var n = 0 // elements in table (excluding the 0 sentinel slot)
    var theta: Long = Long.MaxValue // exclusive admission bound

    private def sizeAll: Int = n + (if (hasZero) 1 else 0)

    private def grow(): Unit = {
      val old = table
      cap = cap << 1
      mask = cap - 1
      table = new Array[Long](cap)
      n = 0
      var i = 0
      while (i < old.length) { if (old(i) != 0L) rawInsert(old(i)); i += 1 }
    }

    def insert(v: Long): Unit = {
      // the unsigned-max hash (v == MaxValue while θ is still
      // unbounded) is rejected as if it collided — a 2^-64 event of
      // the same class as the hash-collision caveat above
      if (v >= theta) return
      if (v == 0L) {
        if (!hasZero) { hasZero = true; afterInsert() }
        return
      }
      var i = (v ^ (v >>> 32)).toInt & mask
      while (true) {
        val cur = table(i)
        if (cur == 0L) {
          table(i) = v; n += 1; afterInsert(); return
        }
        if (cur == v) return
        i = (i + 1) & mask
      }
    }

    private def afterInsert(): Unit =
      if (sizeAll > 2 * k) prune() // cap == maxCap by then (growth below)
      else if (n > cap / 2 && cap < maxCap) grow()

    /** Keep the k smallest, set θ to the (k+1)-th smallest (anything
      * ≥ it is outranked by k retained elements forever). */
    private def prune(): Unit = {
      val vals = new Array[Long](sizeAll)
      var m = 0
      if (hasZero) { vals(m) = 0L; m += 1 }
      var i = 0
      while (i < cap) {
        if (table(i) != 0L) { vals(m) = table(i); m += 1 }
        i += 1
      }
      java.util.Arrays.sort(vals)
      theta = vals(k) // (k+1)-th smallest, exclusive bound
      java.util.Arrays.fill(table, 0L)
      hasZero = false
      n = 0
      var j = 0
      while (j < k) { rawInsert(vals(j)); j += 1 }
    }

    private def rawInsert(v: Long): Unit = {
      if (v == 0L) { hasZero = true; return }
      var i = (v ^ (v >>> 32)).toInt & mask
      while (table(i) != 0L) {
        if (table(i) == v) return
        i = (i + 1) & mask
      }
      table(i) = v
      n += 1
    }

    def foreachValue(f: Long => Unit): Unit = {
      if (hasZero) f(0L)
      var i = 0
      while (i < cap) { if (table(i) != 0L) f(table(i)); i += 1 }
    }

    def mergeIn(other: Buf): Unit = {
      if (other.theta < theta) {
        theta = other.theta
        // evict own elements the tighter bound now rejects
        val keep = new Array[Long](sizeAll)
        var m = 0
        foreachValue { v => if (v < theta) { keep(m) = v; m += 1 } }
        java.util.Arrays.fill(table, 0L)
        hasZero = false
        n = 0
        var j = 0
        while (j < m) { rawInsert(keep(j)); j += 1 }
      }
      other.foreachValue(insert)
    }

    /** (distinct candidates ≤ θ, k-th smallest). The second value is
      * only meaningful when the first is ≥ k. */
    def result(): (Int, Long) = {
      val vals = new Array[Long](sizeAll)
      var m = 0
      if (hasZero) { vals(m) = 0L; m += 1 }
      var i = 0
      while (i < cap) {
        if (table(i) != 0L) { vals(m) = table(i); m += 1 }
        i += 1
      }
      java.util.Arrays.sort(vals)
      (m, if (m >= k) vals(k - 1) else Long.MaxValue)
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 4 + sizeAll * 8)
      bb.putLong(theta)
      bb.putInt(sizeAll)
      foreachValue(v => bb.putLong(v))
      bb.array()
    }
  }

  object Buf {
    def fromBytes(k: Int, bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Buf(k)
      out.theta = bb.getLong
      val m = bb.getInt
      var i = 0
      while (i < m) { out.insert(bb.getLong); i += 1 }
      out
    }
  }

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
