package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) as one
  * typed-imperative aggregate: a depth×width counter matrix; each
  * item increments one counter per row (Kirsch–Mitzenmacher double
  * hashing — two deterministic 64-bit hashes derive all `depth`
  * index functions), and a point estimate reads the MINIMUM of an
  * item's counters.
  *
  * Guarantees, and which kind each is:
  *  - `estimate(x) ≥ true count(x)` — DETERMINISTIC, always:
  *    counters only ever over-count (collisions add, nothing
  *    subtracts). This is the direction frequency filters care
  *    about (an item estimated below a threshold is provably below
  *    it),
  *  - `estimate(x) ≤ true count(x) + (e/width)·N` with probability
  *    ≥ 1 − e^−depth per item (N = total updates) — probabilistic,
  *    spec-measured on fixtures.
  *
  * Unlike Misra-Gries, the merge is EXACT: counter matrices add
  * elementwise, so the merged sketch is bit-identical to a
  * single-pass build regardless of partitioning or merge order —
  * the strongest distribution law a sketch can have, pinned in
  * `CmSketchSpec`. Complements the family: MG answers "which items
  * are heavy", CM answers "how often is THIS item" for any item,
  * in depth·width longs per group at any input size.
  *
  * Hashing is fixed-seed FNV-1a over UTF-8 bytes (h2 forced odd for
  * the KM progression) — deterministic across JVMs, partitions, and
  * rounds, so declared-query outputs are stable. Null items are
  * skipped (SQL aggregate semantics).
  */
case class CmSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cm_sketch needs 1 <= depth <= 16, got $depth")
  require(width >= 2, s"cm_sketch needs width >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cm_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cm_sketch expects a STRING item column, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val (h1, h2) = CmSketch.hashes(bytes)
      var j = 0
      while (j < depth) {
        buf(j * width + CmSketch.rowIndex(h1, h2, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = in.readLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmSketch =
    copy(child = c.head)
}

object CmSketch {

  /** Fixed-seed FNV-1a over raw bytes. */
  private def fnv1a(bytes: Array[Byte], seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — full-avalanche bit mixing. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The two base hashes — computed ONCE per item, every row index
    * derives from them. h2 is the FINALIZED h1, not a reseeded FNV:
    * FNV over the same bytes with a different offset basis differs
    * from h1 by a constant times p^len, so every SAME-LENGTH pair of
    * items would keep one fixed h2 − h1 — and any h1 collision mod
    * width would then collide in EVERY Kirsch–Mitzenmacher row
    * (measured: thousands-fold overcounts on uniform-length keys).
    * Mixing h1 through splitmix64 decorrelates the rows unless the
    * full 64-bit hashes collide. */
  private[functions] def hashes(bytes: Array[Byte]): (Long, Long) = {
    val h1 = mix(fnv1a(bytes, 0xcbf29ce484222325L))
    (h1, mix(h1) | 1L)
  }

  /** Kirsch–Mitzenmacher row index: (h1 + j·h2) mod width, h2 odd. */
  private[functions] def rowIndex(h1: Long, h2: Long, j: Int, width: Int): Int = {
    val m = (h1 + j.toLong * h2) % width
    (if (m < 0) m + width else m).toInt
  }

  /** Column API: the flattened depth×width counter matrix. */
  def state(itemCol: Column, depth: Int, width: Int): Column =
    ColumnGlue.column(
      CmSketch(ColumnGlue.expression(itemCol), depth, width).toAggregateExpression())

  /** Point estimate off a collected state: min of the item's
    * counters. Deterministic lower-bound law: never below the true
    * count's... never — always AT OR ABOVE the true count. */
  def estimate(state: Array[Long], item: String, depth: Int, width: Int): Long = {
    require(state.length == depth * width,
      s"state length ${state.length} != depth*width ${depth * width}")
    val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val (h1, h2) = hashes(bytes)
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = state(j * width + rowIndex(h1, h2, j, width))
      if (c < best) best = c
      j += 1
    }
    best
  }
}
