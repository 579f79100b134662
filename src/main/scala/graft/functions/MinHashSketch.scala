package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** MinHash sketch as ONE typed-imperative aggregate: input is a
  * 64-bit shingle hash per row; the buffer holds `numHashes` running
  * minima of derived hashes `fmix64(h ^ seed_i)`.
  *
  * Exists because the built-ins-only formulation — `numHashes`
  * separate `min(xxhash64(i, h))` aggregate columns — generates a
  * hash-aggregate with a 128-field buffer row whose whole-stage
  * codegen takes multiple seconds to Janino-compile per query (the
  * generated class dwarfs the actual work at any corpus size). This
  * aggregate is a single expression: tiny plan, tiny codegen, and the
  * per-row update is a primitive JVM loop.
  *
  * Determinism: seeds are splitmix64(i) — fixed by construction; the
  * derivation is Murmur3's fmix64 finalizer, a bijection on 64-bit
  * values, so each seed induces a full permutation of the shingle
  * hash space (exactly what minwise hashing needs).
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  private val seeds: Array[Long] = {
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = MinHashSketch.splitmix64(i + 1L); i += 1 }
    out
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val d = MinHashSketch.fmix64(h ^ seeds(i))
        if (d < buf(i)) buf(i) = d
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSketch =
    copy(child = c.head)
}

object MinHashSketch {
  /** splitmix64 step — seed generator. */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Murmur3 fmix64 finalizer — 64-bit bijection. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Column API: minhash sketch of a long hash column. */
  def sketch(hashCol: Column, numHashes: Int): Column =
    ColumnGlue.column(
      MinHashSketch(ColumnGlue.expression(hashCol), numHashes)
        .toAggregateExpression())
}
