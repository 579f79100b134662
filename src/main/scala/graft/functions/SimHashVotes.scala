package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** SimHash signature as ONE typed-imperative aggregate: input is a
  * token hash per row; the buffer holds `bits` running vote counters
  * (+1 when the hash has bit b set, −1 otherwise); eval folds the
  * counter signs into the signature long directly.
  *
  * Exists for the same reason as [[MinHashSketch]]: the built-ins-only
  * formulation — `bits` separate `sum(when(bit, 1).otherwise(-1))`
  * aggregate columns — generates a hash-aggregate whose whole-stage
  * codegen is enormous (a 60-field buffer row) and costs seconds of
  * Janino compilation per query before the first row flows. This
  * aggregate is a single expression: tiny plan, tiny codegen, and the
  * per-row update is a primitive JVM loop over an int array.
  *
  * Semantics are bit-identical to the column formulation: tokens vote
  * with multiplicity (Charikar's frequency weighting), signature bit
  * b = (votes_b > 0). Vote counters are exact ints — a document would
  * need 2³¹ tokens to overflow one.
  */
case class SimHashVotes(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(bits >= 4 && bits <= 64, s"bits must be in [4, 64], got $bits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashVotes =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashVotes =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashVotes =
    copy(child = c.head)
}

object SimHashVotes {
  /** Column API: simhash signature of a long token-hash column. */
  def signature(hashCol: Column, bits: Int): Column =
    ColumnGlue.column(
      SimHashVotes(ColumnGlue.expression(hashCol), bits).toAggregateExpression())
}
