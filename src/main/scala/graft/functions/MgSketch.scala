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

/** Misra-Gries heavy-hitters sketch as one typed-imperative
  * aggregate: at most `k` (item → count) counters per group. Update
  * is the classic rule — increment a held item, admit while below
  * capacity, otherwise decrement every counter (dropping zeros);
  * merge is the mergeable-summaries form (Agarwal et al., PODS'12):
  * sum counts, then subtract the (k+1)-th largest and drop ≤ 0.
  *
  * Guarantees: every item with true frequency > n/(k+1) is retained,
  * and each kept count undercounts by at most n/(k+1). When the
  * TOTAL distinct count is ≤ k, no decrement ever fires in any
  * partial, so the sketch IS the exact `GROUP BY` histogram — the
  * provably-exact configuration the declared query is oracle-gated
  * at (the same epistemics as KMV below saturation and IVF at
  * nProbe = nCells); the approximate regime is ScalaTest-gated.
  *
  * Scale: state is ≤ k counters per group regardless of input rows,
  * merged map-side — a `GROUP BY item` truth at 100 TB shuffles
  * every distinct item; this ships k counters per partition. Null
  * items are skipped (COUNT-over-GROUP-BY never yields a null group
  * row for them either unless nulls exist — document columns here
  * are non-null by fixture contract).
  *
  * Output is `array<struct<item, cnt>>` sorted by (cnt desc, item) —
  * deterministic in the exact regime; in the approximate regime
  * surviving counts can depend on merge order (inherent to MG).
  */
case class MgSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1, s"mg_topk needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mg_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mg_topk expects a STRING item column, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.getOrDefault(s, 0L)
      if (cur != 0L) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else {
        // decrement-all: amortized O(1) — each decrement pays back an
        // earlier admit, so total decrement work ≤ total updates
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach((s, c) => a.merge(s, c, (x, y) => x + y))
    if (a.size > k) {
      val counts = new Array[Long](a.size)
      var i = 0
      a.forEach((_, c) => { counts(i) = c; i += 1 })
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - 1 - k) // (k+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= m) it.remove() else e.setValue(e.getValue - m)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.forEach((s, c) => { entries(i) = (s, c); i += 1 })
    val sorted = entries.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  // length-prefixed UTF-8, not writeUTF — items longer than the
  // 64 KB modified-UTF-8 limit (a full document as the "item") must
  // round-trip, not throw on the executor
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val out = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      out.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): MgSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MgSketch =
    copy(child = c.head)
}

object MgSketch {
  /** Column API: heavy-hitter (item, cnt) array for a string column. */
  def topK(itemCol: Column, k: Int): Column =
    ColumnGlue.column(
      MgSketch(ColumnGlue.expression(itemCol), k).toAggregateExpression())
}
