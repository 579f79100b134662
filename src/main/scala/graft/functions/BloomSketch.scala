package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{lit, when, xxhash64}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Bloom-filter build aggregate for semi-join reduction — the
  * classic distributed-join optimization: when the dim side is too
  * big to BROADCAST as a hash relation but its key SET compresses
  * into a few megabytes of bits, build the bloom in one map-side
  * partial aggregate over the dim, ship the bits to every fact
  * scan, and drop non-joining fact rows BEFORE they pay the
  * shuffle. False positives survive the filter and die in the real
  * join — correctness never depends on the bloom; only the shuffled
  * volume does. (Spark's runtime row-level bloom,
  * `spark.sql.optimizer.runtime.bloomFilter.*`, plants the same
  * shape automatically for some plans; this is the explicit,
  * deterministically-sized engine surface, usable where the
  * optimizer's heuristics decline — e.g. a reused filter across
  * several queries, or a pre-shuffle reduction the cost model can't
  * see.)
  *
  * Standard Bloom sizing (Bloom '70): m = −n·ln p ⁄ (ln 2)²,
  * k = (m/n)·ln 2. Double hashing gᵢ = h₁ + i·h₂ (Kirsch–Mitzenmacher:
  * two independent hashes suffice for the asymptotic false-positive
  * rate). Input is a 64-bit hash column like every sketch in this
  * package ([[KmvSketch]] et al.); h₁/h₂ split the 64 bits after an
  * extra fmix64 so quality never depends on the caller's hash.
  *
  * Buffer is the flat bit array: update O(k) bit sets, merge one
  * word-wise OR, eval serializes `k` + the words. The aggregate is
  * a map-side partial like any sum — the dim is scanned once, never
  * shuffled for the build.
  */
case class BloomSketch(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 32,
    s"numHashes must be in [1, 32], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_build expects a BIGINT hash column, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomSketch.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomSketch.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomSketch.toBytes(buf, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomSketch.fromBytes(bytes)._2

  override def withNewMutableAggBufferOffset(offset: Int): BloomSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomSketch =
    copy(child = c.head)
}

object BloomSketch {

  /** Kirsch–Mitzenmacher double hashing over one fmix64-remixed
    * 64-bit hash: h1 = low 32, h2 = high 32 (odd-ized so it cycles
    * the whole table). Shared bit-address math of build and probe —
    * one definition, no drift. */
  @inline private[functions] def set(
      words: Array[Long], hash: Long, k: Int): Unit = {
    val m = words.length << 6
    val mixed = MinHashSketch.fmix64(hash)
    val h1 = (mixed & 0xffffffffL).toInt
    val h2 = ((mixed >>> 32).toInt << 1) | 1
    var i = 0
    while (i < k) {
      val bit = java.lang.Integer.toUnsignedLong(h1 + i * h2) % m
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Probe — must mirror [[set]] exactly. Public because the codegen
    * path of [[BloomMightContain]] calls it. */
  def contains(words: Array[Long], hash: Long, k: Int): Boolean = {
    val m = words.length << 6
    val mixed = MinHashSketch.fmix64(hash)
    val h1 = (mixed & 0xffffffffL).toInt
    val h2 = ((mixed >>> 32).toInt << 1) | 1
    var i = 0
    while (i < k) {
      val bit = java.lang.Integer.toUnsignedLong(h1 + i * h2) % m
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Serialized form (k header + words) — public because the
    * persisted bloom index re-emits merged bitsets. */
  def toBytes(words: Array[Long], k: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + words.length * 8)
    bb.putInt(k)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** (numHashes, words). */
  def fromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val words = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (k, words)
  }

  /** Optimal sizing for `expectedItems` keys at false-positive rate
    * `fpp`: m = −n·ln p ⁄ (ln 2)², rounded up to whole words;
    * k = (m/n)·ln 2. */
  def sized(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need items > 0 and fpp in (0,1), got $expectedItems / $fpp")
    val ln2 = math.log(2)
    val mRaw = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2))
    val m = (((mRaw.toLong + 63) / 64) * 64).min(1L << 30).max(64L).toInt
    val k = math.max(1, math.round(m.toDouble / expectedItems * ln2)).toInt
    (m, math.min(k, 32))
  }

  /** Build aggregate over a pre-hashed BIGINT column. */
  def sketch(hashCol: Column, numBits: Int, numHashes: Int): Column =
    ColumnGlue.column(
      BloomSketch(ColumnGlue.expression(hashCol), numBits, numHashes)
        .toAggregateExpression())

  /** Build over an arbitrary column: null-preserving xxhash64 (a raw
    * xxhash64(NULL) folds to the seed — a real value — which would
    * admit NULL into the key set where joins never match it). */
  def buildFor(c: Column, expectedItems: Long, fpp: Double): Column = {
    val (m, k) = sized(expectedItems, fpp)
    sketch(when(c.isNotNull, xxhash64(c)), m, k)
  }

  /** Probe a SERIALIZED bloom (the bytes [[sketch]]/[[buildFor]]
    * emitted, passed back as a literal) against a column. NULL keys
    * probe false — they can never satisfy an equi-join. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnGlue.column(BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bloomBytes, BinaryType),
      ColumnGlue.expression(when(c.isNotNull, xxhash64(c)).otherwise(lit(null)))))
}

/** Scalar probe: `might_contain(bloom, hash)` — bloom must be a
  * foldable BINARY (in practice the driver-collected build result as
  * a literal, which Spark ships to executors inside the serialized
  * plan exactly like a broadcast variable would). The bitset is
  * deserialized ONCE per executor-plan instance via a transient
  * lazy, not per row; codegen probes the shared long[] directly
  * inside whole-stage codegen. */
case class BloomMightContain(bloom: Expression, value: Expression)
    extends BinaryExpression {

  require(bloom.foldable, "might_contain needs a foldable bloom argument")

  override def left: Expression = bloom
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, value.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (b, v) => TypeCheckResult.TypeCheckFailure(
        s"might_contain expects (BINARY, BIGINT), got (${b.sql}, ${v.sql})")
    }

  @transient private lazy val built: (Int, Array[Long]) = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom bytes must not be null")
    BloomSketch.fromBytes(bytes)
  }

  /** Row probe against the once-deserialized bitset (called from the
    * generated code through a plan reference object; JIT inlines the
    * monomorphic call). */
  def probe(hash: Long): Boolean =
    BloomSketch.contains(built._2, hash, built._1)

  // a NULL probe (null key) is definitively not in the set — false,
  // not null, so the expression can sit directly in a WHERE
  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) false else probe(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj(
      "bloomProbe", this, classOf[BloomMightContain].getName)
    val childGen = value.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $self.probe(${childGen.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, value = newRight)
}

/** Row-side bloom probe against a SMALL literal hash set:
  * `bloom_any_contain(bloomCol, hashes)` is true iff ANY hash might
  * be in the row's bloom. The dual of [[BloomMightContain]] — there
  * the bloom is the literal and the hashes stream; here the blooms
  * stream (one per index row, e.g. the per-file `_bloom` sidecar)
  * and the probe set is the literal. This keeps per-file bloom scans
  * EXECUTOR-side: the Purge candidate probe with a driver pull of
  * every file bloom measured ~30s at 160 × 7 MB blooms; streamed,
  * the same probe rides the index scan. Deliberately
  * `CodegenFallback`: it runs once per FILE row, not per data row,
  * and each eval deserializes a multi-MB bitset — codegen would buy
  * nothing. */
case class BloomAnyContain(bloom: Expression, hashes: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(hashes.foldable, "bloom_any_contain needs a literal hash set")

  override def left: Expression = bloom
  override def right: Expression = hashes
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_any_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, hashes.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (b, h) => TypeCheckResult.TypeCheckFailure(
        s"bloom_any_contain expects (BINARY, ARRAY<BIGINT>), got (${b.sql}, ${h.sql})")
    }

  @transient private lazy val probeHashes: Array[Long] =
    hashes.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()

  override def eval(input: InternalRow): Any = {
    val b = bloom.eval(input)
    if (b == null) false
    else {
      val (k, words) = BloomSketch.fromBytes(b.asInstanceOf[Array[Byte]])
      var i = 0
      while (i < probeHashes.length) {
        if (BloomSketch.contains(words, probeHashes(i), k)) return true
        i += 1
      }
      false
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, hashes = newRight)
}
