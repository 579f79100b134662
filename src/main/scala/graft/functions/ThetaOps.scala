package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.{when, xxhash64}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Theta-sketch set algebra over the engine's KMV buffers (the
  * KMV-with-admission-bound structure [[KmvSketch]] maintains IS a
  * theta sketch — Dasgupta et al., "Theta sketch framework",
  * DataSketches): [[ThetaOps.sketchState]] aggregates a column into a
  * PORTABLE sketch value, and union / intersect / difference
  * ESTIMATORS combine those values without ever revisiting the data.
  *
  * What this buys at 100 TB: `COUNT(DISTINCT)` under set operations
  * normally needs the raw key sets co-shuffled (the `cap_setops`
  * plan: Expand/aggregate + join per operation). With sketch states,
  * each cohort is ONE bounded-size value computed map-side in a
  * single scan — cohort overlap questions ("users who did A and B",
  * "how many documents are in src0 but not src1") become scalar
  * arithmetic over O(k) state, composable across tables, days, and
  * retention windows without re-scanning any of them. That is the
  * property neither `COUNT(DISTINCT)` nor [[KmvSketch]]'s count-only
  * eval exposes.
  *
  * Estimator (θ-restricted, standard theta algebra): with
  * θc = min(θa, θb) and both candidate sets restricted to < θc,
  *   |A∪B| ≈ |Sa ∪ Sb|_<θc / frac(θc)
  *   |A∩B| ≈ |Sa ∩ Sb|_<θc / frac(θc)
  *   |A\B| ≈ |Sa \ Sb|_<θc / frac(θc)
  * where frac is θc as a fraction of the hash space. While BOTH
  * sketches are below saturation (θ unbounded), every candidate set
  * is the complete distinct-hash set and all three operators are
  * EXACT — the same provably-exact-configuration epistemics as
  * `ext_distinct_kmv`, which is what lets a DuckDB
  * INTERSECT/EXCEPT oracle gate the full machinery. Approximate
  * regime is spec-gated ([[graft.ThetaSketchSpec]]).
  *
  * The set-op expressions run on AGGREGATED rows — one per group, not
  * per input row — so they are deliberately `CodegenFallback`:
  * codegen'ing a ≤2k-element sorted-merge that executes a handful of
  * times buys nothing (unlike the per-row hot-path expressions
  * `HyperplaneMargins` / `WordShingles`, which ARE codegen'd).
  */
object ThetaOps {

  /** State layout: Int k | Long theta | Int m | m × Long values.
    * Values are stored UNSORTED (buffer iteration order); every
    * consumer sorts on parse. */
  private[functions] def stateBytes(k: Int, buf: KmvSketch.Buf): Array[Byte] = {
    var m = 0
    buf.foreachValue(_ => m += 1)
    val bb = ByteBuffer.allocate(4 + 8 + 4 + m * 8)
    bb.putInt(k)
    bb.putLong(buf.theta)
    bb.putInt(m)
    buf.foreachValue(v => bb.putLong(v))
    bb.array()
  }

  private[functions] final case class State(
      k: Int, theta: Long, values: Array[Long])

  private[functions] def parseState(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val theta = bb.getLong
    val m = bb.getInt
    val vs = new Array[Long](m)
    var i = 0
    while (i < m) { vs(i) = bb.getLong; i += 1 }
    java.util.Arrays.sort(vs)
    State(k, theta, vs)
  }

  private def frac(theta: Long): Double =
    (theta.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Counts restricted to < θc on both (sorted) candidate arrays:
    * (in-both, only-in-a, only-in-b). One merge walk. */
  private def mergeCounts(
      a: Array[Long], b: Array[Long], thetaC: Long): (Long, Long, Long) = {
    var ia = 0; var ib = 0
    var both = 0L; var onlyA = 0L; var onlyB = 0L
    while (ia < a.length && a(ia) < thetaC && ib < b.length && b(ib) < thetaC) {
      if (a(ia) == b(ib)) { both += 1; ia += 1; ib += 1 }
      else if (a(ia) < b(ib)) { onlyA += 1; ia += 1 }
      else { onlyB += 1; ib += 1 }
    }
    while (ia < a.length && a(ia) < thetaC) { onlyA += 1; ia += 1 }
    while (ib < b.length && b(ib) < thetaC) { onlyB += 1; ib += 1 }
    (both, onlyA, onlyB)
  }

  private[functions] def evalOp(sa: State, sb: State, op: String): Long = {
    require(sa.k == sb.k,
      s"theta set ops need matching sketch k, got ${sa.k} vs ${sb.k}")
    val thetaC = math.min(sa.theta, sb.theta)
    val (both, onlyA, onlyB) = mergeCounts(sa.values, sb.values, thetaC)
    val raw = op match {
      case "union" => both + onlyA + onlyB
      case "intersect" => both
      case "diff" => onlyA
      case other => throw new IllegalStateException(s"unknown theta op $other")
    }
    if (thetaC == Long.MaxValue) raw else math.round(raw / frac(thetaC))
  }

  private[functions] def evalEstimate(s: State): Long = {
    if (s.theta == Long.MaxValue) s.values.length.toLong
    else {
      // mirror KmvSketch.eval: (k-1)/frac(k-th minimum); values are
      // sorted, so the k-th minimum is values(k-1)
      if (s.values.length < s.k) s.values.length.toLong
      else math.round((s.k - 1).toDouble / frac(s.values(s.k - 1)))
    }
  }

  /** Aggregate a pre-hashed BIGINT column into a portable theta/KMV
    * sketch state (BinaryType). Same buffer discipline as
    * [[KmvSketch]] — bounded O(k) state, map-side partials, bounded
    * merge. */
  case class KmvState(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buf] {

    require(k >= 2, s"kmv_state needs k >= 2, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "kmv_state"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"kmv_state expects a BIGINT hash column, got ${other.sql}")
      }

    override def createAggregationBuffer(): KmvSketch.Buf = new KmvSketch.Buf(k)

    override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
      val v = child.eval(input)
      if (v != null)
        buf.insert(MinHashSketch.fmix64(v.asInstanceOf[Long]) ^ Long.MinValue)
      buf
    }

    override def merge(a: KmvSketch.Buf, b: KmvSketch.Buf): KmvSketch.Buf = {
      a.mergeIn(b); a
    }

    override def eval(buf: KmvSketch.Buf): Any = stateBytes(k, buf)

    override def serialize(buf: KmvSketch.Buf): Array[Byte] = buf.toBytes
    override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
      KmvSketch.Buf.fromBytes(k, bytes)

    override def withNewMutableAggBufferOffset(offset: Int): KmvState =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): KmvState =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvState =
      copy(child = c.head)
  }

  /** Set-operation estimator over two sketch states. */
  case class ThetaSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {

    require(Set("union", "intersect", "diff").contains(op),
      s"theta op must be union/intersect/diff, got $op")

    override def dataType: DataType = LongType
    override def prettyName: String = s"theta_$op"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"theta_$op expects two sketch states (BINARY), got ${l.sql}, ${r.sql}")
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      evalOp(
        parseState(a.asInstanceOf[Array[Byte]]),
        parseState(b.asInstanceOf[Array[Byte]]), op)

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaSetOp = copy(left = l, right = r)
  }

  /** Distinct-count estimator of a single sketch state (the
    * [[KmvSketch]] eval, read off the portable value). */
  case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType
    override def prettyName: String = "theta_estimate"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"theta_estimate expects a sketch state (BINARY), got ${other.sql}")
      }

    override def nullSafeEval(a: Any): Any =
      evalEstimate(parseState(a.asInstanceOf[Array[Byte]]))

    override protected def withNewChildInternal(c: Expression): ThetaEstimate =
      copy(child = c)
  }

  /** Sketch-state aggregate of an arbitrary column (nulls ignored,
    * COUNT(DISTINCT) semantics — same null-before-hash guard as
    * [[KmvSketch.approxCountDistinct]]). */
  def sketchState(c: Column, k: Int): Column =
    ColumnGlue.column(
      KmvState(ColumnGlue.expression(when(c.isNotNull, xxhash64(c))), k)
        .toAggregateExpression())

  def estimate(state: Column): Column =
    ColumnGlue.column(ThetaEstimate(ColumnGlue.expression(state)))

  def union(a: Column, b: Column): Column =
    ColumnGlue.column(
      ThetaSetOp(ColumnGlue.expression(a), ColumnGlue.expression(b), "union"))

  def intersect(a: Column, b: Column): Column =
    ColumnGlue.column(
      ThetaSetOp(ColumnGlue.expression(a), ColumnGlue.expression(b), "intersect"))

  def diff(a: Column, b: Column): Column =
    ColumnGlue.column(
      ThetaSetOp(ColumnGlue.expression(a), ColumnGlue.expression(b), "diff"))
}
