package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou, Douze & Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011): a vector is
  * L2-normalized, split into `m` subvectors of `dsub` dims, and each
  * subvector replaced by the id of its nearest codebook centroid —
  * 64 float dims compress to `m` small ints. Query scoring never
  * decompresses: an `m × ks` lookup table of query-subvector ×
  * centroid inner products turns the approximate cosine into `m`
  * table lookups per corpus vector (asymmetric distance computation).
  *
  * Codebooks are trained driver-side on a bounded sample (tiny Lloyd
  * iterations over `dsub`-dim slices — see [[PqCodebooks.train]]) and
  * shipped to executors as expression reference objects; encode and
  * score are codegen'd primitive loops, same pattern as
  * [[DotProduct]].
  */
final case class PqCodebooks(m: Int, ks: Int, dsub: Int, flat: Array[Double])
    extends Serializable {
  require(flat.length == m * ks * dsub, "codebook shape mismatch")
  def centroid(j: Int, c: Int): Array[Double] =
    java.util.Arrays.copyOfRange(flat, (j * ks + c) * dsub, (j * ks + c + 1) * dsub)

  /** ADC lookup table for a query vector (normalized internally):
    * lut(j*ks + c) = ⟨q_sub_j, codebook_j_c⟩. */
  def lookupTable(query: Array[Double]): Array[Double] = {
    val q = PqCodebooks.normalize(query)
    val lut = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val qi = j * dsub + d
          if (qi < q.length) acc += q(qi) * flat((j * ks + c) * dsub + d)
          d += 1
        }
        lut(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    lut
  }
}

object PqCodebooks {

  private[functions] def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    // multiply by the inverse, not divide: [[PqEncode.encode]] and
    // [[PqLut.lut]] normalize that way in codegen, and the
    // interpreted-vs-codegen specs assert BIT equality — a/n vs
    // a*(1/n) differ in the last ulp
    if (n == 0.0) v else { val inv = 1.0 / n; v.map(_ * inv) }
  }

  /** Seeded driver-side Lloyd's k-means over the `j`-th subvector
    * slices of a (bounded) sample. Deterministic: initial centroids
    * are sample points at splitmix64-derived indices; ties keep the
    * lower centroid id; empty clusters keep their previous centroid. */
  private def lloyd(
      pts: Array[Array[Double]], ks: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val n = pts.length
    val k = math.min(ks, n)
    val centroids = Array.tabulate(ks) { c =>
      if (c < k) pts((math.floorMod(MinHashSketch.splitmix64(seed + c), n.toLong)).toInt).clone()
      else new Array[Double](pts.headOption.map(_.length).getOrElse(0))
    }
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < ks) {
          var d2 = 0.0; var d = 0
          while (d < pts(i).length) {
            val diff = pts(i)(d) - centroids(c)(d); d2 += diff * diff; d += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(ks)(new Array[Double](pts.headOption.map(_.length).getOrElse(0)))
      val counts = new Array[Int](ks)
      i = 0
      while (i < n) {
        val c = assign(i); counts(c) += 1
        var d = 0
        while (d < pts(i).length) { sums(c)(d) += pts(i)(d); d += 1 }
        i += 1
      }
      var c = 0
      while (c < ks) {
        if (counts(c) > 0) {
          var d = 0
          while (d < sums(c).length) { centroids(c)(d) = sums(c)(d) / counts(c); d += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Train `m` subspace codebooks of `ks` centroids each over a
    * bounded sample of (already full-dimension) vectors. Vectors are
    * normalized before slicing, matching the encoder. */
  def train(
      sample: Array[Array[Double]],
      dim: Int,
      m: Int,
      ks: Int,
      iters: Int = 10,
      seed: Long = 42L): PqCodebooks = {
    require(dim % m == 0, s"dim ($dim) must split into m ($m) equal subspaces")
    val dsub = dim / m
    val normed = sample.map(normalize)
    val flat = new Array[Double](m * ks * dsub)
    var j = 0
    while (j < m) {
      val slices = normed.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val cents = lloyd(slices, ks, iters, seed + j)
      var c = 0
      while (c < ks) {
        System.arraycopy(cents(c), 0, flat, (j * ks + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    PqCodebooks(m, ks, dsub, flat)
  }
}

/** Codegen'd PQ encoder: array<float|double> → array<int> of `m`
  * nearest-centroid ids over the normalized input. */
case class PqEncode(child: Expression, codebooks: PqCodebooks)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // analysis-time rejection (same pattern as WordShingles): a bad
  // element type must fail the query plan, not surface as an executor
  // exception from elemIsFloat during codegen/eval
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float> or array<double>, got $other")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_encode expects array<float> or array<double>, got $other")
  }

  @transient private lazy val isF = elemIsFloat

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(PqEncode.encode(
      arr, isF, codebooks.m, codebooks.ks, codebooks.dsub, codebooks.flat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqFlat", codebooks.flat, "double[]")
    val helper = PqEncode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.encode($a, ${isF}, ${codebooks.m}, ${codebooks.ks},
         |    ${codebooks.dsub}, $cbRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Shared by interpreted eval and generated code (the loop nest is
    * identical either way; codegen only removes boxing around it). */
  def encode(
      arr: ArrayData, isF: Boolean, m: Int, ks: Int, dsub: Int,
      flat: Array[Double]): Array[Int] = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      s += x * x; i += 1
    }
    val nrm = math.sqrt(s)
    val inv = if (nrm == 0.0) 0.0 else 1.0 / nrm
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var d2 = 0.0; var d = 0
        while (d < dsub) {
          val vi = j * dsub + d
          val x = if (vi < n) (if (isF) arr.getFloat(vi).toDouble else arr.getDouble(vi)) * inv else 0.0
          val diff = x - flat((j * ks + c) * dsub + d)
          d2 += diff * diff; d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    codes
  }

  def apply(vec: Column, codebooks: PqCodebooks): Column =
    ColumnGlue.column(PqEncode(ColumnGlue.expression(vec), codebooks))
}

/** Codegen'd ADC lookup-table builder: query array<float|double> →
  * array<double> of `m·ks` query-subvector × centroid inner products.
  * Computed ONCE per query row (O(m·ks·dsub)), so every corpus pair
  * afterwards scores in `m` table lookups — the whole point of
  * asymmetric distance computation. Matches
  * [[PqCodebooks.lookupTable]] bit-for-bit (spec-enforced). */
case class PqLut(child: Expression, codebooks: PqCodebooks)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // analysis-time rejection, matching WordShingles / PqEncode
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float> or array<double>, got $other")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_lut expects array<float> or array<double>, got $other")
  }

  @transient private lazy val isF = elemIsFloat

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(PqLut.lut(v.asInstanceOf[ArrayData],
      isF, codebooks.m, codebooks.ks, codebooks.dsub, codebooks.flat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqFlat", codebooks.flat, "double[]")
    val helper = PqLut.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.lut($a, ${isF}, ${codebooks.m}, ${codebooks.ks},
         |    ${codebooks.dsub}, $cbRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

object PqLut {
  /** Shared by interpreted eval and generated code. Normalization
    * mirrors [[PqEncode.encode]]: zero-norm vectors stay zero, and
    * query dims past the array end read as 0 — both sides of the
    * asymmetric distance see the same conventions. */
  def lut(
      arr: ArrayData, isF: Boolean, m: Int, ks: Int, dsub: Int,
      flat: Array[Double]): Array[Double] = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      s += x * x; i += 1
    }
    val nrm = math.sqrt(s)
    val inv = if (nrm == 0.0) 0.0 else 1.0 / nrm
    val lut = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val qi = j * dsub + d
          val x =
            if (qi < n) (if (isF) arr.getFloat(qi).toDouble else arr.getDouble(qi)) * inv
            else 0.0
          acc += x * flat((j * ks + c) * dsub + d)
          d += 1
        }
        lut(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    lut
  }

  def apply(vec: Column, codebooks: PqCodebooks): Column =
    ColumnGlue.column(PqLut(ColumnGlue.expression(vec), codebooks))
}

/** Codegen'd ADC score: Σⱼ lut[j·ks + codes[j]] — the approximate
  * cosine between the lut's query and the encoded corpus vector. */
case class PqAdcScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  // left = codes array<int>, right = lut array<double>
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects (array<int>, array<double>), got ($l, $r)")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) { acc += lut.getDouble(j * ks + codes.getInt(j)); j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("adcM")
      val j = ctx.freshName("adcJ")
      val acc = ctx.freshName("adcAcc")
      s"""
         |int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lut.getDouble($j * $ks + $codes.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc_score"
}

object PqAdcScore {
  def apply(codes: Column, lut: Column, ks: Int): Column =
    ColumnGlue.column(PqAdcScore(
      ColumnGlue.expression(codes), ColumnGlue.expression(lut), ks))
}
