package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd random-hyperplane LSH signature over a numeric array
  * column: bit p = sign(Σᵢ vᵢ · w(seed, p, i)) where the weight
  * w = pmod(xxhash64(seed, p, i), 1000)/1000.0 − 0.5 is hash-derived
  * (deterministic, no RNG state to ship to executors).
  *
  * Exists for the same reason as [[DotProduct]]: the built-ins-only
  * formulation (`aggregate(sequence(…), … aggregate(zip_with(…)))`,
  * kept as [[VectorFunctions.hyperplaneSignatureHof]]) is an
  * interpreted nested higher-order function — per-row lambda dispatch
  * plus materialized index arrays, evaluated once per vector per
  * OR-amplification table. It sat on the inner loop of both LSH paths;
  * this expression is a tight primitive loop inside whole-stage
  * codegen.
  *
  * Bit-compatibility with the HOF form (spec-asserted): Spark's
  * `xxhash64(seedLit, p, i)` chains `XXH64.hashLong(seed, 42L)` then
  * `XXH64.hashInt` for the two INT sequence elements; weight math is
  * the identical IEEE op sequence (`pmod → /1000.0 → −0.5`), and the
  * per-plane dot accumulates left-to-right in double exactly like the
  * inner `aggregate` fold.
  */
case class HyperplaneSignature(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes must be in [1, 62], got $planes")

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_sig expects array<float> or array<double>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isF = elemIsFloat
    val planeSeed = XXH64.hashLong(seed, 42L)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val base = XXH64.hashInt(p, planeSeed)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val m = {
          val h = XXH64.hashInt(i, base)
          ((h % 1000L) + 1000L) % 1000L
        }
        val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += x * (m / 1000.0 - 0.5)
        i += 1
      }
      if (acc > 0.0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (elemIsFloat) "getFloat" else "getDouble"
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("hsN")
      val sig = ctx.freshName("hsSig")
      val p = ctx.freshName("hsP")
      val i = ctx.freshName("hsI")
      val base = ctx.freshName("hsBase")
      val acc = ctx.freshName("hsAcc")
      val h = ctx.freshName("hsH")
      val m = ctx.freshName("hsM")
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $base = $xxh.hashInt($p, $xxh.hashLong(${seed}L, 42L));
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $xxh.hashInt($i, $base);
         |    long $m = (($h % 1000L) + 1000L) % 1000L;
         |    $acc += (double)$a.$get($i) * ($m / 1000.0 - 0.5);
         |  }
         |  if ($acc > 0.0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}
