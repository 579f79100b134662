package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-plane SIGNED projections behind [[HyperplaneSignature]]:
  * margins[p] = Σᵢ vᵢ · w(seed, p, i) — the accumulator whose sign is
  * signature bit p (`margins[p] > 0 ⇔ bit p set`, the identical
  * `> 0.0` comparison and left-to-right double fold, spec-asserted).
  *
  * Exists for query-directed multi-probe LSH (Lv et al., VLDB'07): a
  * query's true near neighbors disagree with its signature mostly on
  * the planes it barely cleared, so ranking probe buckets by the
  * total |margin| of their flipped bits concentrates the probe budget
  * where the neighbors actually are — per-QUERY geometry, independent
  * of the corpus distribution. The signature alone cannot express
  * that ranking; it has already collapsed each margin to its sign.
  */
case class HyperplaneMargins(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes must be in [1, 62], got $planes")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_margins expects array<float> or array<double>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isF = elemIsFloat
    val planeSeed = XXH64.hashLong(seed, 42L)
    val out = new Array[Double](planes)
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
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (elemIsFloat) "getFloat" else "getDouble"
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("hmN")
      val out = ctx.freshName("hmOut")
      val p = ctx.freshName("hmP")
      val i = ctx.freshName("hmI")
      val base = ctx.freshName("hmBase")
      val acc = ctx.freshName("hmAcc")
      val h = ctx.freshName("hmH")
      val m = ctx.freshName("hmM")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $base = $xxh.hashInt($p, $xxh.hashLong(${seed}L, 42L));
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $xxh.hashInt($i, $base);
         |    long $m = (($h % 1000L) + 1000L) % 1000L;
         |    $acc += (double)$a.$get($i) * ($m / 1000.0 - 0.5);
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneMargins =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_margins"
}
