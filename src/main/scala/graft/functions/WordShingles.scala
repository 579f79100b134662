package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling: array<string> words →
  * array<string> of `n`-word shingles joined by single spaces,
  * bit-identical to [[TextFunctions.shingles]] (the interpreted-HOF
  * semantic spec) for every non-empty input, with the MinHash
  * short-document rule: fewer than `n` words yields ONE shingle of
  * all of them; zero words yields an empty array (the document
  * disappears under `explode`, exactly as the prior windowed-`lead`
  * formulation dropped it).
  *
  * This expression exists for plan shape, not arithmetic: the
  * windowed-`lead` shingling it replaces required a
  * hash-partition-by-doc_id EXCHANGE of one row per word before any
  * shingle existed — re-shuffling the whole corpus as token rows.
  * Per-row shingling keeps the pipeline map-side, so the first
  * exchange in the MinHash signature path is the partial-aggregated
  * sketch states (128 longs per doc), and decontamination's corpus
  * side reaches its broadcast join without shuffling at all. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 2, s"shingle size must be at least 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(words: Any): Any =
    WordShingles.shingle(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.shingle($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Shared by interpreted eval and generated code. */
  def shingle(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    if (len <= n) {
      val all = new Array[UTF8String](len)
      var i = 0
      while (i < len) { all(i) = words.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    } else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        val buf = new Array[UTF8String](n)
        var j = 0
        while (j < n) { buf(j) = words.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, buf: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(wordsCol: Column, n: Int): Column =
    ColumnGlue.column(WordShingles(ColumnGlue.expression(wordsCol), n))
}
