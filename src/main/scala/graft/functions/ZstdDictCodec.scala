package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary-trained zstd codec for SHORT text values — the
  * training-data-corpus compression trick parquet's own page codec
  * cannot pull: general zstd needs a few KB of history before its
  * matches pay off, so a column of independent 100-500 byte documents
  * compresses poorly page-by-page, while a 64 KB dictionary trained
  * on a corpus sample front-loads the shared redundancy (boilerplate,
  * domain phrasing, markup) into every value's first byte. The
  * compressed column is a plain parquet `binary`; the dictionary is a
  * sidecar the reader loads once (see
  * [[graft.sources.ZstdCorpus]]).
  *
  * Executor mechanics: one `ZstdCompressCtx`/`ZstdDecompressCtx` per
  * (thread, dictionary) pair, cached in a per-thread map keyed by the
  * dictionary's content hash — contexts are NOT thread-safe, and
  * re-loading a 64 KB dictionary per VALUE would dwarf the codec
  * itself. The dictionary rides the expression tree as a byte-array
  * reference object (≤ a few hundred KB by contract), so tasks get it
  * with the serialized plan — no side-channel distribution. */
case class ZstdDictCompress(child: Expression, dict: Array[Byte], level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 19, s"zstd level must be in [1, 19], got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zstd_dict_compress expects string, got $other")
  }

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(s: Any): Any =
    ZstdDictCodec.compress(s.asInstanceOf[UTF8String], dict, level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ZstdDictCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val dictRef = ctx.addReferenceObj("zdict", dict, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $helper.compress($a, $dictRef, $level);")
  }

  override protected def withNewChildInternal(newChild: Expression): ZstdDictCompress =
    copy(child = newChild)
  override def prettyName: String = "zstd_dict_compress"
}

case class ZstdDictDecompress(child: Expression, dict: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zstd_dict_decompress expects binary, got $other")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(b: Any): Any =
    ZstdDictCodec.decompress(b.asInstanceOf[Array[Byte]], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ZstdDictCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val dictRef = ctx.addReferenceObj("zdict", dict, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $helper.decompress($a, $dictRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ZstdDictDecompress =
    copy(child = newChild)
  override def prettyName: String = "zstd_dict_decompress"
}

object ZstdDictCodec {
  import com.github.luben.zstd.{Zstd, ZstdCompressCtx, ZstdDecompressCtx}

  // per-thread context caches keyed by (dict content DIGEST, level).
  // A 32-bit Arrays.hashCode key (the old scheme) is not
  // collision-proof: two distinct dictionaries colliding in one
  // executor thread would silently compress frames with the WRONG
  // dictionary — a write-path defect that surfaces only at read time
  // (zstd dictID mismatch under a table whose _zdict is the other
  // dict). SHA-256 of the dict content cannot collide in practice,
  // and to avoid hashing the whole dict per ROW the digest is
  // memoized by the dict array's reference identity (plan-shipped
  // dicts are one stable array per task binding, so the memo hits
  // after the first row; the memo is bounded and cleared, never
  // trusted for correctness). BOUNDED context caches: contexts hold
  // NATIVE buffers plus a copy of the loaded dict, and an executor's
  // pooled threads outlive any one job — an unbounded map would leak
  // off-heap memory per (thread, retrained dict) for the executor's
  // lifetime. Access-order LRU of 4 per thread, evictee CLOSED
  // (frees the native allocation); 4 >> the dicts any one job
  // touches, so steady state never evicts.
  private def lru[K, V <: AutoCloseable](max: Int) =
    new java.util.LinkedHashMap[K, V](8, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        if (size() > max) { e.getValue.close(); true } else false
    }
  private val cctx = new ThreadLocal[java.util.LinkedHashMap[(String, Int), ZstdCompressCtx]] {
    override def initialValue() = lru(4)
  }
  private val dctx = new ThreadLocal[java.util.LinkedHashMap[String, ZstdDecompressCtx]] {
    override def initialValue() = lru(4)
  }
  private val digestMemo = new ThreadLocal[java.util.IdentityHashMap[Array[Byte], String]] {
    override def initialValue() = new java.util.IdentityHashMap[Array[Byte], String]()
  }
  private def dictDigest(dict: Array[Byte]): String = {
    val memo = digestMemo.get()
    var d = memo.get(dict)
    if (d == null) {
      d = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(dict))
      // new array instances arrive once per task binding; dozens of
      // live entries would mean the memo is holding dead tasks' dict
      // copies — drop everything rather than leak them
      if (memo.size() >= 64) memo.clear()
      memo.put(dict, d)
    }
    d
  }

  def compress(s: UTF8String, dict: Array[Byte], level: Int): Array[Byte] = {
    val key = (dictDigest(dict), level)
    var ctx = cctx.get().get(key)
    if (ctx == null) {
      ctx = new ZstdCompressCtx().setLevel(level).loadDict(dict)
      cctx.get().put(key, ctx)
    }
    ctx.compress(s.getBytes)
  }

  def decompress(b: Array[Byte], dict: Array[Byte]): UTF8String = {
    val key = dictDigest(dict)
    var ctx = dctx.get().get(key)
    if (ctx == null) {
      ctx = new ZstdDecompressCtx().loadDict(dict)
      dctx.get().put(key, ctx)
    }
    val size = Zstd.getFrameContentSize(b)
    require(size >= 0 && size <= Int.MaxValue,
      s"zstd frame without a valid content size: $size")
    UTF8String.fromBytes(ctx.decompress(b, size.toInt))
  }

  def compressCol(c: Column, dict: Array[Byte], level: Int = 3): Column =
    ColumnGlue.column(ZstdDictCompress(ColumnGlue.expression(c), dict, level))
  def decompressCol(c: Column, dict: Array[Byte]): Column =
    ColumnGlue.column(ZstdDictDecompress(ColumnGlue.expression(c), dict))
}
