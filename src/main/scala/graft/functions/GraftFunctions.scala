package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom expressions, so
  * `spark.sql` users get the same surface as the Column API:
  *
  * {{{
  * GraftFunctions.registerAll(spark)
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", exprs => {
      require(exprs.length == 2, "vec_dot(a, b) takes two array arguments")
      DotProduct(exprs(0), exprs(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sketch", exprs => {
      require(exprs.length == 2, "minhash_sketch(hash, numHashes)")
      // a non-literal numHashes (e.g. a column reference) would make
      // eval(null) throw an opaque NPE — fail with the actual contract
      require(exprs(1).foldable,
        s"minhash_sketch numHashes must be a constant integer, got ${exprs(1).sql}")
      val n = exprs(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"minhash_sketch numHashes must be a constant integer, got $other")
      }
      MinHashSketch(exprs(0), n).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles", exprs => {
      require(exprs.length == 2, "word_shingles(words, n)")
      require(exprs(1).foldable,
        s"word_shingles n must be a constant integer, got ${exprs(1).sql}")
      val n = exprs(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"word_shingles n must be a constant integer, got $other")
      }
      WordShingles(exprs(0), n)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("kmv_distinct", exprs => {
      require(exprs.length == 2, "kmv_distinct(hash, k)")
      require(exprs(1).foldable,
        s"kmv_distinct k must be a constant integer, got ${exprs(1).sql}")
      val k = exprs(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"kmv_distinct k must be a constant integer, got $other")
      }
      KmvSketch(exprs(0), k).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("kll_quantile", exprs => {
      require(exprs.length == 3, "kll_quantile(value, q, capacity)")
      require(exprs(1).foldable && exprs(2).foldable,
        "kll_quantile q and capacity must be constants")
      val q = exprs(1).eval(null) match {
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"kll_quantile q must be a constant double, got $other")
      }
      val cap = exprs(2).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"kll_quantile capacity must be a constant integer, got $other")
      }
      KllSketch(exprs(0), cap, q).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("mg_topk", exprs => {
      require(exprs.length == 2, "mg_topk(item, k)")
      require(exprs(1).foldable,
        s"mg_topk k must be a constant integer, got ${exprs(1).sql}")
      val k = exprs(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"mg_topk k must be a constant integer, got $other")
      }
      MgSketch(exprs(0), k).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash_agg", exprs => {
      require(exprs.length == 2, "simhash_agg(hash, bits)")
      require(exprs(1).foldable,
        s"simhash_agg bits must be a constant integer, got ${exprs(1).sql}")
      val bits = exprs(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"simhash_agg bits must be a constant integer, got $other")
      }
      SimHashVotes(exprs(0), bits).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("bloom_build", exprs => {
      require(exprs.length == 3, "bloom_build(hash, numBits, numHashes)")
      require(exprs(1).foldable && exprs(2).foldable,
        "bloom_build numBits and numHashes must be constants")
      def intOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
          what: String): Int = e.eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"bloom_build $what must be a constant integer, got $other")
      }
      BloomSketch(exprs(0), intOf(exprs(1), "numBits"),
        intOf(exprs(2), "numHashes")).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("might_contain", exprs => {
      require(exprs.length == 2, "might_contain(bloom, hash)")
      BloomMightContain(exprs(0), exprs(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("kmv_state", exprs => {
      require(exprs.length == 2, "kmv_state(hash, k)")
      require(exprs(1).foldable,
        s"kmv_state k must be a constant integer, got ${exprs(1).sql}")
      val k = exprs(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"kmv_state k must be a constant integer, got $other")
      }
      ThetaOps.KmvState(exprs(0), k).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_estimate", exprs => {
      require(exprs.length == 1, "theta_estimate(state)")
      ThetaOps.ThetaEstimate(exprs(0))
    }, "scala_udf")
    Seq("union", "intersect", "diff").foreach { op =>
      reg.createOrReplaceTempFunction(s"theta_$op", exprs => {
        require(exprs.length == 2, s"theta_$op(a, b)")
        ThetaOps.ThetaSetOp(exprs(0), exprs(1), op)
      }, "scala_udf")
    }
  }
}
