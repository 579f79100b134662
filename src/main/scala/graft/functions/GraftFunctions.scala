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
      val n = exprs(1).eval(null).asInstanceOf[Number].intValue()
      MinHashSketch(exprs(0), n).toAggregateExpression()
    }, "scala_udf")
  }
}
