package graft.app

import graft.ext.{DedupClusters, DedupOps, MinHashLSH, SimHash}
import org.apache.spark.sql.DataFrame

/** Corpus deduplication as a command: detector → clustering →
  * keep-one-per-cluster → parquet.
  *
  * {{{
  * runMain graft.app.DedupCorpusApp \
  *   --input /data/docs.parquet --output /data/docs_dedup.parquet \
  *   --method minhash            # exact | minhash | simhash | ngram
  * }}}
  */
object DedupCorpusApp {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val spark = Common.spark()
    val docs = spark.read.parquet(Args.req(m, "input"))

    val deduped: DataFrame = m.getOrElse("method", "minhash") match {
      case "exact" =>
        DedupOps.exactKeepRows(docs).drop("fp")
      case "minhash" =>
        DedupClusters.keepOnePerCluster(docs, MinHashLSH.nearDupPairs(docs))
      case "simhash" =>
        DedupClusters.keepOnePerCluster(docs, SimHash.nearDupPairs(docs))
      case "ngram" =>
        DedupClusters.keepOnePerCluster(docs, DedupOps.ngramJaccard(docs))
      case other => sys.error(s"unknown --method $other (exact|minhash|simhash|ngram)")
    }

    deduped.write.mode("overwrite").parquet(Args.req(m, "output"))
    val (in, out) = (docs.count(), spark.read.parquet(Args.req(m, "output")).count())
    println(s"""{"input_rows": $in, "kept_rows": $out, "removed": ${in - out}}""")
    spark.stop()
  }
}
