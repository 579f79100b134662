package graft.app

import graft.ext.{Decontaminate, DedupClusters, DedupOps, MinHashLSH, SimHash}
import org.apache.spark.sql.DataFrame

/** Corpus deduplication as a command: detector → clustering →
  * keep-one-per-cluster → (optional eval-set decontamination) →
  * parquet.
  *
  * {{{
  * runMain graft.app.DedupCorpusApp \
  *   --input /data/docs.parquet --output /data/docs_dedup.parquet \
  *   --method minhash \          # exact | minhash | simhash | ngram
  *   --decontaminate /data/benchmarks.parquet   # optional: drop docs
  *                                              # sharing a 13-gram
  * }}}
  */
object DedupCorpusApp {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val spark = Common.spark()
    val docs = spark.read.parquet(Args.req(m, "input"))

    val deduped0: DataFrame = m.getOrElse("method", "minhash") match {
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

    // decontamination runs AFTER dedup: the contaminated set is a
    // vanishing fraction, so dedup first avoids shingling duplicates
    val deduped: DataFrame = m.get("decontaminate").fold(deduped0) { evalPath =>
      val eval = spark.read.parquet(evalPath)
      // spreadTrain = false: deduped0 is a post-dedup (wide, shuffled)
      // subtree — the narrow-input probe would re-execute the whole
      // dedup pipeline just to read its partition count
      deduped0.join(
        Decontaminate.contamination(deduped0, eval, spreadTrain = false),
        Seq("doc_id"), "left_anti")
    }

    deduped.write.mode("overwrite").parquet(Args.req(m, "output"))
    val (in, out) = (docs.count(), spark.read.parquet(Args.req(m, "output")).count())
    println(s"""{"input_rows": $in, "kept_rows": $out, "removed": ${in - out}}""")
    spark.stop()
  }
}
