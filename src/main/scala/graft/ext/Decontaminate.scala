package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share any
  * `n`-token n-gram with an evaluation/benchmark document, so the
  * training corpus can't leak test answers (the n-gram-overlap rule
  * of Brown et al., "Language Models are Few-Shot Learners", NeurIPS
  * 2020, Appendix C — 13-gram collisions — as applied by every
  * serious pretraining pipeline since).
  *
  * Scale shape: the eval side is a benchmark suite — thousands of
  * documents against a 100 TB corpus — so its distinct shingles are
  * BROADCAST and the training corpus streams through a broadcast hash
  * join without ever shuffling; the only exchange is the per-doc
  * aggregation of MATCHED rows (contamination hits, a vanishing
  * fraction of the corpus). Shingling reuses the codegen'd
  * [[MinHashLSH.shingleRows]] path (windowed `lead`, not interpreted
  * HOFs) including its short-document rule (a doc with fewer than `n`
  * tokens contributes its whole text as one shingle — a short eval
  * doc quoted verbatim in a training doc must still flag). If the
  * eval side ever outgrows broadcast, drop the hint and the same plan
  * degrades gracefully to a shuffle join on the shingle key.
  */
object Decontaminate {

  /** Per-contaminated-training-doc overlap counts:
    * (doc_id, n_hits = distinct shared shingles,
    *  n_eval_docs = distinct eval docs hit). Clean documents do not
    * appear — anti-join the corpus against this to keep the clean
    * set, or threshold on n_hits for a softer rule. */
  def contamination(train: DataFrame, eval: DataFrame, n: Int = 13): DataFrame = {
    val trainSh = MinHashLSH.shingleRows(train, n)
    val evalSh = MinHashLSH.shingleRows(eval, n)
      .select(col("doc_id").as("eval_id"), col("__sh"))
      .distinct()
    trainSh
      .join(broadcast(evalSh), Seq("__sh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("__sh")).as("n_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
