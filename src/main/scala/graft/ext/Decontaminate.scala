package graft.ext

import graft.functions.TextFunctions._
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
  * HOFs). If the eval side ever outgrows broadcast, drop the hint and
  * the same plan degrades gracefully to a shuffle join on the shingle
  * key.
  *
  * Short eval docs: an eval doc with fewer than `n` tokens emits ONE
  * whole-text shingle, which can only string-equal a train shingle of
  * the same token length — so against a long training doc (which
  * emits only `n`-grams) it would never match, silently missing a
  * short benchmark answer quoted verbatim inside a long training doc.
  * To close that gap the train side is ADDITIONALLY shingled at each
  * distinct short eval length (an L-gram of the train doc equals the
  * eval whole text exactly when the eval doc appears verbatim at a
  * token boundary). The eval suite is tiny by contract, so collecting
  * its distinct short lengths is a bounded driver op, and all lengths
  * are emitted in ONE pass over the corpus — per row, the per-length
  * shingle arrays are concatenated and exploded once, so the extra
  * lengths add map-side CPU but no second scan and no shuffle.
  */
object Decontaminate {

  /** Shingle array at an arbitrary length `l >= 1` ([[WordShingles]]
    * requires >= 2; an eval doc of ONE token matches on bare words,
    * and a 1-gram array is exactly the token array). */
  private def shinglesAt(toks: org.apache.spark.sql.Column, l: Int) =
    if (l >= 2) graft.functions.WordShingles(toks, l) else toks

  /** Per-contaminated-training-doc overlap counts:
    * (doc_id, n_hits = distinct shared shingles,
    *  n_eval_docs = distinct eval docs hit). Clean documents do not
    * appear — anti-join the corpus against this to keep the clean
    * set, or threshold on n_hits for a softer rule.
    *
    * `spreadTrain = false` skips the narrow-input probe on the train
    * side — pass it when `train` is already a wide/shuffled subtree
    * (the probe would execute that subtree just to read its
    * partition count; see [[Spread.ifNarrow]]). */
  def contamination(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 13,
      spreadTrain: Boolean = true): DataFrame = {
    val evalSh = MinHashLSH.shingleRows(eval, n)
      .select(col("doc_id").as("eval_id"), col("__sh"))
      .distinct()
    // distinct token lengths of short eval docs (bounded: at most
    // n - 1 values, from a by-contract-tiny eval suite)
    val shortLens: Seq[Int] = eval
      .select(size(words(normalized(col("text")))).as("l"))
      .where(col("l") > 0 && col("l") < n)
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val trainBase =
      if (spreadTrain) Spread.ifNarrow(train) else train
    val toks = words(normalized(col("text")))
    val trainSh = trainBase.select(col("doc_id"),
      explode(array_distinct(concat(
        ((n +: shortLens).map(l => shinglesAt(toks, l))): _*))).as("__sh"))
    trainSh
      .join(broadcast(evalSh), Seq("__sh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("__sh")).as("n_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
