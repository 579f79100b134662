package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit locality-sensitive
  * fingerprints (per-bit token votes), candidate pairs via the
  * pigeonhole block trick, verified by Hamming distance.
  *
  * Scale shape: the signature is one shuffle-free projection per
  * document; only (chunk, chunkValue, id, sig) tuples shuffle for the
  * block join. With `maxHamming` = 3 and 4 chunks of 16 bits, any
  * pair within distance 3 shares at least one whole chunk
  * (pigeonhole), so the block join loses nothing.
  */
object SimHash {

  /** 64-bit simhash over the word tokens: bit b is the sign of the
    * vote sum Σ_tokens (bit_b(xxhash64(token)) ? +1 : -1). */
  def withSignature(docs: DataFrame): DataFrame =
    docs
      .withColumn("__toks", words(normalized(col("text"))))
      .withColumn("simhash",
        expr(
          """aggregate(
            |  sequence(0, 63),
            |  0L,
            |  (acc, b) -> acc + shiftleft(
            |    CASE WHEN aggregate(__toks, 0L,
            |      (v, t) -> v + CASE WHEN (shiftright(xxhash64(t), b) & 1L) = 1L
            |                    THEN 1L ELSE -1L END) > 0L
            |    THEN 1L ELSE 0L END, b)
            |)""".stripMargin))
      .drop("__toks")

  /** Near-dup pairs with Hamming distance ≤ maxHamming (≤ 15 with the
    * default 4 chunks — pigeonhole requires maxHamming < chunks). */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4-chunk pigeonhole blocking covers distance <= 3")
    val sigs = withSignature(docs).select(col("doc_id"), col("simhash"))
    val chunked = sigs
      .withColumn("chunk", explode(expr("sequence(0, 3)")))
      .withColumn("chunk_val",
        expr("shiftright(simhash, chunk * 16) & 65535L"))
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("sig_a ^ sig_b")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
