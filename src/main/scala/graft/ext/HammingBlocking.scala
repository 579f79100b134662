package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared pigeonhole candidate-pair join over 64-bit-or-narrower
  * fingerprints — one blocking engine for every Hamming-fingerprint
  * modality ([[ImageDedup]] perceptual hashes, [[AudioDedup]] energy
  * hashes; [[SimHash]] keeps its own band layout for its wider
  * distance budget): split each hash into 4 chunks; any pair within
  * Hamming distance ≤ 3 must agree on at least one whole chunk
  * (pigeonhole — Manku, Jain & Das Sarma, WWW 2007), so one
  * equality-keyed join on (chunk, chunk_value) finds every candidate
  * LOSSLESSLY and only candidates pay the XOR-popcount verify.
  *
  * Scale shape: the self-join shuffles (4 × corpus) fixed-width rows
  * — corpus-linear, never quadratic; the delta form broadcasts the
  * (small) delta side so the corpus chunks ride their scan into a
  * broadcast hash join without an exchange. Inputs are
  * `(doc_id, phash)` frames from any fingerprint producer. */
object HammingBlocking {

  /** Near-duplicate pairs (doc_a < doc_b, hamming) within
    * `maxHamming`, found WITHOUT an all-pairs comparison. */
  def nearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 3,
      bits: Int = 64): DataFrame = {
    val chunked = chunkedHashes(hashes, bits)
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("phash").as("h_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("phash").as("h_b"))
    requireBlocking(maxHamming, bits)
    l.join(r, Seq("chunk", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("h_a ^ h_b")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental delta-vs-corpus form: pairs are (delta, corpus)
    * ONLY — no corpus self-pairs; the corpus never self-joins. Ids
    * must be disjoint across the two sides. */
  def nearDupPairsAgainst(
      deltaHashes: DataFrame,
      corpusHashes: DataFrame,
      maxHamming: Int = 3,
      bits: Int = 64): DataFrame = {
    requireBlocking(maxHamming, bits)
    val l = chunkedHashes(deltaHashes, bits)
      .select(col("chunk"), col("chunk_val"),
        col("doc_id").as("delta_id"), col("phash").as("h_a"))
    val r = chunkedHashes(corpusHashes, bits)
      .select(col("chunk"), col("chunk_val"),
        col("doc_id").as("corpus_id"), col("phash").as("h_b"))
    r.join(broadcast(l), Seq("chunk", "chunk_val"))
      .select(col("delta_id"), col("corpus_id"),
        bit_count(expr("h_a ^ h_b")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  private def requireBlocking(maxHamming: Int, bits: Int): Unit = {
    require(maxHamming >= 0 && maxHamming < 4,
      "4-chunk pigeonhole blocking covers distance <= 3")
    require(bits % 4 == 0,
      s"bits must split into 4 equal pigeonhole chunks, got $bits")
  }

  private def chunkedHashes(hashes: DataFrame, bits: Int): DataFrame = {
    val chunkBits = bits / 4
    val chunkMask = (1L << chunkBits) - 1
    hashes
      .withColumn("chunk", explode(expr("sequence(0, 3)")))
      .withColumn("chunk_val",
        expr(s"shiftright(phash, chunk * $chunkBits) & ${chunkMask}L"))
  }
}
