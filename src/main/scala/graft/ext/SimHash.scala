package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit locality-sensitive
  * fingerprints (per-bit token votes), candidate pairs via the
  * pigeonhole block trick, verified by Hamming distance.
  *
  * Scale shape: tokens explode, each token is hashed ONCE, and the
  * per-bit votes accumulate inside ONE [[graft.functions.SimHashVotes]]
  * typed-imperative aggregate (primitive int-array update loop,
  * map-side partial aggregation collapsing each document to one
  * buffer before the shuffle). The earlier 64-separate-`sum(when)`
  * formulation was semantically identical but generated a 64-field
  * aggregate buffer whose whole-stage codegen cost seconds of Janino
  * compilation per query. The block join then shuffles only
  * (chunk, chunkValue, id, sig) tuples.
  *
  * With `maxHamming` = 3 and 4 chunks of 16 bits, any pair within
  * distance 3 shares at least one whole chunk (pigeonhole), so the
  * block join loses nothing.
  *
  * Background: random-hyperplane similarity fingerprints are
  * Charikar's simhash ("Similarity estimation techniques from
  * rounding algorithms", STOC 2002); the chunked pigeonhole lookup is
  * the web-dedup scheme of Manku, Jain & Das Sarma ("Detecting
  * near-duplicates for web crawling", WWW 2007).
  */
object SimHash {

  /** Default token hash: seeded xxhash64 — the fast JVM path. */
  def xxTokenHash(t: Column): Column = xxhash64(t)

  /** Engine-portable token hash: the top 15 hex chars of md5 parsed
    * as a 60-bit integer. Any engine with md5 can reproduce it
    * (DuckDB: `('0x' || substring(md5(t), 1, 15))::UBIGINT`), which
    * makes the whole simhash pipeline oracle-checkable; 60 bits keeps
    * the value ANSI-safe in a signed long. Use with `bits = 60`. */
  def portableTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** (doc_id, simhash) — bit b of the signature is the sign of the
    * vote sum Σ_tokens (bit_b(hash(token)) ? +1 : -1). Tokens vote
    * with multiplicity (Charikar's frequency weighting). */
  def signatures(
      docs: DataFrame,
      bits: Int = 64,
      tokenHash: Column => Column = xxTokenHash): DataFrame = {
    require(bits >= 4 && bits <= 64, s"bits must be in [4, 64], got $bits")
    // Spread a narrow input before the bits-votes-per-token stage
    // (same reasoning as MinHashLSH.shingleRows; no-op on wide scans).
    val spread = Spread.ifNarrow(docs)
    val exploded = spread
      .withColumn("__toks", words(normalized(col("text"))))
      .select(col("doc_id"), explode(col("__toks")).as("__t"))
      .select(col("doc_id"), tokenHash(col("__t")).as("__h"))
    exploded
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashVotes.signature(col("__h"), bits).as("simhash"))
  }

  /** Backwards-compatible variant keeping the input columns. */
  def withSignature(docs: DataFrame): DataFrame =
    docs.join(signatures(docs), Seq("doc_id"))

  /** Near-dup pairs with Hamming distance ≤ maxHamming (pigeonhole
    * blocking with 4 chunks covers distance ≤ 3). */
  def nearDupPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      bits: Int = 64,
      tokenHash: Column => Column = xxTokenHash): DataFrame = {
    require(maxHamming < 4, "4-chunk pigeonhole blocking covers distance <= 3")
    require(bits % 4 == 0, s"bits must split into 4 equal pigeonhole chunks, got $bits")
    val chunkBits = bits / 4
    val chunkMask = (1L << chunkBits) - 1
    val sigs = signatures(docs, bits, tokenHash)
    val chunked = sigs
      .withColumn("chunk", explode(expr("sequence(0, 3)")))
      .withColumn("chunk_val",
        expr(s"shiftright(simhash, chunk * $chunkBits) & ${chunkMask}L"))
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
