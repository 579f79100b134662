package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection
  * (shingle → minhash signature → band → bucket-join), the standard
  * scale path for corpus dedup with no blocking key.
  *
  * Pipeline (all stages sized for a 100 TB corpus):
  *  1. shingling: word `shingleSize`-grams per document (HOF
  *     projection, shuffle-free).
  *  2. signature: each shingle is string-hashed ONCE (`xxhash64`),
  *     then the `numHashes` minhash values derive from the 64-bit
  *     hash by cheap re-hashing — explode + groupBy with `numHashes`
  *     `min` aggregates. The whole stage is codegen'd vectorized
  *     hash aggregation (interpreted higher-order lambdas were ~20×
  *     slower), and map-side partial aggregation collapses each
  *     document back to one row before the shuffle, so only
  *     `docs × numHashes` longs ever cross the wire.
  *  3. banding: signature split into `bands` bands, each hashed to a
  *     bucket key. Only (band, bucket, id) tuples shuffle.
  *  4. bucket self-join: candidate pairs = documents sharing any band
  *     bucket. The hash-uniform bucket key distributes evenly; a
  *     pathological bucket (thousands of identical docs) is exactly
  *     the case where candidates SHOULD pair up.
  *  5. verification: exact shingle-set Jaccard on candidates only —
  *     integer threshold arithmetic, no float disagreement.
  *
  * All hashing is `xxhash64` seeded by construction — deterministic,
  * no RNG state shipped to executors.
  */
object MinHashLSH {

  /** Adds the `__shingles` column (word n-gram shingles). */
  def withShingles(docs: DataFrame, shingleSize: Int = 3): DataFrame =
    docs
      .withColumn("__words", words(normalized(col("text"))))
      .withColumn("__shingles", shingles("__words", shingleSize))
      .drop("__words")

  /** (doc_id, sig: array<bigint>) minhash signatures. */
  def signatures(
      docs: DataFrame,
      numHashes: Int = 128,
      shingleSize: Int = 3): DataFrame = {
    val exploded = withShingles(docs, shingleSize)
      .select(col("doc_id"), explode(col("__shingles")).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("__h"))
    val aggs = (0 until numHashes)
      .map(i => min(xxhash64(lit(i), col("__h"))).as(s"__m$i"))
    exploded
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Candidate pairs from banded bucketing (no verification). */
  def candidatePairs(
      sigs: DataFrame,
      bands: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    val banded = sigs
      .select(col("doc_id"), col("sig"))
      .withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
      .withColumn("bucket",
        expr(s"xxhash64(band, array_join(slice(sig, band * $rowsPerBand + 1, $rowsPerBand), ','))"))
      .select(col("doc_id"), col("band"), col("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Full pipeline: LSH candidates verified by exact shingle-set
    * Jaccard ≥ num/den. */
  def nearDupPairs(
      docs: DataFrame,
      numHashes: Int = 128,
      shingleSize: Int = 3,
      bands: Int = 32,
      jaccard: (Int, Int) = (4, 5)): DataFrame = {
    val (num, den) = jaccard
    val cands = candidatePairs(
      signatures(docs, numHashes, shingleSize), bands, numHashes / bands)
    val shingleSets = withShingles(docs, shingleSize).select(
      col("doc_id"), array_distinct(col("__shingles")).as("sset"))
    cands
      .join(shingleSets.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sset", "sset_a"), Seq("doc_a"))
      .join(shingleSets.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sset", "sset_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sset_a"), col("sset_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("sset_a"), col("sset_b"))).cast("long"))
      .where(col("inter") * den >= col("uni") * num)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }
}
