package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection
  * (shingle → minhash signature → band → bucket-join), the standard
  * scale path for corpus dedup with no blocking key.
  *
  * Pipeline (all stages sized for a 100 TB corpus):
  *  1. signature: per document, `numHashes` minhash values over word
  *     `shingleSize`-gram shingles. Computed entirely with
  *     higher-order functions in one codegen'd projection — no
  *     explode, no shuffle, O(numHashes · shingles) per row.
  *  2. banding: signature split into `bands` bands of `rowsPerBand`;
  *     each band hashed to one bucket key. Only (band, bucket, id)
  *     tuples shuffle — tiny relative to the text.
  *  3. bucket self-join: candidate pairs = documents sharing any
  *     band bucket. The md5-uniform bucket key distributes evenly;
  *     a pathological bucket (thousands of identical docs) is exactly
  *     the case where candidates SHOULD pair up.
  *  4. verification: exact shingle-set Jaccard on candidates only —
  *     integer threshold arithmetic, no float disagreement.
  *
  * Hash functions are `xxhash64(seed, shingle)` — deterministic by
  * construction, no RNG state shipped to executors.
  */
object MinHashLSH {

  def signatures(
      docs: DataFrame,
      numHashes: Int = 128,
      shingleSize: Int = 3): DataFrame =
    docs
      .withColumn("__words", words(normalized(col("text"))))
      .withColumn("__shingles", shingles("__words", shingleSize))
      .withColumn("sig",
        expr(
          s"""transform(
             |  sequence(0, ${numHashes - 1}),
             |  h -> array_min(transform(__shingles, s -> xxhash64(h, s)))
             |)""".stripMargin))
      .drop("__words")

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
    val sigs = signatures(docs, numHashes, shingleSize)
    val cands = candidatePairs(sigs, bands, numHashes / bands)
    val shingleSets = sigs.select(
      col("doc_id"), array_distinct(col("__shingles")).as("sset"))
    cands
      .join(shingleSets.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sset", "sset_a"), Seq("doc_a"))
      .join(shingleSets.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sset", "sset_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sset_a"), col("sset_b"))))
      .withColumn("uni", size(array_union(col("sset_a"), col("sset_b"))))
      .where(col("inter") * den >= col("uni") * num)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }
}
