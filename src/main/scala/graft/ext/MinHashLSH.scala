package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection
  * (shingle → minhash signature → band → bucket-join), the standard
  * scale path for corpus dedup with no blocking key.
  *
  * Pipeline (all stages sized for a 100 TB corpus):
  *  1. shingling: one codegen'd [[graft.functions.WordShingles]]
  *     expression per document, exploded to (doc_id, shingle) rows —
  *     entirely map-side. The natural higher-order-function
  *     formulation (`transform` + `slice` + `array_join`) is
  *     interpreted per-lambda and benchmarked ~5× slower end-to-end;
  *     the earlier windowed-`lead` formulation was codegen'd but paid
  *     a hash-partition exchange of one row per word before any
  *     shingle existed — re-shuffling the corpus as token rows.
  *  2. signature: each shingle string is hashed ONCE; the `numHashes`
  *     minhash values derive by cheap re-hashing of that 64-bit value
  *     — `numHashes` `min` aggregates in one codegen'd hash
  *     aggregation, with map-side partial aggregation collapsing each
  *     document to one row before the shuffle.
  *  3. banding: signature split into `bands` bands, each hashed to a
  *     bucket key; only (band, bucket, id) tuples shuffle.
  *  4. bucket self-join: candidate pairs = documents sharing any band
  *     bucket (hash-uniform key → even distribution).
  *  5. verification: exact shingle-set Jaccard on candidates only,
  *     with the shingle sets materialized ONLY for candidate docs
  *     (semi-join before the collect_set) — integer threshold
  *     arithmetic, no float disagreement.
  *
  * All hashing is `xxhash64` seeded by construction — deterministic,
  * no RNG state shipped to executors. Documents with fewer than
  * `shingleSize` words produce one shingle of all their words
  * (matching `TextFunctions.shingles`); empty documents produce none.
  *
  * Background: minwise hashing estimates resemblance (Broder, "On the
  * resemblance and containment of documents", SEQUENCES 1997); banded
  * bucketing is the standard LSH amplification (Indyk & Motwani, STOC
  * 1998; the band/row trade-off as popularized by Mining of Massive
  * Datasets ch. 3).
  */
object MinHashLSH {

  /** (doc_id, __sh) — one row per word n-gram shingle, codegen path,
    * no shuffle.
    *
    * `spread = false` skips the narrow-input probe entirely: the
    * probe reads `df.rdd.getNumPartitions`, which forces physical
    * planning (and under AQE can run the upstream jobs), so call
    * sites that KNOW their input is already wide — a post-shuffle or
    * post-broadcast-join subtree — must opt out rather than pay an
    * extra execution of that subtree just to learn its width. */
  def shingleRows(docs: DataFrame, shingleSize: Int = 3, spread: Boolean = true): DataFrame = {
    require(shingleSize >= 2, "shingleSize must be at least 2")
    // Spread ONLY when the input arrives under-partitioned (see
    // [[Spread.ifNarrow]]) — a wide production scan must not pay a
    // corpus reshuffle here.
    val base = if (spread) Spread.ifNarrow(docs) else docs
    base.select(col("doc_id"),
      explode(graft.functions.WordShingles(
        words(normalized(col("text"))), shingleSize)).as("__sh"))
  }

  /** (doc_id, sig: array<bigint>) minhash signatures — one
    * [[graft.functions.MinHashSketch]] aggregate (the equivalent
    * `numHashes`-separate-`min`-columns formulation generates a
    * pathologically large codegen class; see the sketch's scaladoc). */
  def signatures(
      docs: DataFrame,
      numHashes: Int = 128,
      shingleSize: Int = 3): DataFrame =
    shingleRows(docs, shingleSize)
      .select(col("doc_id"), xxhash64(col("__sh")).as("__h"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSketch.sketch(col("__h"), numHashes).as("sig"))

  /** Candidate pairs from banded bucketing (no verification).
    * `bands * rowsPerBand` must not exceed the signature length:
    * `slice()` past the array end returns an empty slice, which would
    * silently hash every document into ONE bucket for the overflowing
    * bands and degenerate the self-join toward O(n²). */
  def candidatePairs(
      sigs: DataFrame,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      numHashes: Int = 128): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"bands ($bands) * rowsPerBand ($rowsPerBand) exceeds signature length ($numHashes)")
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
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be a multiple of bands ($bands)")
    val (num, den) = jaccard
    // Only the 16-byte (doc_id, xxhash64(shingle)) projection is
    // persisted — NOT the full shingle strings. The signature stage
    // only ever consumes the hash, and at ~3 words per shingle the
    // string rows are an order of magnitude wider than their hashes;
    // round 4 measured that footprint making this operator the first
    // victim of sweep-wide memory pressure (3.9s-43s spread across
    // runs of identical code). Verification DOES need the strings,
    // but only for docs that appear in some candidate pair — a
    // pairs-bounded set — so shingling is recomputed behind the
    // broadcast candIds semi-join on the RAW docs (filter before the
    // posexplode: the recompute is O(candidate docs), not O(corpus)).
    val hashed = shingleRows(docs, shingleSize)
      .select(col("doc_id"), xxhash64(col("__sh")).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sigs = hashed
        .groupBy(col("doc_id"))
        .agg(graft.functions.MinHashSketch.sketch(col("__h"), numHashes).as("sig"))
      val cands = candidatePairs(sigs, bands, numHashes / bands, numHashes)
        .localCheckpoint(true)
      // shingle sets only for docs that appear in some candidate pair
      val candIds = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id"))).distinct()
      // spread = false: the broadcast-join input embeds the whole
      // candidate pipeline, so the narrow-probe would execute it an
      // extra time; the join inherits the corpus scan's width anyway
      val shingleSets = shingleRows(
          docs.join(broadcast(candIds), Seq("doc_id")), shingleSize, spread = false)
        .groupBy(col("doc_id"))
        .agg(collect_set(col("__sh")).as("sset"))
      cands
        .join(shingleSets.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("sset", "sset_a"), Seq("doc_a"))
        .join(shingleSets.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("sset", "sset_b"), Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("sset_a"), col("sset_b"))).cast("long"))
        .withColumn("uni", size(array_union(col("sset_a"), col("sset_b"))).cast("long"))
        .where(col("inter") * den >= col("uni") * num)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
        .localCheckpoint(true)
    } finally hashed.unpersist()
  }

  /** INCREMENTAL near-dup: (delta, corpus) cross-side pairs ONLY —
    * the daily-ingest shape. A 100 TB corpus that is already deduped
    * never needs its self-pairs again; what each new batch needs is
    * "which of MY documents duplicate something already in the
    * corpus" (drop them) — re-running the full self-join would
    * re-pay the corpus×corpus candidate stage every day for pairs
    * that cannot have changed.
    *
    * Same stages as [[nearDupPairs]] (codegen shingling → minhash →
    * banded buckets → exact-Jaccard verify), with the bucket join
    * delta⋈corpus instead of a self-join: corpus×corpus and
    * delta×delta candidates are never generated. With
    * `broadcastDelta` (the default — the regime this operator exists
    * for is delta ≪ corpus) the delta's banded rows broadcast and
    * the corpus side never shuffles at all: its per-vector work is
    * one linear scan-and-probe. A delta too large to broadcast sets
    * it false and pays one hash-partition exchange per side instead.
    * The corpus signature stage is still a linear scan of the
    * corpus; a production deployment persists the banded corpus
    * table from the initial dedup run and appends to it as batches
    * land, which makes the daily cost O(delta) — the stages here
    * compose over such a table unchanged (it is exactly
    * `signatures → band → bucket`).
    *
    * Output: (delta_id, corpus_id, inter, uni) — one row per
    * cross-side pair with shingle-Jaccard ≥ num/den. A document
    * present in both inputs with the same id pairs with itself
    * (J = 1): re-ingest detection, not an artifact. */
  def nearDupPairsAgainst(
      delta: DataFrame,
      corpus: DataFrame,
      numHashes: Int = 128,
      shingleSize: Int = 3,
      bands: Int = 32,
      jaccard: (Int, Int) = (4, 5),
      broadcastDelta: Boolean = true): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be a multiple of bands ($bands)")
    val (num, den) = jaccard
    val rpb = numHashes / bands
    def bandSide(docs: DataFrame, idOut: String): DataFrame =
      signatures(docs, numHashes, shingleSize)
        .withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
        .withColumn("bucket",
          expr(s"xxhash64(band, array_join(slice(sig, band * $rpb + 1, $rpb), ','))"))
        .select(col("doc_id").as(idOut), col("band"), col("bucket"))
    val deltaBanded = bandSide(delta, "delta_id")
    val cands = (if (broadcastDelta) broadcast(deltaBanded) else deltaBanded)
      .join(bandSide(corpus, "corpus_id"), Seq("band", "bucket"))
      .select(col("delta_id"), col("corpus_id"))
      .distinct()
      .localCheckpoint(true)
    // exact-verify sets recomputed from the RAW side behind a
    // candidate-id semi-join, O(candidate docs) — same discipline as
    // nearDupPairs
    def sets(docs: DataFrame, ids: DataFrame): DataFrame =
      shingleRows(docs.join(broadcast(ids), Seq("doc_id")), shingleSize, spread = false)
        .groupBy(col("doc_id"))
        .agg(collect_set(col("__sh")).as("sset"))
    val dSets = sets(delta, cands.select(col("delta_id").as("doc_id")).distinct())
    val cSets = sets(corpus, cands.select(col("corpus_id").as("doc_id")).distinct())
    cands
      .join(dSets.withColumnRenamed("doc_id", "delta_id")
        .withColumnRenamed("sset", "sset_a"), Seq("delta_id"))
      .join(cSets.withColumnRenamed("doc_id", "corpus_id")
        .withColumnRenamed("sset", "sset_b"), Seq("corpus_id"))
      .withColumn("inter", size(array_intersect(col("sset_a"), col("sset_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("sset_a"), col("sset_b"))).cast("long"))
      .where(col("inter") * den >= col("uni") * num)
      .select(col("delta_id"), col("corpus_id"), col("inter"), col("uni"))
  }

  /** Reference (built-ins-only, interpreted-HOF) shingling — the
    * semantic spec for [[shingleRows]]; used by tests as ground
    * truth. */
  def withShingles(docs: DataFrame, shingleSize: Int = 3): DataFrame =
    docs
      .withColumn("__words", words(normalized(col("text"))))
      .withColumn("__shingles", shingles("__words", shingleSize))
      .drop("__words")
}
