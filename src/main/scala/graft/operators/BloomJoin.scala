package graft.operators

import graft.functions.BloomSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered equi-join — the semi-join reduction for the
  * regime where the dim side is too big to broadcast as a hash
  * relation but its KEY SET compresses into megabytes of bloom bits:
  * build the bloom over the dim keys (one map-side aggregate, dim
  * never shuffled for it), ship the bits to the fact scan as a plan
  * literal, and drop non-joining fact rows BEFORE the join shuffle.
  *
  * Correctness never depends on the bloom: false positives pass the
  * prefilter and are eliminated by the real join that follows; false
  * negatives cannot exist (spec-pinned). NULL fact keys probe false —
  * they could never match an equi-join anyway.
  *
  * 100 TB posture: the win is shuffled BYTES. A fact table joining a
  * 1%-selective dim shuffles ~1% of its volume instead of all of it,
  * for the cost of one dim scan + an O(bits) driver round-trip
  * (`sized(10M keys, 1%) ≈ 12 MB` — broadcast-class, not
  * hash-relation-class). Spark's own runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) plants this
  * shape only under its creation heuristics; this surface makes it
  * deterministic and lets one build serve several queries.
  */
object BloomJoin {

  /** The fact side filtered by a bloom of `dim`'s join keys. The
    * build is a 1-row driver aggregate (bounded: O(numBits) bytes by
    * construction — the same bounded-collect class as the ANN
    * centroid pulls); the probe is a codegen'd scalar in the fact
    * scan's stage. */
  def prefilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bytes = dim
      .select(BloomSketch.buildFor(col(dimKey), expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact.where(BloomSketch.mightContain(bytes, col(factKey)))
  }

  /** Inner equi-join with the fact side bloom-prefiltered. Result is
    * EXACTLY the plain inner join (the join clears the bloom's false
    * positives); only the shuffled volume differs. */
  def join(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    prefilter(fact, factKey, dim, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey), "inner")

  /** LEFT ANTI join through the bloom — the dedup-delta-vs-corpus
    * shape: "which of these rows are NOT in the corpus". The bloom's
    * one-sided error is exactly right for it: a MISS is definitive
    * (no false negatives), so miss rows pass straight through with
    * NO join at all; only the maybe-present fraction (true matches +
    * fpp) pays the verifying anti-join. NULL fact keys probe false →
    * routed to the miss branch — LEFT ANTI semantics keep them, same
    * as the plain anti join.
    *
    * Result is EXACTLY `fact ANTI JOIN dim` (spec-pinned); at 100 TB
    * the anti-join's left side shrinks from |fact| to
    * ~(match-rate + fpp) × |fact| — for a 1%-dup delta against a
    * bloom'd corpus, a 99% shuffle cut. Pass `bloomBytes` to reuse a
    * persisted build ([[graft.sinks.BloomIndex]]); otherwise the dim
    * is scanned once to build it. */
  def antiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01,
      bloomBytes: Option[Array[Byte]] = None): DataFrame = {
    val bytes = bloomBytes.getOrElse(
      dim.select(BloomSketch.buildFor(col(dimKey), expectedItems, fpp).as("bf"))
        .head().getAs[Array[Byte]](0))
    val probe = BloomSketch.mightContain(bytes, col(factKey))
    val miss = fact.where(!probe)
    // renamed probe side keeps the condition unambiguous when the two
    // key columns share a name (the dedup shape: text vs text)
    require(!fact.columns.contains("__bloom_dk"),
      "column __bloom_dk collides with the anti-join's internal name")
    val maybe = fact.where(probe)
      .join(dim.select(col(dimKey).as("__bloom_dk")),
        col(factKey) === col("__bloom_dk"), "left_anti")
    miss.unionByName(maybe)
  }
}
