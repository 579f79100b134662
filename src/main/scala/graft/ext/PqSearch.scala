package graft.ext

import graft.functions.{PqAdcScore, PqCodebooks, PqEncode, PqLut, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze & Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011) — the
  * compressed-domain complement to [[SimilaritySearch]] (LSH, no
  * training, adversarial-safe) and [[IvfSearch]] (coarse cells,
  * data-adaptive): each corpus vector is stored as `m` small centroid
  * ids (64 float dims → 8 bytes at m=8), and query scoring never
  * decompresses — one `m × ks` lookup table per query turns every
  * corpus comparison into `m` table lookups (asymmetric distance
  * computation).
  *
  * Scale shape, stage by stage:
  *  - index build: codebooks train driver-side on a bounded
  *    no-count sample (per-partition head, same scheme as
  *    [[IvfSearch.buildIndex]] — no extra corpus scan just to decide
  *    whether to sample); encoding is ONE codegen'd map pass over the
  *    corpus, no shuffle.
  *  - query: queries broadcast with their precomputed LUTs; the
  *    corpus is scanned once, ADC-scored in whole-stage codegen, and
  *    reduced by a partition-local top-`candidateK` window (keyed by
  *    `spark_partition_id` — no shuffle) before the global
  *    top-`candidateK` cut, mirroring
  *    [[SimilaritySearch.bruteForceTopK]]'s two-phase shape: the full
  *    corpus never shuffles.
  *  - re-rank: exact cosine runs while corpus vectors are still
  *    co-located with the scan (map-side, before any exchange), so
  *    only narrow `(q_id, neighbor_id, adc, cos)` rows enter the
  *    ranking shuffles — `queries × candidateK × partitions` rows,
  *    never vectors. The extra exact distances this computes (on
  *    per-partition survivors that miss the global cut) are
  *    partition-local arithmetic; shipping embeddings through two
  *    window exchanges — or re-scanning the corpus to join vectors
  *    back by id — would cost more at any scale.
  *
  * `candidateK >= corpus size` degenerates to exact brute force
  * evaluated through the full PQ machinery (encode → LUT → ADC →
  * re-rank) — the oracle-exact configuration, same construction as
  * [[IvfSearch]]'s `nProbe = nCells`. Partial-`candidateK` recall is
  * ScalaTest-gated.
  */
object PqSearch {

  final case class PqIndex(codebooks: PqCodebooks, encoded: DataFrame)

  /** Train `m` sub-space codebooks of `ks` centroids driver-side on a
    * bounded sample, then encode the corpus in one codegen'd pass.
    * Deterministic: seeded Lloyd, no RNG state on executors. */
  def buildIndex(
      corpus: DataFrame,
      m: Int = 8,
      ks: Int = 16,
      iters: Int = 10,
      seed: Long = 42L,
      maxFitSamplePoints: Long = 100000L): PqIndex = {
    val vecOnly = corpus.select(col("embedding"))
    val perPart = math.max(1L,
      maxFitSamplePoints / math.max(1, vecOnly.rdd.getNumPartitions)).toInt
    val sample = vecOnly.rdd.mapPartitions(_.take(perPart))
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
      .collect()
    require(sample.nonEmpty, "pq index build: empty corpus")
    val dim = sample.head.length
    val codebooks = PqCodebooks.train(sample, dim, m, ks, iters, seed)
    val encoded = corpus.withColumn("__codes", PqEncode(col("embedding"), codebooks))
    PqIndex(codebooks, encoded)
  }

  /** ADC-scored candidate generation + exact cosine re-rank.
    * Output: (q_id, neighbor_id, rank), rank 1..k by (cos desc,
    * neighbor_id asc) — a total order, deterministic and
    * oracle-comparable. */
  def topK(
      queries: DataFrame,
      index: PqIndex,
      k: Int,
      candidateK: Int): DataFrame = {
    require(candidateK >= k, s"candidateK ($candidateK) must be >= k ($k)")
    val ks = index.codebooks.ks
    val q = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      PqLut(col("embedding"), index.codebooks).as("__lut"),
      VectorFunctions.norm(col("embedding")).as("q_nrm")))
    val c = index.encoded.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"),
      VectorFunctions.norm(col("embedding")).as("c_nrm"), col("__codes"))
    val scored = c.crossJoin(q)
      .where(col("q_id") =!= col("neighbor_id"))
      .withColumn("__adc", PqAdcScore(col("__codes"), col("__lut"), ks))
    // phase 1: partition-local ADC top-candidateK — no shuffle; the
    // global ADC top-candidateK is a subset of the per-partition ones
    val wLocal = Window.partitionBy(col("q_id"), spark_partition_id())
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val local = scored.withColumn("__lr", row_number().over(wLocal))
      .where(col("__lr") <= candidateK)
      // exact cosine while vectors are still co-located (see scaladoc)
      .withColumn("cos",
        VectorFunctions.dot(col("q_vec"), col("c_vec"))
          / (col("q_nrm") * col("c_nrm")))
      .select(col("q_id"), col("neighbor_id"), col("__adc"), col("cos"))
    // phase 2: global ADC top-candidateK over the narrow survivors
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val cands = local.withColumn("__ar", row_number().over(wAdc))
      .where(col("__ar") <= candidateK)
    // exact re-rank of the candidate set
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(wCos).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }
}
