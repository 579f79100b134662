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
  *  - candidate cut: queries broadcast carrying only their
  *    precomputed LUTs (not their vectors); the corpus is scanned
  *    once, ADC-scored in whole-stage codegen, and rank-limited by a
  *    single `row_number <= candidateK` window on `q_id` —
  *    Catalyst's InferWindowGroupLimit plants a PARTIAL (map-side)
  *    top-`candidateK` below the exchange, so at most
  *    `candidateK × partitions` rows per query are shuffled, each
  *    carrying one corpus vector for the re-rank; the LUT and query
  *    vectors never cross a shuffle.
  *  - re-rank: survivors broadcast-join back to the (small) query
  *    side to fetch `q_vec`, exact cosine is computed on candidates
  *    only, and the final top-`k` window reuses the `q_id` hash
  *    partitioning already in place — the whole operator plans with
  *    ONE exchange (PlanQualitySpec pins this and the map-side
  *    WindowGroupLimit).
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
    // ADC side of the broadcast carries ONLY (q_id, lut): the query
    // vectors rejoin after the candidate cut, so neither they nor the
    // m*ks-double LUTs ride along into the shuffle
    val qLut = broadcast(queries.select(
      col("vec_id").as("q_id"),
      PqLut(col("embedding"), index.codebooks).as("__lut")))
    val qVec = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      VectorFunctions.norm(col("embedding")).as("q_nrm")))
    val c = index.encoded.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"),
      VectorFunctions.norm(col("embedding")).as("c_nrm"), col("__codes"))
    val scored = c.crossJoin(qLut)
      .where(col("q_id") =!= col("neighbor_id"))
      .withColumn("__adc", PqAdcScore(col("__codes"), col("__lut"), ks))
      .select(col("q_id"), col("neighbor_id"), col("__adc"),
        col("c_vec"), col("c_nrm"))
    // ADC candidate cut: InferWindowGroupLimit plants the map-side
    // partial top-candidateK below this window's exchange (the same
    // rank-limit pushdown PlanQualitySpec pins for d5/top_terms), so
    // the shuffle moves candidates, not the corpus
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val cands = scored.withColumn("__ar", row_number().over(wAdc))
      .where(col("__ar") <= candidateK)
    // exact re-rank of the candidate set: q_vec fetched back from the
    // broadcast query side (BroadcastHashJoin — no exchange), and the
    // top-k window reuses the q_id hash partitioning already in place
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(qVec, Seq("q_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("q_vec"), col("c_vec"))
          / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }
}
