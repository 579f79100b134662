package graft.ext

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §7.4 similarity search).
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact cosine top-k, the correctness
  *    baseline. Queries are broadcast (a handful of vectors), the
  *    corpus is scanned once, and ranking happens in two phases:
  *    a partition-local top-k (map-side, bounded memory) followed by
  *    a global top-k over only `queries × k × partitions` candidate
  *    rows. The full corpus never shuffles — the property that makes
  *    this viable on a 100 TB corpus.
  *  - `lshTopK` — random-hyperplane LSH bucketing: corpus and queries
  *    hashed to signature buckets, exact re-rank only within the
  *    query's bucket. Sub-linear candidate sets at the cost of
  *    recall; signatures are hash-derived (deterministic, no RNG
  *    state).
  */
object SimilaritySearch {

  /** Plane count whose 2^planes buckets keep the expected bucket size
    * near `targetBucketSize`: planes ≈ log₂(n / targetBucketSize),
    * clamped to [1, 20]. Candidate volume is Σ bucket² ≈
    * n · targetBucketSize — LINEAR in the corpus when the bucket
    * count scales with it; a constant plane count makes it Θ(n²)
    * (round 2 measured that 48× regression first-hand). Callers at
    * scale usually know `n` from pipeline stats; pass it here rather
    * than hardcoding planes. */
  def planesFor(corpusSize: Long, targetBucketSize: Long = 1024L): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val buckets = math.max(2.0, corpusSize.toDouble / targetBucketSize)
    math.min(20, math.max(1, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** Exact cosine top-k per query vector.
    * Output: (q_id, neighbor_id, rank), rank 1..k by (cos desc,
    * neighbor_id asc) — a total order, so results are deterministic
    * and oracle-comparable. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Norms precomputed per side — the pair stage does a single fold.
    val q = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      VectorFunctions.norm(col("embedding")).as("q_nrm")))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"),
      VectorFunctions.norm(col("embedding")).as("c_nrm"))
    val scored = c.crossJoin(q)
      .where(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
      .select(col("q_id"), col("neighbor_id"), col("cos"))
    // One rank-limited window: InferWindowGroupLimit inserts a PARTIAL
    // (map-side) top-k below the exchange, so only <= k rows per query
    // per input partition are shuffled — the partition-local/global
    // two-phase merge, expressed declaratively so Catalyst plans it
    // with a single exchange of narrow (q_id, neighbor_id, cos) rows.
    // The corpus vectors never cross a shuffle. (PlanQualitySpec pins
    // the WindowGroupLimit and the single-exchange shape.)
    val wGlobal = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(wGlobal).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }

  /** LSH-bucketed embedding NEAR-DUP pairs — the scale path for
    * [[DedupOps.embeddingNearDup]]'s all-pairs baseline: vectors
    * sharing a hyperplane bucket are compared exactly; others are
    * never paired. Near-duplicate vectors (cosine ≈ 1) land in the
    * same bucket with probability (1 − θ/π)^planes, so recall stays
    * high exactly where a dedup threshold lives, while candidate
    * count drops from O(n²) to Σ bucket².
    *
    * `tables` adds standard OR-amplification: `tables` independent
    * hyperplane sets, a pair is a candidate if it collides in ANY
    * table — miss probability (1 − (1 − θ/π)^planes)^tables. More
    * tables buy recall at linear candidate-generation cost. A pair
    * colliding in many tables is still verified once. When
    * planes × tables ≤ 62, every table signature packs into ONE long
    * per vector and the pair is emitted only from the FIRST table in
    * which it collides — a codegen-friendly bit-arithmetic filter on
    * the collision row itself, so duplicate candidates die before
    * anything shuffles (the naive union-of-tables `distinct()` is a
    * shuffle of ~tables × Σ bucket² narrow rows — at 16 tables that
    * exchange dominated this operator's runtime). Wider configs fall
    * back to that distinct. */
  def lshNearDupPairs(
      embeddings: DataFrame,
      threshold: Double,
      planes: Int = 8,
      tables: Int = 1): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    // Each table signature is computed exactly ONCE per vector (the
    // projection below), then reused by both the per-table explode and
    // the packed family column — the signature is the inner loop of
    // this operator, and round 2 paid for it twice.
    val sigCols = (0 until tables).map(t =>
      VectorFunctions.hyperplaneSignature(col("embedding"), planes, seed = t.toLong)
        .as(s"__sig_$t"))
    val withSigs = embeddings.select(col("vec_id") +: sigCols: _*)
    val packable = planes * tables <= 62
    // packed = sig_0 | sig_1 << planes | … — one long carries the
    // whole signature family through the candidate join
    val packedCol =
      if (!packable) lit(0L)
      else (0 until tables).map(t => shiftleft(col(s"__sig_$t"), planes * t))
        .reduce(_ bitwiseOR _)
    val tableSigs = array((0 until tables).map(t =>
      struct(lit(t).as("t"), col(s"__sig_$t").as("sig"))): _*)
    val bucketed = withSigs
      .select(col("vec_id"), explode(tableSigs).as("tb"), packedCol.as("packed"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.sig").as("bucket"),
        col("packed"))
    val a = bucketed.select(col("t"), col("bucket"),
      col("vec_id").as("id_a"), col("packed").as("packed_a"))
    val b = bucketed.select(col("t"), col("bucket"),
      col("vec_id").as("id_b"), col("packed").as("packed_b"))
    val joined = a.join(b, Seq("t", "bucket")).where(col("id_a") < col("id_b"))
    // first-collision filter: collapse each planes-wide group of the
    // signature XOR to its lowest bit (nonzero group ⇒ bit set); the
    // pair is emitted at table t iff every group before t is nonzero
    val cands = if (packable) {
      val groupMask = (0 until tables).map(t => 1L << (planes * t)).reduce(_ | _)
      val xorSql = "(packed_a ^ packed_b)"
      val collapsed = (0 until planes)
        .map(s => if (s == 0) xorSql else s"shiftright($xorSql, $s)")
        .mkString("(", " | ", ")")
      joined.where(expr(
        s"(~$collapsed & ($groupMask & (shiftleft(CAST(1 AS BIGINT), $planes * t) - 1))) = 0"))
        .select(col("id_a"), col("id_b"))
    } else {
      joined.select(col("id_a"), col("id_b")).distinct()
    }
    val vecs = embeddings.select(col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"))
    cands
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .withColumn("cos",
        VectorFunctions.dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** INCREMENTAL embedding near-dup: (delta, corpus) cross-side
    * pairs only — [[MinHashLSH.nearDupPairsAgainst]]'s shape for the
    * embedding column. The new batch's hyperplane buckets broadcast
    * (default; the regime is delta ≪ corpus) into a bucket probe of
    * the corpus, so the already-deduped corpus never shuffles its
    * vectors and corpus self-pairs are never generated; the exact
    * cosine verify pulls corpus vectors behind a candidate-id
    * semi-join, O(candidates) not O(corpus). Candidate dedup across
    * OR-amplification tables is a `distinct` over (delta, corpus) id
    * pairs — bounded by the delta's collision count, the small term
    * by construction (the self-join form's packed first-collision
    * bit trick exists because there the candidate stream is
    * corpus-sized; here it would optimize the wrong side of the
    * asymmetry at the cost of shipping signature families through
    * the broadcast). */
  def lshNearDupPairsAgainst(
      delta: DataFrame,
      corpus: DataFrame,
      threshold: Double,
      planes: Int = 8,
      tables: Int = 1,
      broadcastDelta: Boolean = true): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    def bucketed(e: DataFrame, idOut: String): DataFrame = {
      val sigCols = (0 until tables).map(t =>
        VectorFunctions.hyperplaneSignature(col("embedding"), planes, seed = t.toLong)
          .as(s"__sig_$t"))
      e.select(col("vec_id") +: sigCols: _*)
        .select(col("vec_id").as(idOut),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("t"), col(s"__sig_$t").as("sig"))): _*)).as("tb"))
        .select(col(idOut), col("tb.t").as("t"), col("tb.sig").as("bucket"))
    }
    val d = bucketed(delta, "delta_id")
    val cands = (if (broadcastDelta) broadcast(d) else d)
      .join(bucketed(corpus, "corpus_id"), Seq("t", "bucket"))
      .select(col("delta_id"), col("corpus_id"))
      .distinct()
      .localCheckpoint(true)
    def vecs(e: DataFrame, idOut: String, vecOut: String, nrmOut: String): DataFrame =
      e.select(col("vec_id").as(idOut), col("embedding").as(vecOut),
        VectorFunctions.norm(col("embedding")).as(nrmOut))
    val cVecs = vecs(corpus, "corpus_id", "vec_b", "nrm_b")
      .join(broadcast(cands.select(col("corpus_id")).distinct()), Seq("corpus_id"))
    cands
      .join(broadcast(vecs(delta, "delta_id", "vec_a", "nrm_a")), Seq("delta_id"))
      .join(cVecs, Seq("corpus_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .where(col("cos") >= threshold)
      .select(col("delta_id"), col("corpus_id"))
  }

  /** LSH-bucketed ANN: exact re-rank within the query's hyperplane
    * bucket. `planes` controls the bucket count (2^planes);
    * multi-probe widens recall by also searching every bucket within
    * Hamming distance `probeRadius` of the query's signature —
    * radius 0 probes only the home bucket, radius 1 adds each one-bit
    * flip (the classic multi-probe), radius = planes probes every
    * bucket (exhaustive: the bucketing partitions the corpus, so the
    * result is exact brute force evaluated through the LSH machinery). */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int = 4,
      probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= planes,
      s"probeRadius ($probeRadius) must be in [0, planes=$planes]")
    val sig = VectorFunctions.hyperplaneSignature(col("embedding"), planes)
    val c = corpus
      .withColumn("bucket", sig)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"), col("bucket"))
    val qBase = queries.withColumn("sig0", sig)
    // probe set: every signature within the Hamming ball — the XOR
    // masks are enumerated driver-side (there are C(planes, ≤r) of
    // them, a handful) and broadcast inside the literal array
    val masks = (0 until (1 << planes))
      .filter(m => java.lang.Integer.bitCount(m) <= probeRadius)
    val probes = expr(
      s"transform(array(${masks.mkString(",")}), m -> sig0 ^ CAST(m AS BIGINT))")
    val q = broadcast(qBase
      .withColumn("bucket", explode(probes))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("bucket")))
    probeAndRerank(c, q, k)
  }

  /** Query-DIRECTED multi-probe LSH ANN (Lv et al., VLDB'07 shape):
    * instead of a fixed Hamming ball, each query ranks ALL 2^planes
    * probe masks by the total |margin| of the planes the mask flips
    * ([[VectorFunctions.hyperplaneMargins]]) and probes the `nProbe`
    * cheapest — the home bucket (mask 0, cost 0) plus the buckets on
    * the other side of the planes the query barely cleared, which is
    * where its true near neighbors land. Same probe BUDGET as a fixed
    * ball of equal size, strictly better-placed probes; per-query
    * geometry, so it helps regardless of corpus distribution.
    *
    * `nProbe = 2^planes` probes every bucket of the partition —
    * exact brute force through the LSH machinery (spec-asserted).
    * Mask ranking happens on the (small, broadcast) query side only;
    * the corpus still computes one signature per vector. */
  def lshTopKDirected(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int = 4,
      nProbe: Int = 4): DataFrame = {
    val nMasks = 1 << planes
    // the mask ranking enumerates 2^planes structs per QUERY row —
    // fine for probe-sized planes counts, wrong past them
    require(planes >= 1 && planes <= 12,
      s"directed probing enumerates 2^planes masks per query; planes=$planes")
    require(nProbe >= 1 && nProbe <= nMasks,
      s"nProbe ($nProbe) must be in [1, 2^planes=$nMasks]")
    val sig = VectorFunctions.hyperplaneSignature(col("embedding"), planes)
    val c = corpus
      .withColumn("bucket", sig)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"), col("bucket"))
    // array_sort on struct(cost, mask) orders by cost then mask:
    // deterministic under margin ties
    val rankedProbes = expr(
      s"""transform(
         |  slice(array_sort(transform(sequence(0, ${nMasks - 1}), m -> struct(
         |    aggregate(sequence(0, ${planes - 1}), 0.0D,
         |      (a, p) -> a + CASE WHEN (shiftright(m, p) & 1) = 1
         |                    THEN abs(__mg[p]) ELSE 0.0D END) AS cost,
         |    m AS mask))), 1, $nProbe),
         |  s -> sig0 ^ CAST(s.mask AS BIGINT))""".stripMargin)
    val q = broadcast(queries
      .withColumn("__mg", VectorFunctions.hyperplaneMargins(col("embedding"), planes))
      .withColumn("sig0", sig)
      .withColumn("bucket", explode(rankedProbes))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("bucket")))
    probeAndRerank(c, q, k)
  }

  /** Shared probe tail: bucket equi-join, exact cosine re-rank,
    * rank-limited window (map-side top-k via WindowGroupLimit). */
  private def probeAndRerank(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = c.join(q, Seq("bucket"))
      .where(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("neighbor_id"), col("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    // distinct: multi-probe can surface the same (query, neighbor)
    // pair from several probed buckets
    scored.distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }
}
