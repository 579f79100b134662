package graft.ext

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over a document corpus (SURVEY.md §7.4) —
  * exact, n-gram Jaccard, and embedding-cosine near-dup. (MinHash-LSH
  * and SimHash live in their own files.)
  */
object DedupOps {

  /** Exact dedup: one survivor (min doc_id) per canonical-text
    * fingerprint. A single hash-shuffle on the md5 key — map-side
    * partial aggregation applies, and the md5 key distributes
    * uniformly, so no skew at any scale. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keyed = docs.withColumn("fp", fingerprint(col(textCol)))
    keyed
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("fp"), col("n_copies"))
  }

  /** Deterministic keep-first over a fingerprint via window (the
    * full-row-preserving variant of `exact`). */
  def exactKeepRows(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keyed = docs.withColumn("fp", fingerprint(col(textCol)))
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol))
    keyed.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** N-gram (word token set) Jaccard near-dup: candidate pairs inside
    * a cheap blocking key (same source, similar length), exact token
    * Jaccard ≥ `num/den` kept.
    *
    * The threshold test is pure integer arithmetic
    * (`den·|A∩B| ≥ num·|A∪B|`) — no float comparisons to disagree
    * with an oracle. Blocking bounds the quadratic term: pairs only
    * form inside a (source, length-bucket) block, which is the
    * standard scale pattern when an equality-ish key exists. For
    * corpora with no natural blocking key, MinHashLSH is the scale
    * path.
    */
  def ngramJaccard(
      docs: DataFrame,
      numOverDen: (Int, Int) = (1, 2),
      lengthBucket: Int = 100): DataFrame = {
    val (num, den) = numOverDen
    // floor() before the cast: Spark's double→long cast truncates
    // while other engines round — floor makes both sides identical.
    val prepared = docs.select(
      col("doc_id"), col("source"),
      floor(col("n_chars") / lengthBucket).cast("long").as("len_bucket"),
      array_distinct(words(col("text"))).as("toks"))
    // Token-join formulation: |A∩B| comes from joining the exploded
    // distinct-token lists and counting matches per pair;
    // |A∪B| = |A| + |B| − |A∩B|. Everything is codegen'd joins and
    // hash aggregation — the direct formulation
    // (`array_intersect`/`array_union` per blocked pair) re-walks
    // both arrays interpretively for every pair, which dominates once
    // blocks grow. Pairs sharing zero tokens never surface, and
    // correctly so: they can't pass any positive threshold.
    val sized = prepared.withColumn("n_toks", size(col("toks")).cast("long"))
    val tokens = sized.select(
      col("doc_id"), col("source"), col("len_bucket"),
      explode(col("toks")).as("tok"))
    val a = tokens.select(col("source"), col("len_bucket"), col("tok"),
      col("doc_id").as("doc_a"))
    val b = tokens.select(col("source"), col("len_bucket"), col("tok"),
      col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("source", "len_bucket", "tok"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val counts = sized.select(col("doc_id"), col("n_toks"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_toks", "n_a"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_toks", "n_b"), Seq("doc_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * den >= col("uni") * num)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  /** Embedding-cosine near-dup: pairs above a cosine threshold.
    * All-pairs within the corpus — O(n²) compute but shuffle-light
    * (one self-join); the LSH-bucketed variant in SimilaritySearch is
    * the scale path. Cosine computes in double with sequential
    * summation for oracle parity. */
  /** Repeated-span detection — the practical approximation of exact
    * substring dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022, find 50-token repeats with a
    * suffix array; here: n-token spans repeated across documents,
    * found with the same shingle machinery the near-dup family uses).
    * Output: (doc_id, n_repeated_spans) — how many of the document's
    * distinct n-token spans also occur in at least one OTHER
    * document. Zero-hit documents don't appear.
    *
    * Scale shape: spans come from the shuffle-free codegen
    * [[MinHashLSH.shingleRows]]; the repeated-span set forms in ONE
    * hash aggregation over (span, doc) rows with map-side partials,
    * and rejoins the per-doc span rows by span key. The span STRING
    * is the key (oracle-exact, no hash-collision caveat); a corpus
    * where span-string shuffle width dominates can switch the
    * group/join key to `xxhash64(__sh)` and accept 2⁻⁶⁴ collisions.
    * Documents shorter than `n` tokens contribute their whole text as
    * one span, so verbatim short-doc copies count. */
  def repeatedSpans(docs: DataFrame, n: Int = 20): DataFrame = {
    val spans = MinHashLSH.shingleRows(docs, n)
      .select(col("doc_id"), col("__sh")).distinct()
    val shared = spans.groupBy(col("__sh"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= 2)
      .select(col("__sh"))
    spans.join(shared, Seq("__sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_repeated_spans"))
  }

  /** Edit-distance near-duplicate pairs: prefix-blocked candidates
    * verified by Levenshtein over a fixed character window. The
    * block key is the first `prefixLen` characters (near-identical
    * documents cannot escape an equality block that small without
    * editing inside it — the standard blocking assumption, shared
    * with every banding scheme here), refined by the length bound
    * edit distance implies — on the WINDOWED strings, since that is
    * what gets compared (two docs identical for `window` chars are
    * near-dups here regardless of how their tails diverge);
    * verification computes the THRESHOLD-bounded Levenshtein
    * (early-exit — cost O(window · maxEdits), not O(window²)) over
    * the first `window` characters. Emits (low id, high id, dist).
    *
    * 100 TB posture: one equality shuffle on the prefix — no
    * all-pairs term anywhere; the window caps per-pair verify cost.
    * A pathological shared prefix (boilerplate headers) makes one
    * hot block — widen `prefixLen` or strip boilerplate first
    * ([[TextAnalysis.removeBoilerplateLines]]), the same mitigation
    * family as every blocked near-dup.
    */
  def editDistanceNearDup(
      docs: DataFrame,
      maxEdits: Int = 3,
      prefixLen: Int = 8,
      window: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxEdits >= 0 && prefixLen >= 1 && window >= prefixLen,
      "editDistanceNearDup needs maxEdits >= 0, prefixLen >= 1, window >= prefixLen")
    def side(tag: String) = docs.select(
      col(idCol).as(s"id_$tag"),
      substring(col(textCol), 1, window).as(s"w_$tag"),
      substring(col(textCol), 1, prefixLen).as("pfx"),
      length(substring(col(textCol), 1, window)).as(s"len_$tag"))
    side("a").join(side("b"), Seq("pfx"))
      .where(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxEdits)
      .withColumn("dist", levenshtein(col("w_a"), col("w_b"), maxEdits))
      .where(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }

  /** Hard cap on the all-pairs [[embeddingNearDup]] corpus size. The
    * method is the exact O(n²) oracle baseline — at the cap it builds
    * ~1.25e9 candidate pairs, already the practical ceiling for a
    * single job; on a billion-vector corpus it would be 5e17 pairs.
    * Callers above the cap must use the bucketed scale path
    * ([[SimilaritySearch.lshNearDupPairs]]) whose candidate count is
    * bounded by bucket collisions, not n². */
  val EmbeddingAllPairsMaxRows: Long = 50000L

  def embeddingNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    // Guard the all-pairs construction: this is the exactness
    // baseline, not the scale path, and nothing else stops a caller
    // pointing it at a production corpus. One count() of the input is
    // cheap relative to the n² stage it gates.
    val n = embeddings.count()
    require(n <= EmbeddingAllPairsMaxRows,
      s"embeddingNearDup is the O(n²) all-pairs baseline and is capped at " +
        s"$EmbeddingAllPairsMaxRows rows (got $n); use " +
        s"SimilaritySearch.lshNearDupPairs for corpora above the cap")
    // Norms are computed once per vector, not once per pair (the
    // pair-level expression stays dot/(normA*normB) — identical IEEE
    // op order to the inline form, so oracle parity is preserved
    // while the O(n²) stage does one fold instead of three).
    val normed = embeddings.select(
      col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"))
    val a = normed.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"), col("nrm").as("nrm_a"))
    val b = normed.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"), col("nrm").as("nrm_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("cos",
        VectorFunctions.dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
