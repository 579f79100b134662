package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines
  * (SURVEY.md §7.4 family: corpus preparation at 100 TB).
  *
  * Split membership is a pure function of (salt, id) — an md5-derived
  * bucket in [0, 100) — so it is:
  *  - stable under corpus growth/reordering (a document keeps its
  *    split when new data arrives — the property random splits lose),
  *  - reproducible across engines (the same arithmetic runs in ANSI
  *    SQL: `('0x' || substring(md5(salt || ':' || id), 1, 15))
  *    ::UBIGINT % 100`),
  *  - shuffle-free: a per-row projection that scales linearly.
  *
  * The 60-bit md5 prefix keeps the value positive in a signed long on
  * every engine (same trick as [[SimHash.portableTokenHash]]).
  */
object Sampling {

  /** Bucket in [0, 100) from the portable md5-derived hash. */
  def splitBucket(id: Column, salt: String): Column =
    pmod(
      conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 15),
        16, 10).cast("long"),
      lit(100L))

  /** Adds `bucket` and `split` ∈ {train, val, test}: buckets
    * [0, pctTrain) → train, [pctTrain, pctTrain+pctVal) → val,
    * rest → test. */
  def assignSplit(
      docs: DataFrame,
      idCol: String = "doc_id",
      salt: String = "graft",
      pctTrain: Int = 90,
      pctVal: Int = 5): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"pctTrain ($pctTrain) + pctVal ($pctVal) must fit in 100")
    val b = splitBucket(col(idCol), salt)
    docs.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < pctTrain, "train")
          .when(col("bucket") < pctTrain + pctVal, "val")
          .otherwise("test"))
  }

  /** Deterministic PER-ROW weighted Bernoulli keep — quality-weighted
    * downsampling (keep probability = the row's own weight column,
    * e.g. a quality score): a row survives iff its fine hash bucket
    * (out of 10,000) falls below `floor(w × 10000)`, w clamped to
    * [0, 1] (a NULL weight keeps nothing — explicit opt-in
    * semantics). Same md5 arithmetic as [[assignSplit]], so the draw
    * is stable under growth, replayable in ANSI SQL, and
    * shuffle-free; unlike [[sampleBySourceWeight]]'s per-SOURCE map,
    * the weight here varies row by row — the "sample high-quality
    * documents more" knob. */
  def weightedBernoulli(
      docs: DataFrame,
      weightCol: String,
      idCol: String = "doc_id",
      salt: String = "graft-wsample"): DataFrame = {
    val fine = pmod(
      conv(substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 15),
        16, 10).cast("long"),
      lit(10000L))
    val thresh = floor(
      greatest(lit(0.0), least(lit(1.0), col(weightCol))) * 10000).cast("long")
    docs.where(fine < thresh)
  }

  /** Deterministic per-source downsampling — corpus MIXING by weight
    * (e.g. Wikipedia ×1.0, CommonCrawl ×0.3, the standard pretraining
    * recipe knob): a row survives iff its finer-grained hash bucket
    * (out of 10,000) falls below `weight × 10000` for its source.
    * Same stability/portability properties as [[assignSplit]]; sources
    * absent from `weights` keep everything (weight 1.0). Shuffle-free. */
  def sampleBySourceWeight(
      docs: DataFrame,
      weights: Map[String, Double],
      idCol: String = "doc_id",
      sourceCol: String = "source",
      salt: String = "graft-mix"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be fractions in [0, 1]: $weights")
    val fine = pmod(
      conv(substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 15),
        16, 10).cast("long"),
      lit(10000L))
    // integer thresholds (weight pre-scaled on the driver) — the
    // comparison is long < long on every engine, no float rounding
    val threshold = weights.foldLeft(lit(10000L)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(math.round(w * 10000).toLong)).otherwise(acc)
    }
    docs.where(fine < threshold)
  }

  /** Temperature-based domain REBALANCING — the mixing knob between
    * "proportional to size" (τ = 1, identity) and "uniform over
    * domains" (τ = 0): target share p_d ∝ n_d^τ, materialized at the
    * source corpus size, so each domain's sampling rate is
    * rate_d = p_d · Σn / n_d — BELOW 1 for over-represented domains
    * (deterministic downsample) and ABOVE 1 for under-represented
    * ones (repetition: whole copies plus a fractionally-sampled
    * last copy, the multi-epoch treatment small domains get in
    * pretraining mixes). `maxRepeat` caps the repetition the way
    * recipe cards cap epochs.
    *
    * Output: one row per kept (document, copy), `copy_id` ∈ [0, ⌈rate⌉).
    * Survival of the fractional copy is the [[assignSplit]] integer
    * bucket test (md5, portable), so membership is a pure function of
    * (salt, id) — stable under corpus growth and replayable in ANSI
    * SQL. Plan: the domain-rate table is a tiny aggregate broadcast
    * back; the explode emits ≤ ⌈rate⌉ rows per input row map-side —
    * no shuffle beyond the rate aggregate.
    *
    * Cross-engine note: rate_d crosses pow(), which IEEE leaves
    * 1 ulp loose — the declared oracle runs the same arithmetic in
    * the same order and the integer bucket threshold would only flip
    * if round(frac·10⁴) straddled that ulp; the gate data is frozen,
    * so the compare is deterministic either way. */
  def temperatureResample(
      docs: DataFrame,
      domainCol: String,
      tau: Double,
      idCol: String = "doc_id",
      salt: String = "graft-temp",
      maxRepeat: Int = 100): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"temperature must be in [0, 1], got $tau")
    require(maxRepeat >= 1)
    // The rate table is a driver-side recipe: ONE aggregate scan
    // collects |domains| rows (a mixing recipe's domain axis is
    // driver-bounded — sources/languages, not a key space). Keeping
    // it in-plan would recompute the counts subtree per reuse (Spark
    // does not CSE across join branches) and double-scan the corpus.
    // Σ n^τ sums as exact decimals (order-independent — float
    // addition isn't; same discipline as every decimal-sum boundary
    // here), binary-exact expansion like the SQL cast.
    val countRows = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.get(0) -> r.getLong(1))
    val s = countRows.map(_._2).sum
    val z = countRows
      .map(c => new java.math.BigDecimal(math.pow(c._2.toDouble, tau))
        .setScale(15, java.math.RoundingMode.HALF_UP))
      .reduce(_ add _).doubleValue()
    val rateRows = countRows.map { case (d, n) =>
      org.apache.spark.sql.Row(d,
        math.min(math.pow(n.toDouble, tau) / z * s / n, maxRepeat.toDouble))
    }
    val rates = docs.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rateRows: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        docs.schema(domainCol),
        org.apache.spark.sql.types.StructField("__rate",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val fine = pmod(
      conv(substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 15),
        16, 10).cast("long"),
      lit(10000L))
    docs.join(broadcast(rates), domainCol)
      .withColumn("copy_id",
        explode(sequence(lit(0L), floor(col("__rate")).cast("long"))))
      .where(col("copy_id") < floor(col("__rate")) ||
        fine < round((col("__rate") - floor(col("__rate"))) * 10000))
      .drop("__rate")
  }

  /** Shard-local greedy sequence PACKING — the concat-and-chunk token
    * budgeting step before LLM training: documents are dealt to
    * `shards` by a stable hash of their id, ordered within the shard
    * by id, and assigned `pack_id = floor(tokens_before / capacity)`
    * (the pack their first token lands in when the shard's documents
    * are concatenated and chopped every `capacity` tokens).
    *
    * Sharding is what makes this scale: a single global running sum
    * would be one unpartitioned window (one task no matter the
    * cluster); per-shard running sums are `shards`-way parallel and
    * each pack still fills to capacity. The whole computation is one
    * hash shuffle + a window — and every step (md5 bucket, running
    * sum, floor division) replays exactly in ANSI SQL. */
  def packSequences(
      docs: DataFrame,
      capacity: Long,
      shards: Int = 64,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens",
      salt: String = "graft-pack"): DataFrame = {
    require(capacity > 0 && shards > 0)
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(
      conv(substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 15),
        16, 10).cast("long"),
      lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(tokensCol).cast("long").as("n_toks"))
      .withColumn("shard", shard)
      .withColumn("toks_before",
        sum(col("n_toks")).over(w) - col("n_toks"))
      .withColumn("pack_id", floor(col("toks_before") / capacity))
      .select(col(idCol), col("shard"), col("n_toks"),
        col("toks_before"), col("pack_id"))
  }

  /** Stratified sample: per stratum, the `n` rows with the smallest
    * `md5(salt:id)` — a uniform-but-deterministic draw (md5 because
    * it replays bit-identically in ANSI SQL, the same portability
    * choice as the surrogate key and the pack shards; the id
    * tiebreak makes the order total even under md5 collisions).
    * Strata with fewer than `n` rows keep everything.
    *
    * Plan shape: rank-filter windows compile to a map-side
    * WindowGroupLimit + final — each task forwards at most `n` rows
    * per stratum into the shuffle, so the exchange carries
    * O(strata·n·tasks), not the corpus (pinned in PlanQualitySpec,
    * like the deterministic dedup). */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      salt: String = "graft-sample"): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws(":", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(strataCol).orderBy(key.asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n)
      .drop("__rk")
  }
}
