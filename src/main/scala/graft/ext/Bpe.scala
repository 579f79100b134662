package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a document corpus —
  * the "train the tokenizer on the training data" step of an LLM
  * data pipeline, distributed the way the statistics allow:
  *
  *  - the corpus reduces ONCE to the (distinct word, count) table —
  *    the only token-sized shuffle in the whole procedure (same
  *    contract as [[TextAnalysis.vocabulary]]); every BPE iteration
  *    after that is a job over DISTINCT WORDS, whose cardinality is
  *    vocabulary-like (≪ corpus, and sublinear in corpus growth),
  *  - each [[learn]] iteration is: adjacent-pair counts over the
  *    per-word symbol arrays (map-side explode + one pair-keyed
  *    aggregate), a 1-row argmax collect (bounded driver read — the
  *    chosen merge IS the iteration's output), and a shuffle-free
  *    scan-merge rewrite of the symbol arrays,
  *  - [[encode]] applies a FROZEN merge list as a pure projection
  *    (no shuffle, no state): new corpora encode embarrassingly
  *    parallel, exactly how a trained tokenizer deploys.
  *
  * Merge semantics are the classic greedy left-to-right scan
  * (Sennrich et al., ACL 2016): each iteration replaces every
  * non-overlapping occurrence of the chosen pair, leftmost first —
  * "aaa" under merge (a,a) becomes ["aa","a"]. Pair choice
  * tie-breaks deterministically by (count desc, left asc, right
  * asc), so training is reproducible across partitionings.
  *
  * Words here are whitespace tokens; symbols start as single
  * characters. No end-of-word marker is added — merges never cross
  * word boundaries by construction (pairs are generated within the
  * per-word arrays), which keeps every value portable to the SQL
  * oracle. Callers wanting GPT-style boundary glyphs can pre-map
  * words before training.
  */
object Bpe {

  private def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)

  /** (distinct word, corpus count) — the one corpus-sized shuffle. */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    words(df, textCol).groupBy("w").agg(count(lit(1)).as("c"))

  /** Adjacent-character pair statistics — iteration 0 of training,
    * and the oracle-gradeable core (`ext_bpe_pairs`): every 2-char
    * window of every distinct word, weighted by the word's corpus
    * frequency. */
  def pairStats(df: DataFrame, textCol: String = "text"): DataFrame =
    wordCounts(df, textCol)
      .where(length(col("w")) >= 2)
      .select(
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"),
        col("c"))
      .groupBy("pair").agg(sum("c").as("n"))

  /** One greedy left-to-right merge pass of (a, b) over a symbol
    * array: the accumulator either absorbs `x` into a fresh `a+b`
    * tail or appends it. */
  private def mergeScan(syms: Column, a: Column, b: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
          .otherwise(concat(acc, array(x))))

  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))

  /** Learns `numMerges` merges. Stops early when no pair occurs at
    * least `minCount` times (default 2 — a pair seen once compresses
    * nothing). Each iteration localCheckpoints the distinct-word
    * symbol table: the rewrite chain would otherwise grow the plan
    * linearly in merges, and the table is vocabulary-sized by
    * contract. */
  def learn(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 32,
      minCount: Long = 2L,
      vocabPartitions: Int = 8): Seq[(String, String)] = {
    require(numMerges >= 1, "learn needs numMerges >= 1")
    // the corpus-wide aggregate stays at full width; only its
    // vocabulary-sized OUTPUT re-partitions, so the numMerges
    // iteration jobs run vocab-sized task counts instead of
    // spark.sql.shuffle.partitions-many near-empty tasks (8 iteration
    // jobs x 32 tasks of ~600 words each dominated training time at
    // sf0.1). Raise for vocabularies that dwarf 8 partitions.
    var syms = wordCounts(df, textCol)
      .repartition(vocabPartitions)
      .select(col("c"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = syms
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("c"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val prev = syms
        syms = syms.withColumn("syms", mergeScan(col("syms"), lit(a), lit(b)))
          .localCheckpoint(true)
        prev.unpersist(blocking = false)
      }
    }
    syms.unpersist(blocking = false)
    merges.toSeq
  }

  /** Applies a frozen merge list to `textCol`, appending `outCol` =
    * the document's BPE token sequence (word boundaries respected,
    * whitespace dropped — lossless per word: concatenating a word's
    * tokens reproduces the word). Pure projection, no shuffle, no
    * driver state: the whole document becomes ONE
    * separator-interleaved symbol string (`⁁s1⁁s2⁁…`, word
    * boundaries a DOUBLE separator no pattern can bridge) and each
    * merge is a single left-to-right `regexp_replace` pass with
    * non-consuming lookarounds — Java's replaceAll scans leftmost
    * first and resumes after each match, which IS the greedy
    * non-overlapping merge semantics ("aaa" under (a,a) → aa·a,
    * chains like "abab" under (a,b) merge fully because the
    * boundary separators are never consumed). Linear per merge in
    * document length; the earlier per-word array-fold spelling was
    * quadratic in word length per merge (accumulator copy per
    * symbol) and 20× slower at sf0.1.
    *
    * Contract: the input must not contain U+0001 (the internal
    * separator) — enforced per row via a guarded projection so a
    * violating corpus fails loudly instead of mis-tokenizing. */
  def encode(
      df: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      outCol: String = "bpe_tokens"): DataFrame = {
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val SEP = "\u0001"
    val wordsArr = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    // each word → ⁁c⁁h⁁a⁁r⁁; joining words then yields ⁁⁁ boundaries
    val docStr = array_join(
      transform(wordsArr,
        w => concat(lit(SEP), regexp_replace(w, "(?s)(.)", "$1" + SEP))), "")
    val encodedStr = merges.foldLeft(docStr) { case (s, (a, b)) =>
      val qa = java.util.regex.Pattern.quote(a)
      val qb = java.util.regex.Pattern.quote(b)
      val rep = java.util.regex.Matcher.quoteReplacement(a + b)
      regexp_replace(s, lit(s"(?<=$SEP)$qa$SEP$qb(?=$SEP)"), lit(rep))
    }
    val tokens = filter(split(encodedStr, SEP), t => length(t) > 0)
    df.withColumn(outCol,
      when(col(textCol).contains(SEP),
        raise_error(lit(s"encode: input $textCol contains the reserved " +
          "U+0001 separator")).cast("array<string>"))
        .otherwise(tokens))
  }

  /** Vocabulary-scale form of [[encode]]: the frozen merge list
    * rides the plan as ONE codegen'd expression node
    * ([[graft.functions.BpeEncode]] — rank-priority greedy apply
    * loop, word-memoized per thread), so a production 30k-merge
    * vocabulary costs the same plan depth and the same single row
    * scan as 8 merges. [[encode]]'s chained `regexp_replace` stays
    * as the SQL-expressible semantic spec (one plan node and one
    * full-document pass per merge — fine at single-digit merges,
    * unusable at vocabulary scale); BpeSpec pins the two paths
    * value-identical on trained merge tables and pins this plan's
    * size flat in the merge count. Same projection contract: word
    * boundaries respected, lossless per word, no shuffle, no driver
    * state. */
  def encodeRank(
      df: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      outCol: String = "bpe_tokens"): DataFrame = {
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    df.withColumn(outCol, graft.functions.BpeEncode(col(textCol), merges))
  }
}
