package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document table (SURVEY.md §7.4).
  *
  * All single-pass, shuffle-free projections — per-document work only,
  * so throughput scales linearly with executors at any corpus size.
  */
object TextAnalysis {

  /** Per-document statistics: sizes, token counts (whitespace and
    * BPE-ish), punctuation, and both fingerprints. */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars_calc"),
      wordCount(t).as("n_words"),
      bpeishTokenCount(textCol).as("n_tokens"),
      punctCount(t).as("n_punct"),
      fingerprint(t).as("fp"),
      rollingHash(textCol).as("rolling_fp"))
  }

  /** Fixed-window training chunks with overlap: every document's
    * canonical word sequence splits into windows of `window` tokens
    * starting every `stride` tokens (overlap = window − stride; the
    * trailing chunk may run short) — the "split long documents into
    * training sequences" step of an LLM pipeline, the inverse-shaped
    * sibling of [[Sampling.packSequences]] (that PACKS short docs;
    * this SPLITS long ones). Chunk starts are pure arithmetic over
    * the per-document token count, so a SQL oracle replays every
    * boundary exactly.
    *
    * Scale shape: a shuffle-free projection — tokenize, slice
    * `⌈(n−window)/stride⌉+1` windows per document, posexplode. Output
    * grows by the overlap factor only; payload bytes never leave
    * their input partition. */
  def chunkDocuments(
      docs: DataFrame,
      window: Int,
      stride: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(window >= 1, s"chunkDocuments needs window >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val toks = words(normalized(col(textCol)))
    val n = size(toks)
    // number of chunk starts: 1 + max(0, ceil((n - window) / stride))
    val extra = greatest(lit(0L),
      ceil((n - window).cast("double") / stride).cast("long"))
    docs
      .where(n > 0)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0L), extra),
          i => slice(toks, (i * stride).cast("int") + 1, lit(window)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** Hash-trick linear scorer (Weinberger et al., ICML 2009 — the
    * fastText-style inference path of a quality classifier): every
    * token hashes to one of `dims` buckets via the PORTABLE md5 hash
    * (the [[SimHash.portableTokenHash]] construction, so any engine
    * with md5 reproduces the featurization), and the document score
    * is the sum of the buckets' weights with multiplicity — one
    * shuffle-free projection, exactly how a trained linear model
    * deploys over a 100 TB corpus (real deployments broadcast the
    * weight vector; here the weights are a deterministic surrogate
    * `((bucket · 37 + 11) mod 17) − 8` so the whole pipeline stays
    * integer-exact and oracle-replayable — swap `weightOf` for a
    * broadcast lookup to serve a real model).
    *
    * Output: (id, score, keep = score > 0) — integer score, no float
    * crosses the engine boundary. */
  def hashedLinearScore(
      docs: DataFrame,
      dims: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(dims >= 2, s"hashedLinearScore needs dims >= 2, got $dims")
    val bucket = (t: org.apache.spark.sql.Column) =>
      pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"), lit(dims.toLong))
    val weight = (b: org.apache.spark.sql.Column) => (b * 37L + 11L) % 17L - 8L
    docs.select(
      col(idCol),
      aggregate(
        transform(words(normalized(col(textCol))), w => weight(bucket(w))),
        lit(0L), (acc, x) => acc + x).as("score"))
      .withColumn("keep", col("score") > 0)
  }

  /** Corpus card: per-source rollup (doc/token/char volume, language
    * spread) — the summary table every pretraining-mix decision reads.
    * One hash aggregation with map-side partials; count-distinct adds
    * the standard expand, everything else is a plain sum. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(wordCount(col("text"))).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"))

  /** Quality scoring: length/punctuation/stopword signals in [0,1]
    * combined into a single score. The formula is deliberately simple
    * arithmetic (no branching on floats) so an oracle replays it
    * bit-exactly: every division is int/int → double and the final
    * combination is a fixed-order weighted sum. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nWords = wordCount(t)
    val en = stopwordHits(t, "en")
    docs.select(
      col("doc_id"),
      nChars.as("n_chars_calc"),
      nWords.as("n_words"),
      (nWords.cast("double") / nChars.cast("double")).as("word_density"),
      (punctCount(t).cast("double") / nChars.cast("double")).as("punct_ratio"),
      (en.cast("double") / nWords.cast("double")).as("stopword_ratio"))
  }

  /** PII scrubbing: email / phone-number / long-digit-run patterns
    * replaced with typed placeholder tokens, with per-document match
    * counts kept for audit. Patterns stay in the portable regex
    * subset (no lookarounds) so the exact same expressions run under
    * Java regex and RE2-based engines. Shuffle-free projection. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val emailScrubbed = regexp_replace(t, EmailRe, "<EMAIL>")
    docs.select(
      col("doc_id"),
      regexp_replace(emailScrubbed, PhoneRe, "<PHONE>").as("text_scrubbed"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      // phones counted on the email-scrubbed text — the same input the
      // replacement runs on, so the audit count always equals the
      // number of <PHONE> tokens inserted (a digit run inside an email
      // address is consumed by the email pass, not double-counted)
      size(regexp_extract_all(emailScrubbed, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
  }

  /** Heuristic quality FILTER — the keep/drop decision a training-
    * data pipeline applies before tokenization: document length in
    * range, plausible word density, not punctuation soup. Integer/
    * ratio thresholds mirror exactly in SQL. */
  def qualityFilter(
      docs: DataFrame,
      textCol: String = "text",
      minWords: Int = 5,
      maxWords: Int = 100000,
      maxPunctRatio: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val nWords = wordCount(t)
    val nChars = length(t).cast("long")
    docs.where(
      nWords >= minWords && nWords <= maxWords &&
        punctCount(t).cast("double") / nChars.cast("double") <= maxPunctRatio)
  }

  /** Boilerplate line removal: a line that appears in more than
    * `maxDocs` distinct documents is boilerplate (headers, footers,
    * nav text) and is dropped from every document; each document is
    * reassembled from its surviving lines in original order — the
    * cross-document line dedup used by large web-corpus pipelines
    * (CCNet, Wenzek et al. LREC 2020; RefinedWeb, Penedo et al. 2023).
    *
    * Shape: explode lines with position → count distinct docs per
    * line (one hash-shuffle on the line hash, map-side combined) →
    * broadcast-join the common-line set back → re-aggregate by doc.
    * The common-line set is tiny by construction (only lines crossing
    * the threshold), so the rebuild join is broadcast, not shuffled.
    */
  def removeBoilerplateLines(
      docs: DataFrame,
      maxDocs: Long = 1,
      textCol: String = "text"): DataFrame = {
    val lines = docs.select(
      col("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val common = lines
      .groupBy(col("__line"))
      .agg(countDistinct(col("doc_id")).as("__docs"))
      .where(col("__docs") > maxDocs)
      .select(col("__line"))
    // no broadcast hint: on a web-scale corpus the common-line set can
    // be arbitrarily large (every shared sentence) — AQE broadcasts it
    // when it is actually small and shuffles when it isn't
    val kept = lines.join(common, Seq("__line"), "left_anti")
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(array_join(
        array_sort(collect_list(struct(col("__pos"), col("__line"))))
          .getField("__line"), "\n").as("text_cleaned"))
    // documents whose EVERY line was boilerplate still come back —
    // with empty text — so downstream doc_id joins don't lose rows
    docs.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text_cleaned"), lit("")).as("text_cleaned"))
  }

  /** Corpus vocabulary: the `topK` most frequent word tokens with
    * counts — tokenizer-prep over the whole corpus. One shuffle on
    * the token (map-side combined), then a global top-k. */
  def vocabulary(docs: DataFrame, topK: Int = 1000, textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      explode(words(normalized(col(textCol)))).as("token"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)
  }

  /** Vocabulary id-encoding — the tokenizer-materialization step
    * between [[vocabulary]] and the packer: each document's token
    * sequence becomes integer ids against the corpus top-K vocabulary
    * (ids 1..K in (frequency desc, token asc) order; 0 = OOV), with
    * the per-doc OOV count kept as the coverage audit.
    *
    * Shape: the vocabulary is ONE token aggregation plus a K-row
    * driver collect; encoding is then a PURE shuffle-free projection —
    * the id map rides the serialized plan as a literal and the lookup
    * runs inside codegen via `transform` + `try_element_at` — so the
    * 100 TB encode pass adds zero exchanges to the corpus scan. */
  def encodeIds(
      docs: DataFrame,
      vocabSize: Int = 100,
      textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1, s"encodeIds needs vocabSize >= 1, got $vocabSize")
    val vocab: Map[String, Long] = vocabulary(docs, vocabSize, textCol)
      .collect().map(_.getString(0)).zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    val ids = transform(words(normalized(col(textCol))),
      w => coalesce(try_element_at(typedLit(vocab), w), lit(0L)))
    docs.select(col("doc_id"), ids.as("ids"))
      .withColumn("n_oov",
        size(filter(col("ids"), x => x === 0L)).cast("long"))
  }

  /** Repetition-quality signals (the Gopher-rule family — Rae et al.
    * 2021 §A1.1: excessive within-document repetition marks low-
    * quality text): duplicate-line and duplicate-word fractions plus
    * the top-word concentration.
    *
    * Shape: line stats are a shuffle-free projection (array ops on the
    * line split); word stats explode once and aggregate twice with
    * map-side combining — (doc, word) counts, then per-doc
    * sum/count/max — the same two-level shape a 100 TB corpus scan
    * needs. Ratios are int/int → double divisions in fixed order, so
    * an oracle replays them bit-exactly. */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = split(col(textCol), "\n")
    val lineStats = docs.select(
      col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(array_distinct(lines)).cast("long").as("n_distinct_lines"))
    val wordStats = docs
      .select(col("doc_id"), explode(words(normalized(col(textCol)))).as("__w"))
      .groupBy(col("doc_id"), col("__w")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__cnt")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("__cnt")).as("max_word_freq"))
    lineStats.join(wordStats, Seq("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_distinct_lines"),
        col("n_words"), col("n_distinct_words"), col("max_word_freq"),
        ((col("n_lines") - col("n_distinct_lines")).cast("double") /
          col("n_lines").cast("double")).as("dup_line_ratio"),
        ((col("n_words") - col("n_distinct_words")).cast("double") /
          col("n_words").cast("double")).as("dup_word_ratio"),
        (col("max_word_freq").cast("double") /
          col("n_words").cast("double")).as("top_word_ratio"))
  }

  /** Per-document top-`k` terms by frequency with corpus document
    * frequency attached — the integer core of TF-IDF term weighting,
    * ranked by the float-free total order (tf desc, df asc, term asc)
    * so every engine agrees on the exact rows.
    *
    * Shape: ONE token-stream scan into the (doc, term) aggregation
    * (map-side combined); document frequency is a count window over
    * those tf rows partitioned by term — NOT a second aggregation of
    * the token stream (a `tf.groupBy(term)` branch would recompute
    * the explode+agg subtree from the scan: two full corpus passes at
    * 100 TB). Everything after the first aggregation moves only
    * distinct (doc, term) rows; the final rank-≤-k window prunes
    * map-side (WindowGroupLimit). */
  def topTerms(docs: DataFrame, k: Int = 5, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(words(normalized(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val byTerm = Window.partitionBy(col("term"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** BM25 sufficient statistics for one query over the corpus — per
    * (document, query token): term frequency `tf`, document frequency
    * `df`, document length `dl` (words). All BIGINT, so the whole
    * distributed pipeline is hash-exact cross-engine (the scalar BM25
    * arithmetic on top is [[bm25Rank]], spec-graded — per-row float
    * math can't hide a distribution bug once these are right).
    *
    * Plan: doc lengths are computed map-side BEFORE the token
    * explode (no second pass), tf is the one (id, token) shuffle,
    * df reduces the tf table (|matched docs| rows, not the corpus)
    * and broadcasts back. Tokenization is the engine's canonical
    * [[TextFunctions.words]]∘[[TextFunctions.normalized]] split. */
  def bm25Stats(
      docs: DataFrame,
      query: String,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val qtoks = query.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(qtoks.nonEmpty, "empty query")
    val toks = docs.select(col(idCol),
        words(normalized(col(textCol))).as("__w"))
      .select(col(idCol), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("token"))
    val tf = toks.where(col("token").isin(qtoks: _*))
      .groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df as a window over the tf table, NOT a self-join: reusing tf
    // in two join branches would duplicate the subtree in the plan
    // and scan + explode the corpus twice (plan-pinned). The window
    // exchange moves only the matched-doc tf rows.
    import org.apache.spark.sql.expressions.Window
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("dl"))
  }

  /** BM25 ranked retrieval (Robertson/Sparck Jones, the k1-b form):
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Top-`k` by score with a
    * deterministic id tie-break. Corpus scalars (N, avgdl) come from
    * one 1-row aggregate broadcast across the stats — nothing beyond
    * [[bm25Stats]]'s single shuffle plus the final top-k sort. */
  def bm25Rank(
      docs: DataFrame,
      query: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val stats = bm25Stats(docs, query, textCol, idCol)
    val corpus = docs.select(col(idCol),
        size(words(normalized(col(textCol)))).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val scored = stats.crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__tfpart",
        col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("__idf") * col("__tfpart")).as("score"))
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
  }

  /** N-gram language-model scoring statistics — the CCNet-style
    * "perplexity vs a reference corpus" quality signal, reduced to
    * its INTEGER sufficient statistics so the verdict is bit-portable:
    * a word-bigram model counted over `reference`, then per scored
    * document the number of bigrams, how many the model knows, and
    * the summed model counts. The caller turns these (plus any
    * smoothing) into log-probabilities; the floats never cross an
    * engine boundary.
    *
    * Scale: the model build is one bigram-keyed aggregate over the
    * reference; scoring is one LEFT join keyed on bigrams — prune the
    * model with `minModelCount` (rare-bigram mass dominates the
    * model's cardinality, Zipf) until it broadcasts and the scored
    * corpus never shuffles. Documents with fewer than two tokens have
    * no bigrams and emit no row (SQL aggregate-of-nothing semantics).
    */
  def lmBigramStats(
      scored: DataFrame,
      reference: DataFrame,
      textCol: String = "text",
      minModelCount: Long = 1L): DataFrame = {
    def toks = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    // slice length must not go negative on an EMPTY token array
    def nPairs = greatest(size(toks) - 1, lit(0))
    def bigramCol = explode(zip_with(
      slice(toks, lit(1), nPairs),
      slice(toks, lit(2), nPairs),
      (a, b) => concat_ws(" ", a, b))).as("bg")
    val model = reference.select(bigramCol)
      .groupBy("bg").agg(count(lit(1)).as("model_n"))
      .where(col("model_n") >= minModelCount)
    scored.select(col("doc_id"), bigramCol)
      .join(model, Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("model_n")).as("n_known"),
        coalesce(sum("model_n"), lit(0L)).as("sum_model_n"))
  }

  /** Language-ID heuristic: stopword-marker occurrence counting per
    * candidate language + CJK codepoint detection; argmax with a fixed
    * tie-break order (en > es > fr > de > und). */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val hits = Seq("en", "es", "fr", "de").map(l => l -> stopwordHits(t, l))
    val withScores = hits.foldLeft(docs)((d, h) => d.withColumn(s"hits_${h._1}", h._2))
      .withColumn("cjk", cjkCount(t))
    val best = hits.map(_._1).map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    withScores.select(
      col("doc_id"),
      col("hits_en"), col("hits_es"), col("hits_fr"), col("hits_de"), col("cjk"),
      when(col("cjk") > 0, "zh")
        .when(best === 0, "und")
        .when(col("hits_en") === best, "en")
        .when(col("hits_es") === best, "es")
        .when(col("hits_fr") === best, "fr")
        .otherwise("de")
        .as("lang_guess"))
  }
}
