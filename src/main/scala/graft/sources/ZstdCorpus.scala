package graft.sources

import graft.functions.ZstdDictCodec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side DICTIONARY-COMPRESSED corpus option: the text column is
  * stored as zstd frames compressed against a corpus-trained shared
  * dictionary, the dictionary itself as a `_zdict` sidecar the reader
  * loads once.
  *
  * What this buys over parquet's own page codec — and what it
  * doesn't: a page codec compresses a column CHUNK with every
  * co-located value as history, so on a large well-compacted file it
  * captures cross-document redundancy fine and generally beats
  * per-value frames (measured in `ZstdCorpusSpec`; this pass does
  * not pretend otherwise). The dictionary pass wins where that
  * history ISN'T there:
  *  - SMALL files — the streaming-ingest regime. An O(batch)
  *    micro-batch lands tens-to-hundreds of rows per file; a page
  *    codec's history is only those rows, while every dict frame
  *    carries the full corpus-trained context whatever the file
  *    size. The spec measures the crossover on the fixtures.
  *  - ROW-DECODABLE values: a dict frame survives extraction out of
  *    parquet (KV export, per-row service reads, shuffle-through)
  *    still compressed, at a per-value ratio page codecs can't give.
  * The dictionary is a fixed ~64 KB sidecar, amortized O(1) over the
  * corpus. [[writeCompressed]] leaves the FILE codec on
  * `uncompressed` for the data it already squeezed — a file codec
  * would burn CPU re-compressing high-entropy frames for ~0.
  *
  * 100 TB posture: training reads a BOUNDED sample (driver-side cap in
  * bytes, enforced before collect); compression/decompression are
  * per-row expressions — no shuffle, no extra pass; the dictionary is
  * plan-shipped (≤ a few hundred KB). Readers that never touch the
  * text column never pay decompression: it's a per-column projection
  * expression, and column pruning drops it with the column. */
object ZstdCorpus {

  private[graft] def dictPath(dir: String) = new Path(dir, "_zdict")

  /** Train a zstd dictionary from a bounded corpus sample.
    *
    * `sampleBudgetBytes` bounds DRIVER memory: rows stream in a
    * single bounded collect of `sampleRows` rows (take(), not a full
    * collect), and samples stop feeding the trainer once the budget
    * is hit. zstd wants ~100× the dictionary size in samples;
    * defaults give 64 KB dict / 8 MB samples. */
  def trainDict(
      df: DataFrame,
      textCol: String = "text",
      dictBytes: Int = 64 << 10,
      sampleRows: Int = 20000,
      sampleBudgetBytes: Int = 8 << 20): Array[Byte] = {
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(
      sampleBudgetBytes, dictBytes)
    var fed = 0L
    df.select(col(textCol)).where(col(textCol).isNotNull)
      .take(sampleRows)
      .iterator
      .map(_.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .filter(_.nonEmpty)
      // count a sample into the budget only if it is actually FED:
      // an over-budget sample stops the feed without poisoning `fed`,
      // so the emptiness guard below reports the truth
      .takeWhile { b =>
        val fits = fed + b.length <= sampleBudgetBytes
        if (fits) { fed += b.length; trainer.addSample(b): Unit }
        fits
      }
      .foreach(_ => ())
    require(fed > 0,
      s"no trainable $textCol samples: every sampled row was null/empty, " +
        s"or the first sample alone exceeds sampleBudgetBytes " +
        s"($sampleBudgetBytes)")
    trainer.trainSamples()
  }

  /** Write `df` at `dir` with `textCol` replaced by a dict-compressed
    * binary `<textCol>_z` column; the dictionary (trained here unless
    * supplied) lands as the `_zdict` sidecar AFTER the data (the
    * Overwrite write clears the directory, so the sidecar cannot
    * precede it) — a crash between the two writes leaves frames with
    * no dictionary, which every read refuses LOUDLY at [[readDict]]:
    * the incomplete-write signal, never a silent wrong decode.
    * Returns the dictionary so callers can compress DELTAS against
    * the same one (a dictionary is an append-time config, like PQ
    * codebooks: retraining mid-table would strand old frames). */
  def writeCompressed(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      textCol: String = "text",
      level: Int = 3,
      dict: Option[Array[Byte]] = None): Array[Byte] = {
    val d = dict.getOrElse(trainDict(df, textCol))
    df.withColumn(s"${textCol}_z",
        ZstdDictCodec.compressCol(col(textCol), d, level))
      .drop(textCol)
      .write.mode(SaveMode.Overwrite)
      // the text bytes are already dict-compressed; a file codec
      // would burn CPU re-compressing high-entropy frames for ~0
      .option("compression", "uncompressed")
      .parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(dictPath(dir), true)
    try out.write(d) finally out.close()
    d
  }

  /** Read a [[writeCompressed]] table with `textCol` restored. Column
    * pruning still works: the decompress projection rides the
    * `<textCol>_z` column and disappears with it when a downstream
    * plan never selects the text. */
  def readCompressed(
      spark: SparkSession,
      dir: String,
      textCol: String = "text"): DataFrame = {
    val d = readDict(spark, dir)
    spark.read.parquet(dir)
      .withColumn(textCol,
        ZstdDictCodec.decompressCol(col(s"${textCol}_z"), d))
      .drop(s"${textCol}_z")
  }

  /** GRADUATION pass — the compaction-time flip the economics above
    * call for: rewrite a dict-compressed hot-tier table as a
    * compacted PAGE-CODEC table at `dest`. Once files are big enough
    * that the page codec has a real column chunk as history, it
    * out-compresses per-value frames (measured in `ZstdCorpusSpec`),
    * so the graduated tier drops the `_zdict` dependency entirely —
    * plain parquet any reader understands. `targetRowsPerFile`
    * controls the compaction (one exchange); the text column comes
    * back plaintext under parquet-zstd pages. */
  def graduate(
      spark: SparkSession,
      dir: String,
      dest: String,
      textCol: String = "text",
      targetRowsPerFile: Long = 1L << 20): Unit = {
    require(targetRowsPerFile >= 1,
      s"targetRowsPerFile ($targetRowsPerFile) must be >= 1")
    val src = readCompressed(spark, dir, textCol)
    val n = src.count()
    val parts = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    src.repartition(parts.toInt)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .parquet(dest)
  }

  private[graft] def readDict(spark: SparkSession, dir: String): Array[Byte] = {
    val p = dictPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no zstd dictionary sidecar at $p — was this " +
      "table written by ZstdCorpus.writeCompressed?")
    readDictBytes(fs, p)
  }

  private[graft] def readDictBytes(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    } finally in.close()
  }
}
