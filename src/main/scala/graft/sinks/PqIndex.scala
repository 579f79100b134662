package graft.sinks

import graft.ext.PqSearch
import graft.functions.{PqAdcScore, PqCodebooks, PqEncode, PqLut, VectorFunctions}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED product-quantization ANN index — [[PqSearch]] promoted
  * to lake sidecars with the index family's discipline, and the one
  * member of the ANN family whose index is SMALLER than the corpus:
  *
  *  - `_pq_codebooks`: one row (m, ks, dsub, flat) — the frozen
  *    driver-trained sub-space codebooks.
  *  - `_pq_codes`: (file, vec_id, \_\_codes) — m bytes per vector
  *    (64 float dims → 8 ids at m=8, a ~32× I/O reduction against
  *    re-scanning embeddings), range-clustered by vec_id.
  *
  * Unlike [[IvfIndex]] (which stores vectors cell-partitioned,
  * because cells are what it prunes by), the codes sidecar
  * deliberately does NOT duplicate the embeddings — compression is
  * the point of PQ. Query = one ADC scan over the codes sidecar
  * (whole-stage codegen'd table lookups, map-side top-candidateK
  * below the one candidate exchange), then the exact re-rank
  * broadcast-joins the candidate ids back into a corpus pass that is
  * COLUMN-PRUNED to (id, vector). That trades one extra
  * candidate-sized exchange against [[PqSearch.topK]]'s
  * carry-vectors-through-the-shuffle plan, and in exchange the scan
  * that touches every row reads 8-byte codes, not vectors — the
  * trade a 100 TB corpus wants.
  *
  * [[refresh]] keeps the codebooks FROZEN (assignment is one
  * codegen'd encode pass; retraining is a rebuild): vanished corpus
  * files' codes drop, covered files carry verbatim, only new files'
  * vectors are read and encoded. Same `.next`-then-swap and
  * one-row-per-vector enforcement as the siblings.
  *
  * Exactness contract matches [[PqSearch]]: `candidateK` at or above
  * the corpus size degenerates to exact brute force evaluated
  * through the full compressed-domain machinery — the declared
  * queries grade build and refresh at that setting. */
object PqIndex {

  private[graft] def codebooksPath(table: String): String = s"$table/_pq_codebooks"
  private[graft] def codesPath(table: String): String = s"$table/_pq_codes"

  /** Bootstrap / rebuild: driver-trained codebooks on a bounded
    * no-count sample (via [[PqSearch.buildIndex]]), one codegen'd
    * encode pass, both sidecars written (codebooks first — a crash
    * between the writes is repaired by re-running collect). */
  def collect(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 8,
      ks: Int = 16,
      iters: Int = 10,
      seed: Long = 42L): Unit = {
    import spark.implicits._
    val corpus = spark.read.parquet(table)
      .select(col("_metadata.file_path").as("file"),
        col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val idx = PqSearch.buildIndex(corpus, m, ks, iters, seed)
    val cb = idx.codebooks
    Seq((cb.m, cb.ks, cb.dsub, cb.flat))
      .toDF("m", "ks", "dsub", "flat").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(codebooksPath(table))
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeCodes(spark,
      idx.encoded.select("file", "vec_id", "__codes"), codesPath(table), fs)
  }

  private[graft] def readCodebooks(spark: SparkSession, table: String): PqCodebooks = {
    val r = spark.read.parquet(codebooksPath(table)).head()
    PqCodebooks(r.getAs[Int]("m"), r.getAs[Int]("ks"), r.getAs[Int]("dsub"),
      r.getAs[Seq[Double]]("flat").toArray)
  }

  /** Incremental maintenance, pure file-set arithmetic over the
    * FROZEN codebooks. */
  def refresh(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(codebooksPath(table), codesPath(table)).foreach(p =>
      require(fs.exists(new Path(p)),
        s"no PQ index at $p — bootstrap with collect()"))
    val current = BloomIndex.dataFilePaths(spark, table).toSet
    val codes = spark.read.parquet(codesPath(table)).localCheckpoint(true)
    val indexed = codes.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (current -- indexed).toSeq.sorted
    val kept = codes.where(col("file").isin(current.toSeq: _*))
      .select("file", "vec_id", "__codes")
    val merged =
      if (fresh.isEmpty) kept
      else {
        val cb = readCodebooks(spark, table)
        val freshCodes = spark.read.option("basePath", table).parquet(fresh: _*)
          .select(col("_metadata.file_path").as("file"),
            col(idCol).as("vec_id"),
            PqEncode(col(vecCol), cb).as("__codes"))
        kept.unionByName(freshCodes)
      }
    writeCodes(spark, merged, codesPath(table), fs)
  }

  private def writeCodes(
      spark: SparkSession,
      codes: DataFrame,
      dest: String,
      fs: org.apache.hadoop.fs.FileSystem,
      buckets: Int = 4): Unit = {
    codes.repartitionByRange(buckets, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dest.next")
    val offenders = spark.read.parquet(s"$dest.next")
      .groupBy("vec_id").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).limit(5).collect()
    if (offenders.nonEmpty) {
      fs.delete(new Path(s"$dest.next"), true)
      require(offenders.isEmpty,
        s"vectors indexed more than once: ids " +
          s"${offenders.map(_.get(0)).mkString(", ")} — a vector's row " +
          "must live in ONE corpus data file (append new ids, " +
          "purge-rewrite whole files); compact, then rebuild")
    }
    fs.delete(new Path(dest), true)
    fs.rename(new Path(s"$dest.next"), new Path(dest))
  }

  /** ADC over the codes sidecar, exact re-rank against the
    * column-pruned corpus. Output (q_id, neighbor_id, rank) —
    * identical contract to [[PqSearch.topK]]. */
  def topK(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      k: Int,
      candidateK: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(candidateK >= k, s"candidateK ($candidateK) must be >= k ($k)")
    val cb = readCodebooks(spark, table)
    val qLut = broadcast(queries.select(
      col(idCol).as("q_id"), PqLut(col(vecCol), cb).as("__lut")))
    val qVec = broadcast(queries.select(
      col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.norm(col(vecCol)).as("q_nrm")))
    // the scan that touches EVERY corpus row reads m bytes per
    // vector — never the embeddings
    val codes = spark.read.parquet(codesPath(table))
      .select(col("vec_id").as("neighbor_id"), col("__codes"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val cands = codes.crossJoin(qLut)
      .where(col("q_id") =!= col("neighbor_id"))
      .withColumn("__adc", PqAdcScore(col("__codes"), col("__lut"), cb.ks))
      .select(col("q_id"), col("neighbor_id"), col("__adc"))
      .withColumn("__ar", row_number().over(wAdc))
      .where(col("__ar") <= candidateK)
      .select(col("q_id"), col("neighbor_id"))
    // candidates (queries × candidateK, small by contract) broadcast
    // INTO the corpus pass, which is column-pruned to (id, vector)
    val corpusVecs = spark.read.parquet(table)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        VectorFunctions.norm(col(vecCol)).as("c_nrm"))
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    corpusVecs.join(broadcast(cands), Seq("neighbor_id"))
      .join(qVec, Seq("q_id"))
      .withColumn("cos",
        VectorFunctions.dot(col("q_vec"), col("c_vec"))
          / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }
}
