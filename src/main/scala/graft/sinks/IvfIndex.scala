package graft.sinks

import graft.ext.IvfSearch
import graft.functions.VectorFunctions
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED IVF ANN index — [[graft.ext.IvfSearch]]'s in-memory
  * build promoted to a lake sidecar with the index family's
  * maintenance discipline (`_stats` / `_bloom` / `_invindex`
  * siblings): build once, query many, refresh by file-set
  * arithmetic.
  *
  * Layout, next to the vector table:
  *  - `_ivf_centroids`: (\_\_cell, \_\_centroid) — the frozen coarse
  *    quantizer, nCells rows.
  *  - `_ivf_cells`: (file, vec_id, embedding, \_\_cell), written
  *    DIRECTORY-PARTITIONED BY CELL — this is what makes the
  *    persisted form an actual inverted file: a query that probes
  *    `nProbe` of `nCells` cells pushes a static partition filter
  *    and READS only those cells' files (`IvfIndexSpec` pins the
  *    records-read separation), instead of filtering a full scan.
  *
  * [[refresh]] keeps the centroids FROZEN (the production IVF
  * maintenance model — assignment is cheap, re-clustering is a
  * rebuild): vanished corpus files' rows drop, files already covered
  * carry verbatim, and ONLY new files' vectors are read and assigned
  * to their nearest centroid — O(new vectors × nCells) work, no
  * corpus rescan, no model refit. Assignment uses the same
  * squared-euclidean argmin (ties → lowest cell id) as the KMeans
  * transform that built the index. Same `.next`-then-swap discipline
  * as the siblings; one-row-per-vec-per-file is ENFORCED before any
  * swap. [[collect]] is the bootstrap/rebuild: it writes BOTH
  * sidecars (centroids first), so a crash between the two writes is
  * repaired by re-running collect.
  *
  * Exactness contract mirrors IvfSearch: `nProbe = nCells` probes
  * every cell, so top-k is EXACT regardless of the clustering —
  * the declared queries grade the whole persisted path (build →
  * refresh → probe) against the brute-force oracle at that setting;
  * partial-probe recall is the approximate regime, bounded by the
  * same cell geometry as the in-memory form. */
object IvfIndex {

  private[graft] def centroidsPath(table: String): String = s"$table/_ivf_centroids"
  private[graft] def cellsPath(table: String): String = s"$table/_ivf_cells"

  /** Bootstrap / rebuild: sampled seeded KMeans over the table (via
    * [[IvfSearch.buildIndex]]), then both sidecars. */
  def collect(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16,
      seed: Long = 42L): Unit = {
    val corpus = spark.read.parquet(table)
      .select(col("_metadata.file_path").as("file"),
        col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val idx = IvfSearch.buildIndex(corpus, nCells, seed)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    idx.centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath(table))
    writeCells(spark, idx.assigned, cellsPath(table), fs)
  }

  /** Incremental maintenance, pure file-set arithmetic over the
    * FROZEN centroids. */
  def refresh(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(centroidsPath(table), cellsPath(table)).foreach(p =>
      require(fs.exists(new Path(p)),
        s"no IVF index at $p — bootstrap with collect()"))
    val current = BloomIndex.dataFilePaths(spark, table).toSet
    // the swap deletes the dir being read — pin the old cells first
    val cells = spark.read.parquet(cellsPath(table)).localCheckpoint(true)
    val indexed = cells.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (current -- indexed).toSeq.sorted
    val kept = cells.where(col("file").isin(current.toSeq: _*))
      .select("file", "vec_id", "embedding", "__cell")
    val merged =
      if (fresh.isEmpty) kept
      else kept.unionByName(assignFiles(spark, table, fresh, idCol, vecCol))
    writeCells(spark, merged, cellsPath(table), fs)
  }

  /** Nearest-centroid assignment for specific corpus files: each new
    * vector × the broadcast nCells centroids, squared-euclidean
    * argmin, ties to the lowest cell id — the same rule KMeans
    * transform applies at build time. */
  private def assignFiles(
      spark: SparkSession,
      table: String,
      paths: Seq[String],
      idCol: String,
      vecCol: String): DataFrame = {
    val cents = broadcast(spark.read.parquet(centroidsPath(table)))
    val freshVecs = spark.read.option("basePath", table).parquet(paths: _*)
      .select(col("_metadata.file_path").as("file"),
        col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("__d").asc, col("__cell").asc)
    freshVecs.crossJoin(cents)
      .withColumn("__d", VectorFunctions.l2Sq(col("embedding"), col("__centroid")))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select("file", "vec_id", "embedding", "__cell")
  }

  private def writeCells(
      spark: SparkSession,
      assigned: DataFrame,
      dest: String,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    assigned.select("file", "vec_id", "embedding", "__cell")
      .repartition(col("__cell"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__cell").parquet(s"$dest.next")
    // layout guard BEFORE the swap (the family's append-new-ids /
    // purge-rewrite-whole-files model): a vec_id carried by two data
    // files would surface twice in every probe
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

  /** Probe the persisted index: rank cells per query against the
    * broadcast centroids, push the probed cell set as a STATIC
    * partition filter (the probed set is bounded by queries × nProbe
    * — query sets are small by contract, so the collect is bounded),
    * exact cosine top-k inside the probed cells only. */
  def topK(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(centroidsPath(table))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val cellRank = Window.partitionBy(col("q_id"))
      .orderBy(col("__cdist").asc, col("__cell").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__cdist", VectorFunctions.l2Sq(col("q_vec"), col("__centroid")))
      .withColumn("__cr", row_number().over(cellRank))
      .where(col("__cr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("__cell"))
      .localCheckpoint(true) // reused as the filter source AND the join side
    val probedCells = probes.select("__cell").distinct()
      .collect().map(_.get(0))
    val scored = spark.read.parquet(cellsPath(table))
      .where(col("__cell").isin(probedCells: _*))
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_vec"), col("__cell"))
      .join(broadcast(probes), Seq("__cell"))
      .where(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .select(col("q_id"), col("neighbor_id"), col("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
  }
}
