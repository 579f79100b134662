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
  *  - `_ivf_cells`: (file, vec_id, embedding, \_\_cell), written
  *    DIRECTORY-PARTITIONED BY CELL — this is what makes the
  *    persisted form an actual inverted file: a query that probes
  *    `nProbe` of `nCells` cells pushes a static partition filter
  *    and READS only those cells' files (`IvfIndexSpec` pins the
  *    records-read separation), instead of filtering a full scan.
  *  - `_ivf_cells/_centroids`: (\_\_cell, \_\_centroid) — the frozen
  *    coarse quantizer, nCells rows, stored INSIDE the cells dir
  *    (underscore-prefixed, so cells reads never see it) so
  *    [[collect]]'s journaled publish moves quantizer and
  *    assignments together: no crash point can pair new centroids
  *    with old cells or vice versa.
  *
  * [[refresh]] keeps the centroids FROZEN (the production IVF
  * maintenance model — assignment is cheap, re-clustering is a
  * rebuild) and is O(delta) in write I/O via
  * [[SidecarMaintenance.commitDelta]]: new corpus files' vectors are
  * read, argmin-assigned and APPENDED as fresh sidecar files inside
  * the cell directories; vanished corpus files' rows drop by
  * rewriting ONLY the sidecar files that carried them. The untouched
  * remainder of the sidecar — at 100 TB, essentially all of it — is
  * never rewritten (the per-file-partial discipline of
  * [[InvertedIndex]]'s `_termstats`/`_doclen`, applied to the vector
  * family). Assignment uses the same squared-euclidean argmin
  * (ties → lowest cell id) as the KMeans transform that built the
  * index, windowed per (file, vec_id) so an id duplicated across
  * fresh files SURVIVES to the one-row-per-vector guard and fails
  * loudly instead of silently collapsing. The guard runs BEFORE any
  * mutation; small-file accumulation from repeated refreshes is
  * repacked by [[compact]].
  *
  * Exactness contract mirrors IvfSearch: `nProbe = nCells` probes
  * every cell, so top-k is EXACT regardless of the clustering —
  * the declared queries grade the whole persisted path (build →
  * refresh → probe) against the brute-force oracle at that setting;
  * partial-probe recall is the approximate regime, bounded by the
  * same cell geometry as the in-memory form. */
object IvfIndex {

  private[graft] def cellsPath(table: String): String = s"$table/_ivf_cells"
  private[graft] def centroidsPath(table: String): String =
    s"${cellsPath(table)}/_centroids"
  private[graft] def refsPath(table: String): String = s"$table/_ivf_refs"
  private[graft] def refsCentroidsPath(table: String): String =
    s"${refsPath(table)}/_centroids"

  /** Spread the `__cell=` partition-dir write across `writeSalt`
    * tasks per cell ([[SidecarMaintenance.saltedByPartition]]). */
  private def salted(rows: DataFrame, writeSalt: Int): DataFrame =
    SidecarMaintenance.saltedByPartition(rows, "__cell",
      Seq("file", "vec_id", "embedding", "__cell"), writeSalt)

  /** Bootstrap / rebuild: sampled seeded KMeans over the table (via
    * [[IvfSearch.buildIndex]]), both sidecars built under
    * `_ivf_cells.next` and published by the journaled
    * [[SidecarMaintenance.publishDir]] dance — a crash anywhere
    * before the marker (including a layout-guard trip) leaves the
    * previous index fully consistent and serving; a crash anywhere
    * after it is rolled forward by the next maintenance entry, so
    * no crash point leaves the table without a serving index. */
  def collect(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16,
      seed: Long = 42L,
      writeSalt: Int = 1): Unit = {
    val corpus = ParquetMemo.readDir(spark, table)
      .select(col("_metadata.file_path").as("file"),
        col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val idx = IvfSearch.buildIndex(corpus, nCells, seed)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = cellsPath(table)
    SidecarMaintenance.recoverPublish(spark, dest)
    val next = s"$dest.next"
    fs.delete(new Path(next), true)
    val rows = salted(idx.assigned, writeSalt)
    rows.write.mode(SaveMode.Overwrite).partitionBy("__cell").parquet(next)
    idx.centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$next/_centroids")
    requireOneRowPerVector(
      spark.read.schema(ParquetMemo.nullableTop(rows.schema)).parquet(next),
      onTrip = { fs.delete(new Path(next), true) })
    SidecarMaintenance.publishDir(spark, dest)
  }

  /** Incremental maintenance, pure file-set arithmetic over the
    * FROZEN centroids — O(delta) write I/O: appends new files' rows,
    * rewrites only the sidecar files holding vanished files' rows.
    * `appendedOnly = Some(files)` plans from exactly those candidate
    * corpus files with no corpus listing and no vanish detection
    * ([[SidecarMaintenance.planAppend]] — the O(batch) form for
    * streaming cadences that know what they just published); None
    * is the full diff against the listed corpus. `replaced` (only
    * meaningful with `appendedOnly`) names corpus files an
    * idempotent replay republished under a prior delivery's names —
    * their covered bindings are stale and plan vanished+fresh
    * ([[SidecarMaintenance.planAppend]]). */
  def refresh(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      writeSalt: Int = 1,
      appendedOnly: Option[Set[String]] = None,
      replaced: Set[String] = Set.empty,
      replacedPrefixes: Seq[String] = Nil): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal a crashed rebuild publish BEFORE the existence check — a
    // crash between publishDir's renames can leave the index parked
    // at `.next`/`.old`, and this entry must restore it, not wedge
    SidecarMaintenance.recoverPublish(spark, cellsPath(table))
    Seq(centroidsPath(table), cellsPath(table)).foreach(p =>
      require(fs.exists(new Path(p)),
        s"no IVF index at $p — bootstrap with collect()"))
    val plan = appendedOnly match {
      case Some(c) => SidecarMaintenance.planAppend(spark, cellsPath(table),
        c, replaced, replacedPrefixes)
      case None => SidecarMaintenance.planDelta(spark, cellsPath(table),
        BloomIndex.dataFilePaths(spark, table).toSet)
    }
    val freshAssigned =
      if (plan.fresh.isEmpty) None
      else {
        // footer-derived fresh bounds (zero jobs) let the guard run
        // its ONE-job fused form, which reads only the id column —
        // then the checkpoint materialization is pure overhead and
        // the staging write re-derives the (cheap, codegen) assign
        // from the corpus files. The aggregation fallback consumes
        // the assigned frame three times, so it keeps the checkpoint.
        val hint = SidecarMaintenance.footerIdRange(spark, plan.fresh, idCol)
        val fa0 = assignFiles(spark, table, plan.fresh, idCol, vecCol,
            ParquetMemo.metaDF(spark, centroidsPath(table)))
        val fa = if (hint.isDefined) fa0 else fa0.localCheckpoint(true)
        // guard BEFORE any mutation: a trip leaves the live index
        // untouched. Rows of vanished files don't count — a
        // purge-rewritten file's ids legitimately reappear fresh.
        guardFreshAgainstKept(spark, fa, cellsPath(table), plan, hint)
        Some(fa)
      }
    SidecarMaintenance.applyDelta(spark, cellsPath(table), plan,
      freshAssigned, Seq("__cell"), salted(_, writeSalt),
      statsCol = Some("vec_id"))
  }

  /** Repack the WHOLE cells sidecar (one journaled rewrite) —
    * O(sidecar) by design, an explicit offline layout reset. The
    * scheduled amortizer on streaming cadences is [[compactSmall]]. */
  def compact(spark: SparkSession, table: String, writeSalt: Int = 1): Unit =
    SidecarMaintenance.compact(spark, cellsPath(table), Seq("__cell"),
      statsCol = Some("vec_id"))(salted(_, writeSalt))

  /** Size-tiered repack of refresh-accumulated SMALL sidecar files
    * only ([[SidecarMaintenance.compactSmall]]) — O(accumulated
    * deltas), never O(sidecar): the cells sidecar carries full
    * embeddings (corpus-scale), so this is what a streaming cadence
    * may schedule without a periodic corpus rewrite. The merged tier
    * always lands UNSALTED (one file per cell): a salted merge would
    * re-split each tier into writeSalt sub-threshold files that land
    * back in the same size class — perpetual re-merge churn instead
    * of graduation. Refresh keeps its salt; the merge must not. */
  def compactSmall(
      spark: SparkSession,
      table: String,
      smallBytes: Long = 32L << 20): Unit =
    SidecarMaintenance.compactSmall(
      spark, cellsPath(table), Seq("__cell"), smallBytes,
      statsCol = Some("vec_id"))(salted(_, 1))

  /** Per-row nearest-centroid argmin as a Column: ONE
    * `least()` fold over the collected centroids — no join, no
    * window, no exchange. `least` over `struct(d, c)` compares d
    * first then c, so ties go to the lowest cell id — the same rule
    * KMeans transform applies at build time. Shared by
    * [[assignFiles]] (refresh path) and [[clusterAppend]]. */
  private[graft] def nearestCellCol(
      centRows: Array[org.apache.spark.sql.Row],
      vecCol: String): org.apache.spark.sql.Column = {
    require(centRows.nonEmpty, "nearestCellCol needs >= 1 centroid")
    val cands = centRows.map { r =>
      struct(
        VectorFunctions.l2Sq(col(vecCol),
          lit(r.getAs[Seq[Double]]("__centroid").toArray)).as("d"),
        lit(r.getAs[Int]("__cell")).as("c"))
    }.toIndexedSeq
    // least() needs >= 2 args; an nCells = 1 geometry is legal and
    // its single centroid needs no comparison at all
    (if (cands.length == 1) cands.head else least(cands: _*)).getField("c")
  }

  /** Nearest-centroid assignment for specific corpus files: each new
    * vector folds over the nCells collected centroids with the
    * codegen'd [[nearestCellCol]] argmin — narrow, map-side-only,
    * never materializing the delta-rows × nCells product (the prior
    * shape cross-joined broadcast centroids and ran a
    * `row_number()` window over (file, vec_id), a full shuffle of
    * the product and the refresh path's biggest avoidable constant).
    * Per-row, so an id appearing twice — in two fresh files OR twice
    * inside one file — keeps BOTH rows here, and the layout guard
    * sees and rejects it. */
  private[graft] def assignFiles(
      spark: SparkSession,
      table: String,
      paths: Seq[String],
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val centRows = centroids.collect()
    ParquetMemo.readFiles(spark, table, paths)
      .select(col("_metadata.file_path").as("file"),
        col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("__cell", nearestCellCol(centRows, "embedding"))
      .select("file", "vec_id", "embedding", "__cell")
  }

  /** The committed refs rows still BACKED by a live corpus file —
    * the kept side [[clusterAppend]]'s pre-append clash check runs
    * against (shared with [[LshIndex.clusterAppend]]). Rows of
    * vanished corpus files are dropped via one broadcast semi-join
    * on the current file list, mirroring
    * [[SidecarMaintenance.keptRows]]' vanish-aware rule on the
    * refresh path. */
  private[sinks] def clusterAppendKeptRefs(
      spark: SparkSession, dest: String, refsDir: String): DataFrame = {
    import spark.implicits._
    val current = BloomIndex.dataFilePaths(spark, dest)
    SidecarMaintenance.snapshotRead(spark, refsDir)
      .join(broadcast(current.toDF("file")), Seq("file"), "left_semi")
  }

  /** The family's layout contract: a vector's row must live in ONE
    * corpus data file (append new ids, purge-rewrite whole files). */
  private[sinks] def requireOneRowPerVector(
      rows: DataFrame, onTrip: => Unit): Unit = {
    val offenders = rows.groupBy("vec_id").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).limit(5).collect()
    if (offenders.nonEmpty) {
      onTrip
      require(offenders.isEmpty,
        s"vectors indexed more than once: ids " +
          s"${offenders.map(_.get(0)).mkString(", ")} — a vector's row " +
          "must live in ONE corpus data file (append new ids, " +
          "purge-rewrite whole files); compact, then rebuild")
    }
  }

  /** One-job fusion of the refresh guard's fresh-side statistics
    * (r18): the old shape ran THREE aggregation jobs over the fresh
    * batch (duplicate check, [[SidecarMaintenance.idRangeOf]] for
    * kept-file pruning, native-typed bounds for the kept-row filter)
    * plus the clash probe — this computes all three statistics in ONE
    * aggregation, then runs the same pruned clash probe. The
    * duplicate-offender collection (error path only) re-runs the old
    * query purely to name the ids in the failure message. Semantics
    * are identical to `requireNoVectorClash(fresh, keptRows(spark,
    * dir, plan, idRangeOf(fresh, "vec_id")))`. */
  private[sinks] def guardFreshAgainstKept(
      spark: SparkSession, fresh: DataFrame, dir: String,
      plan: SidecarMaintenance.DeltaPlan,
      freshIdRange: Option[(Long, Long)] = None): Unit = freshIdRange match {
    case Some((lo, hi)) =>
      // ONE-job form (r18): the fresh bounds came from the corpus
      // files' parquet footers ([[SidecarMaintenance.footerIdRange]] —
      // exact, driver-side, zero jobs), so the kept-file pruning and
      // the kept-side row-group filter need no bounds aggregation, and
      // the in-batch duplicate check and the fresh-vs-kept clash check
      // collapse into a single per-id aggregation: an id trips when it
      // occurs twice on the fresh side, or on both sides. The
      // null-id rule is unchanged — null ids only trip as FRESH
      // duplicates (equality joins never matched them before).
      val freshSide = fresh.select(col("vec_id"))
        .withColumn("__fresh", lit(1L))
      val both = SidecarMaintenance.keptRows(spark, dir, plan, freshIdRange) match {
        case Some(k) => freshSide.unionByName(
          k.select(col("vec_id"))
            .where(col("vec_id").between(lit(lo), lit(hi)))
            .withColumn("__fresh", lit(0L)))
        case None => freshSide
      }
      val offenders = both.groupBy("vec_id")
        .agg(sum(col("__fresh")).as("__nf"),
          sum(lit(1L) - col("__fresh")).as("__nk"))
        .where(col("__nf") > 1L ||
          (col("__nf") >= 1L && col("__nk") >= 1L && col("vec_id").isNotNull))
        .limit(5).collect()
      require(offenders.isEmpty,
        s"vectors indexed more than once: ids " +
          s"${offenders.map(_.get(0)).mkString(", ")} — a vector's row " +
          "must live in ONE corpus data file (append new ids, " +
          "purge-rewrite whole files); compact, then rebuild")
    case None => guardFreshAgainstKeptAgg(spark, fresh, dir, plan)
  }

  private def guardFreshAgainstKeptAgg(
      spark: SparkSession, fresh: DataFrame, dir: String,
      plan: SidecarMaintenance.DeltaPlan): Unit = {
    val g = fresh.groupBy("vec_id").agg(count(lit(1)).as("__n"))
    val Array(st) = g.agg(
      sum(when(col("__n") > 1, 1L).otherwise(0L)).as("dups"),
      count(lit(1)).as("n"),
      min(col("vec_id")).as("lo"), max(col("vec_id")).as("hi"),
      min(col("vec_id").cast("long")).as("llo"),
      max(col("vec_id").cast("long")).as("lhi"),
      sum(when(col("vec_id").cast("long").isNull, 1L).otherwise(0L))
        .as("badcast"))
      .collect()
    if (st.getLong(0) > 0L) requireOneRowPerVector(fresh, onTrip = ())
    if (st.getLong(1) == 0L) return // empty fresh batch: nothing to clash
    val idRange =
      if (st.getLong(6) > 0L || st.isNullAt(4)) None
      else Some((st.getLong(4), st.getLong(5)))
    val kept = SidecarMaintenance.keptRows(spark, dir, plan, idRange)
    if (kept.isEmpty || st.isNullAt(2)) return
    val clash = kept.get.select("vec_id")
      .where(col("vec_id").between(lit(st.get(2)), lit(st.get(3))))
      .join(broadcast(fresh.select("vec_id").distinct()),
        Seq("vec_id"), "left_semi")
      .limit(5).collect()
    require(clash.isEmpty,
      s"vectors indexed more than once: ids " +
        s"${clash.map(_.get(0)).mkString(", ")} — a vector's row " +
        "must live in ONE corpus data file (append new ids, " +
        "purge-rewrite whole files); compact, then rebuild")
  }

  /** Pre-append guard: the fresh batch must be duplicate-free both
    * within itself and against the rows staying in the index.
    *
    * A clash id lies inside the fresh batch's [min, max] by
    * definition, so that range is pushed as a filter on the kept
    * side — parquet row-group stats then skip every sidecar file
    * whose id range doesn't overlap the batch. Monotonic ingest ids
    * (the common case) make the guard read ~nothing instead of the
    * whole sidecar's id column per refresh. `keptRows` is None when
    * the sidecar carries no surviving rows at all (every corpus file
    * vanished) — nothing to clash with, only the batch-internal
    * check applies. */
  private[sinks] def requireNoVectorClash(
      freshRows: DataFrame, keptRows: Option[DataFrame]): Unit = {
    requireOneRowPerVector(freshRows, onTrip = ())
    if (keptRows.isEmpty) return
    val Array(bounds) = freshRows
      .agg(min(col("vec_id")).as("lo"), max(col("vec_id")).as("hi"))
      .collect()
    if (bounds.isNullAt(0)) return // empty or all-null fresh batch
    val clash = keptRows.get.select("vec_id")
      .where(col("vec_id").between(lit(bounds.get(0)), lit(bounds.get(1))))
      .join(broadcast(freshRows.select("vec_id").distinct()),
        Seq("vec_id"), "left_semi")
      .limit(5).collect()
    require(clash.isEmpty,
      s"vectors indexed more than once: ids " +
        s"${clash.map(_.get(0)).mkString(", ")} — a vector's row " +
        "must live in ONE corpus data file (append new ids, " +
        "purge-rewrite whole files); compact, then rebuild")
  }

  // ── embedding-free REFS variant ─────────────────────────────────
  // `_ivf_cells` duplicates every embedding (the sidecar IS the
  // corpus, re-shaped — ~1× corpus storage). `_ivf_refs` stores
  // (file, vec_id, __cell) only — a few percent of corpus bytes —
  // and [[topKRefs]] re-reads candidate vectors from the corpus
  // through ONE column-pruned join per probe. Same maintenance
  // discipline (journaled publish, O(delta) refresh, tiered
  // compaction); the storage-for-I/O trade mirrors
  // [[LshIndex.collectRefs]].

  private def saltedRefs(rows: DataFrame, writeSalt: Int): DataFrame =
    SidecarMaintenance.saltedByPartition(rows, "__cell",
      Seq("file", "vec_id", "__cell"), writeSalt)

  /** Bootstrap / rebuild of the refs sidecar — [[collect]] minus the
    * embedding column, same journaled publish. `centroids`, when
    * given, SKIPS the KMeans train and assigns against the provided
    * quantizer (nCells/seed ignored) — what [[clusterCorpus]] uses so
    * the refs cells and the file layout are the SAME geometry, not
    * two independently-trained quantizers that merely resemble each
    * other. */
  def collectRefs(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16,
      seed: Long = 42L,
      writeSalt: Int = 1,
      centroids: Option[DataFrame] = None): Unit = {
    val (cents, rows) = centroids match {
      case Some(c) =>
        (c, assignFiles(spark, table,
          BloomIndex.dataFilePaths(spark, table), idCol, vecCol, c)
          .drop("embedding"))
      case None =>
        val corpus = ParquetMemo.readDir(spark, table)
          .select(col("_metadata.file_path").as("file"),
            col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        val idx = IvfSearch.buildIndex(corpus, nCells, seed)
        (idx.centroids, idx.assigned.drop("embedding"))
    }
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = refsPath(table)
    SidecarMaintenance.recoverPublish(spark, dest)
    val next = s"$dest.next"
    fs.delete(new Path(next), true)
    val saltedRows = saltedRefs(rows, writeSalt)
    saltedRows
      .write.mode(SaveMode.Overwrite).partitionBy("__cell").parquet(next)
    cents.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$next/_centroids")
    requireOneRowPerVector(
      spark.read.schema(ParquetMemo.nullableTop(saltedRows.schema))
        .parquet(next),
      onTrip = { fs.delete(new Path(next), true) })
    SidecarMaintenance.publishDir(spark, dest)
  }

  /** O(delta) maintenance of the refs sidecar — [[refresh]] on the
    * embedding-free rows, frozen centroids. */
  def refreshRefs(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      writeSalt: Int = 1): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SidecarMaintenance.recoverPublish(spark, refsPath(table))
    Seq(refsCentroidsPath(table), refsPath(table)).foreach(p =>
      require(fs.exists(new Path(p)),
        s"no IVF refs index at $p — bootstrap with collectRefs()"))
    val plan = SidecarMaintenance.planDelta(spark, refsPath(table),
      BloomIndex.dataFilePaths(spark, table).toSet)
    val freshAssigned =
      if (plan.fresh.isEmpty) None
      else {
        val hint = SidecarMaintenance.footerIdRange(spark, plan.fresh, idCol)
        val fa0 = assignFiles(spark, table, plan.fresh, idCol, vecCol,
            ParquetMemo.metaDF(spark, refsCentroidsPath(table)))
          .drop("embedding")
        val fa = if (hint.isDefined) fa0 else fa0.localCheckpoint(true)
        guardFreshAgainstKept(spark, fa, refsPath(table), plan, hint)
        Some(fa)
      }
    SidecarMaintenance.applyDelta(spark, refsPath(table), plan,
      freshAssigned, Seq("__cell"), saltedRefs(_, writeSalt),
      statsCol = Some("vec_id"))
  }

  /** Size-tiered amortizer for the refs sidecar (unsalted merge —
    * see [[compactSmall]]). */
  def compactSmallRefs(
      spark: SparkSession,
      table: String,
      smallBytes: Long = 32L << 20): Unit =
    SidecarMaintenance.compactSmall(
      spark, refsPath(table), Seq("__cell"), smallBytes,
      statsCol = Some("vec_id"))(saltedRefs(_, 1))

  /** Materialize a CELL-CLUSTERED copy of the vector table at `dest`
    * — the layout operation that makes the refs variant's partial-
    * probe economics real: [[topKRefs]]' re-rank reads the candidate
    * FILES of the probed cells, and on a randomly-laid-out corpus
    * every file hosts every cell, so the "probed fraction" prunes
    * columns but not files. Clustering writes each cell's vectors
    * into contiguous files (range exchange on (cell, id), the
    * Z-ORDER-for-ANN analogue of [[Compaction]]'s z-order pass), so
    * a probe of nProbe/nCells cells reads ≈ that fraction of the
    * corpus in FILES too — at 100 TB the difference between a
    * probe-scaled read and a full-width one. One sampled-KMeans
    * train + ONE shuffle over the table; every column survives
    * verbatim. `filesPerCell` sizes output files (pick
    * ≈ corpusBytes / (nCells × 128 MB) in production). Builds the
    * `_ivf_refs` sidecar on the clustered copy against the SAME
    * trained quantizer, so refs cells and file layout share one
    * geometry by construction. An explicit
    * materialization to a NEW directory — no in-place swap, the
    * source table is never touched. */
  def clusterCorpus(
      spark: SparkSession,
      table: String,
      dest: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16,
      seed: Long = 42L,
      filesPerCell: Int = 1): Unit = {
    require(filesPerCell >= 1, s"filesPerCell ($filesPerCell) must be >= 1")
    require(nCells >= 2, // KMeans itself rejects k=1, loudly and early
      s"a clustered layout needs nCells >= 2, got $nCells")
    val corpus = spark.read.parquet(table)
    // one KMeans transform over the FULL row (every column survives;
    // no join, so duplicate ids can neither drop nor multiply rows —
    // the refs build's one-row-per-vector guard still vets them)
    val renamed =
      if (vecCol == "embedding") corpus
      else corpus.withColumnRenamed(vecCol, "embedding")
    val idx = IvfSearch.buildIndex(renamed, nCells, seed)
    val back =
      if (vecCol == "embedding") idx.assigned
      else idx.assigned.withColumnRenamed("embedding", vecCol)
    back
      .repartitionByRange(nCells * filesPerCell, col("__cell"), col(idCol))
      .sortWithinPartitions(col("__cell"), col(idCol))
      .drop("__cell")
      .write.mode(SaveMode.Overwrite).parquet(dest)
    // the refs build reuses THIS quantizer: refs cells and the file
    // layout are the same geometry by construction, not two
    // independently-trained lookalikes
    collectRefs(spark, dest, idCol, vecCol, nCells, seed,
      centroids = Some(idx.centroids))
  }

  /** Append a batch to a [[clusterCorpus]]-materialized copy WITHOUT
    * degrading its cell-clustered layout — the maintenance story
    * that keeps the partial-probe file pruning real under ingest:
    * the batch's rows assign against dest's FROZEN refs quantizer
    * (the same geometry the layout and the sidecar share), range-
    * exchange on (cell, id) into ≤ nCells × `filesPerCell`
    * cell-contiguous files, land as an append, and the refs sidecar
    * refreshes O(delta) against the same centroids. Each appended
    * batch adds at most nCells−1 extra (file, cell) incidences, so a
    * probe's candidate files stay ≈ the probed fraction of EVERY
    * batch generation — never the random-layout files × cells. The
    * per-row cell is ONE least() fold over the collected
    * centroids (nCells rows by contract — no join, no window, safe
    * under duplicate ids, which the pre-append clash check rejects
    * before the CORPUS mutates — the corpus append is un-journaled,
    * so a post-append guard alone would leave the duplicate parts
    * permanent; [[refreshRefs]]' guard still runs after as the
    * sidecar-side belt-and-braces). */
  def clusterAppend(
      spark: SparkSession,
      dest: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filesPerCell: Int = 1): Unit = {
    require(filesPerCell >= 1,
      s"filesPerCell ($filesPerCell) must be >= 1")
    val centRows = ParquetMemo.metaRows(spark, refsCentroidsPath(dest))._2
    require(centRows.nonEmpty, s"no refs quantizer at " +
      s"${refsCentroidsPath(dest)} — materialize with clusterCorpus()")
    // The corpus append is NOT journaled (nondeterministic part
    // names, no undo), so a duplicate-id batch must be rejected
    // BEFORE dest mutates — refreshRefs' guard alone would trip only
    // after the appended parts are already a permanent layout
    // violation with no idempotent sweep path. Check the batch
    // against the committed refs sidecar first, restricted to rows
    // whose corpus file still EXISTS — a purge-rewritten file's ids
    // legitimately reappear fresh (the same vanish-aware rule
    // refreshRefs' keptRows applies; the raw snapshot would falsely
    // reject them until a refresh ran). The corpus listing this
    // costs is one refreshRefs (below) pays anyway; the batch
    // id-range still pushes onto the refs scan.
    requireNoVectorClash(
      batch.select(col(idCol).as("vec_id")),
      Some(clusterAppendKeptRefs(spark, dest, refsPath(dest))))
    batch
      .withColumn("__cell", nearestCellCol(centRows, vecCol))
      .repartitionByRange(centRows.length * filesPerCell,
        col("__cell"), col(idCol))
      .sortWithinPartitions(col("__cell"), col(idCol))
      .drop("__cell")
      .write.mode(SaveMode.Append).parquet(dest)
    refreshRefs(spark, dest, idCol, vecCol)
  }

  /** Probe off the REFS sidecar: the probed cell set pushes as a
    * static partition filter exactly as in [[topK]], but the probe
    * yields candidate IDS only — their vectors come from ONE
    * column-pruned corpus pass joined on vec_id. The refs rows carry
    * their corpus `file`, so that pass reads ONLY the candidate
    * files (vec_id + embedding of a file subset reach the parquet
    * scan, nothing else) — at partial nProbe a corpus fraction in
    * both files and columns, so the re-rank reads scale with the
    * probe, not the corpus; the trade buys back the cells sidecar's
    * ~1× corpus storage duplication. */
  def topKRefs(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    // ONE committed-snapshot resolution serves both refs reads below:
    // the probe runs THROUGH a live refresh's commit window on the
    // pre-commit truth instead of refusing for its whole duration
    // ([[SidecarMaintenance.snapshotRead]])
    val refsSnap = SidecarMaintenance.snapshotRead(spark, refsPath(table))
    // centroids from the listing-signature memo (no read job), probes
    // collected ONCE: the prior shape paid a localCheckpoint job, a
    // distinct+collect job AND a broadcast-build job on the probe set
    // — which is driver-bounded by contract (queries × nProbe) and
    // becomes a LocalRelation, so the broadcast join side costs no
    // job at all. The ranking arithmetic stays in Spark, bit-for-bit.
    val cents = ParquetMemo.metaDF(spark, refsCentroidsPath(table))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val cellRank = Window.partitionBy(col("q_id"))
      .orderBy(col("__cdist").asc, col("__cell").asc)
    val probesPlan = q.crossJoin(broadcast(cents))
      .withColumn("__cdist", VectorFunctions.l2Sq(col("q_vec"), col("__centroid")))
      .withColumn("__cr", row_number().over(cellRank))
      .where(col("__cr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("__cell"))
    val probeRows = probesPlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probesPlan.schema)
    val probedCells: Array[Any] = probeRows.map(_.get(2)).distinct
    val candidates = refsSnap
      .where(col("__cell").isin(probedCells: _*))
      .select(col("vec_id").as("neighbor_id"), col("__cell"))
      .join(broadcast(probes), Seq("__cell"))
      .where(col("q_id") =!= col("neighbor_id"))
      .select("q_id", "q_vec", "neighbor_id")
    // the re-rank corpus read is FILE-PRUNED to the candidate files
    // (bounded by the probed cells' coverage — a corpus fraction at
    // partial nProbe), not a full column pass over the table; the
    // file set comes from its own partition-pruned refs scan so the
    // candidates plan keeps the __cell PartitionFilters visible.
    // A refs index stale w.r.t. a corpus DELETION may still name
    // vanished files — reconciled EXCEPTION-DRIVEN
    // ([[SidecarMaintenance.readCandidateFiles]]): the steady-state
    // probe pays zero extra metadata RPCs, and only an actually-
    // missing path triggers one batched corpus listing + retry.
    // Dropped files' candidates score absent, exactly as the
    // full-table read served them.
    val candFiles = refsSnap
      .where(col("__cell").isin(probedCells: _*))
      .select("file").distinct().as[String]
      .collect().toSeq.sorted
    val corpusRead =
      SidecarMaintenance.readCandidateFiles(spark, table, candFiles)
    if (corpusRead.isEmpty)
      // same schema as the non-empty path (q_id/neighbor_id take the
      // id column's type), just zero rows
      return probes.select(col("q_id"), col("q_id").as("neighbor_id"))
        .withColumn("rank", lit(0L)).limit(0)
    val corpus = corpusRead.get
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = candidates.join(corpus, Seq("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .select(col("q_id"), col("neighbor_id"), col("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank"))
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
    // committed-snapshot read: serves through a live commit window on
    // the pre-commit truth ([[SidecarMaintenance.snapshotRead]])
    val cellsSnap = SidecarMaintenance.snapshotRead(spark, cellsPath(table))
    // see [[topKRefs]]: memoized centroids + one probe collect replace
    // localCheckpoint + distinct-collect + broadcast-build jobs
    val cents = ParquetMemo.metaDF(spark, centroidsPath(table))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val cellRank = Window.partitionBy(col("q_id"))
      .orderBy(col("__cdist").asc, col("__cell").asc)
    val probesPlan = q.crossJoin(broadcast(cents))
      .withColumn("__cdist", VectorFunctions.l2Sq(col("q_vec"), col("__centroid")))
      .withColumn("__cr", row_number().over(cellRank))
      .where(col("__cr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("__cell"))
    val probeRows = probesPlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probesPlan.schema)
    val probedCells: Array[Any] = probeRows.map(_.get(2)).distinct
    val scored = cellsSnap
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
