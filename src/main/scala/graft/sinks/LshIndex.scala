package graft.sinks

import graft.functions.VectorFunctions
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED hyperplane-LSH ANN index — the third member of the
  * persisted ANN family ([[IvfIndex]] data-adaptive cells,
  * [[PqIndex]] compressed codes, this one TRAINING-FREE buckets):
  *
  *  - `_lsh_meta`: one row (planes, seed) — the whole "model". The
  *    hyperplanes derive deterministically from (planes, seed)
  *    inside the codegen'd signature expression, so refresh carries
  *    NO learned state at all: any machine can extend the index
  *    from the metadata row alone.
  *  - `_lsh_buckets`: (file, vec_id, embedding, bucket),
  *    DIRECTORY-PARTITIONED BY BUCKET (2^planes directories) — a
  *    probe pushes its bucket set as a static partition filter and
  *    reads only the probed directories.
  *
  * [[refresh]] is file-set arithmetic: vanished corpus files' rows
  * drop, covered files carry, new files' vectors get their signature
  * in one codegen'd pass (no refit — there is nothing to fit).
  *
  * Exactness contract matches [[graft.ext.SimilaritySearch.lshTopK]]:
  * `probeRadius = planes` probes every bucket of the partition, so
  * top-k is exact brute force evaluated through the LSH machinery —
  * the declared queries grade build and refresh at that setting;
  * partial-radius recall is the approximate regime. */
object LshIndex {

  private[graft] def metaPath(table: String): String = s"$table/_lsh_meta"
  private[graft] def bucketsPath(table: String): String = s"$table/_lsh_buckets"

  /** Bootstrap / rebuild: one signature pass, both sidecars. */
  def collect(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      planes: Int = 4,
      seed: Long = 0L): Unit = {
    import spark.implicits._
    require(planes >= 1 && planes <= 12,
      s"bucket directories number 2^planes; planes=$planes")
    Seq((planes, seed)).toDF("planes", "seed").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(metaPath(table))
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeBuckets(spark,
      signFiles(spark, table, BloomIndex.dataFilePaths(spark, table),
        idCol, vecCol, planes, seed),
      bucketsPath(table), fs)
  }

  private[graft] def readMeta(spark: SparkSession, table: String): (Int, Long) = {
    val r = spark.read.parquet(metaPath(table)).head()
    (r.getAs[Int]("planes"), r.getAs[Long]("seed"))
  }

  /** Incremental maintenance — pure file-set arithmetic; the
    * "model" is the (planes, seed) metadata row. */
  def refresh(
      spark: SparkSession,
      table: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(metaPath(table), bucketsPath(table)).foreach(p =>
      require(fs.exists(new Path(p)),
        s"no LSH index at $p — bootstrap with collect()"))
    val (planes, seed) = readMeta(spark, table)
    val current = BloomIndex.dataFilePaths(spark, table).toSet
    val buckets = spark.read.parquet(bucketsPath(table)).localCheckpoint(true)
    val indexed = buckets.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (current -- indexed).toSeq.sorted
    val kept = buckets.where(col("file").isin(current.toSeq: _*))
      .select("file", "vec_id", "embedding", "bucket")
    val merged =
      if (fresh.isEmpty) kept
      else kept.unionByName(
        signFiles(spark, table, fresh, idCol, vecCol, planes, seed))
    writeBuckets(spark, merged, bucketsPath(table), fs)
  }

  private def signFiles(
      spark: SparkSession,
      table: String,
      paths: Seq[String],
      idCol: String,
      vecCol: String,
      planes: Int,
      seed: Long): DataFrame =
    spark.read.option("basePath", table).parquet(paths: _*)
      .select(col("_metadata.file_path").as("file"),
        col(idCol).as("vec_id"), col(vecCol).as("embedding"),
        VectorFunctions.hyperplaneSignature(col(vecCol), planes, seed)
          .as("bucket"))

  private def writeBuckets(
      spark: SparkSession,
      rows: DataFrame,
      dest: String,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    rows.select("file", "vec_id", "embedding", "bucket")
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"$dest.next")
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

  /** Multi-probe search off the persisted buckets: each query probes
    * every bucket within Hamming radius `probeRadius` of its home
    * signature; the probed bucket set (bounded by queries × the
    * Hamming-ball size) pushes as a STATIC partition filter. */
  def topK(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      k: Int,
      probeRadius: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (planes, seed) = readMeta(spark, table)
    require(probeRadius >= 0 && probeRadius <= planes,
      s"probeRadius ($probeRadius) must be in [0, planes=$planes]")
    val masks = (0 until (1 << planes))
      .filter(m => java.lang.Integer.bitCount(m) <= probeRadius)
    val probes = expr(
      s"transform(array(${masks.mkString(",")}), m -> sig0 ^ CAST(m AS BIGINT))")
    val q = queries
      .withColumn("sig0",
        VectorFunctions.hyperplaneSignature(col(vecCol), planes, seed))
      .withColumn("bucket", explode(probes))
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("bucket"))
      .localCheckpoint(true) // filter source AND join side
    // partition-column type inference reads `bucket=N` directories
    // back as INTEGER; the probe literals must match that type or the
    // implicit cast wraps the partition column and kills the pruning
    val probedBuckets = q.select("bucket").distinct()
      .collect().map(_.getLong(0).toInt)
    val scored = spark.read.parquet(bucketsPath(table))
      .where(col("bucket").isin(probedBuckets: _*))
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_vec"), col("bucket"))
      .join(broadcast(q), Seq("bucket"))
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
