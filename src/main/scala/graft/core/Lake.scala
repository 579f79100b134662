package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Two-zone lake addressing (SURVEY.md §1.1).
  *
  * The reference addresses every table as `(environment, zone,
  * namespace, dataset)` through its proprietary wrapper (reference
  * `shared_etls/etls/utils.py:117-124`); WORK is append-only staging,
  * TRUSTED is the merged/deduped curated zone
  * (`cloud_utils.py:459-467`, `:515-524`). We reproduce the observable
  * behavior over any Hadoop-compatible filesystem.
  */
sealed abstract class Zone(val name: String)
object Zone {
  case object Work extends Zone("work")
  case object Trusted extends Zone("trusted")
}

final case class DatasetRef(
    environment: String,
    namespace: String,
    dataset: String)

/** Resolves (ref, zone) → filesystem path under a configurable root. */
final case class LakePaths(root: String) {
  def path(ref: DatasetRef, zone: Zone): String =
    s"$root/${ref.environment}/${zone.name}/${ref.namespace}/${ref.dataset}"
  def work(ref: DatasetRef): String = path(ref, Zone.Work)
  def trusted(ref: DatasetRef): String = path(ref, Zone.Trusted)
}

/** Bucket-lifecycle surface of the reference (exists / create /
  * clear — `cloud_utils.py:96-373`), realized over Hadoop
  * `FileSystem` so the same code runs on HDFS/S3A/GCS/local.
  *
  * Cloud control-plane seam: every lifecycle op first consults
  * [[ObjectStoreAdapters.route]] — a path whose URI scheme has a
  * registered [[ObjectStoreAdapter]] is decomposed into
  * (bucket = authority, prefix = path) and served by the adapter
  * (real SDK clients, auth, region pinning, retry policy), exactly
  * as the reference's lifecycle calls go through per-cloud clients
  * while Spark handles the data I/O. Unregistered schemes and bare
  * paths keep the Hadoop behavior, so the seam is inert until a
  * deployment opts in. ([[dirBytes]] stays FS-only: it is the
  * spec/witness footprint measure, not a lifecycle call.)
  */
final class LakeStorage(conf: Configuration) {
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(path: String): Boolean =
    ObjectStoreAdapters.route(path) match {
      case Some((a, bucket, prefix)) =>
        if (prefix.isEmpty) a.bucketExists(bucket)
        else a.prefixExists(bucket, prefix)
      case None => val p = new Path(path); fs(p).exists(p)
    }

  def create(path: String): Unit =
    ObjectStoreAdapters.route(path) match {
      case Some((a, bucket, prefix)) =>
        // object stores have no directories: creating a dataset path
        // means ensuring its BUCKET exists (keys appear on write).
        // Idempotent like mkdirs — an existing bucket is a no-op, so
        // real adapters' create-conflict (409) never surfaces here
        val _ = prefix
        if (!a.bucketExists(bucket)) a.createBucket(bucket)
      case None => val p = new Path(path); fs(p).mkdirs(p); ()
    }

  /** Recursive bytes-on-disk under `path`, local-FS `.crc` shadows
    * excluded (they don't exist on real lakes) — the storage-footprint
    * measure the zstd-dict witnesses and specs share. */
  def dirBytes(path: String): Long = {
    val p = new Path(path)
    val it = fs(p).listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val s = it.next()
      if (!s.getPath.getName.endsWith(".crc")) total += s.getLen
    }
    total
  }

  /** K3 dataset truncation (destructive re-init): recursive delete of
    * every object under the prefix — reference
    * `cloud_utils.py:172-247` iterates blobs and deletes each; one
    * recursive FS delete is the scalable equivalent. */
  def truncate(path: String): Unit =
    ObjectStoreAdapters.route(path) match {
      case Some((a, bucket, prefix)) => a.deletePrefix(bucket, prefix)
      case None =>
        val p = new Path(path)
        val f = fs(p)
        if (f.exists(p)) { f.delete(p, true); () }
    }

  /** `clear_current_bucket_or_create_a_new_bucket`
    * (`cloud_utils.py:315-373`): wipe if present, else create. On an
    * adapter-routed path this is literally the reference's composite —
    * bucket exists ⇒ clear the dataset prefix, absent ⇒ create the
    * bucket (the first write materializes the keys). */
  def clearOrCreate(path: String): Unit =
    ObjectStoreAdapters.route(path) match {
      case Some((a, bucket, prefix)) =>
        if (a.bucketExists(bucket)) a.deletePrefix(bucket, prefix)
        else a.createBucket(bucket)
      case None =>
        truncate(path)
        create(path)
    }
}

object LakeStorage {
  def apply(spark: SparkSession): LakeStorage =
    new LakeStorage(spark.sparkContext.hadoopConfiguration)
}
