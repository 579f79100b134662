package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Object-store bucket-lifecycle ADAPTER SEAM.
  *
  * The reference drives its two clouds with per-cloud SDK clients —
  * `cloud_utils.py:96-124` (GCS `storage.Client().create_bucket`,
  * region-pinned), `:126-153` (S3-style `create_bucket`), `:250-313`
  * (`head_bucket` / `bucket.exists()`), `:172-247` (clear = list every
  * object under the DATASET PREFIX and delete each), composed by
  * `clear_current_bucket_or_create_a_new_bucket` (`:315-373`: bucket
  * exists ⇒ clear the dataset prefix, else ⇒ create the bucket). The
  * engine abstracts the same surface over Hadoop `FileSystem`
  * ([[LakeStorage]]) — correct for HDFS/S3A/GCS connectors, but it
  * left no seam a deployment could drop the REAL cloud SDK into for
  * the control-plane calls (auth, region pinning, retry policy,
  * head-bucket semantics the FS connectors don't expose).
  *
  * This trait is that seam. [[LakeStorage]] routes its lifecycle ops
  * (exists / create / truncate / clearOrCreate) through the adapter
  * registered for the path's URI scheme; unregistered schemes (and
  * every bare path) keep the Hadoop behavior, so nothing changes until
  * a deployment opts in. Data I/O is deliberately NOT routed — exactly
  * like the reference, where the SDK clients manage bucket lifecycle
  * while Spark reads/writes the data through its own connectors.
  *
  * Dropping a real cloud in is a config swap, no engine change:
  * {{{
  * ObjectStoreAdapters.register("gs", new ObjectStoreAdapter {
  *   private val client = StorageOptions.getDefaultInstance.getService
  *   def bucketExists(b: String) = client.get(b) != null
  *   def createBucket(b: String) = {
  *     client.create(BucketInfo.newBuilder(b).setLocation("us-east1").build); ()
  *   }
  *   def prefixExists(b: String, p: String) =
  *     client.list(b, BlobListOption.prefix(p), BlobListOption.pageSize(1))
  *       .iterateAll.iterator.hasNext
  *   def deletePrefix(b: String, p: String) =
  *     client.list(b, BlobListOption.prefix(p)).iterateAll
  *       .forEach(blob => blob.delete())
  * })
  * }}}
  *
  * Scale note: [[ObjectStoreAdapter.deletePrefix]] must paginate to
  * exhaustion. The reference's S3-style clear reads ONE
  * `list_objects_v2` page (`cloud_utils.py:212-247`) — a silent
  * 1000-key truncation that leaves debris under any real dataset.
  * That bug is deliberately NOT reproduced (same policy as the O(n²)
  * log re-upload): adapters own complete deletion, and the spec's
  * fake store verifies clearing past its page size.
  */
trait ObjectStoreAdapter {

  /** Reference `bucket_exists` (`cloud_utils.py:250-313`):
    * head-bucket / `bucket.exists()` — never throws for plain
    * absence. */
  def bucketExists(bucket: String): Boolean

  /** Reference `create_gcp_bucket` / `create_mgc_bucket`
    * (`cloud_utils.py:96-153`) — region/auth policy lives in the
    * adapter. */
  def createBucket(bucket: String): Unit

  /** Any object under `prefix`? (One single-key list on a real
    * store.) */
  def prefixExists(bucket: String, prefix: String): Boolean

  /** Delete EVERY object under `prefix`, paginating to exhaustion
    * (reference `clear_dataset_inside_bucket_*`,
    * `cloud_utils.py:172-247` — minus its single-page truncation
    * bug). Deleting an absent prefix is a no-op. */
  def deletePrefix(bucket: String, prefix: String): Unit
}

/** Classified adapter failure: `statusCode` carries the store's HTTP
  * status so the retry policy can tell transient (429/5xx) from
  * permanent (403/404) without parsing SDK-specific exceptions. */
final case class ObjectStoreException(
    statusCode: Int,
    msg: String,
    cause: Throwable = null)
  extends RuntimeException(s"[$statusCode] $msg", cause)

/** Bounded-backoff retry DECORATOR over any adapter — the
  * control-plane hardening the reference leaves to luck (its lifecycle
  * calls log and re-raise on the first failure,
  * `cloud_utils.py:120-124`). Transient failures (429 / 5xx
  * [[ObjectStoreException]]s and bare `IOException`s by default) retry
  * up to `maxAttempts` with exponential backoff; everything else —
  * auth denials, missing buckets — propagates immediately. The sleeper
  * is injectable so specs witness the schedule without real waiting.
  */
final class RetryingObjectStore(
    underlying: ObjectStoreAdapter,
    maxAttempts: Int = 4,
    baseDelayMs: Long = 100L,
    isTransient: Throwable => Boolean = RetryingObjectStore.defaultTransient,
    sleep: Long => Unit = Thread.sleep)
  extends ObjectStoreAdapter {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  private def attempt[A](op: String)(body: => A): A = {
    var n = 0
    while (true) {
      n += 1
      try return body
      catch {
        // fatal VM errors and interrupts propagate raw — wrapping
        // (or worse, sleeping on) them loses the type frameworks
        // special-case and consumes the interrupt
        case e: Throwable
            if n < maxAttempts && scala.util.control.NonFatal(e) &&
              isTransient(e) =>
          sleep(baseDelayMs << (n - 1))
        case e: Throwable if scala.util.control.NonFatal(e) =>
          throw new ObjectStoreException(
            e match { case o: ObjectStoreException => o.statusCode case _ => 0 },
            s"$op failed after $n attempt(s): ${e.getMessage}", e)
      }
    }
    sys.error("unreachable")
  }

  def bucketExists(bucket: String): Boolean =
    attempt(s"bucketExists($bucket)")(underlying.bucketExists(bucket))
  def createBucket(bucket: String): Unit =
    attempt(s"createBucket($bucket)")(underlying.createBucket(bucket))
  def prefixExists(bucket: String, prefix: String): Boolean =
    attempt(s"prefixExists($bucket/$prefix)")(
      underlying.prefixExists(bucket, prefix))
  def deletePrefix(bucket: String, prefix: String): Unit =
    attempt(s"deletePrefix($bucket/$prefix)")(
      underlying.deletePrefix(bucket, prefix))
}

object RetryingObjectStore {
  /** 429 (throttle) and 5xx (server) retry; 4xx (auth/absence) and
    * everything classified don't. Bare IOExceptions are the network's
    * transient shape. */
  def defaultTransient(e: Throwable): Boolean = e match {
    case ObjectStoreException(code, _, _) => code == 429 || code >= 500
    case _: java.io.IOException => true
    case _ => false
  }
}

/** Scheme → adapter registry, the [[graft.sources.DocStoreAdapters]]
  * pattern on the storage side. [[LakeStorage]] consults it per path:
  * a registered scheme's lifecycle ops go to the adapter, everything
  * else stays on Hadoop `FileSystem`. */
object ObjectStoreAdapters {
  private val adapters =
    new java.util.concurrent.ConcurrentHashMap[String, ObjectStoreAdapter]()

  def register(scheme: String, adapter: ObjectStoreAdapter): Unit = {
    adapters.put(scheme.toLowerCase, adapter); ()
  }
  def unregister(scheme: String): Unit = {
    adapters.remove(scheme.toLowerCase); ()
  }
  def forScheme(scheme: String): Option[ObjectStoreAdapter] =
    Option(scheme).flatMap(s => Option(adapters.get(s.toLowerCase)))

  /** (adapter, bucket = URI authority, prefix = path sans leading
    * slash) when the path's scheme is registered — the
    * `scheme://bucket/prefix` decomposition every object store
    * shares. Non-empty prefixes are DELIMITER-TERMINATED (`ds/table`
    * → `ds/table/`) before reaching the adapter: raw key-prefix
    * matching would make `truncate(…/ds/table)` also delete a
    * sibling `ds/table_v2`'s objects and `exists(…/ds/tab)` report a
    * dataset that does not exist — the Hadoop branch's
    * exact-directory semantics are the contract. */
  def route(path: String): Option[(ObjectStoreAdapter, String, String)] = {
    if (adapters.isEmpty) return None // fast path: seam not in use
    val uri = new Path(path).toUri
    for {
      adapter <- forScheme(uri.getScheme)
      bucket <- Option(uri.getAuthority).filter(_.nonEmpty)
    } yield {
      val raw = Option(uri.getPath).getOrElse("").stripPrefix("/")
      (adapter, bucket, if (raw.isEmpty) raw else s"$raw/")
    }
  }
}

/** Reference `build_bucket_name` (`cloud_utils.py:155-170`): bucket =
  * `<prefix><namespace>`, with underscores hyphenated for stores whose
  * bucket grammar forbids them (the reference's S3-style cloud). */
object BucketNames {
  def build(prefix: String, namespace: String, hyphenate: Boolean): String = {
    val name = s"$prefix$namespace"
    if (hyphenate) name.replace('_', '-') else name
  }
}

/** Hadoop-`FileSystem` realization of the adapter — the default
  * behavior [[LakeStorage]] always had, expressed through the seam so
  * one spec grades both paths: a "bucket" is a root directory under
  * `root`, a prefix is a subpath, deletion is one recursive FS call.
  */
final class HadoopFsBucketAdapter(conf: Configuration, root: String)
  extends ObjectStoreAdapter {
  private def p(bucket: String, prefix: String = ""): Path =
    if (prefix.isEmpty) new Path(s"$root/$bucket")
    else new Path(s"$root/$bucket/$prefix")
  private def fs(path: Path) = path.getFileSystem(conf)

  def bucketExists(bucket: String): Boolean =
    { val x = p(bucket); fs(x).exists(x) }
  def createBucket(bucket: String): Unit =
    { val x = p(bucket); fs(x).mkdirs(x); () }
  def prefixExists(bucket: String, prefix: String): Boolean =
    { val x = p(bucket, prefix); fs(x).exists(x) }
  def deletePrefix(bucket: String, prefix: String): Unit = {
    val x = p(bucket, prefix)
    val f = fs(x)
    if (f.exists(x)) { f.delete(x, true); () }
  }
}
