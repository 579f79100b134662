package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** §2.6 dual logging (reference `shared_etls/etls/cloud_utils.py:20-93`):
  * every message echoes to the driver console immediately AND
  * accumulates in an in-memory batch; `flush()` persists the batch as
  * ONE new timestamped file under the lake's log prefix.
  *
  * The reference re-uploaded the ENTIRE accumulated log to the bucket
  * on EVERY message — O(n²) bytes over a job's lifetime (SURVEY.md
  * §2.6 calls this out as the one behavior NOT to reproduce). Here
  * each message is written to storage exactly once: a flush appends
  * nothing and rewrites nothing, it creates a fresh
  * `<job>_<millis>_<seq>.log` object — the append-free pattern that
  * object stores (the reference's deployment target) actually
  * support.
  *
  * Failures to persist are swallowed after a console note — logging
  * must never fail the job it observes (same posture as the
  * reference's bare bucket upload and the HTTP status reporter).
  */
final class LakeLogger(
    hadoopConf: Configuration,
    logDir: String,
    jobName: String) extends AutoCloseable {

  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private var seq = 0

  private def log(level: String, msg: String): Unit = synchronized {
    val line = s"${java.time.LocalDateTime.now()} [$level] $msg"
    // dual sink #1: immediate console echo (the reference tees
    // stdout/stderr); ERROR goes to stderr like the original stream
    if (level == "ERROR") Console.err.println(s"[$jobName] $line")
    else Console.out.println(s"[$jobName] $line")
    buf += line
  }

  def info(msg: String): Unit = log("INFO", msg)
  def warn(msg: String): Unit = log("WARN", msg)
  def error(msg: String): Unit = log("ERROR", msg)

  /** Persist the pending batch as one new log object; no-op when
    * nothing is pending. */
  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      try {
        val dir = new Path(logDir)
        val fs = dir.getFileSystem(hadoopConf)
        if (!fs.exists(dir)) fs.mkdirs(dir)
        val file = new Path(dir,
          f"${jobName}_${System.currentTimeMillis()}_$seq%04d.log")
        val out = fs.create(file, false)
        try out.write((buf.mkString("\n") + "\n").getBytes(UTF_8))
        finally out.close()
      } catch {
        case scala.util.control.NonFatal(e) =>
          Console.err.println(s"[$jobName] log flush to $logDir failed: ${e.getMessage}")
      }
      seq += 1
      buf.clear()
    }
  }

  override def close(): Unit = flush()
}
