package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** TTL retention as a METADATA-ONLY operation: on a hive-partitioned
  * table, expiring old data means deleting whole partition
  * directories — no data file is ever opened, decoded, or rewritten,
  * so at 100 TB the cost is O(partitions dropped), zero scan. This is
  * the reason time-organized lakes partition by ingestion date in the
  * first place; the row-level alternative ([[Purge]]) exists for keys
  * that do NOT align with the layout.
  *
  * The cutoff compares partition VALUES as strings — exact for the
  * zero-padded encodings date layouts use (`yyyy-MM`, `yyyy-MM-dd`,
  * fixed-width numerics); the caller owns that contract, same as with
  * every hive-layout tool here. Hive-escaped values are unescaped
  * before comparison. `__HIVE_DEFAULT_PARTITION__` (the null
  * partition) is never age-dropped — nulls have no age.
  *
  * Sidecar indexes (`_stats`, `_bloom`, `_invindex`) are untouched;
  * their file-set `refresh` reconciles vanished files on its next run
  * (the same contract as [[Purge]] rewrites). Readers racing the drop
  * see the usual file-source behavior for vanished files — schedule
  * retention like any other maintenance window.
  */
object Retention {

  /** Deletes every `partitionCol=<value>` directory with
    * `value < cutoff` (string compare, strictly below — the cutoff
    * partition itself survives). Returns the dropped values, sorted.
    * Fails loudly if the table has no hive layout on `partitionCol`
    * (a typo must not silently retain everything). */
  def dropPartitionsBelow(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String,
      cutoff: String): Seq[String] = {
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(table), s"no table at $tablePath")
    val prefix = s"$partitionCol="
    val parts = fs.listStatus(table).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
    require(parts.nonEmpty,
      s"$tablePath has no $prefix<value> hive partitions — wrong column or layout")
    val doomed = parts
      .map(st => st.getPath)
      .flatMap { p =>
        val raw = p.getName.stripPrefix(prefix)
        val value = java.net.URLDecoder.decode(raw, "UTF-8")
        if (value != "__HIVE_DEFAULT_PARTITION__" && value < cutoff)
          Some(value -> p)
        else None
      }
    doomed.foreach { case (_, p) =>
      if (!fs.delete(p, true))
        sys.error(s"retention failed: could not drop $p")
    }
    doomed.map(_._1).sorted
  }
}
