package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * - shuffle partitions sized to the local core count (the 200
  *   default is wrong for local mode; on a real cluster this knob is
  *   deployment config),
  * - AQE on (runtime re-plan: skew-join splitting, partition
  *   coalescing — the 100 TB posture assumes it),
  * - UTC session timezone (oracle parity),
  * - `nanosAsLong`: parquet TIMESTAMP(NANOS) columns (the `events`
  *   fixture) read as nanos-since-epoch longs, which
  *   `Tables.normalizeNanos` converts losslessly to TimestampType —
  *   Spark has no native ns timestamp.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // MinHash signatures aggregate 128 columns at once; the default
      // maxFields=100 would silently drop those plans out of
      // whole-stage codegen (interpreted row-at-a-time, ~4x slower).
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
