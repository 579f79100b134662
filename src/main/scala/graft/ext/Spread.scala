package graft.ext

import org.apache.spark.sql.DataFrame

/** Conditional pre-spread for CPU-heavy per-row stages (shingling,
  * token voting): a small corpus file arrives as one input partition,
  * which would serialize the work onto a single core — but a wide
  * production scan already has the parallelism, and an unconditional
  * `repartition` there is a full corpus reshuffle for nothing.
  *
  * The probe itself is not free: `df.rdd.getNumPartitions` forces
  * physical planning, and under AQE materializes upstream exchanges
  * (runs real jobs). Cheap for a leaf file scan — which is the
  * intended call site — but NEVER probe a post-join/post-shuffle
  * subtree; those callers already know they're wide and must pass an
  * explicit no-spread flag instead (see `MinHashLSH.shingleRows`). */
object Spread {
  def ifNarrow(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism)
    else df
  }
}
