package org.apache.spark.graftglue

import org.apache.spark.SparkContext

/** Access to `private[spark]` runtime surface the engine's tests
  * need — same escape-hatch pattern as the sql-side `ColumnGlue`. */
object SparkGlue {
  /** Blocks until every queued listener event is delivered — makes
    * SparkListener-based metric accumulation deterministic. */
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
