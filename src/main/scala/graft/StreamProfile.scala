package graft

import scala.collection.mutable
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev harness (not part of the bench contract): run one declared
  * query with a [[StreamingQueryListener]] attached and print every
  * micro-batch's `durationMs` breakdown — triggerExecution,
  * latestOffset, getBatch, queryPlanning, walCommit, commitOffsets,
  * addBatch. [[JobProfile]] shows WHERE jobs run and how big the
  * gaps between them are; this shows what the streaming ENGINE spent
  * those gaps on (offset/commit log writes, source planning) versus
  * our foreachBatch body (addBatch).
  *
  * Usage: runMain graft.StreamProfile <queryName> [sfDir] [cpus]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.core.Sessions.local(cpus)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val fn = SparkEntry.queries(name)

    // warm pass (page cache, codegen)
    fn(spark, sfDir).count()
    graft.core.Sessions.settle(spark)

    val lines = mutable.ArrayBuffer.empty[String]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        lines.synchronized {
          val p = e.progress
          val durs = p.durationMs
          import scala.jdk.CollectionConverters._
          val d = durs.asScala.toSeq.sortBy(-_._2).map {
            case (k, v) => f"$k=$v%d" }.mkString(" ")
          lines += f"BATCH ${p.batchId}%3d rows=${p.numInputRows}%7d  $d"
        }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)
    println(f"STREAMPROFILE $name rows=$n total=$total%.3f s batches=${lines.size}")
    lines.foreach(println)
    spark.stop()
  }
}
