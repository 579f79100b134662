package graft.streaming

import graft.operators.{DateQuality, IngestTimestamp, SurrogateKey}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface (SURVEY.md §2.8 notes the reference
  * has NO streaming — `timestamp_kafka` only nods at an upstream CDC
  * feed. These operators are the engine's forward-looking streaming
  * analogs of the batch flows, built on the standard
  * readStream → transform → writeStream shape.)
  *
  * Scale posture: all stateful operators are keyed (state partitions
  * by the grouping key), watermarks bound state size, and the
  * transforms reuse the exact batch expressions (T1-T3 are pure
  * column operations — identical semantics batch or streaming).
  */
object StreamingOps {

  /** Streaming variant of the promote transform chain: T1 sk →
    * T2 ingest timestamp → T3 quality repair → watermarked streaming
    * dedup on sk.
    *
    * The watermark MUST ride on a real event-time column from the
    * data (`eventTimeCol`) — watermarking on the batch-constant
    * ingest stamp would pin the watermark forever and grow dedup
    * state without bound. `dropDuplicatesWithinWatermark` then keeps
    * per-sk state only inside the watermark horizon: bounded state at
    * any throughput. The ingest stamp itself uses
    * `current_timestamp()` (evaluated per micro-batch, the streaming
    * analog of the reference's per-batch wall-clock literal) rather
    * than the injectable batch clock, which is fixed at plan time. */
  def streamingPromote(
      stream: DataFrame,
      skIds: Seq[String],
      eventTimeCol: String,
      hyphen: Boolean = false,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val withSk = SurrogateKey.addSk(stream, skIds, hyphen)
    val stamped = withSk.withColumn(IngestTimestamp.ColumnName,
      date_trunc("second", current_timestamp()))
    val repaired = DateQuality.repair(stamped)
    repaired
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("sk")
  }

  /** Event-time windowed aggregation with late-data handling:
    * tumbling or sliding counts/sums per event type. */
  def windowedEventStats(
      events: DataFrame,
      windowLength: String = "5 minutes",
      slide: Option[String] = None,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val w = slide.fold(window(col("ts"), windowLength))(s =>
      window(col("ts"), windowLength, s))
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: per-user running
    * aggregate surviving across micro-batches (the
    * `KeyValueGroupedDataset` state API the batch engine can't
    * express). State is keyed, so it partitions across executors; a
    * production deployment would add an event-time timeout to evict
    * idle keys (processing-time timeouts force continuous empty
    * micro-batches, which also makes synchronous testing impossible). */
  def runningUserStats(
      spark: SparkSession,
      events: Dataset[Event]): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(userId, n, v)
          state.update(next)
          next
      }
  }

  /** Streaming WORK-zone ingestion: the K1 append flow as a stream —
    * files landing in the WORK directory are discovered incrementally
    * (`maxFilesPerTrigger` paces recovery after downtime). */
  def workStream(
      spark: SparkSession,
      workPath: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(workPath)
}
