package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape: windowed
  * aggregation with watermarking, and stateful sessionization via
  * flatMapGroupsWithState — the incremental counterparts of q19/q35.
  *
  * The reference has no streaming surface (SURVEY §2.7); this is the
  * north-star extension. Batch parquet drives the stream in tests via
  * Trigger.AvailableNow + a memory sink, which is also how the operators
  * would be backfilled at scale (same code, bounded input).
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (parquet TIMESTAMP(NANOS) read w/ nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over an events parquet directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .format("parquet")
      .option("path", dir)
      .load()
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window counts/sums per event type with a watermark: the
    * incremental form of q19. Watermark bounds state: at 100 TB/day the
    * state store holds only windows newer than (max event time - delay). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval self-join: pairs of same-user events where
    * the second falls within `window` after the first. Watermarks bound
    * the join state on both sides — without them the state grows
    * unboundedly at any sustained rate. Batch twin: q43_interval_join. */
  def intervalSelfJoin(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val a = events.select(col("event_id").as("id_a"), col("user_id"), col("ts").as("ts_a"))
      .withWatermark("ts_a", watermarkDelay)
    val b = events.select(col("event_id").as("id_b"),
      col("user_id").as("user_b"), col("ts").as("ts_b"))
      .withWatermark("ts_b", watermarkDelay)
    a.join(b,
      col("user_id") === col("user_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES") &&
        col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** Streaming exact-dedup on event id with watermark-bounded state:
    * the incremental form of q26's hash-dedup. State holds only ids
    * newer than (max event time - delay) — bounded at any corpus rate. */
  def dedupedStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  // Timestamps kept as-is (micros precision); a millis round-trip would
  // shift session boundaries vs the batch query
  case class SessionState(start: Timestamp, end: Timestamp, n: Int, value: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, session_value: Double)

  /** Stateful sessionization (gap = 30 min): flatMapGroupsWithState with
    * a processing-time timeout emitting closed sessions. The q35 batch
    * window query is the backfill-equivalent; this form is incremental
    * and state-bounded (one small SessionState per active user). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)(
      implicit outEnc: org.apache.spark.sql.Encoder[SessionOut],
      stEnc: org.apache.spark.sql.Encoder[SessionState]): Dataset[SessionOut] = {

    def flush(userId: Long, st: SessionState): SessionOut =
      SessionOut(userId, st.start, st.end, st.n, st.value)

    events
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              if (cur == null) cur = SessionState(e.ts, e.ts, 1, e.value)
              else if (e.ts.getTime - cur.end.getTime > gapMs) {
                closed += flush(userId, cur)
                cur = SessionState(e.ts, e.ts, 1, e.value)
              } else {
                cur = SessionState(cur.start, e.ts, cur.n + 1, cur.value + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }
}
