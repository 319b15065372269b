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

  /** Event schema with `ts` in the physical type the source directory
    * actually carries — testdata generations have shipped `ts` as both
    * TIMESTAMP(NANOS) (surfacing as LongType under `nanosAsLong`) and
    * TIMESTAMP(MICROS, no zone) (surfacing as TimestampNTZType); a
    * streaming source schema must match the files, so it is probed
    * from the directory's parquet footer at plan time (no job). */
  def eventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over an events parquet directory.
    * `maxFilesPerTrigger` caps files per micro-batch — tests use 1 to
    * force one batch per staged file (deterministic watermark steps).
    * `ts` is normalized to a UTC-instant micros TimestampType exactly
    * as the batch reader (graft.queries.Tables.t) does, so stream and
    * batch twins stay bit-identical across testdata generations.
    *
    * The physical `ts` type comes from `tsType` when given; otherwise
    * it is probed from the directory's parquet footers at plan time
    * (no job). A watch directory that is still EMPTY at stream start
    * cannot be probed — the probe then falls back to the current
    * testdata generation's micros-NTZ; a producer that will write the
    * nanos layout into an initially-empty directory must pass
    * `tsType = Some(LongType)` explicitly. Directories must be
    * generation-homogeneous (one physical ts type per dir) — true of
    * any writer that doesn't change layout mid-directory. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None,
      tsType: Option[DataType] = None): DataFrame = {
    val resolved = tsType.getOrElse(
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          // fall back ONLY for the not-yet-populated watch directory;
          // a nonexistent path (typo) must fail fast here, not as a
          // confusing mid-stream error later
          val p = new org.apache.hadoop.fs.Path(dir)
          if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
            TimestampNTZType
          else throw e
      })
    val reader = spark.readStream
      .schema(eventSchema(resolved))
      .format("parquet")
      .option("path", dir)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.load()
    resolved match {
      case LongType => // nanos-as-long: integer-divide (exact) to micros
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // wall time read in the UTC session zone
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling — or, with `slide`, overlapping — window counts/sums per
    * event type with a watermark: the incremental form of q19 (and of
    * q54 when sliding). Watermark bounds state: at 100 TB/day the
    * state store holds only windows newer than (max event time -
    * delay); a slide of 1/k the length multiplies state k-fold. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours", slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(
        slide.map(s => window(col("ts"), windowLen, s))
          .getOrElse(window(col("ts"), windowLen)),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Windowed OHLC bars — the incremental form of q137: per closed
    * (window, event_type), open/close selected by min/max over a
    * (ts, event_id, value) struct and low/high over the value. Every
    * aggregate is an associative selection with a constant-size merge
    * buffer, so the state store holds six numbers per open window and
    * the closed rows are bit-identical to the batch bars (no float
    * arithmetic ever runs — the doubles are the stored bytes). Null
    * values are excluded to pin struct-comparison semantics, exactly
    * as q137 does. */
  def ohlcStream(events: DataFrame, windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .filter(col("value").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("low"), max(col("value")).as("high"),
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("low"), col("high"), col("open"), col("close"))

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

  /** Stream-stream LEFT OUTER interval join — view-to-click attribution:
    * every (view, click-by-same-user-within-30min) pair as it matches,
    * plus a null-click row for each view once the watermark PROVES no
    * click can still arrive (that proof is what the outer side buys
    * over [[intervalSelfJoin]]; without watermarks Spark rejects the
    * outer join outright, because "no match" is undecidable under
    * unbounded lateness). State on both sides is watermark-bounded.
    *
    * This is the pair SURFACE: the first-click reduction over it is a
    * plain batch agg (q108_attribution's min-struct) or, fully
    * incremental, the [[funnelStream]] flatMapGroupsWithState shape.
    * Batch twin: the q108 pair stage with a left join. */
  def attributionJoin(events: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("ts_view"))
      .withWatermark("ts_view", watermarkDelay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("user_c"),
        col("ts").as("ts_click"))
      .withWatermark("ts_click", watermarkDelay)
    views.join(clicks,
      col("user_id") === col("user_c") &&
        col("ts_click") > col("ts_view") &&
        col("ts_click") <= col("ts_view") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("view_id"), col("user_id"), col("ts_view"),
        col("click_id"), col("ts_click"))
  }

  /** Stream-static dimension enrichment: each micro-batch joins the
    * (small, broadcast) static dimension — the streaming form of q08's
    * enrichment chain. The static side is planned per micro-batch, so
    * at 100 TB/day the stream side never shuffles for this join and a
    * dim refresh is picked up on the next trigger when the static
    * frame is a view over reloadable storage. Stateless: no watermark
    * needed, state store untouched. */
  def enrichedStream(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact-dedup on event id with watermark-bounded state:
    * the incremental form of q26's hash-dedup. State holds only ids
    * newer than (max event time - delay) — bounded at any corpus rate. */
  def dedupedStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  /** Native session windows on a stream — q212's incremental twin:
    * the same session_window(gap) aggregation under a watermark.
    * Spark keeps one OPEN session per (user, session) in the state
    * store, MERGES sessions when a late-but-in-watermark event
    * bridges two of them, and emits a session only once the watermark
    * passes its end — so closed rows are final (no session can still
    * grow) and match the batch answer exactly. State is bounded by
    * active users x open sessions inside the watermark horizon. */
  def sessionWindowStream(events: DataFrame, gap: String = "5 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(max(col("ts")).as("session_end"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_end"), col("n_events"))

  /** Exact distinct users per sliding window — q207's incremental twin
    * and the CHAINED-stateful-operator form Spark 3.4+ unlocked: two
    * stateful stages in ONE query. Stage 1 deduplicates (window, user)
    * pairs — the window struct carries event time, so dedup state for
    * a pair evicts when the watermark passes its window's end; stage 2
    * counts the survivors per window (the usual windowed-agg state).
    * Batch count(distinct) plans a two-phase expand; this is its
    * streaming analogue — state is one key per ACTIVE (window, user)
    * pair plus one count per open window, both watermark-bounded.
    * Running the same code on a batch frame reproduces q207's n_users
    * exactly (the twin equality StreamingSpec pins). */
  def slidingDistinctStream(events: DataFrame, windowLen: String = "3 hours",
      slide: String = "1 hour", watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .select(window(col("ts"), windowLen, slide).as("win"), col("user_id"))
      .dropDuplicates("win", "user_id")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("win.start").as("win_start"), col("n_users"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class HourBucket(hr: Timestamp, n: Long)
  case class AnomalyState(open: List[HourBucket], m: Long, tot: Long, ss: Long)
  case class AnomalyOut(event_type: String, hr: Timestamp, cnt: Long,
      m_prior: Long, is_anomaly: Boolean)

  private val HourUs = 3600000000L

  /** Online ingest anomaly detection — the stateful twin of the batch
    * q80 query: per event type, each CLOSED hourly bucket is flagged
    * against the running stats of all PRIOR closed hours (the 3-sigma
    * z^2 test in cross-multiplied BIGINT arithmetic, so stream and
    * batch agree bit-for-bit), then folded into those stats.
    *
    * State per type is O(1) running stats plus the open buckets still
    * inside the watermark horizon — bounded at any event rate. A bucket
    * closes when the watermark passes its end (no admissible row can
    * land in it anymore: rows older than the watermark are dropped
    * upstream), and closes are processed in hour order, so a backfill
    * replay of the same files in any order emits identical flags.
    * Batch mode (no watermark) closes everything in hour order: the
    * output IS the q80 result.
    */
  def anomalyStream(events: Dataset[Event], watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[AnomalyOut],
      stEnc: org.apache.spark.sql.Encoder[AnomalyState]): Dataset[AnomalyOut] = {
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[AnomalyState, AnomalyOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, batch: Iterator[Event], state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(Nil, 0L, 0L, 0L))
          // merge incoming events into hour buckets (hour starts are
          // whole epoch hours, so micros are exact in Timestamp millis)
          val incoming = batch.toSeq
            .groupBy(e => Math.floorDiv(micros(e.ts), HourUs) * HourUs)
            .view.mapValues(_.size.toLong).toMap
          val merged = (st.open.map(b => micros(b.hr) -> b.n).toMap.toSeq ++ incoming.toSeq)
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          // closed = no admissible future row can land in the bucket:
          // rows with ts < watermark are dropped upstream, so hour h is
          // final once watermark >= hour end
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = merged.partition { case (hrUs, _) => hrUs + HourUs <= wmUs }
          var (m, tot, ss) = (st.m, st.tot, st.ss)
          val outs = closed.toSeq.sortBy(_._1).map { case (hrUs, c) =>
            val dev = m * c - tot
            val flag = m >= 2 && dev * dev * (m - 1) > 9 * m * (m * ss - tot * tot)
            val o = AnomalyOut(etype, new Timestamp(hrUs / 1000L), c, m, flag)
            m += 1; tot += c; ss += c * c
            o
          }
          // running stats persist even with no open bucket — they are
          // the prior for every future hour of this type
          if (open.isEmpty && m == 0) { if (state.exists) state.remove() }
          else {
            state.update(AnomalyState(
              open.toSeq.sortBy(_._1)
                .map { case (u, n) => HourBucket(new Timestamp(u / 1000L), n) }.toList,
              m, tot, ss))
            if (open.nonEmpty) {
              // fire when the earliest open bucket becomes closable
              val nextCloseMs = (open.keys.min + HourUs) / 1000L
              state.setTimeoutTimestamp(
                math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          outs.iterator
      }
  }
  case class QBucket(hr: Timestamp, n: Long, buf: graft.functions.Kll.KllBuf)
  case class QuantState(open: List[QBucket])
  case class QuantOut(event_type: String, hr: Timestamp, n: Long,
      p50_micro: Long, p99_micro: Long)

  /** Streaming per-window value quantiles — the mergeable-sketch payoff:
    * the KLL buffer ([[graft.functions.Kll]]) IS the per-(type, hour)
    * state, so state stays O(k log(n/k)) per open bucket at ANY event
    * rate where exact per-window quantiles would have to buffer every
    * row until the watermark closes the window. Values are floored to
    * integer micro-units first (floor of the same double product both
    * engines compute — no float drift in ranks).
    *
    * A bucket emits when the watermark passes its hour end (no
    * admissible row can still land in it), in hour order, so any
    * replay order emits identical rows. With `capacity` >= the bucket
    * population the sketch is exact and the emitted quantiles equal
    * the batch q109 rank selection bit-for-bit (the q101 exactness
    * gate); production capacity trades ~1% rank error for the bounded
    * state. Batch mode (no watermark) closes every bucket: the output
    * IS the q109 result.
    */
  def quantileStream(events: Dataset[Event], capacity: Int = 1 << 15,
      watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[QuantOut],
      stEnc: org.apache.spark.sql.Encoder[QuantState]): Dataset[QuantOut] = {
    import graft.functions.Kll
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[QuantState, QuantOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, batch: Iterator[Event], state: GroupState[QuantState]) =>
          val st = state.getOption.getOrElse(QuantState(Nil))
          // per-hour batch sketches; event_id insertion order makes the
          // buffer bytes (not just the result) replay-reproducible. The
          // row count rides along beside the buffer — weight(buf) now
          // equals it exactly in every regime (weight-conserving
          // compaction), but the explicit count keeps the output
          // independent of sketch internals
          val incoming = batch.toSeq
            .groupBy(e => Math.floorDiv(micros(e.ts), HourUs) * HourUs)
            .view.mapValues { es =>
              (es.size.toLong, es.sortBy(_.event_id).foldLeft(Kll.empty)((b, e) =>
                Kll.insert(b, math.floor(e.value * 1000000.0).toLong, capacity)))
            }
            .toMap
          val merged = (st.open.map(b => micros(b.hr) -> (b.n, b.buf)) ++ incoming.toSeq)
            .groupBy(_._1).view
            .mapValues(_.map(_._2).reduce((a, b) =>
              (a._1 + b._1, Kll.merge(a._2, b._2, capacity))))
            .toMap
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = merged.partition { case (hrUs, _) => hrUs + HourUs <= wmUs }
          val outs = closed.toSeq.sortBy(_._1).map { case (hrUs, (n, buf)) =>
            val qs = Kll.quantiles(buf, Seq(50, 99))
            QuantOut(etype, new Timestamp(hrUs / 1000L), n, qs(0), qs(1))
          }
          if (open.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(QuantState(
              open.toSeq.sortBy(_._1)
                .map { case (u, (n, b)) => QBucket(new Timestamp(u / 1000L), n, b) }.toList))
            val nextCloseMs = (open.keys.min + HourUs) / 1000L
            state.setTimeoutTimestamp(
              math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1))
          }
          outs.iterator
      }
  }

  case class DriftBucket(hr: Timestamp, hist: Seq[Long])
  case class DriftState(open: List[DriftBucket], lastHr: Option[Timestamp],
      lastHist: Seq[Long])
  case class DriftOut(event_type: String, hr: Timestamp, n: Long,
      prev_n: Long, drift_bp: Long)

  case class EwmaBucket(hr: Timestamp, n: Long)
  case class EwmaState(open: List[EwmaBucket], last: Option[Long])
  case class EwmaOut(event_type: String, hr: Timestamp, n: Long, ewma: Long)

  case class PendEv(ts: Timestamp, event_id: Long, event_type: String)
  case class TransState(pending: List[PendEv], lastType: Option[String])
  case class TransOut(user_id: Long, from_type: String, to_type: String,
      ts: Timestamp, event_id: Long)

  /** Streaming event-type transitions — the incremental twin of q158's
    * lag window: per user, each event emits one (previous type ->
    * this type) pair in exact (ts, event_id) order. Order under
    * out-of-order ARRIVAL is what the state buys: an event is only
    * processed once the watermark proves nothing earlier can still
    * arrive (ts strictly below the watermark — Spark admits ts == wm,
    * so that boundary stays buffered), and the buffer holds at most
    * the watermark horizon's events per user plus ONE string — the
    * last emitted type — forever. Batch mode closes everything: the
    * emitted pairs ARE the batch lag query's rows, and their (from,
    * to) counts aggregate to q158's matrix exactly. */
  def transitionStream(events: Dataset[Event], watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[TransOut],
      stEnc: org.apache.spark.sql.Encoder[TransState]): Dataset[TransOut] = {
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[TransState]) =>
          val st = state.getOption.getOrElse(TransState(Nil, None))
          val all = (st.pending ++
            batch.map(e => PendEv(e.ts, e.event_id, e.event_type)))
            .sortBy(e => (micros(e.ts), e.event_id))
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = all.partition(e => micros(e.ts) < wmUs)
          var last = st.lastType
          val outs = closed.flatMap { e =>
            val o = last.map(f => TransOut(uid, f, e.event_type, e.ts, e.event_id))
            last = Some(e.event_type)
            o
          }
          state.update(TransState(open, last))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(micros(open.head.ts) / 1000L + 1,
                state.getCurrentWatermarkMs() + 1))
          outs.iterator
      }
  }

  case class PatState(pending: List[PendEv], views: List[PendEv])
  case class PatOut(user_id: Long, view_ts: Timestamp, view_event_id: Long,
      hit: Boolean, latency_us: Option[Long])

  /** Streaming CEP pattern — the incremental twin of batch q173's
    * 'view then purchase within 1 h with no error between': per user,
    * every view is classified the moment its outcome is DETERMINED —
    * by the first subsequent purchase (hit iff within the hour, with
    * exact micros latency), by the first subsequent error (miss), or
    * by the watermark passing view + 1 h (any later purchase can only
    * be late, and an error-first future is also a miss — so the
    * verdict is already forced and the view leaves state). That
    * horizon rule is what bounds state: pending views live at most
    * 1 h + watermark delay, unlike a naive formulation that would
    * hold every unanswered view forever. Events process in exact
    * (ts, event_id) order under the transitionStream watermark-buffer
    * discipline, so replay and arrival order cannot change a verdict.
    * Batch mode closes everything and the output rows ARE q173's
    * per-view classification (MiningQueries.patternViews). */
  def patternStream(events: Dataset[Event], watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[PatOut],
      stEnc: org.apache.spark.sql.Encoder[PatState]): Dataset[PatOut] = {
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[PatState, PatOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[PatState]) =>
          val st = state.getOption.getOrElse(PatState(Nil, Nil))
          val all = (st.pending ++
            batch.map(e => PendEv(e.ts, e.event_id, e.event_type)))
            .sortBy(e => (micros(e.ts), e.event_id))
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = all.partition(e => micros(e.ts) < wmUs)
          var views = st.views
          val outs = scala.collection.mutable.ListBuffer[PatOut]()
          closed.foreach { e =>
            e.event_type match {
              case "view" => views = views :+ e
              case "purchase" =>
                views.foreach { v =>
                  val lat = micros(e.ts) - micros(v.ts)
                  val hit = lat <= HourUs
                  outs += PatOut(uid, v.ts, v.event_id, hit,
                    if (hit) Some(lat) else None)
                }
                views = Nil
              case "error" =>
                views.foreach(v =>
                  outs += PatOut(uid, v.ts, v.event_id, hit = false, None))
                views = Nil
              case _ => ()
            }
          }
          // horizon expiry — in batch mode (wm = +inf) this closes the
          // tail views that never saw a purchase or error, exactly the
          // batch query's NULL-next-purchase misses
          val (expired, alive) =
            if (wmUs == Long.MaxValue) (views, Nil)
            else views.partition(v => micros(v.ts) + HourUs < wmUs)
          expired.foreach(v =>
            outs += PatOut(uid, v.ts, v.event_id, hit = false, None))
          state.update(PatState(open, alive))
          val nexts =
            open.headOption.map(e => micros(e.ts) / 1000L + 1).toList ++
              alive.headOption.map(v => (micros(v.ts) + HourUs) / 1000L + 1)
          if (nexts.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(nexts.min, state.getCurrentWatermarkMs() + 1))
          outs.iterator
      }
  }

  /** Streaming integer EWMA — the incremental twin of batch q149: per
    * event type, each CLOSED hour's count folds into the running
    * s_t = (s_{t-1} + n) div 2 trend (seeded s = n at the type's first
    * closed hour; the fold runs over OBSERVED hours in order, gaps and
    * all, exactly like the batch array fold). State per type is the
    * open hour counts inside the watermark horizon plus ONE long — the
    * carry — however long the stream runs; closes process in hour
    * order, so any replay order emits identical rows. Batch mode
    * closes everything: the output IS the q149 result. */
  def ewmaStream(events: Dataset[Event], watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[EwmaOut],
      stEnc: org.apache.spark.sql.Encoder[EwmaState]): Dataset[EwmaOut] = {
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, batch: Iterator[Event], state: GroupState[EwmaState]) =>
          val st = state.getOption.getOrElse(EwmaState(Nil, None))
          val incoming = batch.toSeq
            .groupBy(e => Math.floorDiv(micros(e.ts), HourUs) * HourUs)
            .view.mapValues(_.size.toLong).toMap
          val merged = (st.open.map(b => micros(b.hr) -> b.n) ++ incoming.toSeq)
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = merged.partition { case (hrUs, _) => hrUs + HourUs <= wmUs }
          var last = st.last
          val outs = closed.toSeq.sortBy(_._1).map { case (hrUs, n) =>
            // Long / on non-negatives == Spark div == DuckDB // here
            val s = last match { case None => n; case Some(p) => (p + n) / 2 }
            last = Some(s)
            EwmaOut(etype, new Timestamp(hrUs / 1000L), n, s)
          }
          state.update(EwmaState(
            open.toSeq.sortBy(_._1)
              .map { case (u, n) => EwmaBucket(new Timestamp(u / 1000L), n) }.toList,
            last))
          if (open.nonEmpty) {
            val nextCloseMs = (open.keys.min + HourUs) / 1000L
            state.setTimeoutTimestamp(
              math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1))
          }
          outs.iterator
      }
  }

  case class TwapPending(us: Long, eventId: Long, cents: Long)
  case class TwapBucket(hr: Timestamp, n: Long, totalUs: Long, weighted: Long)
  case class TwapState(open: List[TwapBucket], buf: List[TwapPending],
      lastUs: Option[Long], lastCents: Option[Long])
  case class TwapOut(event_type: String, hr: Timestamp, n_intervals: Long,
      total_us: Long, weighted_cents_us: Long, twap_milli: Long)

  /** Streaming time-weighted average — the incremental twin of batch
    * q228's step-interpolated TWAP, emitted per CLOSED hour (batch
    * q228 reports the per-type total; summing this stream's rows per
    * type reproduces it exactly — StreamingSpec pins that). Each
    * consecutive-event interval [e_i, e_{i+1}) weighs e_i's value by
    * the holding micros and attributes to the hour the interval STARTS
    * in; an hour closes once the watermark passes its end AND a later
    * event has been processed (the hour holding the type's latest
    * event stays open — its last interval is still unbounded), so
    * closes process in time order and any replay emits identical rows.
    *
    * Ordering is the q158-twin discipline: events buffer in state until
    * the watermark proves nothing earlier can arrive, then process in
    * exact (ts, event_id) order — the interval structure needs true
    * adjacency, which per-batch arrival order cannot promise. State
    * per type: open-hour aggregates (3 longs each) + the in-horizon
    * buffer + ONE carried last event. Value cents enter via the q39
    * DECIMAL(12,2) house cast upstream; per-hour weighted sums are
    * cents x micros longs (bounded: one hour's attributed intervals
    * start within it, and even a month-long holding gap at max cents
    * stays under 2^57). Batch mode closes everything, the final
    * carried event contributing no interval — exactly q228's
    * open-interval drop. */
  def twapStream(events: Dataset[Event], watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[TwapOut],
      stEnc: org.apache.spark.sql.Encoder[TwapState]): Dataset[TwapOut] = {
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[TwapState, TwapOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, batch: Iterator[Event], state: GroupState[TwapState]) =>
          val st = state.getOption.getOrElse(TwapState(Nil, Nil, None, None))
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          // cents via the same exact decimal path the batch query takes
          val incoming = batch.map(e => TwapPending(micros(e.ts), e.event_id,
            BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .*(100).toLongExact)).toList
          val (ready, buf) = (st.buf ++ incoming)
            .partition(_.us <= wmUs)
          var lastUs = st.lastUs
          var lastCents = st.lastCents
          val deltas = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
          ready.sortBy(p => (p.us, p.eventId)).foreach { p =>
            (lastUs, lastCents) match {
              case (Some(lu), Some(lc)) =>
                val dt = p.us - lu
                val hr = Math.floorDiv(lu, HourUs) * HourUs
                val (n, t, w) = deltas.getOrElse(hr, (0L, 0L, 0L))
                deltas(hr) = (n + 1, t + dt, w + lc * dt)
              case _ => ()
            }
            lastUs = Some(p.us); lastCents = Some(p.cents)
          }
          val merged = (st.open.map(b =>
              micros(b.hr) -> (b.n, b.totalUs, b.weighted)) ++ deltas.toSeq)
            .groupBy(_._1).view.mapValues(vs =>
              (vs.map(_._2._1).sum, vs.map(_._2._2).sum, vs.map(_._2._3).sum))
            .toMap
          val lastHr = lastUs.map(u => Math.floorDiv(u, HourUs) * HourUs)
            .getOrElse(Long.MinValue)
          val (closed, open) = merged.partition { case (hrUs, _) =>
            if (!streaming) true
            else hrUs + HourUs <= wmUs && hrUs < lastHr
          }
          val outs = closed.toSeq.sortBy(_._1).map { case (hrUs, (n, t, w)) =>
            // positives: Long / == the batch integral div; an hour whose
            // every attributed interval is zero-length (identical
            // timestamps) reports 0 rather than dividing by it
            TwapOut(etype, new Timestamp(hrUs / 1000L), n, t, w,
              if (t > 0) w * 10L / t else 0L)
          }
          state.update(TwapState(
            open.toSeq.sortBy(_._1).map { case (u, (n, t, w)) =>
              TwapBucket(new Timestamp(u / 1000L), n, t, w) }.toList,
            buf, lastUs, lastCents))
          if (streaming && (open.nonEmpty || buf.nonEmpty)) {
            val nextCloseMs =
              (open.keys ++ buf.map(_.us)).min / 1000L + HourUs / 1000L
            state.setTimeoutTimestamp(
              math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1))
          }
          outs.iterator
      }
  }

  /** Streaming hour-over-hour distribution drift — the incremental twin
    * of batch q113: per event type, each CLOSED hour's 8-bin value
    * histogram is compared with the previous closed hour's (consecutive
    * hours only; a series gap restarts the comparison) by the same
    * integer L1 share gap, then becomes the new reference. State per
    * type is the open buckets inside the watermark horizon plus ONE
    * closed histogram — 8 longs — however long the stream runs; closes
    * process in hour order, so any replay order emits identical rows.
    * Batch mode closes everything: the output IS the q113 result. */
  def driftStream(events: Dataset[Event], watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[DriftOut],
      stEnc: org.apache.spark.sql.Encoder[DriftState]): Dataset[DriftOut] = {
    val streaming = events.isStreaming
    // local copies: an object-field read inside the closure would
    // capture the (non-serializable) enclosing object
    val nBins = graft.queries.AdvancedQueries.DRIFT_BINS
    val binW = graft.queries.AdvancedQueries.DRIFT_BIN_WIDTH
    // clamped at both ends, NaN to the top bin — the exact batch/oracle
    // semantics (least/greatest with NaN-sorts-largest)
    def binOf(v: Double): Int =
      if (v.isNaN) nBins - 1
      else math.min(nBins - 1, math.max(0, math.floor(v / binW).toInt))
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[DriftState, DriftOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, batch: Iterator[Event], state: GroupState[DriftState]) =>
          val st = state.getOption.getOrElse(DriftState(Nil, None, Nil))
          val incoming = batch.toSeq
            .groupBy(e => Math.floorDiv(micros(e.ts), HourUs) * HourUs)
            .view.mapValues { es =>
              val h = Array.fill(nBins)(0L)
              es.foreach(e => h(binOf(e.value)) += 1L)
              h.toSeq
            }.toMap
          val merged = (st.open.map(b => micros(b.hr) -> b.hist) ++ incoming.toSeq)
            .groupBy(_._1).view
            .mapValues(_.map(_._2).reduce((a, b) => a.lazyZip(b).map(_ + _)))
            .toMap
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = merged.partition { case (hrUs, _) => hrUs + HourUs <= wmUs }
          var lastHr = st.lastHr.map(micros)
          var lastHist = st.lastHist
          val outs = closed.toSeq.sortBy(_._1).flatMap { case (hrUs, hist) =>
            val n = hist.sum
            val out = lastHr match {
              case Some(p) if p + HourUs == hrUs =>
                val pn = lastHist.sum
                val drift = hist.lazyZip(lastHist).map((c, pc) =>
                  math.abs(c * 10000 / n - pc * 10000 / pn)).sum
                Some(DriftOut(etype, new Timestamp(hrUs / 1000L), n, pn, drift))
              case _ => None
            }
            lastHr = Some(hrUs); lastHist = hist
            out
          }
          state.update(DriftState(
            open.toSeq.sortBy(_._1)
              .map { case (u, h) => DriftBucket(new Timestamp(u / 1000L), h) }.toList,
            lastHr.map(u => new Timestamp(u / 1000L)), lastHist))
          if (open.nonEmpty) {
            val nextCloseMs = (open.keys.min + HourUs) / 1000L
            state.setTimeoutTimestamp(
              math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1))
          }
          outs.iterator
      }
  }

  // Timestamps kept as-is (micros precision); a millis round-trip would
  // shift session boundaries vs the batch query
  case class PartialSession(start: Timestamp, end: Timestamp, n: Int, value: Double)
  case class SessionBuffer(sessions: List[PartialSession])
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, session_value: Double)

  /** Full-precision epoch micros of a Timestamp — gap comparisons must
    * run at the data's micros precision: `getTime` truncates to millis,
    * and a sub-millisecond boundary gap would merge here while the
    * batch q35 query (micros arithmetic) splits. */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Gap-merge: each incoming event is a singleton session; the union
    * with the buffered partials, sorted by start, folds adjacent
    * intervals whose gap is <= gapMs — exactly the batch q35 session
    * rule (compared in micros), but incremental and ORDER-INDEPENDENT:
    * a late event that bridges two buffered sessions merges all three. */
  private def gapMerge(existing: List[PartialSession], incoming: Seq[Event],
      gapMs: Long): List[PartialSession] = {
    val gapUs = gapMs * 1000L
    val all = (existing ++ incoming.map(e => PartialSession(e.ts, e.ts, 1, e.value)))
      .sortBy(s => (micros(s.start), micros(s.end)))
    all.foldLeft(List.empty[PartialSession]) {
      case (cur :: done, s) if micros(s.start) - micros(cur.end) <= gapUs =>
        PartialSession(cur.start,
          if (micros(s.end) > micros(cur.end)) s.end else cur.end,
          cur.n + s.n, cur.value + s.value) :: done
      case (acc, s) => s :: acc
    }.reverse
  }

  /** Stateful sessionization (gap = 30 min): flatMapGroupsWithState
    * with an EVENT-TIME timeout, so closed sessions depend only on the
    * data's timestamps and the watermark — a backfill replay of the
    * same files, in any order and at any speed, emits the same
    * sessions as live execution and as the batch q35 query
    * (processing-time timeouts would close sessions on wall-clock,
    * diverging under out-of-order replay).
    *
    * State per user is the list of gap-merged partial sessions still
    * inside the watermark horizon — bounded: a session whose close is
    * watermark-proven (end + gap < watermark; no unlocked future event
    * can extend or bridge it, late rows beyond the watermark are
    * dropped upstream) is emitted and leaves the state. The event-time
    * timer fires at the earliest pending close, so idle users flush
    * without new input.
    *
    * Run in BATCH mode (no watermark exists), every session closes:
    * the output IS the batch q35 result — same code, bounded input.
    *
    * Session values fold in interval-merge order, which can differ
    * from strict event order across micro-batches; `session_value` is
    * therefore sum-equal but not bit-order-identical to batch folds
    * (start/end/n are exact). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[SessionOut],
      stEnc: org.apache.spark.sql.Encoder[SessionBuffer]): Dataset[SessionOut] = {

    // resolved at plan time: batch execution has no watermark — all
    // input is present and every session is final. (Not inferred from
    // a getCurrentWatermarkMs failure: swallowing arbitrary exceptions
    // there would turn a genuine streaming-side error into silently
    // closing every open session.)
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionBuffer, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionBuffer]) =>
          val existing = state.getOption.map(_.sessions).getOrElse(Nil)
          val merged = gapMerge(existing, batch.toSeq, gapMs)
          val gapUs = gapMs * 1000L
          // strict <: an event AT the watermark can still arrive and an
          // event at exactly end+gap still joins the session; watermark
          // is millis — compare in micros at the conservative boundary
          val (closed, open) =
            if (!streaming) (merged, Nil)
            else {
              val wmUs = state.getCurrentWatermarkMs() * 1000L
              merged.partition(s => micros(s.end) + gapUs < wmUs)
            }
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBuffer(open))
            // fire when the earliest pending session becomes closable:
            // round the micros close-time UP to millis, and keep it
            // strictly beyond the current watermark
            val nextCloseMs = open.map(s =>
              Math.floorDiv(micros(s.end) + gapUs + 999L, 1000L)).min
            state.setTimeoutTimestamp(math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1))
          }
          closed.map(s => SessionOut(userId, s.start, s.end, s.n, s.value)).iterator
      }
  }

  case class FEvent(ts: Timestamp, tpe: String)
  case class FunnelBuf(events: List[FEvent])
  case class FunnelOut(user_id: Long, t_view: Timestamp,
      t_click: Option[Timestamp], t_purchase: Option[Timestamp],
      reached_step: Long)

  /** Stateful event funnel with a conversion horizon — the incremental
    * form of q100, made watermark-finalizable: t_view = the user's
    * first view; t_click = first click in (t_view, t_view+H];
    * t_purchase = first purchase in (t_click, t_click+H]. The horizon
    * is what makes a funnel FINAL: once the watermark passes
    * t_view + 2H, no admissible event can change any step (an earlier
    * view can no longer arrive, and both conversion windows have
    * closed), so the user emits exactly once and leaves the state.
    *
    * State per user is the funnel-relevant events still able to affect
    * the outcome: everything past min-view + 2H is dropped on arrival,
    * and for users with no view yet, a click/purchase is held only
    * while a view before it can still arrive (watermark < its ts) —
    * both prunes keep state bounded at any stream rate. The funnel is
    * recomputed from the buffer, so arrival order never matters.
    *
    * Run in BATCH mode every funnel is final — the output equals the
    * same horizon-variant computed declaratively (spec-proven). */
  def funnelStream(events: Dataset[Event], horizonMs: Long,
      watermarkDelay: String = "2 hours")(
      implicit outEnc: org.apache.spark.sql.Encoder[FunnelOut],
      stEnc: org.apache.spark.sql.Encoder[FunnelBuf]): Dataset[FunnelOut] = {
    val hUs = horizonMs * 1000L
    val funnelTypes = Set("view", "click", "purchase")
    val streaming = events.isStreaming

    def funnelOf(userId: Long, evs: List[FEvent]): Option[FunnelOut] = {
      val views = evs.filter(_.tpe == "view").map(e => micros(e.ts))
      if (views.isEmpty) None
      else {
        val tv = views.min
        val tc = evs.filter(e => e.tpe == "click" &&
          micros(e.ts) > tv && micros(e.ts) <= tv + hUs)
          .map(e => micros(e.ts)).minOption
        val tp = tc.flatMap(c => evs.filter(e => e.tpe == "purchase" &&
          micros(e.ts) > c && micros(e.ts) <= c + hUs)
          .map(e => micros(e.ts)).minOption)
        def ts(us: Long): Timestamp = {
          val x = new Timestamp(Math.floorDiv(us, 1000L))
          x.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          x
        }
        Some(FunnelOut(userId, ts(tv), tc.map(ts), tp.map(ts),
          1L + tc.size + tp.size))
      }
    }

    events
      .filter(e => funnelTypes.contains(e.event_type))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelBuf, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelBuf]) =>
          val incoming = batch.map(e => FEvent(e.ts, e.event_type)).toList
          val all = state.getOption.map(_.events).getOrElse(Nil) ++ incoming
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L
            else Long.MaxValue
          val viewsUs = all.filter(_.tpe == "view").map(e => micros(e.ts))
          val minView = viewsUs.minOption
          // prune: events beyond min-view + 2H can't affect this funnel;
          // with no view, hold click/purchase only while an earlier view
          // can still arrive
          val kept = minView match {
            case Some(tv) => all.filter(e => micros(e.ts) <= tv + 2 * hUs)
            case None => all.filter(e => micros(e.ts) >= wmUs)
          }
          val finalized = minView.exists(tv => tv + 2 * hUs < wmUs) ||
            (!streaming)
          if (finalized || kept.isEmpty) {
            if (state.exists) state.remove()
            if (minView.isDefined) funnelOf(userId, kept).iterator else Iterator.empty
          } else {
            state.update(FunnelBuf(kept))
            // fire when the funnel becomes finalizable (or, with no
            // view yet, when the oldest held event stops being
            // validatable)
            val fireUs = minView.map(_ + 2 * hUs)
              .getOrElse(kept.map(e => micros(e.ts)).min)
            val fireMs = Math.floorDiv(fireUs + 999L, 1000L)
            state.setTimeoutTimestamp(
              math.max(fireMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class AttrState(pending: List[PendEv], touches: List[PendEv])
  case class AttrOut(user_id: Long, conv_event_id: Long, touch_event_id: Long,
      touch_type: String, pos: Long, n_touches: Long, credit_bp: Long)

  /** Streaming U-shaped multi-touch attribution — the incremental twin
    * of batch q231: per user, non-purchase events buffer as the open
    * conversion segment's touches, and the moment a purchase CLOSES
    * (watermark-proven: nothing earlier can still arrive) it emits one
    * row per buffered touch with the exact q231 credit split — 10000 bp
    * for a lone touch, 5000/5000 for two, 40/20/40 with the integer
    * remainder to the earliest middles otherwise — then resets the
    * segment. Credits for a conversion therefore appear EXACTLY ONCE,
    * in one batch, summing to 10000; replay order cannot change them
    * because events process in (ts, event_id) order under the
    * transitionStream watermark-buffer discipline. Touches after a
    * user's final purchase are never emitted — q231's exclusion.
    *
    * State per user = the open segment's touches plus the watermark
    * buffer. `attributionWindow` (an event-time duration, micros) is
    * the production bound: touches older than purchase-time minus the
    * window take no credit, and a buffered touch EXPIRES from state
    * once the watermark proves every future purchase would ignore it —
    * so state holds at most one window of touches per user however
    * long the stream runs. The default (Long.MaxValue) disables the
    * window for exact q231 equivalence, which attributes the whole
    * segment; AttributionStreamSpec covers both modes. */
  def attributionStream(events: Dataset[Event],
      watermarkDelay: String = "2 hours",
      attributionWindowUs: Long = Long.MaxValue)(
      implicit outEnc: org.apache.spark.sql.Encoder[AttrOut],
      stEnc: org.apache.spark.sql.Encoder[AttrState]): Dataset[AttrOut] = {
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[AttrState]) =>
          val st = state.getOption.getOrElse(AttrState(Nil, Nil))
          val all = (st.pending ++
            batch.map(e => PendEv(e.ts, e.event_id, e.event_type)))
            .sortBy(e => (micros(e.ts), e.event_id))
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
          val (closed, open) = all.partition(e => micros(e.ts) < wmUs)
          var touches = st.touches
          val outs = scala.collection.mutable.ListBuffer[AttrOut]()
          closed.foreach { e =>
            if (e.event_type != "purchase") touches = touches :+ e
            else {
              val cutoff =
                if (attributionWindowUs == Long.MaxValue) Long.MinValue
                else micros(e.ts) - attributionWindowUs
              val credited = touches.filter(t => micros(t.ts) >= cutoff)
              val n = credited.size.toLong
              credited.zipWithIndex.foreach { case (t, i) =>
                val pos = i + 1L
                val bp =
                  if (n == 1) 10000L
                  else if (n == 2) 5000L
                  else if (pos == 1 || pos == n) 4000L
                  else 2000L / (n - 2) + (if (pos - 1 <= 2000L % (n - 2)) 1L else 0L)
                outs += AttrOut(uid, e.event_id, t.event_id, t.event_type,
                  pos, n, bp)
              }
              touches = Nil
            }
          }
          // window expiry: once wm > touch_ts + window, every future
          // purchase's cutoff already excludes the touch — drop it
          val alive =
            if (attributionWindowUs == Long.MaxValue || wmUs == Long.MaxValue)
              touches
            else touches.filter(t => micros(t.ts) + attributionWindowUs >= wmUs)
          state.update(AttrState(open, alive))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(micros(open.head.ts) / 1000L + 1,
                state.getCurrentWatermarkMs() + 1))
          outs.iterator
      }
  }
}
