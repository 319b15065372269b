package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  // file streams need a DIRECTORY source; stage the single parquet file
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed agg with watermark over a file stream matches the batch query") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.windowedAgg(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("win_out")
    // batch reference: q19 logic at 1h granularity
    val batch = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .groupBy("bucket", "event_type").agg(count(lit(1)).as("n"))
    // append mode + AvailableNow emits only watermark-closed windows; all
    // emitted windows must match the batch counts exactly
    val joined = got.alias("s").join(batch.alias("b"), Seq("bucket", "event_type"))
    assert(got.count() > 0)
    assert(joined.filter(col("s.n") =!= col("b.n")).isEmpty)
  }

  test("checkpointed restart: second run processes only new files, no duplicate windows") {
    val root = java.nio.file.Files.createTempDirectory("events-incr")
    val stage = root.resolve("in"); java.nio.file.Files.createDirectories(stage)
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    val all = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")

    def runOnce(): Unit = {
      // write ts back as long nanos so the staged files match the
      // stream source schema (readStream expects the raw layout)
      val q = EventsStream.windowedAgg(EventsStream.readStream(spark, stage.toString))
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // the file-stream source wants FLAT files in the watched dir: write
    // each batch to a scratch dir and move its single part file in
    def stageBatch(name: String, pred: org.apache.spark.sql.Column): Unit = {
      val scratch = root.resolve(s"scratch_$name")
      all.filter(pred)
        .withColumn("ts", unix_micros(col("ts")) * 1000)
        .coalesce(1).write.parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, stage.resolve(s"$name.parquet"))
    }
    stageBatch("a", col("event_id") < 500)
    runOnce()
    val afterFirst = spark.read.parquet(out).count()

    stageBatch("b", col("event_id") >= 500)
    runOnce()

    val result = spark.read.parquet(out)
    assert(result.count() > afterFirst, "second run must emit newly closed windows")
    // exactly-once across the restart: no (bucket, event_type) emitted twice
    val dups = result.groupBy("bucket", "event_type").count().filter(col("count") > 1)
    assert(dups.isEmpty, "duplicate windows after restart")
    // every emitted window matches the batch computation
    val batch = all.withColumn("bucket", date_trunc("hour", col("ts")))
      .groupBy("bucket", "event_type").agg(count(lit(1)).as("bn"))
    assert(result.join(batch, Seq("bucket", "event_type"))
      .filter(col("n") =!= col("bn")).isEmpty)
  }

  test("streaming dedup drops the duplicated input file's rows") {
    // stage the same parquet twice -> every event arrives twice
    val d2 = java.nio.file.Files.createTempDirectory("events-dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d2.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d2.resolve("b.parquet"))
    val q = EventsStream.dedupedStream(EventsStream.readStream(spark, d2.toString))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val n = spark.table("dedup_out").count()
    val distinct = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events").count()
    assert(n == distinct)
  }

  test("streaming session_window closes the same sessions as batch q212") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.sessionWindowStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sesswin_out").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "session-window stream did not finish")
    val got = spark.table("sesswin_out")
    val batch = graft.queries.WarehouseQueries.all
      .find(_.name == "q212_session_window").get
      .run(spark, "/root/testdata/sf0.001")
    // every closed session must exist in batch with identical bounds/count
    val joined = got.alias("s").join(batch.alias("b"),
      Seq("user_id", "session_start"))
    assert(got.count() > 0)
    assert(joined.count() == got.count(), "closed session missing from batch")
    assert(joined.filter(col("s.n_events") =!= col("b.n_events") ||
      col("s.session_end") =!= col("b.session_end")).isEmpty)
  }

  test("chained stateful dedup + sliding agg matches q207's distinct counts") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.slidingDistinctStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sldist_out").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "sliding-distinct stream did not finish")
    // the query must really run TWO stateful operators (dedup -> agg)
    val opNames = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      .recentProgress.flatMap(_.stateOperators.map(_.operatorName)).distinct.sorted
    assert(opNames.length >= 2, s"expected chained stateful ops, got ${opNames.mkString(",")}")
    val got = spark.table("sldist_out")
    val batch = graft.queries.WarehouseQueries.all
      .find(_.name == "q207_sliding_distinct").get
      .run(spark, "/root/testdata/sf0.001")
      .select(col("win_start"), col("n_users"))
    // append mode emits only watermark-closed windows; each must match
    val joined = got.alias("s").join(batch.alias("b"), Seq("win_start"))
    assert(got.count() > 0)
    assert(joined.count() == got.count(), "emitted window missing from batch")
    assert(joined.filter(col("s.n_users") =!= col("b.n_users")).isEmpty)
    // batch mode of the SAME code reproduces q207's n_users exactly
    val batchMode = EventsStream.slidingDistinctStream(
      graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events"))
    assert(batchMode.exceptAll(batch).isEmpty && batch.exceptAll(batchMode).isEmpty)
  }

  test("stream-stream interval join emits the same pairs as the batch twin") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.intervalSelfJoin(stream)
      .writeStream.outputMode("append").format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ssj_out").count()
    val batch = graft.queries.AdvancedQueries.all
      .find(_.name == "q43_interval_join").get
      .run(spark, "/root/testdata/sf0.001").count()
    assert(got == batch, s"stream=$got batch=$batch")
  }

  test("sliding windowed agg over a stream matches the batch q54 buckets") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.windowedAgg(stream, windowLen = "2 hours", slide = Some("1 hour"))
      .writeStream.outputMode("append").format("memory").queryName("slide_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "sliding-window stream did not finish in 120 s")
    val got = spark.table("slide_out")
      .select(col("bucket").as("win_start"), col("event_type"), col("n"))
    val batch = graft.queries.AdvancedQueries.all
      .find(_.name == "q54_sliding_window").get
      .run(spark, "/root/testdata/sf0.001")
    // append mode emits only watermark-closed windows; each must match
    // its batch counterpart exactly
    val joined = got.alias("s").join(batch.alias("b"), Seq("win_start", "event_type"))
    assert(got.count() > 0)
    assert(joined.count() == got.count(), "emitted window missing from batch")
    assert(joined.filter(col("s.n") =!= col("b.n")).isEmpty)
  }

  test("online anomaly stream: emitted buckets match the batch q80 flags") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.anomalyStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("anom_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "anomaly stream did not finish in 120 s")
    val got = spark.table("anom_out")
    val batch = graft.queries.PipelineQueries.all
      .find(_.name == "q80_online_anomaly").get
      .run(spark, "/root/testdata/sf0.001")
    // append mode emits only watermark-closed buckets; each must match
    // the batch prefix-stats row exactly (count, prior-m AND flag)
    assert(got.count() > 0)
    val joined = got.alias("s").join(batch.alias("b"), Seq("event_type", "hr"))
    assert(joined.count() == got.count(), "emitted bucket missing from batch")
    assert(joined.filter(
      col("s.cnt") =!= col("b.cnt") ||
        col("s.m_prior") =!= col("b.m_prior") ||
        col("s.is_anomaly") =!= col("b.is_anomaly")).isEmpty)
  }

  test("streaming value quantiles: emitted buckets match the batch q109 rows") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.quantileStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("quant_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "quantile stream did not finish in 120 s")
    val got = spark.table("quant_out")
    val batch = graft.queries.PipelineQueries.all
      .find(_.name == "q109_value_quantiles").get
      .run(spark, "/root/testdata/sf0.001")
    // append mode emits only watermark-closed buckets; each must match
    // the batch rank-selection row exactly (count and both quantiles)
    assert(got.count() > 0)
    val joined = got.alias("s").join(batch.alias("b"), Seq("event_type", "hr"))
    assert(joined.count() == got.count(), "emitted bucket missing from batch")
    assert(joined.filter(
      col("s.n") =!= col("b.n") ||
        col("s.p50_micro") =!= col("b.p50_micro") ||
        col("s.p99_micro") =!= col("b.p99_micro")).isEmpty)
  }

  test("streaming value quantiles: batch mode reproduces q109 exactly") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.quantileStream(events).collect()
      .map(o => (o.event_type, o.hr, o.n, o.p50_micro, o.p99_micro)).toSet
    val want = graft.queries.PipelineQueries.all
      .find(_.name == "q109_value_quantiles").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"),
        r.getAs[Long]("n"), r.getAs[Long]("p50_micro"),
        r.getAs[Long]("p99_micro"))).toSet
    assert(got == want)
  }

  test("streaming hourly drift: emitted rows match the batch q113 result") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.driftStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("drift_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "drift stream did not finish in 120 s")
    val got = spark.table("drift_out")
    val batch = graft.queries.AdvancedQueries.all
      .find(_.name == "q113_hourly_drift").get
      .run(spark, "/root/testdata/sf0.001")
    assert(got.count() > 0)
    val joined = got.alias("s").join(batch.alias("b"), Seq("event_type", "hr"))
    assert(joined.count() == got.count(), "emitted drift row missing from batch")
    assert(joined.filter(
      col("s.n") =!= col("b.n") || col("s.prev_n") =!= col("b.prev_n") ||
        col("s.drift_bp") =!= col("b.drift_bp")).isEmpty)
  }

  test("streaming hourly drift: batch mode reproduces q113 exactly") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.driftStream(events).collect()
      .map(o => (o.event_type, o.hr, o.n, o.prev_n, o.drift_bp)).toSet
    val want = graft.queries.AdvancedQueries.all
      .find(_.name == "q113_hourly_drift").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"),
        r.getAs[Long]("n"), r.getAs[Long]("prev_n"),
        r.getAs[Long]("drift_bp"))).toSet
    assert(got == want)
  }

  test("streaming integer EWMA: emitted rows match the batch q149 result") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.ewmaStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("ewma_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "ewma stream did not finish in 120 s")
    val got = spark.table("ewma_out")
    val batch = graft.queries.AdvancedQueries.all
      .find(_.name == "q149_integer_ewma").get
      .run(spark, "/root/testdata/sf0.001")
    assert(got.count() > 0)
    val joined = got.alias("s").join(batch.alias("b"), Seq("event_type", "hr"))
    assert(joined.count() == got.count(), "emitted ewma row missing from batch")
    assert(joined.filter(
      col("s.n") =!= col("b.n") || col("s.ewma") =!= col("b.ewma")).isEmpty,
      "streamed ewma must carry the batch fold's exact value")
  }

  test("streaming TWAP: emitted hours are a subset of batch mode, values exact") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.twapStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("twap_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "twap stream did not finish in 120 s")
    val got = spark.table("twap_out")
    assert(got.count() > 0)
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val batchRows = EventsStream.twapStream(events).toDF()
    val joined = got.alias("s").join(batchRows.alias("b"), Seq("event_type", "hr"))
    assert(joined.count() == got.count(), "emitted hour missing from batch mode")
    assert(joined.filter(
      col("s.n_intervals") =!= col("b.n_intervals")
        || col("s.total_us") =!= col("b.total_us")
        || col("s.weighted_cents_us") =!= col("b.weighted_cents_us")
        || col("s.twap_milli") =!= col("b.twap_milli")).isEmpty,
      "streamed hour must carry the batch-mode exact values")
  }

  test("streaming TWAP: batch-mode rows aggregate exactly to q228") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.twapStream(events).collect()
      .groupBy(_.event_type).view.mapValues(os =>
        (os.map(_.n_intervals).sum, os.map(_.total_us).sum,
          BigDecimal(os.map(o => BigInt(o.weighted_cents_us)).sum)))
      .toMap
    // q228's gate output carries the exact numerator as a hi/lo BIGINT
    // split (wcu_hi * 10^15 + wcu_lo) — reassemble it for the compare
    val want = graft.queries.AdvancedQueries.all
      .find(_.name == "q228_twap").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("total_us"),
          BigDecimal(BigInt(r.getAs[Long]("wcu_hi")) *
            BigInt(10).pow(15) + BigInt(r.getAs[Long]("wcu_lo")))))
      .toMap
    assert(got == want,
      s"per-type stream sums must equal the batch TWAP aggregates")
  }

  test("streaming integer EWMA: batch mode reproduces q149 exactly") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.ewmaStream(events).collect()
      .map(o => (o.event_type, o.hr, o.n, o.ewma)).toSet
    val want = graft.queries.AdvancedQueries.all
      .find(_.name == "q149_integer_ewma").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"),
        r.getAs[Long]("n"), r.getAs[Long]("ewma"))).toSet
    assert(got == want)
  }

  test("streaming transitions: batch mode reproduces the q158 lag pairs and matrix") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val events = ev
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.transitionStream(events).collect()
      .map(o => (o.user_id, o.from_type, o.to_type, o.event_id)).toSet
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val want = ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
        r.getAs[String]("event_type"), r.getAs[Long]("event_id"))).toSet
    assert(got == want, "batch-mode stream must emit exactly the lag pairs")
    // aggregated (from, to) counts == the q158 matrix
    val agg = got.toSeq.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val matrix = graft.queries.AdvancedQueries.all
      .find(_.name == "q158_transition_matrix").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
        -> r.getAs[Long]("n")).toMap
    assert(agg == matrix)
  }

  test("streaming transitions: emitted pairs are exactly a batch-pair subset") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.transitionStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("trans_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "transition stream did not finish in 120 s")
    val got = spark.table("trans_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
        r.getAs[String]("to_type"), r.getAs[Long]("event_id"))).toSet
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val want = ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
        r.getAs[String]("event_type"), r.getAs[Long]("event_id"))).toSet
    assert(got.nonEmpty, "the watermark must close some pairs")
    assert(got.subsetOf(want),
      "every emitted pair must be one the batch lag query produces")
  }

  test("streaming CEP pattern: batch mode emits exactly q173's per-view verdicts") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.patternStream(events).collect()
      .map(o => (o.user_id, o.view_event_id, o.hit, o.latency_us)).toSet
    val want = graft.queries.MiningQueries
      .patternViews(spark, "/root/testdata/sf0.001").collect()
      .map { r =>
        val hit = r.getAs[Boolean]("hit")
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), hit,
          if (hit) Some(r.getAs[Long]("next_purchase") - r.getAs[Long]("us"))
          else None)
      }.toSet
    assert(got == want,
      "batch-mode pattern stream must classify every view like the window query")
    assert(got.exists(_._3) && got.exists(!_._3), "both verdicts must occur")
  }

  test("streaming CEP pattern: watermark-closed verdicts are a batch subset") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event](org.apache.spark.sql.Encoders.product[EventsStream.Event])
    val q = EventsStream.patternStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("pat_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "pattern stream did not finish in 120 s")
    val got = spark.table("pat_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_event_id"),
        r.getAs[Boolean]("hit"))).toSet
    val want = graft.queries.MiningQueries
      .patternViews(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Boolean]("hit"))).toSet
    assert(got.nonEmpty, "the watermark must close some verdicts")
    assert(got.subsetOf(want),
      "every emitted verdict must agree with the batch classification")
  }

  test("online anomaly: batch mode reproduces the q80 result exactly") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val got = EventsStream.anomalyStream(events).collect()
      .map(a => (a.event_type, a.hr, a.cnt, a.m_prior, a.is_anomaly)).toSet
    val want = graft.queries.PipelineQueries.all
      .find(_.name == "q80_online_anomaly").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"),
        r.getAs[Long]("cnt"), r.getAs[Long]("m_prior"),
        r.getAs[Boolean]("is_anomaly"))).toSet
    assert(got.size == want.size)
    assert(got == want)
  }

  test("sessionization is input-order independent (randomized property)") {
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val baseUs = 1700000000000000L
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val events = (1 to 300).map { i =>
        val us = baseUs + rnd.nextLong(48L * 3600 * 1000000) // 48h spread
        val t = new java.sql.Timestamp(us / 1000)
        t.setNanos(((us % 1000000) * 1000).toInt)
        EventsStream.Event(i.toLong, t, rnd.nextInt(5).toLong, "view", rnd.nextInt(100) / 10.0)
      }
      // in-memory reference: the batch session fold in micros
      def us(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      val want = events.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (us(e.ts), e.event_id))
        val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int)]
        var (start, end, n) = (0L, 0L, 0)
        sorted.foreach { e =>
          val t = us(e.ts)
          if (n == 0) { start = t; end = t; n = 1 }
          else if (t - end > gapMs * 1000L) {
            sessions += ((u, start, end, n)); start = t; end = t; n = 1
          } else { end = t; n += 1 }
        }
        if (n > 0) sessions += ((u, start, end, n))
        sessions
      }.toSet
      val got = EventsStream.sessionize(rnd.shuffle(events).toDS(), gapMs)
        .collect()
        .map(s => (s.user_id, us(s.session_start), us(s.session_end), s.n_events))
        .toSet
      assert(got == want, s"seed $seed: sessions diverge from the ordered fold")
    }
  }

  test("stateful sessionization: batch mode reproduces the q35 result exactly") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    // batch mode has no watermark -> every session is final: the
    // operator's output IS the batch q35 result, session for session
    val sessions = EventsStream.sessionize(events).collect()
    val batchSessions = graft.queries.AdvancedQueries.all
      .find(_.name == "q35_sessionize").get
      .run(spark, "/root/testdata/sf0.001")
      .collect()
    val got = sessions.map(s =>
      (s.user_id, s.session_start, s.session_end, s.n_events.toLong)).toSet
    val want = batchSessions.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSet
    assert(sessions.length == batchSessions.length)
    assert(got == want)
  }

  test("event-time sessionization: out-of-order shuffled replay emits " +
      "exactly the batch sessions (closed set)") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("events-sess")
    val stage = root.resolve("in"); java.nio.file.Files.createDirectories(stage)
    val all = graft.queries.Tables.t(spark, sfDir, "events")
    val gapMs = 30 * 60 * 1000L
    val delayMs = 4L * 24 * 3600 * 1000 // watermark "4 days" covers the staged disorder

    // stage 10 time-decile files, but (a) every 7th event lands one
    // file LATE (~3 days of cross-batch disorder, inside the 4-day
    // watermark) and (b) rows inside each file are hash-shuffled; a
    // processing-time/arrival-order implementation emits sessions that
    // don't exist in batch under this replay
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val filed = all
      .withColumn("decile", ntile(10).over(w) - 1)
      .withColumn("f", least(lit(9),
        col("decile") + when(col("event_id") % 7 === 0, 1).otherwise(0)))
    def stageFile(name: String, df: org.apache.spark.sql.DataFrame, order: Int): Unit = {
      val scratch = root.resolve(s"scratch_$name")
      df.orderBy(xxhash64(col("event_id"))) // shuffled intra-file order
        .select(col("event_id"),
          (unix_micros(col("ts")) * 1000).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = stage.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dest)
      // the file source processes oldest-mtime first: make order explicit
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + order * 60000L))
    }
    for (i <- 0 until 10)
      stageFile(f"f$i%02d", filed.filter(col("f") === i).drop("decile", "f"), i)
    // sentinel: one far-future event pushes the final watermark beyond
    // every real session's close; its own session stays open/filtered
    val realMaxMs = all.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val sentinelUser = 999999L
    stageFile("f10", Seq(
      (9999999L, new java.sql.Timestamp(realMaxMs + 40L * 24 * 3600 * 1000),
        sentinelUser, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), 10)

    val stream = EventsStream.readStream(spark, stage.toString, maxFilesPerTrigger = Some(1))
      .as[EventsStream.Event]
    val q = EventsStream.sessionize(stream, gapMs, watermarkDelay = "4 days")
      .writeStream.outputMode("append").format("memory").queryName("sess_stream")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "sessionization replay did not finish in 180 s")

    val got = spark.table("sess_stream")
      .filter(col("user_id") =!= sentinelUser)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Int]("n_events").toLong))
    val batch = graft.queries.AdvancedQueries.all
      .find(_.name == "q35_sessionize").get.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events")))
    val batchSet = batch.toSet
    assert(got.nonEmpty, "no sessions closed — watermark never advanced?")
    // soundness: every emitted session exists in the batch result,
    // exactly (user, start, end, size) — despite the shuffled replay
    got.foreach(s => assert(batchSet.contains(s), s"streamed session not in batch: $s"))
    assert(got.length == got.toSet.size, "duplicate session emitted")
    // completeness: every batch session provably closed by the last
    // REAL file's watermark (realMax - delay at the sentinel batch's
    // start) must have been emitted; later closes depend on a trailing
    // no-data batch the trigger need not run
    val wmGuaranteed = realMaxMs - delayMs
    val gotSet = got.toSet
    val mustClose = batch.filter(s => s._3.getTime + gapMs < wmGuaranteed - 1000)
    assert(mustClose.nonEmpty, "test data yields no guaranteed-closed sessions")
    mustClose.foreach(s => assert(gotSet.contains(s),
      s"batch session not emitted though watermark passed it: $s"))
  }

  private val funnelH = 60 * 60 * 1000L // 1h conversion horizon

  /** Declarative horizon-funnel twin of EventsStream.funnelStream. */
  private def funnelBatchTwin() = {
    val e = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("tv"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" &&
        col("us") > col("tv") && col("us") <= col("tv") + funnelH * 1000L)
      .groupBy("user_id").agg(min(col("us")).as("tc"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" &&
        col("us") > col("tc") && col("us") <= col("tc") + funnelH * 1000L)
      .groupBy("user_id").agg(min(col("us")).as("tp"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("tv"), col("tc"), col("tp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
  }

  private def funnelRowsOf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("user_id"), expr("unix_micros(t_view)"),
      expr("unix_micros(t_click)"), expr("unix_micros(t_purchase)"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3))))
    .toSet

  test("stateful funnel: batch mode reproduces the declarative twin exactly") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventsStream.Event]
    val got = funnelRowsOf(EventsStream.funnelStream(events, funnelH).toDF())
    assert(got == funnelBatchTwin())
  }

  test("stateful funnel: stream emits exactly the watermark-closed funnels") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventsStream.Event]
    val q = EventsStream.funnelStream(stream, funnelH, "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = funnelRowsOf(spark.table("funnel_out"))
    val want = funnelBatchTwin()
    // every emitted funnel is a batch funnel
    assert(got.subsetOf(want), s"stream emitted non-batch rows: ${got -- want}")
    // and every funnel the watermark PROVABLY closed must have emitted:
    // final watermark = max event time - delay
    val maxUs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    val wmUs = maxUs - 30L * 60 * 1000 * 1000
    val mustEmit = want.filter(_._2 + 2 * funnelH * 1000L < wmUs)
    mustEmit.foreach(f => assert(got.contains(f),
      s"watermark-closed funnel not emitted: $f"))
    assert(mustEmit.nonEmpty, "test data yields no provably-closed funnels")
  }

  test("stream-static enrichment matches the batch join, dim side broadcast") {
    // static dim: one row per user id bucket (small by construction)
    val dim = spark.range(0, 1000)
      .select(col("id").as("user_id"),
        concat(lit("tier-"), pmod(col("id"), lit(3))).as("tier"))
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.enrichedStream(stream, dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("enrich_out")
    val batch = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .join(broadcast(dim), Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // every stream row found its dim row (left join produced no nulls here)
    assert(got.filter(col("tier").isNull).isEmpty)
  }

  test("left-outer attribution join: matched pairs equal batch; null rows are watermark-proven") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("events-attr")
    val stage = root.resolve("in"); java.nio.file.Files.createDirectories(stage)
    val all = graft.queries.Tables.t(spark, sfDir, "events")
    val delayMs = 3600 * 1000L // 1h watermark delay
    val horizonMs = 30 * 60 * 1000L

    // stage time-decile files so the watermark steps batch by batch —
    // a single batch would leave null emission to a trailing no-data
    // batch the AvailableNow trigger need not run
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val filed = all.withColumn("f", ntile(10).over(w) - 1)
    def stageFile(name: String, df: org.apache.spark.sql.DataFrame, order: Int): Unit = {
      val scratch = root.resolve(s"scratch_$name")
      df.select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = stage.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + order * 60000L))
    }
    for (i <- 0 until 10)
      stageFile(f"f$i%02d", filed.filter(col("f") === i).drop("f"), i)
    // sentinel view+click far past the real data advance BOTH sides'
    // watermarks (the join watermark is their min); 10 days apart so
    // they cannot pair with anything, including each other
    val realMaxMs = all.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val sentinelUser = 999999L
    stageFile("f10", Seq(
      (9999998L, new java.sql.Timestamp(realMaxMs + 30L * 24 * 3600 * 1000),
        sentinelUser, "view", 0.0, "{}"),
      (9999999L, new java.sql.Timestamp(realMaxMs + 40L * 24 * 3600 * 1000),
        sentinelUser, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), 10)

    val stream = EventsStream.readStream(spark, stage.toString,
      maxFilesPerTrigger = Some(1))
    val q = EventsStream.attributionJoin(stream, watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "attribution replay did not finish in 180 s")

    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("user_id") =!= sentinelUser)
      .collect().map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts_view"),
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong),
        Option(r.getAs[java.sql.Timestamp]("ts_click"))))

    val twin = all.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("ts_view"))
      .join(all.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("user_c"),
            col("ts").as("ts_click")),
        col("user_id") === col("user_c") &&
          col("ts_click") > col("ts_view") &&
          col("ts_click") <= col("ts_view") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("view_id"), col("user_id"), col("ts_view"),
        col("click_id"), col("ts_click"))

    val got = rowsOf(spark.table("attr_out"))
    val want = rowsOf(twin)
    // matched pairs: exact set equality — inner matches emit regardless
    // of watermark progress
    val gotMatched = got.filter(_._4.nonEmpty).toSet
    val wantMatched = want.filter(_._4.nonEmpty).toSet
    assert(gotMatched == wantMatched,
      s"matched pairs diverge: ${(gotMatched diff wantMatched).take(3)} / ${(wantMatched diff gotMatched).take(3)}")
    // null rows: sound (a subset of the batch's unmatched views), unique,
    // and complete for every view whose no-click status the final
    // watermark provably decided
    val gotNull = got.filter(_._4.isEmpty)
    val wantNull = want.filter(_._4.isEmpty).toSet
    assert(gotNull.toSet.subsetOf(wantNull),
      s"phantom null rows: ${gotNull.toSet -- wantNull}")
    assert(gotNull.length == gotNull.toSet.size, "duplicate null row emitted")
    val wmGuaranteedMs = realMaxMs - delayMs
    val mustNull = wantNull.filter(_._3.getTime + horizonMs < wmGuaranteedMs - 1000)
    assert(mustNull.nonEmpty, "test data yields no provably-unmatched views")
    val gotNullSet = gotNull.toSet
    mustNull.foreach(v => assert(gotNullSet.contains(v),
      s"unmatched view not emitted though watermark passed it: $v"))
  }

  test("OHLC bar stream: closed windows are bit-identical to the batch q137 bars") {
    val q = EventsStream.ohlcStream(EventsStream.readStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("ohlc_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("ohlc_out")
    val batch = graft.SparkEntry.queries("q137_ohlc_bars")(
      spark, "/root/testdata/sf0.001")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[java.sql.Timestamp]("bucket"),
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("low"), r.getAs[Double]("high"),
          r.getAs[Double]("open"), r.getAs[Double]("close"))).toMap
    val g = keyed(got); val b = keyed(batch)
    assert(g.nonEmpty, "no closed OHLC windows emitted")
    // append mode emits only watermark-closed windows: every emitted bar
    // must equal its batch twin EXACTLY (selections, not arithmetic —
    // the doubles are the stored bytes)
    g.foreach { case (k, v) =>
      assert(b.contains(k), s"stream emitted unknown bar $k")
      assert(b(k) == v, s"bar $k diverged: stream $v vs batch ${b(k)}")
    }
  }

  test("streaming attribution: batch mode aggregates exactly to q231") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val outs = EventsStream.attributionStream(events).collect()
    // per-conversion law: credits sum to exactly 10000
    outs.groupBy(_.conv_event_id).foreach { case (c, rows) =>
      assert(rows.map(_.credit_bp).sum == 10000L, s"conv $c credits != 10000")
    }
    val got = outs.groupBy(_.touch_type).view.mapValues { rows =>
      (rows.size.toLong,
        rows.count(_.pos == 1L).toLong,
        rows.count(r => r.pos == r.n_touches).toLong,
        rows.map(_.conv_event_id).distinct.size.toLong,
        rows.map(_.credit_bp).sum)
    }.toMap
    val want = graft.queries.AdvancedQueries.all
      .find(_.name == "q231_touch_attribution").get
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("n_first"),
          r.getAs[Long]("n_last"), r.getAs[Long]("n_convs_touched"),
          r.getAs[Long]("credit_bp_total"))).toMap
    assert(got == want, "batch-mode stream must aggregate to the q231 rows")
  }

  test("streaming attribution: emitted conversions are complete and batch-identical") {
    import spark.implicits._
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val q = EventsStream.attributionStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "attribution stream did not finish in 120 s")
    val got = spark.table("attr_out").collect()
      .map(r => (r.getAs[Long]("conv_event_id"), r.getAs[Long]("touch_event_id"),
        r.getAs[Long]("pos"), r.getAs[Long]("n_touches"), r.getAs[Long]("credit_bp")))
    assert(got.nonEmpty, "the watermark must close some conversions")
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val batch = EventsStream.attributionStream(events).collect()
      .map(r => (r.conv_event_id, r.touch_event_id, r.pos, r.n_touches, r.credit_bp))
      .toSet
    assert(got.toSet.subsetOf(batch),
      "every emitted credit row must be one batch mode produces")
    // a conversion either emits ALL its rows or none — credits are atomic
    got.groupBy(_._1).foreach { case (c, rows) =>
      assert(rows.map(_._5).sum == 10000L, s"conv $c emitted partial credits")
    }
  }

  test("streaming attribution: the window caps credited touches and bounds state") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val windowUs = 3600000000L // 1 hour
    val outs = EventsStream
      .attributionStream(events, attributionWindowUs = windowUs).collect()
    val convTs = events.filter(col("event_type") === "purchase")
      .collect().map(e => e.event_id ->
        (Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L))
      .toMap
    val touchTs = events.collect().map(e => e.event_id ->
      (Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L))
      .toMap
    assert(outs.nonEmpty)
    outs.foreach { o =>
      assert(convTs(o.conv_event_id) - touchTs(o.touch_event_id) <= windowUs,
        s"credited touch ${o.touch_event_id} is outside the window")
    }
    // the law still holds over the surviving touches
    outs.groupBy(_.conv_event_id).foreach { case (c, rows) =>
      assert(rows.map(_.credit_bp).sum == 10000L, s"conv $c credits != 10000")
    }
    // unwindowed run credits at least as many touches
    val unwindowed = EventsStream.attributionStream(events).collect()
    assert(outs.length <= unwindowed.length)
  }
}
