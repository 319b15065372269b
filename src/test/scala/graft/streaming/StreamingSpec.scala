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

  test("stateful sessionization: sessions partition each user's events") {
    import spark.implicits._
    val events = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    // batch-mode flatMapGroupsWithState: one pass, no timeouts fire, so
    // emitted sessions are the CLOSED ones; per-user open tails stay in
    // state. Closed sessions must agree with the batch q35 window query.
    val sessions = EventsStream.sessionize(events).collect()
    val batchSessions = graft.queries.AdvancedQueries.all
      .find(_.name == "q35_sessionize").get
      .run(spark, "/root/testdata/sf0.001")
      .collect()
    val users = events.select("user_id").distinct().count()
    // every closed session has a batch counterpart (same user, start, size)
    val batchKeys = batchSessions.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[Long]("n_events"))).toSet
    assert(sessions.nonEmpty)
    sessions.foreach { s =>
      assert(batchKeys.contains((s.user_id, s.session_start, s.n_events.toLong)),
        s"no batch counterpart for $s")
    }
    // closed + open (<= one open per user) accounts for every batch session
    assert(sessions.length + users >= batchSessions.length)
  }
}
