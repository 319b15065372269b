package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement aid (guide §1): run named queries (or all) and report,
  * per query, wall seconds plus the JOB / STAGE / TASK counts and total
  * shuffle bytes a warm run schedules — the "how many passes, how many
  * barriers, how many bytes cross" numbers that pick optimization
  * targets. Two passes per query; the SECOND (warm: codegen + file
  * listing cached) is reported, matching what Bench's min-of-3
  * effectively measures.
  *
  *   sbt "runMain graft.Profile [sfDir] [query ...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); ()
      }
    })
    println(f"${"query"}%-38s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shufMB"}%7s")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          var dt = 0.0
          (1 to 2).foreach { pass =>
            // the listener bus drains async: settle BEFORE resetting
            // too, or the previous pass/query's late events bleed
            // into this pass's counters (r16 advisory)
            Thread.sleep(400)
            jobs.set(0); stages.set(0); tasks.set(0); shuffleBytes.set(0L)
            val t0 = System.nanoTime()
            try fn(spark, sfDir).count()
            catch { case e: Throwable => System.err.println(s"$n: $e") }
            dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            if (pass == 2) {
              // ...and again before reading this pass's counts
              Thread.sleep(400)
              println(f"$n%-38s $dt%7.2f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${shuffleBytes.get / 1e6}%7.1f")
            }
          }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
