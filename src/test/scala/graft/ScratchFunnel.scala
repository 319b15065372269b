package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: component timings for q160/q82's shared CC pipeline
  * (the r16 verdict's #8 — cut a pass or record INHERENT). */
object ScratchFunnel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Tables.{t, spread}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[funnel] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val docs = spread(t(spark, dir, "documents"), col("doc_id"))
      // q82's shape: pairs -> CC -> argmax
      val m = graft.queries.DedupQueries.getClass.getDeclaredMethods
        .find(_.getName == "lshVerifiedPairs").get
      m.setAccessible(true)
      val pairs = m.invoke(graft.queries.DedupQueries, spark, dir)
        .asInstanceOf[org.apache.spark.sql.DataFrame].persist()
      time("1 lsh verified pairs")(pairs.count())
      val comps = graft.operators.Dedup.connectedComponents(pairs)
      time("2 connected components")(comps.count())
      val j = comps.select(col("id").as("doc_id"), col("comp"))
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id").persist()
      val stats = j.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"), max(col("n_chars")).as("max_chars"))
      time("3 q82 argmax tail")(
        j.join(stats, "comp").filter(col("n_chars") === col("max_chars"))
          .groupBy(col("comp"), col("n_members"))
          .agg(min(col("doc_id")).as("rep_id")).count())
      spark.catalog.clearCache()
      time("4 q82 full")(graft.SparkEntry.queries(
        "q82_cluster_representatives")(spark, dir).count())
      spark.catalog.clearCache()
      time("5 q160 full")(graft.SparkEntry.queries(
        "q160_curation_funnel")(spark, dir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
