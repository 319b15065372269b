package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE registered query against an sf dir and print
  * its row count and wall time — the single-query iteration loop that
  * Bench (full suite) and Verify (full dump) are too heavy for.
  *
  * {{{ sbt "runMain graft.RunOne q75_triangle_count /root/testdata/sf0.1" }}}
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
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
    spark.sparkContext.setLogLevel("WARN")
    // A/B timing aid: SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2" sets session
    // confs (e.g. graft.topk.rewrite.enabled=false) before the run
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(ck, cv) = kv.split("=", 2)
        spark.conf.set(ck, cv)
      })
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // two passes: cold (includes codegen + scan warmup) and warm
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[runone] $name pass$pass: rows=$n wall=$dt%.2fs")
    }
    val rows = fn(spark, sfDir).collect()
    if (rows.length <= 5) println(s"[runone] result: ${rows.mkString(" | ")}")
    spark.stop()
  }
}
