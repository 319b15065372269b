package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Throwaway measurement harness for the optimization rounds — lives
  * in the TEST source set (dev-only; never ships in the production
  * jar — the r16 advisory): `sbt "Test/runMain graft.Scratch [dir]"`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.queries.Tables.{t, spread}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val docs = spread(t(spark, dir, "documents"), col("doc_id"))
      val train = docs
        .filter(col("doc_id") >= 100 && pmod(col("doc_id"), lit(10)) === 0)
        .select("doc_id", "text")
      val ranks = time("ranks (stamp check / build)")(
        graft.operators.SuffixIndex.ranks(spark, "m10", train, "doc_id", "text"))
      time("ranks count")(ranks.count())
      val cap = 40
      val base = train.select(col("doc_id").cast(LongType).as("__id"),
        col("text").as("__t"))
      val snips = ranks.join(base, col("doc_id") === col("__id"))
        .select(col("suffix_rank").as("__r"),
          expr(s"substring(__t, CAST(pos AS INT), $cap)").as("__snip"))
        .groupBy(col("__r"))
        .agg(min(col("__snip")).as("__snip"))
        .select(col("__snip"))
        .persist()
      time("snips build+persist")(snips.count())
      snips.unpersist()
      val evalDocs = docs
        .filter(col("doc_id") < 100 && pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id").as("eval_id"), col("text"))
      val lm = graft.operators.LongestMatch.longestMatchFromRanks(
        ranks, train, "doc_id", "text", evalDocs, "eval_id", "text", 40)
      time("full longestMatch")(lm.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
