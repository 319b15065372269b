package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round — times
  * the internal stages of a query under investigation. Not part of
  * the driver contract; removed or inert once the round closes. */
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
    import graft.operators.C4Rules
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
        .select(col("doc_id"), col("source"), col("text"))
      time("audit agg (q283 shape)")(
        docs.select(col("doc_id"), C4Rules.audit(col("text")).as("a"))
          .select(col("doc_id"), col("a.n_kept").as("nk")).count())
      val ts = docs.select(col("doc_id"), split(col("text"), " ").as("__ts"))
      time("ts only")(ts.count())
      val bp = ts.select(col("doc_id"), col("__ts"),
        filter(sequence(lit(1), size(col("__ts"))), i =>
          graft.functions.Portable.pmd5(element_at(col("__ts"), i)) % 5 === 0)
          .as("__bp"))
      time("ts+bp")(bp.count())
      val kept = docs.select(col("doc_id"), C4Rules.keptSentences(col("text")).as("kept"))
      time("keptSentences one-projection")(kept.count())
      val pgNofilter = kept
      time("kept + size filter")(pgNofilter.filter(size(col("kept")) >= 3).count())
      val pg0 = C4Rules.pageRows(docs, "doc_id", "text")
      time("pageRows (staged)")(pg0.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
