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
    import graft.operators.Dedup
    import graft.queries.Tables.{t, spread}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val (kk, shingle, nb, rpb, jt) = (16, 3, 4, 4, 0.7)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val docs = spread(t(spark, dir, "documents"), col("doc_id"))
      val banded = Dedup.bandKeys(
        Dedup.minhashSignature(docs, "text", kk, shingle), kk, rpb)
      time("banded count")(banded.count())
      val cands = Dedup.lshCandidates(banded, "doc_id", nb)
      time("lsh candidates")(cands.count())
      val sets = docs.select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("ts"))
      val pairs = cands
        .join(sets.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("ts", "ts_a"), "id_a")
        .join(sets.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("ts", "ts_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccard(col("ts_a"), col("ts_b")).as("jaccard"))
        .filter(col("jaccard") >= jt)
      time("verified pairs")(pairs.count())
      val comps = time("connectedComponents build")(
        Dedup.connectedComponents(pairs.select("id_a", "id_b")))
      time("components count")(comps.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
