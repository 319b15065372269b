package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Property-style checks for the curation queries on ADVERSARIAL
  * synthetic corpora — shapes the real testdata never exercises
  * (degenerate histograms, extreme skew). */
class CurationPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Stage a documents.parquet with the given (doc_id, text, source)
    * rows; lang/n_chars ride along for schema compatibility. */
  private def stage(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curation-prop").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("q95 histogram refine == q85 full window on degenerate shapes") {
    val shapes = Seq(
      // all docs identical length -> width 1, every rank in bin 0
      "flat" -> (1L to 40L).map(i => (i, Seq.fill(7)("w").mkString(" "), "s")),
      // single doc per source -> every quantile is that one row
      "single" -> Seq((1L, "a b c", "s1"), (2L, "a b c d e", "s2")),
      // bimodal extremes -> nearly-empty middle bins
      "bimodal" -> (1L to 30L).map(i =>
        (i, Seq.fill(if (i % 2 == 0) 2 else 5000)("w").mkString(" "), "s")),
      // strictly monotone lengths across two sources
      "monotone" -> (1L to 50L).map(i =>
        (i, Seq.fill(i.toInt)("w").mkString(" "), s"s${i % 2}")))
    for ((label, rows) <- shapes) {
      val dir = stage(rows)
      val refine = run("q95_quantile_refine", dir).collect().toSet
      val window = run("q85_length_quantiles", dir).collect().toSet
      assert(refine == window, s"shape '$label' diverged")
    }
  }

  test("q94 two-pass heavy hitters == exact threshold set under extreme skew") {
    // one dominant token, a mid tier straddling the N/64 bar, a long tail
    val text = (Seq.fill(2000)("hot") ++ Seq.fill(40)("mid") ++
      (1 to 300).map(i => s"tail$i")).mkString(" ")
    val dir = stage(Seq((1L, text, "s")))
    val got = run("q94_heavy_hitters", dir)
      .select("tok", "cnt").as[(String, Long)].collect().toMap
    val n = 2000 + 40 + 300
    val exact = (Seq("hot" -> 2000L, "mid" -> 40L) ++
      (1 to 300).map(i => s"tail$i" -> 1L))
      .filter { case (_, c) => c * 64 > n }.toMap
    assert(got == exact)
    assert(got.contains("hot") && got.contains("mid") && got.size == 2)
  }
}
