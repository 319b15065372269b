package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JSONL corpus edge: parquet -> jsonl[.gz] -> read must be a value
  * round-trip, and malformed lines must degrade per-field, not kill
  * the scan.
  */
class JsonlCorpusSpec extends SparkSpec {

  private def docs = graft.queries.Tables.t(
    spark, "/root/testdata/sf0.001", "documents")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "source", "lang", "n_chars", "text")
      .collect().map(_.toSeq).toSet

  test("plain JSONL round-trips the documents table exactly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    JsonlCorpus.write(docs, dir)
    val back = JsonlCorpus.read(spark, dir)
    assert(back.schema == JsonlCorpus.documentSchema)
    assert(canon(back) == canon(docs))
  }

  test("gzip JSONL round-trips and writes one compressed file per partition") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlgz").toString
    val parts = 3
    JsonlCorpus.write(docs.repartition(parts, col("doc_id")), dir, gzip = true)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length == parts,
      s"expected $parts gzip part files, got ${files.map(_.getName).toSeq}")
    assert(canon(JsonlCorpus.read(spark, dir)) == canon(docs))
  }

  test("malformed lines null the bad fields instead of failing the scan") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlbad")
    val good = """{"doc_id": 1, "source": "s", "lang": "en", "n_chars": 3, "text": "a b"}"""
    val badType = """{"doc_id": "not-a-number", "source": "s2", "lang": "en", "n_chars": 1, "text": "x"}"""
    val notJson = """this is not json at all"""
    java.nio.file.Files.writeString(dir.resolve("part-0.jsonl"),
      Seq(good, badType, notJson).mkString("\n"))
    val got = JsonlCorpus.read(spark, dir.toString)
    // PERMISSIVE: the good row intact; the bad-typed row keeps its
    // parseable fields; the unparseable line becomes an all-null row
    assert(got.count() == 3)
    assert(got.filter(col("doc_id") === 1 && col("text") === "a b").count() == 1)
    assert(got.filter(col("source") === "s2" && col("doc_id").isNull).count() == 1)
    assert(got.filter(col("source").isNull && col("doc_id").isNull
      && col("text").isNull).count() >= 1)
  }
}
