package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parquet schema evolution at the scan: a corpus written over months
  * gains columns; readers must see one superset schema with honest
  * nulls for files that predate a column — no rewrite of old files.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("mergeSchema unions generations; old files read the new column as null") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // generation 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen=1")
    // generation 2 adds a quality score
    Seq((3L, "gamma", 750L)).toDF("doc_id", "text", "quality_milli")
      .write.parquet(s"$dir/gen=2")

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("doc_id", "text", "quality_milli", "gen"))
    assert(df.count() == 3)
    // old rows: the new column is null, not dropped and not defaulted
    assert(df.filter(col("gen") === 1 && col("quality_milli").isNull).count() == 2)
    assert(df.filter(col("gen") === 2).select("quality_milli")
      .as[Long].collect().toSeq == Seq(750L))
    // and the evolved frame still aggregates cleanly (nulls skipped)
    val stats = df.agg(count(lit(1)).as("n"),
      count(col("quality_milli")).as("n_scored")).collect().head
    assert((stats.getLong(0), stats.getLong(1)) == (3L, 1L))
  }

  test("without mergeSchema, a single-footer schema would hide the new column") {
    val dir = java.nio.file.Files.createTempDirectory("evolve2").toString
    Seq((1L, "alpha")).toDF("doc_id", "text").write.parquet(s"$dir/gen=1")
    Seq((2L, "beta", 500L)).toDF("doc_id", "text", "quality_milli")
      .write.parquet(s"$dir/gen=2")
    // default read picks one footer arbitrarily — the documented reason
    // the engine's evolving-corpus reads must pass mergeSchema (or an
    // explicit schema, the JsonlCorpus discipline)
    val cols = spark.read.parquet(dir).columns.toSet
    assert(cols("doc_id") && cols("text"))
    val merged = spark.read.option("mergeSchema", "true").parquet(dir).columns.toSet
    assert(merged("quality_milli"), "mergeSchema must surface the evolved column")
  }
}
