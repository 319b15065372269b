package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental semantic-decontamination gate: reading the standing
  * SRP index with a cosine threshold must equal the batch cross-table
  * operator (q267's `srpCosineMatchesAcross`) over the same corpus —
  * after the initial build AND after appends — with zero-match evals
  * kept. Deterministic planes make append-then-read == rebuild-then-
  * read exact, the embedding twin of DedupIndexStream's
  * candidatesAcross guarantee. */
class SrpIndexDeconSpec extends SparkSpec {

  private val (bits, dim, tables) = (5, 64, 4)
  private val threshold = 0.3

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def keyOf(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString))

  test("index read == batch operator after build, after two appends, " +
      "zero-match evals kept") {
    val queries = emb.filter(col("vec_id") < 10)
    def corpus(p: org.apache.spark.sql.Column) =
      emb.filter(col("vec_id") >= 10 && p)

    Similarity.buildSrpIndex(corpus(col("vec_id") % 2 === 0),
      "vec_id", "embedding", bits, dim, tables, "srp_decon")
    def indexRead = Similarity.srpIndexMatchesAcross(spark, "srp_decon",
      queries, "vec_id", "embedding", threshold, bits, dim, tables)
      .collect().map(keyOf).toSet
    def batchRead(p: org.apache.spark.sql.Column) =
      Similarity.srpCosineMatchesAcross(corpus(p), queries,
        "vec_id", "embedding", threshold, bits, dim, tables)
        .collect().map(keyOf).toSet

    val afterBuild = indexRead
    assert(afterBuild == batchRead(col("vec_id") % 2 === 0),
      "post-build read diverged from the batch operator")
    spark.catalog.clearCache()

    Similarity.appendSrpIndex(spark, "srp_decon",
      corpus(col("vec_id") % 4 === 1), "vec_id", "embedding",
      bits, dim, tables)
    Similarity.appendSrpIndex(spark, "srp_decon",
      corpus(col("vec_id") % 4 === 3), "vec_id", "embedding",
      bits, dim, tables)
    val afterAppends = indexRead
    assert(afterAppends == batchRead(lit(true)),
      "post-append read diverged from the batch operator on the union")
    spark.catalog.clearCache()

    // the shuffle-merge probe path (large eval corpora) is value-equal
    val noBc = Similarity.srpIndexMatchesAcross(spark, "srp_decon",
      queries, "vec_id", "embedding", threshold, bits, dim, tables,
      broadcastProbes = false).collect().map(keyOf).toSet
    assert(noBc == afterAppends, "shuffle-merge probe path diverged")
    val noBcBatch = Similarity.srpCosineMatchesAcross(
      corpus(lit(true)), queries, "vec_id", "embedding", threshold,
      bits, dim, tables, broadcastProbes = false)
      .collect().map(keyOf).toSet
    assert(noBcBatch == afterAppends, "batch shuffle-merge path diverged")
    spark.catalog.clearCache()

    // every eval id is present even with no match; the fixture must
    // exercise both sides or the threshold paths are vacuous
    assert(afterAppends.map(_._1) ==
      queries.select("vec_id").collect().map(_.getLong(0)).toSet)
    assert(afterAppends.exists(_._2 > 0L), "fixture vacuous: no matches")
    assert(afterAppends.exists(_._2 == 0L), "fixture vacuous: no zero rows")
  }
}
