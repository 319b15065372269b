package graft.operators

import graft.SparkSpec

/** The standing BPE merge table: built once per corpus fingerprint,
  * reused while the stamp matches, rebuilt when the corpus or the
  * rounds setting moves — and the frozen list must equal
  * [[Bpe.trainMerges]]' inline training bit-for-bit (the q285
  * contract, pinned at operator grain so a drift shows up without
  * the oracle round-trip). */
class BpeIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(salt: String) = Seq(
    (1L, s"aaab aaab ${salt}x"), (2L, "aaab ab ba"))
    .toDF("doc_id", "text")

  test("build once, reuse on matching stamp, rebuild when the corpus " +
      "or the rounds setting moves; frozen list == inline training") {
    val docs = corpus("a")
    val before = BpeIndex.buildCount
    val got = BpeIndex.mergeList(spark, "bpespec", docs, "doc_id",
      "text", rounds = 3)
    assert(BpeIndex.buildCount == before + 1, "first call must build")
    val inline = Bpe.trainMerges(docs, "text", 3).map(m => (m._2, m._3))
    assert(got == inline, s"standing $got != inline $inline")

    BpeIndex.mergeList(spark, "bpespec", docs, "doc_id", "text", rounds = 3)
    assert(BpeIndex.buildCount == before + 1,
      "matching stamp must reuse the standing table")

    // a different rounds setting is a different model generation
    BpeIndex.mergeList(spark, "bpespec", docs, "doc_id", "text", rounds = 2)
    assert(BpeIndex.buildCount == before + 2,
      "a rounds change must rebuild")

    // moved corpus -> stamp misses -> rebuild
    BpeIndex.mergeList(spark, "bpespec", corpus("bb"), "doc_id",
      "text", rounds = 2)
    assert(BpeIndex.buildCount == before + 3,
      "a moved corpus must rebuild")
    spark.catalog.clearCache()
  }
}
