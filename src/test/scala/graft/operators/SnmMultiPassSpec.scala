package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-pass sorted neighborhood: the single-pass blind spot (a true
  * pair whose sort keys land in different blocks) must be recovered by
  * the rotated-key pass — the property q224 claims and the in-code doc
  * of q168 promises as the production completion. */
class SnmMultiPassSpec extends SparkSpec {

  import spark.implicits._

  // the exact key derivations q224 uses
  private def norm: Column =
    regexp_replace(lower(col("text")), "[^a-z0-9]", "")
  private def keyed(df: org.apache.spark.sql.DataFrame, key: Column) =
    df.select(col("doc_id"), col("lang"),
      substring(key, 1, 12).as("sortkey"))
      .withColumn("blk", substring(col("sortkey"), 1, 4))

  // near-dup pair differing ONLY in the first character: normalized
  // prefixes "appl..." vs "bppl..." put them in different pass-1 blocks;
  // the REVERSED texts share everything but the last character, so the
  // rotated pass blocks them together. Token Jaccard = 4/6 >= 0.5.
  private val docs = Seq(
    (1L, "en", "apple banana cherry date egg"),
    (2L, "en", "bpple banana cherry date egg"),
    (3L, "en", "zebra yak xylophone walrus"),
    (4L, "en", "totally unrelated text here"),
    (5L, "en", "mid corpus filler document"))
    .toDF("doc_id", "lang", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pass 1 alone misses the boundary-straddling pair") {
    val p1 = pairs(Dedup.snmPairs(
      keyed(docs, norm), "doc_id", Seq("lang", "blk"), "sortkey", 3))
    assert(!p1.contains((1L, 2L)),
      "if pass 1 already pairs them the plant is not straddling a boundary")
  }

  test("the rotated (reversed-text) pass recovers it; union is normalized and distinct") {
    val multi = Dedup.snmMultiPassPairs(
      Seq(keyed(docs, norm), keyed(docs, reverse(norm))),
      "doc_id", Seq("lang", "blk"), "sortkey", 3)
    val got = pairs(multi)
    assert(got.contains((1L, 2L)), s"rotated pass must recover the pair; got $got")
    // normalization invariant: every pair oriented id_a < id_b, no dups
    assert(got.forall { case (a, b) => a < b })
    assert(multi.count() == got.size.toLong, "distinct must collapse cross-pass dups")
  }

  test("multi-pass is a superset of every single pass") {
    val p1 = pairs(Dedup.snmPairs(
      keyed(docs, norm), "doc_id", Seq("lang", "blk"), "sortkey", 3))
    val p2 = pairs(Dedup.snmPairs(
      keyed(docs, reverse(norm)), "doc_id", Seq("lang", "blk"), "sortkey", 3))
    val multi = pairs(Dedup.snmMultiPassPairs(
      Seq(keyed(docs, norm), keyed(docs, reverse(norm))),
      "doc_id", Seq("lang", "blk"), "sortkey", 3))
    assert((p1 union p2) == multi)
  }
}
