package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** The one-pass native minhash vs the composed per-member HOF form it
  * replaces — bit-identical values member-for-member is what keeps
  * every oracle's list_min(list_transform(...)) spelling valid. */
class MinhashAllSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  test("native == composed per member, including empty and null-element arrays") {
    val rnd = new scala.util.Random(42)
    val rows: Seq[Seq[java.lang.Long]] =
      Seq.fill(50)(Seq.fill(rnd.nextInt(40))(
        java.lang.Long.valueOf(rnd.nextLong(Portable.MinhashP)))) ++
      Seq(Seq.empty[java.lang.Long], // empty -> MaxValue members
          Seq(null, java.lang.Long.valueOf(7L), null)) // null elements skipped
    val df = rows.toDF("hs")
    val composed = df.select(
      (0 until K).map(i => Portable.minhash(i, col("hs")).as(s"c$i")): _*)
      .collect().map(r => (0 until K).map(r.getLong))
    val native = df.select(MinhashAll(col("hs"), K).as("mh"))
      .select((0 until K).map(i => col("mh").getItem(i).as(s"n$i")): _*)
      .collect().map(r => (0 until K).map(r.getLong))
    assert(composed.length == native.length)
    composed.zip(native).zipWithIndex.foreach { case ((c, n), i) =>
      assert(c == n, s"row $i: composed $c != native $n")
    }
  }

  test("NULL input array yields MaxValue members (the composed coalesce)") {
    val df = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("hs")
    val got = df.select(MinhashAll(col("hs"), 4).as("mh"))
      .collect().head.getSeq[Long](0)
    assert(got == Seq.fill(4)(Long.MaxValue))
  }

  test("the signature builders produce the same m-columns as the composed spelling") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different words in this one here now"),
      (4L, "ab"), (5L, "")).toDF("doc_id", "text")
    val viaBuilder = graft.operators.Dedup
      .minhashSignature(docs, "text", K, 3)
      .select((col("doc_id") +: (0 until K).map(i => col(s"m$i"))): _*)
      .orderBy("doc_id").collect()
      .map(r => (1 to K).map(r.getLong))
    val withHs = docs
      .withColumn("__th", Portable.tokenHashes(col("text")))
      .withColumn("__hs", Portable.shingleHashesFromTokens(col("__th")))
    val composed = withHs.select(
      (col("doc_id") +: (0 until K).map(i =>
        Portable.minhash(i, col("__hs")).as(s"m$i"))): _*)
      .orderBy("doc_id").collect()
      .map(r => (1 to K).map(r.getLong))
    assert(viaBuilder.toSeq == composed.toSeq)
    assert(viaBuilder(0) == viaBuilder(1), "identical docs must tie")
    assert(viaBuilder(0) != viaBuilder(2), "distinct docs must differ")
  }
}
