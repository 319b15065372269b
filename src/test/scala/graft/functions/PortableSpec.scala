package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PortableSpec extends SparkSpec {
  import spark.implicits._

  test("pmd5Local (driver) == pmd5 (executor expression) for varied inputs") {
    val samples = Seq("", "a", "hello world", "p0,1", "0:the fast key",
      "日本語テキスト", "x" * 500)
    val got = samples.toDF("s")
      .select(col("s"), Portable.pmd5(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == Portable.pmd5Local(s), s"mismatch for '$s'")
    }
  }

  test("wordShingles: n-grams in order, short docs empty") {
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(Portable.wordShingles(col("t"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq.empty)
  }

  test("rolling fingerprint is order-sensitive (unlike the set measures)") {
    val df = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(Portable.rollingFingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < Portable.FpMod))
  }

  test("minhash: identical shingle sets agree, family members differ") {
    val df = Seq("x y z w", "x y z w", "q r s t").toDF("t")
      .select(Portable.baseHashes(Portable.wordShingles(col("t"), 2)).as("hs"))
      .select((0 until 4).map(i => Portable.minhash(i, col("hs")).as(s"m$i")): _*)
    val rows = df.collect()
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
    val r0 = (0 until 4).map(rows(0).getLong)
    assert(r0.distinct.length > 1) // members are independent maps
    assert(r0.forall(m => m >= 0 && m < Portable.MinhashP))
  }
}
