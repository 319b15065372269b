package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Native one-pass char n-gram hashing vs the composed
  * array_distinct(transform(...)) form — order included (first
  * occurrence), multibyte included (the byte-range md5 must equal the
  * md5 of the materialized substring's UTF-8 bytes). */
class CharNgramSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String], n: Int): Unit = {
    val df = texts.toDF("t")
    val native = df.select(Dedup.charNgramHashes(col("t"), n).as("g"))
      .collect().map(_.getSeq[Long](0))
    val composed = df.select(Dedup.charNgramHashesComposed(col("t"), n).as("g"))
      .collect().map(_.getSeq[Long](0))
    texts.indices.foreach { i =>
      assert(native(i) == composed(i),
        s"n=$n text='${texts(i).take(40)}': ${native(i)} != ${composed(i)}")
    }
  }

  test("native == composed: ascii, repeats, shorter-than-n, empty") {
    both(Seq("banana", "aaaaaaa", "ab", "", "a", "the quick brown fox",
      "x" * 300), n = 3)
    both(Seq("banana", "ab"), n = 2)
    both(Seq("banana banana banana"), n = 5)
  }

  test("native == composed on multibyte UTF-8 (2-, 3- and 4-byte chars)") {
    both(Seq("日本語のテキストです", "naïve café déjà vu", "aé日b𝄞c",
      "𝄞𝄞𝄞𝄞", "mixedに日本語and ascii"), n = 3)
  }

  test("distinctness and order: first occurrence wins, duplicates collapse") {
    val got = Seq("abcabcabc").toDF("t")
      .select(Dedup.charNgramHashes(col("t"), 3).as("g"))
      .collect().head.getSeq[Long](0)
    // windows: abc bca cab abc bca cab abc -> 3 distinct, in first-seen order
    assert(got.length == 3)
    val composed = Seq("abcabcabc").toDF("t")
      .select(Dedup.charNgramHashesComposed(col("t"), 3).as("g"))
      .collect().head.getSeq[Long](0)
    assert(got == composed)
  }
}
