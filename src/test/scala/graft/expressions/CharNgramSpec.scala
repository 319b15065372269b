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

  test("native == composed on MALFORMED UTF-8 (invalid lead bytes walk " +
      "Spark's own numBytesForFirstByte table)") {
    // invalid lead bytes (0xC0/0xC1, 0xF5-0xFF) and bare continuation
    // bytes advance 1 in Spark's table; a hand-rolled mirror that
    // advanced them 2/4 put the native windows on different char
    // boundaries than the composed substr walk. Raw bytes reach
    // UTF8String unvalidated via a binary->string cast.
    val bads: Seq[Array[Byte]] = Seq(
      Array(0xC0, 'a', 'b', 'c', 0xC1, 'd').map(_.toByte),
      Array(0xF5, 0xF6, 0xFF, 'x', 'y', 'z').map(_.toByte),
      Array('a', 0x80, 0xBF, 'b', 'c', 'd').map(_.toByte), // bare continuations
      Array(0xC0, 0x80, 0xC1, 0xBF, 0xF5, 0x90, 0x90, 0x90).map(_.toByte))
    val df = bads.toDF("b").select(col("b").cast("string").as("t"))
    val native = df.select(Dedup.charNgramHashes(col("t"), 3).as("g"))
      .collect().map(_.getSeq[Long](0))
    val composed = df.select(Dedup.charNgramHashesComposed(col("t"), 3).as("g"))
      .collect().map(_.getSeq[Long](0))
    bads.indices.foreach { i =>
      assert(native(i) == composed(i), s"malformed row $i differs")
    }
  }

  test("truncated trailing multibyte char: native CLAMPS to the string's " +
      "bytes (the composed substr over-reads one padding byte)") {
    // 'a','b','c','d',0xE3,0x81 — the final 3-byte lead char has only 2
    // bytes. UTF8String.substring advances past numBytes before its
    // copy, so the composed form's last window hashes cd E3 81 00 (one
    // byte of UnsafeRow zero padding — an unsafe read, not a contract).
    // The native walk clamps the window to the string's real bytes:
    // the ONE deliberate, documented divergence from the composed form.
    val bytes = Array('a', 'b', 'c', 'd', 0xE3, 0x81).map(_.toByte)
    val df = Seq(bytes).toDF("b").select(col("b").cast("string").as("t"))
    val got = df.select(Dedup.charNgramHashes(col("t"), 3).as("g"))
      .collect().head.getSeq[Long](0)
    // last window = md5 over the CLAMPED byte range "cd\xE3\x81"
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(Array('c', 'd', 0xE3, 0x81).map(_.toByte))
    val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
    assert(got.last == h60 % graft.functions.Portable.MinhashP)
    assert(got.length == 3) // windows abc, bcd, cd+truncated
  }

  test("column built under one session analyzes in a cloned session " +
      "(no temp-function registry dependence)") {
    // newSession() shares the catalog but NOT temp functions; the old
    // call_function spelling registered in the ACTIVE session and
    // failed analysis here. The expression now rides in the Column.
    val col3 = Dedup.charNgramHashes(col("t"), 3) // built with `spark` active
    val s2 = spark.newSession()
    val df2 = s2.createDataFrame(Seq(Tuple1("banana"))).toDF("t")
    val got = df2.select(col3.as("g")).collect().head.getSeq[Long](0)
    val want = Seq(Tuple1("banana")).toDF("t")
      .select(Dedup.charNgramHashesComposed(col("t"), 3).as("g"))
      .collect().head.getSeq[Long](0)
    assert(got == want)
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
