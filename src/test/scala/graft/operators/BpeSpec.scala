package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE merge semantics pinned against an independent Scala reference
  * (greedy left-to-right non-overlapping, scan continuing after each
  * match — the Sennrich reference behavior), exhaustively over every
  * short symbol sequence, plus a hand-computed trainer fixture. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The reference implementation, written as the paper describes it
    * (imperative scan), independent of the closed form under test. */
  private def refMerge(l: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < l.length) {
      if (i + 1 < l.length && l(i) == a && l(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += l(i); i += 1 }
    }
    out.toSeq
  }

  test("mergeOnce == the reference greedy scan for EVERY sequence of " +
      "length <= 6 over {x, y}, for a self-pair and both cross pairs") {
    val seqs = (1 to 6).flatMap { n =>
      (0 until math.pow(2, n).toInt).map { bits =>
        (0 until n).map(k => if ((bits >> k & 1) == 0) "x" else "y")
      }
    }
    for (pair <- Seq(("x", "x"), ("x", "y"), ("y", "x"))) {
      val got = seqs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "l")
        .select(col("id"), Bpe.mergeOnce(col("l"), pair._1, pair._2).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      seqs.zipWithIndex.foreach { case (s, i) =>
        val want = refMerge(s, pair._1, pair._2)
        assert(got(i.toLong) == want,
          s"pair $pair on $s: got ${got(i.toLong)}, want $want")
      }
    }
  }

  test("trainMerges learns the hand-computed table and tokenizedVocab " +
      "replays it; ties break (count desc, pair asc)") {
    // vocab: aaab x3, ab x1. Round 1: (a,a)=6 beats (a,b)=4.
    // Round 2: (a,b)=4 beats (aa,a)=3. Round 3: (aa,ab)=3. Then dry.
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab"))
      .toDF("doc_id", "text")
    val learned = Bpe.trainMerges(docs, "text", rounds = 8)
    assert(learned == Seq((1, "a", "a", 6L), (2, "a", "b", 4L),
      (3, "aa", "ab", 3L)),
      s"learned $learned")
    val tv = Bpe.tokenizedVocab(docs, "text",
        learned.map(m => (m._2, m._3)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(tv == Map("aaab" -> Seq("aaab"), "ab" -> Seq("ab")))
    spark.catalog.clearCache()
  }

  test("single-character words survive every stage (no pairs, no rows " +
      "in the pair table, form unchanged)") {
    val docs = Seq((1L, "a a bc")).toDF("doc_id", "text")
    val learned = Bpe.trainMerges(docs, "text", rounds = 2)
    // round 1: only pair is (b, c) with count 1
    assert(learned.head == ((1, "b", "c", 1L)), s"got $learned")
    val tv = Bpe.tokenizedVocab(docs, "text", learned.map(m => (m._2, m._3)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(tv("a") == Seq("a") && tv("bc") == Seq("bc"))
    spark.catalog.clearCache()
  }
}
