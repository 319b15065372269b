package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binary-search longest-span contamination vs a from-first-principles
  * Scala reference (every eval position x every train position x every
  * length — the quadratic spelling the operator exists to avoid). */
class LongestMatchSpec extends SparkSpec {
  import spark.implicits._

  private def reference(train: Seq[(Long, String)],
      eval: Seq[(Long, String)], cap: Int): Map[Long, (Long, Option[String])] = {
    val grams = (l: Int) => train.flatMap { case (_, t) =>
      (0 to t.length - l).map(i => t.substring(i, i + l))
    }.toSet
    eval.map { case (id, t) =>
      val best = (1 to math.min(cap, t.length)).reverse.find { l =>
        val g = grams(l)
        (0 to t.length - l).exists(i => g.contains(t.substring(i, i + l)))
      }.getOrElse(0)
      val witness = if (best == 0) None
      else Some((0 to t.length - best).map(i => t.substring(i, i + best))
        .filter(grams(best).contains).min)
      id -> (best.toLong, witness)
    }.toMap
  }

  private def run(train: Seq[(Long, String)], eval: Seq[(Long, String)],
      cap: Int): Map[Long, (Long, Option[String])] = {
    val trainDf = train.toDF("doc_id", "text")
    val out = LongestMatch.longestMatchFromRanks(
      SuffixArray.suffixRanks(trainDf, "doc_id", "text"),
      trainDf, "doc_id", "text",
      eval.toDF("eval_id", "text"), "eval_id", "text", cap)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
    spark.catalog.clearCache()
    out
  }

  test("match lengths and witnesses across full-doc dups, partial " +
      "overlaps, zero matches, and cap saturation") {
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"),
      (102L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")) // 40 a's
    val eval = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // full dup
      (2L, "a quick brown fox leaps"),  // partial overlap
      (3L, "zzz qqq vvv"),              // shares only spaces/letters
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"), // 47 a's > cap
      (5L, "&&&&"))                     // no character in common
    val cap = 16
    val got = run(train, eval, cap)
    val want = reference(train, eval, cap)
    assert(got == want, s"got $got\nwant $want")
    assert(got(1L)._1 == cap.toLong, "full dup must saturate the cap")
    assert(got(4L)._1 == cap.toLong)
    assert(got(5L) == (0L, None), "no-match doc must report 0/null")
  }

  test("eval docs shorter than the cap and single-char matches") {
    val train = Seq((100L, "abcdef"))
    val eval = Seq(
      (1L, "xbc"),   // best = "bc" (2)
      (2L, "f"),     // best = "f" (1)
      (3L, "gg"))    // no match
    val got = run(train, eval, 10)
    assert(got == reference(train, eval, 10), s"got $got")
    assert(got(1L) == (2L, Some("bc")))
    assert(got(2L) == (1L, Some("f")))
    assert(got(3L) == (0L, None))
  }

  test("witness is the lexicographically smallest among equal-length " +
      "matches") {
    val train = Seq((100L, "zz yy"))
    // "zz " and " yy" both match at length 3 ("zz y"/"z yy" do not);
    // the witness is the lexicographic min, and space sorts first
    val eval = Seq((1L, "zz xx yy"))
    val got = run(train, eval, 8)
    assert(got == reference(train, eval, 8), s"got $got")
    assert(got(1L) == (3L, Some(" yy")))
  }

  test("every fanout converges to the same answer (1 = binary, 3, " +
      "6 = default septenary, 7, and cap-wide)") {
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "aaaaaaaaaaaaaaaaaaaa"))
    val eval = Seq(
      (1L, "a quick brown fox leaps over dogs"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (3L, "&&&&"))
    val cap = 13
    val want = reference(train, eval, cap)
    Seq(1, 3, 6, 7, cap + 3).foreach { f =>
      val trainDf = train.toDF("doc_id", "text")
      val got = LongestMatch.longestMatchFromRanks(
        SuffixArray.suffixRanks(trainDf, "doc_id", "text"),
        trainDf, "doc_id", "text",
        eval.toDF("eval_id", "text"), "eval_id", "text", cap, f)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
      spark.catalog.clearCache()
      assert(got == want, s"fanout $f diverged: $got vs $want")
    }
  }

  test("property: random 3-letter-alphabet corpora (dense accidental " +
      "overlap) match the reference") {
    val rnd = new scala.util.Random(7)
    def word = (1 to (2 + rnd.nextInt(6)))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 3).foreach { trial =>
      val train = (100L to 103L).map(i =>
        (i, (1 to 5).map(_ => word).mkString(" ")))
      val eval = (1L to 6L).map(i =>
        (i, (1 to 3).map(_ => word).mkString(" ")))
      val cap = 11
      val got = run(train, eval, cap)
      val want = reference(train, eval, cap)
      assert(got == want, s"trial $trial: $got\nvs $want")
    }
  }

  test("broadcastMaxRows = 0 (every probe join shuffles) changes " +
      "nothing but the plan") {
    val train = Seq((100L, "the quick brown fox"), (101L, "aaaa bbbb"))
    val eval = Seq((1L, "a quick brown cat"), (2L, "&&&&"))
    val trainDf = train.toDF("doc_id", "text")
    val got = LongestMatch.longestMatchFromRanks(
      SuffixArray.suffixRanks(trainDf, "doc_id", "text"),
      trainDf, "doc_id", "text",
      eval.toDF("eval_id", "text"), "eval_id", "text", 12,
      broadcastMaxRows = 0L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
    spark.catalog.clearCache()
    assert(got == reference(train, eval, 12), s"got $got")
  }

  test("the standing SuffixIndex.snippets table path (r16) equals the " +
      "inline-ranks path — content and search results") {
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"))
    val eval = Seq(
      (1L, "a quick brown fox leaps"),
      (2L, "five dozen boxes"),
      (3L, "&&&&"))
    val cap = 12
    val trainDf = train.toDF("doc_id", "text")
    // standing snippet table == the inline derivation, row for row
    val standing = SuffixIndex.snippets(
      spark, "lmsniptest", trainDf, "doc_id", "text", cap)
    val ranks = SuffixArray.suffixRanks(trainDf, "doc_id", "text")
    val inline = ranks
      .join(trainDf.select(col("doc_id").as("__id"), col("text").as("__t")),
        col("doc_id") === col("__id"))
      .select(col("suffix_rank").as("__r"),
        expr(s"substring(__t, CAST(pos AS INT), $cap)").as("__snip"))
      .groupBy(col("__r")).agg(min(col("__snip")).as("__snip"))
      .select(col("__snip"))
    assert(standing.collect().map(_.getString(0)).sorted.toSeq ==
      inline.collect().map(_.getString(0)).sorted.toSeq,
      "standing snippet table diverged from the inline derivation")
    // the search over the standing table == the inline-ranks search
    val got = LongestMatch.longestMatchFromSnips(standing,
      eval.toDF("eval_id", "text"), "eval_id", "text", cap)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
    spark.catalog.clearCache()
    assert(got == reference(train, eval, cap), s"got $got")
    // and a second call reuses the table (no rebuild while fresh)
    val before = SuffixIndex.snippets(
      spark, "lmsniptest", trainDf, "doc_id", "text", cap)
      .inputFiles.toSet
    val again = SuffixIndex.snippets(
      spark, "lmsniptest", trainDf, "doc_id", "text", cap)
    assert(again.inputFiles.toSet == before,
      "a fresh corpus must not rebuild the snippet table between reads")
    spark.sql("DROP TABLE IF EXISTS graft_sufsnip_lmsniptest_c12")
    spark.sql("DROP TABLE IF EXISTS graft_sufidx_lmsniptest")
  }

  test("empty eval frame returns the right empty schema") {
    val train = Seq((100L, "abc"))
    val out = LongestMatch.longestMatchFromRanks(
      SuffixArray.suffixRanks(train.toDF("doc_id", "text"), "doc_id", "text"),
      train.toDF("doc_id", "text"), "doc_id", "text",
      Seq.empty[(Long, String)].toDF("eval_id", "text"),
      "eval_id", "text", 8)
    assert(out.columns.toSeq == Seq("eval_id", "match_len", "witness"))
    assert(out.count() == 0)
    spark.catalog.clearCache()
  }
}
