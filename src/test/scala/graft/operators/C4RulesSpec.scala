package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** C4 structural rules + keep-one span dedup on a hand-built fixture
  * whose boundary structure is known exactly: with SentModulus = 5
  * the corpus-vocabulary boundary words are {group, join, vector,
  * filter, sort} (asserted below, so a constant change fails loudly
  * here instead of silently re-segmenting every expectation). */
class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  // five 5-word sentences, each ending in exactly one boundary word
  private val A = "the fast big data sort"
  private val B = "key table window row join"
  private val C = "slow small agg value filter"
  private val D = "batch stream merge dup group"
  private val E = "spark hash line part vector"

  private def j(ss: String*): String = ss.mkString(" ")

  test("fixture guard: boundary words are exactly the sentence tails") {
    val words = j(A, B, C, D, E).split(" ")
    val bounds = words.filter(w => Portable.pmd5Local(w) % C4Rules.SentModulus == 0)
    assert(bounds.toSeq == Seq("sort", "join", "filter", "group", "vector"))
  }

  test("audit: terminated sentences, short drop, unterminated tail, page rule") {
    // sentence1 = 'the fast key join' (4 words -> short), sentence2 = A
    // (5 words, kept), then an unterminated 2-word tail
    val df = Seq((1L, "the fast key join " + A + " table window"))
      .toDF("doc_id", "text")
      .select(C4Rules.audit(col("text")).as("a")).select("a.*")
    val r = df.collect().head
    assert(r.getAs[Long]("n_sent") == 2)
    assert(r.getAs[Long]("n_short") == 1)
    assert(r.getAs[Boolean]("unterminated"))
    assert(r.getAs[Long]("n_kept") == 1)
    assert(!r.getAs[Boolean]("page_pass"))
    // no boundary word at all: everything is tail, zero sentences
    val none = Seq((2L, "the fast big data"))
      .toDF("doc_id", "text")
      .select(C4Rules.audit(col("text")).as("a")).select("a.*")
      .collect().head
    assert(none.getAs[Long]("n_sent") == 0)
    assert(none.getAs[Boolean]("unterminated"))
    assert(!none.getAs[Boolean]("page_pass"))
  }

  test("segmentation is offset-invariant: the same sentence text " +
      "yields the same sentence at any document offset") {
    val df = Seq((1L, j(A, B)), (2L, j(E, A, B)))
      .toDF("doc_id", "text")
      .select(col("doc_id"), C4Rules.keptSentences(col("text")).as("k"))
    val m = df.collect().map(r => r.getLong(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1))).toMap
    assert(m(1L) == Seq(A, B))
    assert(m(2L) == Seq(E, A, B))
  }

  test("spanDedup: first occurrence wins, losers surrender their " +
      "sentences, fully-consumed documents leave, untouched pages " +
      "bypass with line rules applied") {
    val docs = Seq(
      (10L, "s0", j(A, B, C, D)),          // owns spans ABC, BCD
      (20L, "s0", j(E, A, B, C)),          // loses span ABC -> E remains
      (30L, "s1", j(B, C, D, E)),          // loses span BCD -> E remains
      (40L, "s1", j(A, B, C)),             // loses ABC entirely -> gone
      (50L, "s2", j(E, D) + " the fast"),  // 2 kept sentences: thin page, gone
      (60L, "s2", j(D, E, "the fast key join", C)) // unique spans, untouched
    ).toDF("doc_id", "source", "text")
    val out = C4Rules.spanDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out.keySet == Set(10L, 20L, 30L, 60L))
    assert(out(10L) == ("s0", j(A, B, C, D)))
    assert(out(20L) == ("s0", E))
    assert(out(30L) == ("s1", E))
    // 60's short sentence ('the fast key join', 4 words) drops by the
    // line rule even though the page is never touched by the dedup
    assert(out(60L) == ("s2", j(D, E, C)))
  }

  test("c4SpanCompact: the snapshot is exactly the spanDedup rewrite " +
      "of the landed corpus, extra columns intact") {
    val root = java.nio.file.Files.createTempDirectory("c4compact")
    val sink = root.resolve("sink").toString
    val outDir = root.resolve("snap").toString
    val docs = Seq(
      (10L, "s0", j(A, B, C, D)),
      (20L, "s0", j(E, A, B, C)),   // loses span ABC -> E remains
      (40L, "s1", j(A, B, C)))      // loses ABC entirely -> gone
      .toDF("doc_id", "source", "text")
    docs.write.parquet(sink)
    val n = Maintenance.c4SpanCompact(spark, sink, outDir, "text", "doc_id")
    assert(n >= 1)
    val got = spark.read.parquet(outDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("text"))).toMap
    assert(got == Map(10L -> ("s0", j(A, B, C, D)), 20L -> ("s0", E)))
    spark.catalog.clearCache()
  }

  test("pagePass is the audit's page verdict") {
    val docs = Seq((1L, j(A, B, C)), (2L, j(A, B)), (3L, j(A, B, "the fa")))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), C4Rules.pagePass(col("text")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }
}
