package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The k-round greedy coverage loop must equal a from-first-principles
  * greedy on a planted corpus, stop when the space is exhausted, and
  * agree with q229's oracled 2-round slice on real testdata. */
class CoverageSpec extends SparkSpec {

  import spark.implicits._

  private def referenceGreedy(docs: Seq[(Long, Set[String])],
      k: Int): Seq[(Long, Long)] = {
    var covered = Set.empty[String]
    val out = Seq.newBuilder[(Long, Long)]
    var continue = true
    var r = 0
    while (r < k && continue) {
      val gains = docs.map { case (id, fs) => (id, (fs -- covered).size.toLong) }
      val (id, g) = gains.minBy { case (i, g) => (-g, i) } // max gain, min id
      if (g == 0) continue = false
      else { out += ((id, g)); covered ++= docs.find(_._1 == id).get._2; r += 1 }
    }
    out.result()
  }

  test("k-round loop == reference greedy, ties broken on id") {
    val docs = Seq(
      (1L, Set("a", "b", "c", "d")),     // round-1 winner (4 features)
      (2L, Set("a", "b", "e", "f")),     // marginal 2 after doc 1
      (3L, Set("e", "f", "g")),          // marginal 3 -> round-2 winner
      (4L, Set("a", "b")),               // fully covered after round 2... no: a,b covered r1
      (5L, Set("h")),                    // marginal 1 until picked
      (6L, Set("c", "d", "g", "h")))     // marginal 2 after r2 (g covered)
    val df = docs.map { case (id, fs) => (id, fs.toSeq.sorted) }
      .toDF("doc_id", "feats")
    val got = Coverage.greedySelect(df, "doc_id", "feats", 4)
    assert(got == referenceGreedy(docs, 4), s"got $got")
  }

  test("k=50 planted corpus: matches reference greedy; covered-plan " +
      "depth stays O(1) in k; shuffle path (broadcast bound 0) agrees") {
    // 60 docs, each one unique feature + one of 7 shared ones: greedy
    // must run the full 50 rounds (unique features never exhaust).
    val docs = (1L to 60L).map(i => (i, Set(s"u$i", s"shared${i % 7}")))
    val df = docs.map { case (id, fs) => (id, fs.toSeq.sorted) }
      .toDF("doc_id", "feats")
    val got = Coverage.greedySelect(df, "doc_id", "feats", 50)
    assert(got == referenceGreedy(docs, 50), s"got $got")
    // the round-8 verdict task: covered lineage used to be a chained
    // union().distinct() of depth O(k); after per-round truncation the
    // analyzed plan of the final covered view is a small constant
    val depth = Coverage.lastCoveredPlanDepth
    assert(depth > 0 && depth <= 8,
      s"covered plan depth $depth should not grow with k=50")
    // broadcastMaxRows = 0 forces the no-hint shuffle anti-join from
    // round 2 on; the picks are a pure function of the data
    val shuffled = Coverage.greedySelect(df, "doc_id", "feats", 50,
      broadcastMaxRows = 0L)
    assert(shuffled == got, "hint choice must not change the selection")
  }

  test("selection stops early once every feature is covered") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("b")), (3L, Seq("a")))
      .toDF("doc_id", "feats")
    val got = Coverage.greedySelect(df, "doc_id", "feats", 10)
    assert(got == Seq((1L, 2L)), s"doc 1 covers everything; got $got")
  }

  test("first two rounds match q229's oracled picks on real testdata") {
    val w = split(col("text"), " ")
    val sets = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        array_distinct(transform(
          graft.functions.TextAnalysis.indices1(size(w) - 1),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
          .as("feats"))
    val ops = Coverage.greedySelect(sets, "doc_id", "feats", 2)
    val q = graft.SparkEntry.queries("q229_coverage_select")(
      spark, "/root/testdata/sf0.001").orderBy("pick_round").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(ops == q, s"operator $ops vs query $q")
  }
}
