package graft.operators

import graft.SparkSpec

/** Prefix-doubling suffix ranks vs a from-first-principles reference
  * (materialize every suffix, sort, dense-rank) on corpora chosen to
  * hit the construction's edges: prefix-of-another suffixes (the
  * sentinel path), duplicate documents (ties that survive to the last
  * round), single-character runs (maximal tie depth — the loop must
  * run all log2(len) rounds), and degenerate inputs. */
class SuffixArraySpec extends SparkSpec {

  import spark.implicits._

  private def brute(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sfx = for ((id, t) <- docs; p <- 1 to t.length)
      yield ((id, p.toLong), t.substring(p - 1))
    val rankOf = sfx.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    sfx.map { case (k, s) => k -> rankOf(s) }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("banana: the textbook suffix order") {
    val docs = Seq((7L, "banana"))
    val got = run(docs)
    assert(got == brute(docs))
    // a(6) < ana(4) < anana(2) < banana(1) < na(5) < nana(3)
    assert(got == Map((7L, 6L) -> 1L, (7L, 4L) -> 2L, (7L, 2L) -> 3L,
      (7L, 1L) -> 4L, (7L, 5L) -> 5L, (7L, 3L) -> 6L))
  }

  test("prefix suffixes rank before their extensions; ranks dense across docs") {
    // "ab" is a prefix of "abab"'s pos-1 suffix: the sentinel-0 tail
    // must sort it first, exactly like the string compare
    val docs = Seq((1L, "abab"), (2L, "ab"), (3L, "ba"))
    assert(run(docs) == brute(docs))
  }

  test("duplicate documents tie every suffix rank, dense over DISTINCT suffixes") {
    val docs = Seq((1L, "banana"), (2L, "banana"), (3L, "band"))
    val got = run(docs)
    assert(got == brute(docs))
    assert((1 to 6).forall(p => got((1L, p.toLong)) == got((2L, p.toLong))),
      "identical docs must share every rank")
    val maxRank = got.values.max
    assert(got.values.toSet == (1L to maxRank).toSet, "rank space must be dense")
  }

  test("single-character runs force the full round count (deepest tie chains)") {
    // every proper suffix of "aaaaaaaa" is a prefix of the longer ones:
    // ties only resolve as the doubled span reaches each length
    val docs = Seq((1L, "aaaaaaaa"), (2L, "aaab"))
    assert(run(docs) == brute(docs))
  }

  test("degenerates: empty slice and 1-char docs") {
    assert(run(Seq.empty[(Long, String)]).isEmpty)
    val docs = Seq((1L, "x"), (2L, "y"), (3L, "x"))
    assert(run(docs) == brute(docs))
  }
}
