package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.SparkEntry

/** q269's stupid-backoff arithmetic vs a from-first-principles Scala
  * reference, on a staged corpus whose held-out doc exercises ALL FOUR
  * levels — trigram hit, bigram backoff, unigram backoff, and the OOV
  * branch the harness corpus never reaches (its held-out vocabulary is
  * a subset of training's, so the oracle gate proves levels 1-3 only;
  * this fixture proves level 4 and the level counters). */
class BackoffSurpriseSpec extends SparkSpec {
  import spark.implicits._

  // train >= 100, eval < 100 — q269's split rule
  private val train = Seq(
    (100L, "a b c a b c"),
    (101L, "x y z"),
    (102L, "a b d"))
  private val eval = Seq(
    (1L, "a b c q y d k a b"), // tri, OOV(q), uni, uni, OOV(k), uni, bi
    (2L, "a b"))               // < 3 tokens: drops

  /** Plain-Scala stupid backoff, alpha = 1/4 (2 bits per level). */
  private def reference: Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    def toks(t: String) = t.split(" ", -1).toSeq
    def grams(n: Int) = train.flatMap(d => toks(d._2).sliding(n).toSeq
      .filter(_.size == n).map(_.toList))
    val c123 = grams(3).groupBy(identity).map { case (k, v) => k -> v.size }
    val c12t = grams(3).groupBy(_.take(2)).map { case (k, v) => k -> v.size }
    val c23 = grams(2).groupBy(identity).map { case (k, v) => k -> v.size }
    val c2 = grams(2).groupBy(_.take(1)).map { case (k, v) => k -> v.size }
    val c3 = grams(1).groupBy(identity).map { case (k, v) => k -> v.size }
    val n = grams(1).size
    def bitlen(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    (for {
      (id, t) <- eval
      tris = toks(t).sliding(3).toSeq.filter(_.size == 3).map(_.toList)
      if tris.nonEmpty
    } yield {
      val scored = tris.map { g =>
        if (c123.contains(g)) (1, bitlen(c12t(g.take(2)).toLong / c123(g)) - 1)
        else if (c23.contains(g.drop(1)))
          (2, bitlen(c2(List(g(1))).toLong / c23(g.drop(1))) - 1 + 2)
        else if (c3.contains(List(g(2))))
          (3, bitlen(n.toLong / c3(List(g(2)))) - 1 + 4)
        else (4, bitlen(n.toLong) - 1 + 6)
      }
      def cnt(l: Int) = scored.count(_._1 == l).toLong
      id -> (tris.size.toLong, scored.map(_._2).sum,
        cnt(1), cnt(2), cnt(3), cnt(4))
    }).toMap
  }

  test("registry q269 == Scala stupid-backoff reference; all four " +
      "levels exercised; sub-trigram docs drop") {
    val dir = Files.createTempDirectory("q269")
    (train ++ eval).toDF("doc_id", "text")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("q269_backoff_surprise")(spark, dir.toString)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    spark.catalog.clearCache()
    val want = reference
    assert(got == want, s"got $got\nwant $want")
    assert(!got.contains(2L), "a doc with < 3 tokens must drop")
    val totals = got.values.toSeq
    for ((lvl, i) <- Seq("tri" -> 2, "bi" -> 3, "uni" -> 4, "oov" -> 5))
      assert(totals.map(_.productElement(i).asInstanceOf[Long]).sum > 0,
        s"fixture vacuous: level $lvl never taken")
  }
}
