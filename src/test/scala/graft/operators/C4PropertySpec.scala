package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** Property sweep: C4's content-defined segmentation, line rules and
  * keep-one span dedup against an independent driver-side reference
  * over randomized corpora drawn from the real testdata vocabulary —
  * the BpeSpec discipline applied to the other round-16 operator
  * family. Deterministic seed: the sweep is reproducible. */
class C4PropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash",
    "join", "key", "line", "merge", "order", "part", "query", "row",
    "scan", "slow", "small", "sort", "spark", "stream", "table",
    "the", "value", "vector", "window")

  // ---- the reference, written imperatively and independently ------
  private def refSentences(text: String): Seq[Seq[String]] = {
    val toks = text.split(" ").toSeq
    val bounds = toks.indices.filter(i =>
      Portable.pmd5Local(toks(i)) % C4Rules.SentModulus == 0)
    var prev = -1
    bounds.map { b => val s = toks.slice(prev + 1, b + 1); prev = b; s }
  }
  private def refKept(text: String): Seq[String] =
    refSentences(text).filter(_.length >= C4Rules.MinSentWords)
      .map(_.mkString(" "))

  private def refSpanDedup(docs: Seq[(Long, String)]): Map[Long, String] = {
    val pages = docs.map { case (id, t) => id -> refKept(t) }
      .filter(_._2.length >= C4Rules.MinSentences).toMap
    val occ = for {
      (id, kept) <- pages.toSeq.sortBy(_._1)
      j <- 1 to kept.length - (C4Rules.SpanSentences - 1)
    } yield (kept.slice(j - 1, j - 1 + C4Rules.SpanSentences)
      .mkString(" "), id, j)
    val byHash = occ.groupBy(_._1)
    val removed = scala.collection.mutable.Set[(Long, Int)]()
    byHash.values.foreach { os =>
      if (os.size > 1) {
        val win = os.map(o => (o._2, o._3)).min
        os.foreach { o =>
          if ((o._2, o._3) != win)
            (0 until C4Rules.SpanSentences)
              .foreach(k => removed += ((o._2, o._3 + k)))
        }
      }
    }
    pages.flatMap { case (id, kept) =>
      val left = kept.zipWithIndex.collect {
        case (s, i) if !removed((id, i + 1)) => s
      }
      if (left.isEmpty) None else Some(id -> left.mkString(" "))
    }
  }

  // deterministic corpus: duplicated runs planted so spans collide
  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val shared = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (0 until n).map { i =>
      val len = 8 + rnd.nextInt(60)
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val t =
        if (i % 4 == 0) words.take(len / 2).mkString(" ") + " " + shared +
          " " + words.drop(len / 2).mkString(" ")
        else words.mkString(" ")
      (i.toLong, t)
    }
  }

  test("audit fields match the reference on 3 random corpora") {
    for (seed <- 1 to 3) {
      val docs = corpus(seed, 120)
      val got = docs.toDF("doc_id", "text")
        .select(col("doc_id"), C4Rules.audit(col("text")).as("a"))
        .select("doc_id", "a.n_sent", "a.n_short", "a.unterminated",
          "a.n_kept", "a.page_pass")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4),
            r.getBoolean(5)))).toMap
      docs.foreach { case (id, t) =>
        val sents = refSentences(t)
        val kept = refKept(t)
        val toks = t.split(" ")
        val unterm = sents.map(_.length).sum < toks.length
        val want = (sents.length.toLong,
          (sents.length - kept.length).toLong, unterm, kept.length.toLong,
          kept.length >= C4Rules.MinSentences)
        assert(got(id) == want, s"seed $seed doc $id: ${got(id)} != $want")
      }
    }
  }

  test("spanDedup matches the reference keep-one rewrite on 3 random " +
      "corpora with planted shared runs") {
    for (seed <- 4 to 6) {
      val docs = corpus(seed, 120)
      val want = refSpanDedup(docs)
      val got = C4Rules.spanDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      spark.catalog.clearCache()
      assert(got == want,
        s"seed $seed: ${got.size} vs ${want.size} survivors; " +
          s"first diff: ${(got.toSet diff want.toSet).take(2)} / " +
          s"${(want.toSet diff got.toSet).take(2)}")
      // non-vacuity: the planted shared run must actually cost some
      // page a sentence (not just line-rule filtering)
      val untouched = docs.toMap
      assert(want.exists { case (id, t) =>
        t != refKept(untouched(id)).mkString(" ") },
        s"seed $seed: the dedup removed nothing — fixture vacuous")
    }
  }
}
