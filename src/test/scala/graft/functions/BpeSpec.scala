package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Plain-Scala reference BPE (Sennrich et al. 2016 algorithm 1):
    * pair counts over the vocab, greedy left-to-right merge, total
    * tiebreak (count DESC, left ASC, right ASC). */
  private def referenceBpe(vocab: Map[String, Long], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, List[String]]) = {
    var words = vocab.map { case (w, f) => w.split("(?!^)").toList -> f }.toList
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, f) =>
        sym.zip(sym.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val ((a, b), n) = eligible.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((a, b, n))
        words = words.map { case (sym, f) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = sym
          while (rest.nonEmpty) rest match {
            case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
            case x :: tail => out += x; rest = tail
            case Nil => ()
          }
          out.toList -> f
        }
        i += 1
      }
    }
    (merges.result(),
      vocab.keys.map { w =>
        w -> {
          var sym = w.split("(?!^)").toList
          merges.result().foreach { case (a, b, _) =>
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var rest = sym
            while (rest.nonEmpty) rest match {
              case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
              case x :: tail => out += x; rest = tail
              case Nil => ()
            }
            sym = out.toList
          }
          sym
        }
      }.toMap)
  }

  private val vocab = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train matches the reference merge sequence (classic vocab)") {
    val wc = vocab.toSeq.toDF("w", "f")
    val got = Bpe.train(wc, 8).map(m => (m.left, m.right, m.count))
    val (want, _) = referenceBpe(vocab, 8)
    assert(got == want)
  }

  test("applyMerges reproduces the reference tokenization, incl. unseen words") {
    val wc = vocab.toSeq.toDF("w", "f")
    val merges = Bpe.train(wc, 6)
    val (_, wantTok) = referenceBpe(vocab, 6)
    val words = (vocab.keys.toSeq :+ "lowest").toDF("w")
    val got = words.select(col("w"), Bpe.applyMerges(col("w"), merges).as("sym"))
      .as[(String, Seq[String])].collect().toMap
    vocab.keys.foreach(w => assert(got(w) == wantTok(w), s"word $w"))
    // unseen word segments with trained merges, no retrain needed
    assert(got("lowest").mkString("|").replace("|", "") == "lowest")
  }

  test("overlapping pairs merge greedily left-to-right (aaa + (a,a) -> [aa, a])") {
    val df = Seq(Tuple1("aaa")).toDF("w")
    val got = df.select(Bpe.mergePair(Bpe.charSymbols(col("w")), "a", "a"))
      .as[Seq[String]].head()
    assert(got == Seq("aa", "a"))
  }

  test("train stops when no pair occurs twice") {
    val wc = Seq(("ab", 1L)).toDF("w", "f")
    assert(Bpe.train(wc, 10).isEmpty)
  }

  test("empty-string symbols are real symbols, not the fold sentinel") {
    // charSymbols("") == [""] and mergePair must flush it, matching
    // Scala's "".split which also yields Array("")
    val df = Seq(Tuple1("")).toDF("w")
    val got = df.select(Bpe.mergePair(Bpe.charSymbols(col("w")), "x", "y"))
      .as[Seq[String]].head()
    assert(got == Seq(""))
  }

  test("first trained merge on the corpus == q90's rank-1 pair") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val m = Bpe.train(wc, 1).head
    val q90 = graft.SparkEntry
      .queries("q90_bpe_first_merge")(spark, "/root/testdata/sf0.001")
      .filter(col("rnk") === 1)
      .select(col("pair"), col("n")).as[(String, Long)].head()
    assert(m.left + m.right == q90._1 && m.count == q90._2)
  }
}
