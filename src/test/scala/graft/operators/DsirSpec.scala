package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** The signed floor-log2 identity behind q265's DSIR weights, checked
  * against BigInt arithmetic (the oracle gate proves the DuckDB twin;
  * this proves the Spark spelling against ground truth), plus the
  * degenerate model paths the oracle fixture cannot reach. */
class DsirSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  /** Ground truth: floor(log2(num/den)) via exact BigInt comparisons —
    * the unique k with 2^k <= num/den < 2^(k+1), i.e. den * 2^k <= num
    * (k can be negative: num * 2^-k >= den). */
  private def refFlog2(num: Long, den: Long): Long = {
    def le(k: Int): Boolean = // 2^k <= num/den
      if (k >= 0) BigInt(den) << k <= BigInt(num)
      else BigInt(num) << -k >= BigInt(den)
    var k = 0
    while (le(k + 1)) k += 1
    while (!le(k)) k -= 1
    k.toLong
  }

  test("flog2Sql == BigInt floor(log2(num/den)) across magnitudes, " +
      "exact powers, off-by-one boundaries") {
    val rnd = new scala.util.Random(42)
    val boundary = for {
      e <- 0 to 40; d <- Seq(-1L, 0L, 1L)
      v = (1L << e) + d if v >= 1
    } yield v
    val pool = boundary ++ Seq.fill(300)(1L + rnd.nextLong(1L << 50))
    val cases = (for (_ <- 1 to 2000) yield
      (pool(rnd.nextInt(pool.size)), pool(rnd.nextInt(pool.size)))) ++
      Seq((1L, 1L), (1L, Long.MaxValue / 2), (Long.MaxValue / 2, 1L))
    val got = cases.toDF("num", "den")
      .select(col("num"), col("den"),
        expr(Dsir.flog2Sql("num", "den")).as("bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (n, d) =>
      assert(got((n, d)) == refFlog2(n, d),
        s"flog2($n/$d): got ${got((n, d))}, want ${refFlog2(n, d)}")
    }
  }

  test("target == raw makes every ratio exactly 1: all weights 0") {
    val docs = Seq((1L, "a b c"), (2L, "c d"), (3L, "e")).toDF("doc_id", "text")
    val out = Dsir.scoreSelf(docs, "doc_id", "text", lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 5L, 0L), (2L, 3L, 0L), (3L, 1L, 0L)),
      s"got ${out.toSeq}") // n_feats = unigrams + bigrams
  }

  test("scoring instances with a bucket the model never saw takes the " +
      "fully smoothed default flog2(Tr+B, Tt+B)") {
    val B = 16
    val raw = Seq((0L, 48L)).toDF("bucket", "cr")   // Tr = 48
    val tgt = Seq((0L, 1L)).toDF("bucket", "ct")    // Tt = 1
    val feats = Seq((7L, 3L)).toDF("doc_id", "bucket") // bucket 3 unseen
    val out = Dsir.scoreInstances(feats, "doc_id", raw, tgt, B).collect()
    // default = floor(log2((48+16)/(1+16))) = floor(log2(3.76..)) = 1
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((7L, 1L, 1L)))
  }

  test("empty model (nothing streamed yet) scores everything 0, " +
      "not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "cr")
    val emptyT = Seq.empty[(Long, Long)].toDF("bucket", "ct")
    val feats = Seq((1L, 5L), (1L, 9L)).toDF("doc_id", "bucket")
    val out = Dsir.scoreInstances(feats, "doc_id", empty, emptyT).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 0L)))
  }

  test("featureBuckets explodes unigrams + adjacent bigrams, hashed " +
      "into range, and a 1-token doc contributes exactly its unigram") {
    val docs = Seq((1L, "x y"), (2L, "solo")).toDF("doc_id", "text")
    val out = Dsir.featureBuckets(docs, "text", 32, Seq("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        min("bucket").as("mn"), max("bucket").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L)._1 == 3L) // x, y, "x y"
    assert(out(2L)._1 == 1L)
    out.values.foreach { case (_, mn, mx) =>
      assert(mn >= 0L && mx < 32L)
    }
  }
}
