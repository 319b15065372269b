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

  test("a TARGET-ONLY bucket (general DSIR: target corpus not a subset " +
      "of raw) takes the correct ct>0/cr=0 weight via the full outer " +
      "join, not the smoothed default") {
    val B = 16
    val raw = Seq((0L, 48L)).toDF("bucket", "cr")            // Tr = 48
    val tgt = Seq((0L, 1L), (3L, 15L)).toDF("bucket", "ct")  // Tt = 16
    val feats = Seq((7L, 3L)).toDF("doc_id", "bucket")  // 3: target-only
    val out = Dsir.scoreInstances(feats, "doc_id", raw, tgt, B).collect()
    // weight = floor(log2(((15+1)(48+16)) / ((0+1)(16+16))))
    //        = floor(log2(1024 / 32)) = 5 — a left join would have
    // dropped the bucket and scored the smoothed default instead
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((7L, 1L, 5L)))
  }

  test("floorDivSql == Math.floorDiv for mixed-sign numerators") {
    val cases = Seq((7L, 2L), (6L, 3L), (-7L, 2L), (-6L, 3L), (-1L, 4L),
      (0L, 5L), (1L, 1L), (-1L, 1L), (-1000001L, 7L), (1000001L, 7L),
      (Long.MinValue / 4, 3L), (Long.MaxValue / 4, 3L))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), expr(Dsir.floorDivSql("a", "b")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == Math.floorDiv(a, b),
        s"floorDiv($a, $b): got ${got((a, b))}, want ${Math.floorDiv(a, b)}")
    }
  }

  test("resampleKeep: wb_norm >= pivot keeps always; below, the keep " +
      "bit matches the integer threshold rule exactly (incl. the " +
      "2^-30 clamp)") {
    val scored = Seq(
      (1L, 4L, 8L),   // wb_norm  2: always kept
      (2L, 4L, 0L),   // wb_norm  0: always kept
      (3L, 4L, -1L),  // wb_norm -1 (floor, not trunc): p = 1/2
      (4L, 4L, -13L), // wb_norm -4: p = 1/16
      (5L, 3L, -200L) // wb_norm -67: clamps to threshold 1
    ).toDF("doc_id", "n_feats", "weight_bits")
    val out = Dsir.resampleKeep(scored, "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // wb_norm is FLOOR division
    assert(out.view.mapValues(_._1).toMap ==
      Map(1L -> 2L, 2L -> 0L, 3L -> -1L, 4L -> -4L, 5L -> -67L))
    // independent reference for the draw: pull u with a separate
    // projection, apply the documented rule in plain Scala
    val u = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
      .select(col("doc_id"), pmod(graft.functions.Portable.pmd5(
        concat(lit("dsirk:"), col("doc_id").cast("string"))),
        lit(1L << 30)).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (wbNorm, keep)) =>
      val threshold =
        if (wbNorm >= 0) 1L << 30
        else if (30 + wbNorm <= 0) 1L
        else 1L << (30 + wbNorm).toInt
      assert(keep == (u(id) < threshold),
        s"doc $id: keep=$keep, u=${u(id)}, threshold=$threshold")
    }
    assert(out(1L)._2 && out(2L)._2, "wb_norm >= 0 must always keep")
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
