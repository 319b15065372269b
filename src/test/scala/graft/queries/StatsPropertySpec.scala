package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Planted-extreme checks for the exact nonparametric statistics
  * family (q248-q252): each statistic is driven to the endpoints of
  * its range on corpora where the right answer is provable by hand,
  * plus a random-corpus equality against a from-first-principles
  * BigInt reference for the rank statistics. The DuckDB oracles prove
  * engine-equality on the real testdata; these prove the STATISTICS
  * are the claimed ones. */
class StatsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def stageDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("stats-prop").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def stageEvents(rows: Seq[(Long, String, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("stats-prop-ev").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("q248 endpoints: monotone corpus -> +10000, antitone -> -10000, constant -> filtered") {
    // mono: token count i, chars 2i-1 — both strictly increasing.
    val mono = (1L to 8L).map(i =>
      (i, Seq.fill(i.toInt)("w").mkString(" "), "en", "mono"))
    // anti: token count 6-i decreasing, token width 3^i makes total
    // chars strictly increasing — a perfect inverse ranking.
    val anti = (1L to 5L).map(i =>
      (100 + i, Seq.fill(6 - i.toInt)("x" * math.pow(3, i.toDouble).toInt)
        .mkString(" "), "en", "anti"))
    // flat: every doc has 3 tokens (zero rank variance in y) but
    // distinct char counts — rho undefined, source must be absent.
    val flat = (1L to 6L).map(i =>
      (200 + i, Seq.fill(3)("y" * i.toInt).mkString(" "), "en", "flat"))
    val out = run("q248_spearman_rank", stageDocs(mono ++ anti ++ flat))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("mono" -> 10000L, "anti" -> -10000L))
  }

  test("q248 == BigInt midrank-Pearson reference on a random tied corpus") {
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { i =>
      // heavy ties in both variables: 6 token-count levels, and the
      // token width levels collide chars across different counts
      val ntok = 1 + rnd.nextInt(6)
      val wide = 1 + rnd.nextInt(4)
      (i, Seq.fill(ntok)("z" * wide).mkString(" "), "en", s"s${i % 3}")
    }
    val got = run("q248_spearman_rank", stageDocs(docs))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap

    def midrank2(vs: Seq[Long]): Seq[BigInt] = {
      val sorted = vs.sorted
      vs.map { v =>
        val below = sorted.count(_ < v)
        val ties = sorted.count(_ == v)
        // 2 * (minrank + (ties-1)/2) with minrank = below + 1
        BigInt(2) * (below + 1) + ties - 1
      }
    }
    val ref = docs.groupBy(_._4).flatMap { case (src, ds) =>
      val xs = ds.map(_._2.length.toLong)
      val ys = ds.map(_._2.split(" ", -1).length.toLong)
      val (rx, ry) = (midrank2(xs), midrank2(ys))
      val n = BigInt(ds.size)
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(b => b * b).sum)
      val num = n * sxy - sx * sy
      val (d1, d2) = (n * sxx - sx * sx, n * syy - sy * sy)
      if (d1 > 0 && d2 > 0)
        Some(src -> (ds.size.toLong,
          (num.sign * (num * num * 10000 / (d1 * d2))).toLong))
      else None
    }
    assert(got == ref)
  }

  test("q249 endpoints: equal weights -> 0; reference formula on a skewed corpus") {
    val flat = (1L to 10L).map(i => (i, "aaaa", "en", "flat"))
    val skew = (1L to 9L).map(i => (100 + i, "b", "en", "skew")) :+
      ((110L, "c" * 91, "en", "skew"))
    val out = run("q249_gini_length", stageDocs(flat ++ skew))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // skew: 9 docs of 1 char + 1 of 91 = 100 chars, n=10.
    // sum(i*w) = 45 + 10*91 = 955; (2*955 - 11*100)*10000 div 1000 = 8100
    assert(out == Map("flat" -> 0L, "skew" -> 8100L))
  }

  test("q250 endpoints: en-all-longer -> -10000, en-all-shorter -> +10000, missing stratum filtered") {
    val enLong = (1L to 4L).map(i => (i, "e" * (50 + i.toInt), "en", "a")) ++
      (1L to 5L).map(i => (10 + i, "d" * i.toInt, "de", "a"))
    val enShort = (1L to 3L).map(i => (20 + i, "e" * i.toInt, "en", "b")) ++
      (1L to 4L).map(i => (30 + i, "f" * (50 + i.toInt), "fr", "b"))
    val enOnly = Seq((40L, "eee", "en", "c"))
    val out = run("q250_mannwhitney_u", stageDocs(enLong ++ enShort ++ enOnly))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out == Map("a" -> -10000L, "b" -> 10000L))
  }

  test("q251: W1 of identical distributions is 0; point masses pay exactly the shift; a uniform shift pays the shift") {
    // week 0: identical multisets -> zero transport cost.
    val w0 = Seq(1.00, 2.50, 7.25).zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, "2024-01-02 10:00:00", 1L, "purchase", v),
        (i * 2L + 1, "2024-01-03 10:00:00", 2L, "click", v))
    }
    // week 1: point mass at 1.00 vs point mass at 3.00 -> W1 = 200
    // cents = 200000 millicents (the mean shift, exactly).
    val w1 = Seq((100L, "2024-01-09 10:00:00", 1L, "purchase", 1.00),
      (101L, "2024-01-10 10:00:00", 2L, "click", 3.00))
    // week 2: clicks are purchases shifted +2.00 with equal counts ->
    // W1 = 200 cents again, though the shapes share no support.
    val w2 = Seq((200L, "2024-01-16 10:00:00", 1L, "purchase", 1.00),
      (201L, "2024-01-16 11:00:00", 1L, "purchase", 2.00),
      (202L, "2024-01-17 10:00:00", 2L, "click", 3.00),
      (203L, "2024-01-17 11:00:00", 2L, "click", 4.00),
      // other types must not leak into either sample
      (204L, "2024-01-16 12:00:00", 3L, "view", 9.99))
    val out = run("q251_w1_drift", stageEvents(w0 ++ w1 ++ w2))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(0L -> 0L, 1L -> 200000L, 2L -> 200000L))
  }

  test("q253 endpoints + BigInt all-pairs reference, straddling bucket boundaries") {
    // mono/anti reuse the q248 shapes — Kendall must agree at the
    // endpoints: every pair concordant -> +10000, discordant -> -10000.
    val mono = (1L to 8L).map(i =>
      (i, Seq.fill(i.toInt)("w").mkString(" "), "en", "mono"))
    val anti = (1L to 5L).map(i =>
      (100 + i, Seq.fill(6 - i.toInt)("x" * math.pow(3, i.toDouble).toInt)
        .mkString(" "), "en", "anti"))
    // rnd: char counts span several x-buckets (div 64) and token
    // counts several y-buckets (div 8), with ties in both — every
    // decomposition class (cross-bucket, same-x-bucket, same-y-bucket)
    // is populated, which is what the BigInt check must cover.
    val rnd = {
      val r = new scala.util.Random(7)
      (1L to 50L).map { i =>
        val ntok = 1 + r.nextInt(20)
        val wide = 1 + r.nextInt(12)
        (200 + i, Seq.fill(ntok)("z" * wide).mkString(" "), "en", s"r${i % 2}")
      }
    }
    val got = run("q253_kendall_tau", stageDocs(mono ++ anti ++ rnd))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("mono")._3 == 10000L && got("anti")._3 == -10000L)

    val ref = (mono ++ anti ++ rnd).groupBy(_._4).flatMap { case (src, ds) =>
      val xs = ds.map(_._2.length.toLong)
      val ys = ds.map(_._2.split(" ", -1).length.toLong)
      val n = ds.size
      var s = BigInt(0)
      for (i <- 0 until n; j <- i + 1 until n)
        s += xs(j).compare(xs(i)).sign * ys(j).compare(ys(i)).sign
      val n0 = BigInt(n) * (n - 1) / 2
      val n1 = xs.groupBy(identity).values
        .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
      val n2 = ys.groupBy(identity).values
        .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
      val (d1, d2) = (n0 - n1, n0 - n2)
      if (d1 > 0 && d2 > 0)
        Some(src -> (n.toLong, s.toLong,
          (s.sign * (s * s * 10000 / (d1 * d2))).toLong))
      else None
    }
    assert(got == ref)
  }

  test("q252 endpoints: identical distributions -> 0, disjoint supports -> 10000") {
    // week 0: purchase and click values are the same multiset -> D = 0.
    val w0 = Seq(1.00, 2.50, 2.50, 7.25).zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, "2024-01-02 10:00:00", 1L, "purchase", v),
        (i * 2L + 1, "2024-01-03 10:00:00", 2L, "click", v))
    }
    // week 1: every purchase < every click -> D = 1.
    val w1 = Seq((100L, "2024-01-09 10:00:00", 1L, "purchase", 1.00),
      (101L, "2024-01-09 11:00:00", 1L, "purchase", 1.50),
      (102L, "2024-01-10 10:00:00", 2L, "click", 50.00),
      (103L, "2024-01-11 10:00:00", 3L, "click", 60.00),
      // other types must not leak into either sample
      (104L, "2024-01-09 12:00:00", 1L, "view", 1.00))
    val out = run("q252_ks_drift", stageEvents(w0 ++ w1))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(0L -> 0L, 1L -> 10000L))
  }
}
