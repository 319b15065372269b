package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Property / brute-force cross-checks for the profiling queries
  * (q177+): hand-built inputs with known answers, plus driver-side
  * recomputation on the small testdata where the semantics allow. */
class ProfilingQueriesSpec extends SparkSpec {

  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  // ------------------------------------------------------------------
  // q177: integer-sqrt weights recomputed driver-side
  // ------------------------------------------------------------------

  test("q177: weights are floor-sqrt of shares, normalized to <= 10000 bp") {
    val rows = run("q177_temperature_mix", SF)
      .select("lang", "cnt", "share_e8", "sqrt_share_e4", "weight_bp")
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val wsum = rows.map(_.getLong(3)).sum
    for (r <- rows) {
      val share = r.getLong(1) * 100000000L / total
      assert(r.getLong(2) == share, s"share for ${r.getString(0)}")
      assert(r.getLong(3) == math.sqrt(share.toDouble).toLong,
        s"sqrt weight for ${r.getString(0)}")
      assert(r.getLong(4) == r.getLong(3) * 10000L / wsum)
    }
    // floor-normalization never exceeds the full scale
    assert(rows.map(_.getLong(4)).sum <= 10000L)
    // sqrt compresses: the weight ORDER still follows the count order
    val byCnt = rows.sortBy(_.getLong(1)).map(_.getLong(4))
    assert(byCnt.zip(byCnt.tail).forall { case (a, b) => a <= b })
  }

  // ------------------------------------------------------------------
  // q178: greedy selection is the maximal affordable prefix
  // ------------------------------------------------------------------

  test("q178: kept set is the maximal budget-affordable prefix per source") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_distinct"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val ordered = ds.sortBy(d => (-d._4, d._2))
      val runs = ordered.scanLeft(0L)(_ + _._3).tail
      val kept = ordered.zip(runs).takeWhile(_._2 <= 1000L).map(_._1)
      src -> ((kept.length.toLong, kept.map(_._3).sum))
    }
    val got = run("q178_token_budget", SF)
      .select("source", "n_kept", "tokens_kept").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  // ------------------------------------------------------------------
  // q179: hand-built day with a known overlap pattern + brute force
  // ------------------------------------------------------------------

  test("q179: sweep-line peak matches the hand-computed overlap") {
    val dir = java.nio.file.Files.createTempDirectory("prof-conc").toString
    val base = 1700006400L // midnight-aligned epoch
    // windows [0,300) [100,400) [200,500) [400,700): three overlap at
    // t=200; the 400s window starts after the first has closed
    val day1 = Seq(0L, 100L, 200L, 400L)
    // second day: one lone event
    val rows = day1.map(o => Timestamp.from(
        java.time.Instant.ofEpochSecond(base + o))) :+
      Timestamp.from(java.time.Instant.ofEpochSecond(base + 86400L + 50L))
    rows.toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("q179_daily_peak_load", dir).orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((4L, 3L), (1L, 1L)))
  }

  test("q179: peak equals brute-force max concurrency on testdata") {
    // Tables.t applies the same ts normalization the query sees
    val ev = Tables.t(spark, SF, "events")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val byDay = ev.groupBy(_ / 86400000000L)
    val expect = byDay.map { case (day, ts) =>
      // concurrency only increases at window starts, so the peak is
      // attained at some event's start instant
      val peak = ts.map(s => ts.count(e => e <= s && s < e + 300000000L)).max
      day -> ((ts.length.toLong, peak.toLong))
    }
    val got = run("q179_daily_peak_load", SF).collect().map { r =>
      val day = r.getDate(0).toLocalDate.toEpochDay
      day -> ((r.getLong(1), r.getLong(2)))
    }.toMap
    assert(got.keySet == expect.keySet.map(identity))
    for ((d, v) <- expect) assert(got(d) == v, s"day $d")
  }

  // ------------------------------------------------------------------
  // q180: driver-side phrase scan agrees
  // ------------------------------------------------------------------

  test("q180: occurrence counts match a driver-side token scan") {
    val phrase = Seq("slow", "hash", "batch")
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val expect = docs.flatMap { case (id, toks) =>
      val n = toks.sliding(3).count(_ == phrase)
      if (n > 0) Some(id -> n.toLong) else None
    }.sortBy { case (id, n) => (-n, id) }.take(20)
    val got = run("q180_phrase_search", SF).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got.sortBy { case (id, n) => (-n, id) } == expect.toSeq)
  }

  // ------------------------------------------------------------------
  // q182: per-node credits sum to 3x the global census; bp bounded
  // ------------------------------------------------------------------

  // ------------------------------------------------------------------
  // q185: coreset assignment partitions the corpus
  // ------------------------------------------------------------------

  test("q185: every vector lands in exactly one cell of a distinct center") {
    val n = spark.read.parquet(s"$SF/embeddings.parquet").count()
    val rows = run("q185_kcenter_coreset", SF)
      .select("cell", "center_id", "n_members", "worst_cos").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 6L))
    assert(rows.map(_.getLong(1)).distinct.length == 6)
    assert(rows.map(_.getLong(2)).sum == n)
    // a center is its own nearest representative: radius never > 1
    for (r <- rows) assert(r.getDouble(3) <= 1.0 + 1e-12)
  }

  test("q182: triangle credits total 3x q75's census and bp <= 10000") {
    val global = run("q75_triangle_count", SF).collect()(0).getLong(0)
    val rows = run("q182_clustering_coeff", SF)
      .select("degree", "n_triangles", "closed_bp").collect()
    assert(rows.map(_.getLong(1)).sum == 3 * global)
    for (r <- rows) {
      assert(r.getLong(0) >= 2)
      val wedges = r.getLong(0) * (r.getLong(0) - 1) / 2
      assert(r.getLong(2) == r.getLong(1) * 10000L / wedges)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10000L)
    }
  }
}
