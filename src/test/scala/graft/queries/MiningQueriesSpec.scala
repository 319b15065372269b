package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Property checks for the mining queries (q162+) on synthetic inputs
  * with hand-computable answers, plus brute-force cross-checks of the
  * sort-based rewrites on the real testdata. */
class MiningQueriesSpec extends SparkSpec {

  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  // ------------------------------------------------------------------
  // q162 BFS: hand-built path graph with a known hop labeling
  // ------------------------------------------------------------------

  test("q162: path graph labels hops 0..3 and stops at the depth bound") {
    val dir = java.nio.file.Files.createTempDirectory("mining-bfs").toString
    // baskets chain parts 0-1-2-3-4-5; part 6 is isolated; the only
    // seed is part 0 (0 % 97 == 0; 97 itself is outside the id range)
    val baskets = Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L),
      (3L, 3L), (4L, 3L), (4L, 4L), (5L, 4L), (5L, 5L))
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0L to 6L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = run("q162_copurchase_bfs", dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // hop h reaches exactly part h; parts 4, 5 are beyond depth 3 and
    // part 6 is disconnected — neither may appear anywhere
    assert(got == Map(0 -> ((1L, 0L, 0L)), 1 -> ((1L, 1L, 1L)),
      2 -> ((1L, 2L, 2L)), 3 -> ((1L, 3L, 3L))))
  }

  // ------------------------------------------------------------------
  // q164 ACF: a linear hourly series has unit autocorrelation
  // ------------------------------------------------------------------

  test("q164: linear hourly counts give acf ~ 1 at every lag") {
    val dir = java.nio.file.Files.createTempDirectory("mining-acf").toString
    val base = 1700000000L
    // hour h carries h+1 events, h in 0..9: every lagged pair is an
    // exact linear relation, so each Pearson r must be 1 up to the
    // final sqrt rounding (the moments themselves are exact integers)
    val rows = for (h <- 0 until 10; i <- 0 to h)
      yield Timestamp.from(java.time.Instant.ofEpochSecond(base + h * 3600L + i))
    rows.toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("q164_acf", dir).collect()
    assert(got.length == 6)
    for (r <- got) {
      assert(r.getLong(1) == 10 - r.getLong(0), s"pair count at lag ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"acf at lag ${r.getLong(0)}")
    }
  }

  // ------------------------------------------------------------------
  // q166 weighted median: brute-force cross-check on random inputs
  // ------------------------------------------------------------------

  test("q166: window-based weighted median == driver-side definition") {
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("mining-wm").toString
    // duplicate values on purpose: v drawn from a small grid so ties
    // are common and the RANGE-frame tie-insensitivity is exercised
    val rows = for (i <- 1 to 500) yield
      (s"F${i % 3}", (rnd.nextInt(40) * 25).toDouble / 100.0,
        (1 + rnd.nextInt(50)).toDouble)
    rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = run("q166_weighted_median", dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val expect = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.map(x => (x._2, x._3.toLong)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val m = sorted.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      flag -> m
    }
    assert(got == expect)
  }

  // ------------------------------------------------------------------
  // q167 skyline: sound and complete vs brute-force dominance
  // ------------------------------------------------------------------

  test("q167: sort-based skyline == brute-force dominance on testdata") {
    val parts = Tables.t(spark, SF, "part")
      .select(col("p_brand"), col("p_partkey"),
        col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    def dominated(p: (String, Long, Double, Int)) = parts.exists(q =>
      q._1 == p._1 && q._3 <= p._3 && q._4 <= p._4
        && (q._3 < p._3 || q._4 < p._4))
    val expect = parts.filterNot(dominated)
      .map(p => (p._1, p._2, p._3, p._4)).toSet
    val got = run("q167_skyline", SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------------
  // q168 sorted neighborhood: planted adjacent near-dups are found
  // ------------------------------------------------------------------

  test("q168: planted near-dup pair with shared prefix is recovered") {
    val dir = java.nio.file.Files.createTempDirectory("mining-snm").toString
    val noise = (10L to 40L).map(i =>
      (i, s"unique${i} content block number ${i} with filler ${i * 7}", "en"))
    // two docs sharing 9 of 10 tokens AND the normalized prefix — they
    // sort adjacent inside the (en, pref4) block and verify at J >= 0.5
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda", "en"))
    (noise ++ planted).toSeq.sortBy(_._1).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("q168_sorted_neighborhood", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"planted pair missing from $got")
    // window bound: at most (SNM_WINDOW-1) * N candidate pairs exist,
    // and none of the mutually-dissimilar noise docs may pair up
    assert(got.forall { case (a, b) => (a == 1L && b == 2L) || a >= 10L })
  }

  // ------------------------------------------------------------------
  // q170 change point: a planted step lands the split on the step day
  // ------------------------------------------------------------------

  test("q170: step function volume finds the exact step boundary") {
    val dir = java.nio.file.Files.createTempDirectory("mining-cp").toString
    val base = 1700006400L // midnight-aligned day D0
    val day0 = base / 86400L
    // type A: 2/day for days 0..9, then 20/day for days 10..19 ->
    // best split = last low day (rank ties broken by earliest day);
    // type B: constant 5/day -> any split scores 0, earliest day wins
    val rows =
      (for (d <- 0 until 20; i <- 0 until (if (d < 10) 2 else 20))
        yield ("A", base + d * 86400L + i)) ++
      (for (d <- 0 until 20; i <- 0 until 5) yield ("B", base + d * 86400L + i))
    rows.map { case (ty, sec) =>
      (ty, Timestamp.from(java.time.Instant.ofEpochSecond(sec))) }
      .toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("q170_changepoint", dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("A") == day0 + 9, s"step split: ${got("A") - day0}")
    assert(got("B") == day0, s"flat series split: ${got("B") - day0}")
  }

  test("q224 multi-pass covers every q168 single-pass pair at the same threshold") {
    // q168 emits sort-oriented pairs at jaccard >= 0.5; q224 runs the
    // SAME pass-1 key plus the rotated pass and normalizes to
    // id_a < id_b — so q168's verified pairs, normalized, must be a
    // subset of q224's (the completion can only ADD recall)
    val single = run("q168_sorted_neighborhood", SF).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val multi = run("q224_snm_multipass", SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi),
      s"lost pairs: ${single diff multi}")
    multi.foreach { case (a, b) => assert(a < b) }
  }
}
