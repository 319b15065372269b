package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Theil-Sen parametric search vs a from-first-principles all-pairs
  * reference: exact-line corpora, the robustness-to-outliers claim,
  * degenerate bucket widths (forcing every decomposition class), and
  * the excluded no-sloped-pair group. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def bruteRef(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val slopes = for {
        (_, x1, y1) <- rs
        (_, x2, y2) <- rs
        if x1 < x2
      } yield Math.floorDiv(1000L * (y2 - y1), x2 - x1)
      if (slopes.isEmpty) None
      else {
        val sorted = slopes.sorted
        Some(g -> (slopes.size.toLong, sorted(((slopes.size + 1) / 2 - 1).toInt)))
      }
    }

  private def run(rows: Seq[(String, Long, Long)], xOcc: Long = 64L,
      zw: Long = 4096L): Map[String, (Long, Long)] =
    TheilSen.slopeMilli(rows.toDF("g", "x", "y"), "g", "x", "y", xOcc, zw)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("exact line recovers the slope; all-x-tied group is excluded") {
    val line = (1L to 30L).map(i => ("line", i * 7, 2 * (i * 7) + 5))
    val flat = (1L to 6L).map(i => ("flat", 10L, i))
    val got = run(line ++ flat)
    assert(got == Map("line" -> (435L, 2000L)))
  }

  test("robustness: 20% wild outliers do not move the median slope (OLS would)") {
    val clean = (1L to 40L).map(i => ("g", i * 3, 5 * (i * 3) + 11))
    val wild = (1L to 10L).map(i => ("g", 200L + i, 1000000L + i * 99999))
    val got = run(clean ++ wild)
    assert(got("g")._2 == 5000L,
      s"median slope should hold at 5000 milli under 20% outliers: $got")
  }

  test("== brute force on random tied data, default AND degenerate bucket widths") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 120).map { i =>
      // negative and positive slopes, heavy x and y ties, several
      // groups — and values straddling many buckets
      (s"g${i % 3}", (rnd.nextInt(40) * 17 + 1).toLong,
        (rnd.nextInt(50) - 25).toLong * (1 + rnd.nextInt(3)))
    }
    val ref = bruteRef(rows)
    assert(run(rows) == ref, "default settings diverged")
    // occupancy 1 in BOTH dimensions: every distinct value is "heavy"
    // -> singleton buckets, so every counted pair is cross-bucket
    // (class A carries everything; intra-bucket pairs all tie and
    // contribute zero); huge occupancies: one light bucket per group
    // and per probe (class B carries everything)
    assert(run(rows, 1L, 1L) == ref, "occupancy-1 buckets diverged")
    assert(run(rows, 1000000L, 100000000L) == ref, "single-bucket diverged")
  }

  test("pathological x skew (3 distinct x over many rows) stays in the cell classes") {
    // The fixed-width hazard corpus: every row lands in one x bucket,
    // so a width-based decomposition materializes O(m^2) intra-bucket
    // join rows per probe. Equi-depth bucketing makes each of the 3
    // heavily-tied x values a SINGLETON bucket (zero intra-bucket
    // rows), and the tie collapse bounds the z-side frames by the
    // distinct (x, y) support — here 3 x * 40 y = 120 combos standing
    // in for 30k rows. The brute reference is computed per distinct
    // combo pair (weighted), so the expected value is exact.
    val n = 30000
    val rows = (0 until n).map { i =>
      ("g", Seq(100L, 500L, 900L)(i % 3), (i % 40).toLong * 7 + (i % 3))
    }
    // weighted brute force over the 120 distinct combos
    val combos = rows.groupBy(identity).map { case ((_, x, y), rs) =>
      (x, y, rs.size.toLong)
    }.toSeq
    val weighted = for {
      (x1, y1, c1) <- combos
      (x2, y2, c2) <- combos
      if x1 < x2
    } yield (Math.floorDiv(1000L * (y2 - y1), x2 - x1), c1 * c2)
    val npairs = weighted.map(_._2).sum
    val k = (npairs + 1) / 2
    val median = {
      val bySlope = weighted.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var cum = 0L
      bySlope.find { case (_, c) => cum += c; cum >= k }.get._1
    }
    val got = run(rows)
    assert(got == Map("g" -> (npairs, median)),
      s"pathological corpus diverged: $got vs ($npairs, $median)")
  }

  test("near-linear corpus (z concentrates as probes converge) stays bounded and exact") {
    // 2000 points on y = 3x + (i % 5): as the search closes on 3000
    // milli, the z = 1000y - (t+1)x support collapses to the residual
    // band (five values, 400 rows each) — the corpus a FIXED z width
    // piles into ONE slab (2000^2 intra-slab join rows per probe).
    // Equi-depth z-buckets make each residual value a heavy singleton
    // bucket the intra-z class skips. Reference computed leanly
    // (primitive arrays): 2M pairs.
    val n = 2000
    val rows = (0 until n).map(i => ("g", i.toLong, 3L * i + i % 5))
    val xs = rows.map(_._2).toArray
    val ys = rows.map(_._3).toArray
    val buf = Array.newBuilder[Long]
    for (i <- 0 until n; j <- i + 1 until n) // xs strictly increasing
      buf += Math.floorDiv(1000L * (ys(j) - ys(i)), xs(j) - xs(i))
    val slopes = buf.result().sorted
    val expected = ("g", (slopes.length.toLong,
      slopes(((slopes.length + 1) / 2 - 1).toInt)))
    assert(run(rows).toSeq == Seq(expected), "near-linear corpus diverged")
  }

  test("median index is the LOWER median and honors x-tie exclusion") {
    // pairs: (1,0)-(2,10): 10000; (1,0)-(3,1): 500; (2,10)-(3,1):
    // -9000; the two x=1 rows tie and add pairs only against x=2,3.
    val rows = Seq(("g", 1L, 0L), ("g", 1L, 2L), ("g", 2L, 10L), ("g", 3L, 1L))
    val got = run(rows)
    assert(got("g") == bruteRef(rows)("g"))
    assert(got("g")._1 == 5L, "x-tied pair must not count")
  }
}
