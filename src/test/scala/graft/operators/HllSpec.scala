package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HyperLogLog registers, merge, and estimate (Sketches.hllRegisters /
  * hllMerge / hllEstimate — q132's machinery).
  */
class HllSpec extends SparkSpec {

  import spark.implicits._

  private def keyed(rows: Seq[(String, String)]) =
    rows.toDF("grp", "k")

  test("registers are dense: HLL_M rows per group, registers in [0, 55]") {
    val df = keyed(Seq("a" -> "x", "a" -> "y", "b" -> "z"))
    val regs = Sketches.hllRegisters(df, "grp", "k").collect()
    assert(regs.length == 2 * Sketches.HLL_M)
    val byGrp = regs.groupBy(_.getString(0))
    assert(byGrp.keySet == Set("a", "b"))
    byGrp.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq ==
        (0L until Sketches.HLL_M).toSeq)
      rs.foreach { r =>
        val m = r.getLong(2)
        assert(m >= 0 && m <= Sketches.HLL_RHO_BITS + 1, s"register $m")
      }
    }
  }

  test("registers are insensitive to duplication and partitioning") {
    val base = (1 to 200).map(i => "g" -> s"k$i")
    val dup = base ++ base ++ base
    def regsOf(rows: Seq[(String, String)], parts: Int) =
      Sketches.hllRegisters(keyed(rows).repartition(parts), "grp", "k")
        .orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val a = regsOf(base, 1)
    assert(regsOf(dup, 1) == a, "duplicates must not move registers")
    assert(regsOf(base, 7) == a, "partitioning must not move registers")
    assert(regsOf(scala.util.Random.shuffle(dup), 5) == a)
  }

  test("merge of shard sketches == sketch of the union, bit for bit") {
    val shard1 = (1 to 150).map(i => "s1" -> s"k$i")
    val shard2 = (100 to 260).map(i => "s2" -> s"k$i") // overlap with s1
    val perShard = Sketches.hllRegisters(keyed(shard1 ++ shard2), "grp", "k")
    val merged = Sketches.hllMerge(perShard, "grp", "union")
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val direct = Sketches.hllRegisters(
      keyed((shard1 ++ shard2).map { case (_, k) => "union" -> k }), "grp", "k")
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(merged == direct)
  }

  test("estimate lands within 40% of truth across two decades") {
    // 64 registers -> ~13% relative standard error; 40% is a safe gate
    // that still catches a broken rho/bucket/alpha path (those err by x2+)
    for (n <- Seq(80, 800, 8000)) {
      val df = keyed((1 to n).map(i => "g" -> s"key$i"))
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, "grp", "k"), "grp").collect().head
      val milli = est.getAs[Long]("est_milli")
      assert(math.abs(milli / 1000.0 - n) <= 0.40 * n,
        s"n=$n est=${milli / 1000.0}")
    }
  }

  test("small-range correction: linear counting applies and is exact-ish") {
    // 10 distinct keys: most registers empty -> raw estimate under the
    // 2.5m cutoff -> the precomputed linear-counting table must engage
    val df = keyed((1 to 10).map(i => "g" -> s"v$i"))
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(df, "grp", "k"), "grp").collect().head
    val vEmpty = est.getAs[Long]("v_empty")
    val raw = est.getAs[Long]("est_raw_milli")
    val corrected = est.getAs[Long]("est_milli")
    assert(vEmpty > 0 && raw <= Sketches.HLL_LC_CUTOFF_MILLI,
      s"correction preconditions not met: v=$vEmpty raw=$raw")
    assert(corrected == Sketches.HLL_LC_MILLI(vEmpty.toInt - 1),
      "corrected estimate must come from the precomputed table")
    // linear counting is near-exact at this occupancy
    assert(math.abs(corrected / 1000.0 - 10) <= 2.5,
      s"lc estimate ${corrected / 1000.0} far from 10")
  }

  test("empty-group degenerate: zero keys would estimate zero") {
    // a group whose bucket table is all-empty (register 0 everywhere):
    // v_empty = M, linear counting gives ln(1) = 0
    val regs = spark.range(Sketches.HLL_M)
      .select(lit("g").as("grp"), col("id").as("bucket"),
        lit(0L).as("register"))
    val est = Sketches.hllEstimate(regs, "grp").collect().head
    assert(est.getAs[Long]("v_empty") == Sketches.HLL_M)
    assert(est.getAs[Long]("est_milli") == 0L)
  }
}
