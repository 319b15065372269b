package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graph.pageRank]]: bit-determinism across plan-truncation modes,
  * bounded plan depth for long runs, and checkpoint-file hygiene. */
class GraphSpec extends SparkSpec {

  // deterministic non-trivial graph: ring + doubling chords over 40
  // nodes (connected, irregular degrees — ranks genuinely differ)
  private def pairs = {
    import spark.implicits._
    val n = 40
    ((0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)) ++
      (0 until n).map(i => (i.toLong, (2 * i % n).toLong)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("id_a", "id_b")
  }

  private def bits(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) ->
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap

  test("per-round plan truncation is bit-identical to the unrolled form") {
    val unrolled = bits(Graph.pageRank(pairs, iters = 5, truncateEvery = 0))
    spark.catalog.clearCache()
    val truncated = bits(Graph.pageRank(pairs, iters = 5, truncateEvery = 1))
    spark.catalog.clearCache()
    assert(unrolled.nonEmpty && unrolled == truncated,
      "truncateEvery must never change a single rank bit")
  }

  test("reliable checkpoint path is bit-identical and keeps only the last round's files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt").toString
    try {
      val unrolled = bits(Graph.pageRank(pairs, iters = 6, truncateEvery = 0))
      spark.catalog.clearCache()
      val ckpt = bits(Graph.pageRank(pairs, iters = 6, truncateEvery = 2,
        checkpointDir = Some(dir)))
      assert(unrolled == ckpt, "checkpointed ranks must match unrolled bit-for-bit")
      // rounds 2 and 4 truncate mid-run; round 4's files free round 2's,
      // so at most one round of checkpoint files outlives the run
      val rddDirs = new java.io.File(dir).listFiles().flatMap(_.listFiles())
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.length <= 1,
        s"stale checkpoint rounds left behind: ${rddDirs.map(_.getName).toSeq}")
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("plan depth stays constant per round under truncation (and grows unrolled)") {
    def planSize(iters: Int, truncateEvery: Int): Int =
      Graph.pageRank(pairs, iters = iters, truncateEvery = truncateEvery)
        .queryExecution.optimizedPlan.toString.length
    val t3 = planSize(3, 1); val t9 = planSize(9, 1)
    val u3 = planSize(3, 0); val u9 = planSize(9, 0)
    spark.catalog.clearCache()
    info(s"optimized-plan chars: truncated 3/9 iters = $t3/$t9, unrolled = $u3/$u9")
    // truncated: final round always plans over one LogicalRDD -> O(1)
    assert(t9 <= t3 * 12 / 10,
      s"truncated plan must not grow with iteration count: $t3 -> $t9")
    assert(u9 > u3 * 2, s"unrolled sanity: 9-iter plan should dwarf 3-iter ($u3 -> $u9)")
  }

  test("q70's shape (iters <= stride) never truncates — the oracle-mirrored unrolled plan") {
    val plan = Graph.pageRank(pairs, iters = 5).queryExecution.optimizedPlan.toString
    assert(!plan.contains("LogicalRDD"),
      "default stride must leave short runs as the plain unrolled plan")
  }
}
