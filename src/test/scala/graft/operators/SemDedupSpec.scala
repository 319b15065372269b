package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup operator semantics on a corpus with known geometry: two
  * tight semantic neighborhoods and one loner. Each neighborhood must
  * collapse to EXACTLY one survivor, the survivor must be the
  * least-prototypical member (lowest cosine to its cell centroid —
  * the paper's keeper choice), and raising eps past the pair
  * cosines must keep everything. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // neighborhood A on the e1 axis, neighborhood B on the e2 axis,
  // loner L on e3 — cross-neighborhood cosines are ~0
  private val rows = Seq(
    (1L, vec(1.0, 0.0, 0.0, 0.0)),   // A, prototypical
    (2L, vec(0.9, 0.1, 0.0, 0.0)),   // A, slightly off-axis
    (3L, vec(0.0, 1.0, 0.0, 0.0)),   // B, prototypical
    (4L, vec(0.0, 0.95, 0.05, 0.0)), // B, slightly off-axis
    (5L, vec(0.0, 0.0, 1.0, 0.0)))   // loner

  private def run(eps: Double) = Similarity.semDedup(
    rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
    nCells = 3, trainIters = 1, dim = 4, eps = eps)
    .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap

  test("each semantic neighborhood collapses to exactly one survivor; " +
      "the keeper is the least-prototypical member; the loner stays") {
    val got = run(eps = 0.9)
    assert(got.size == 5)
    // within-pair cosines ~0.99, cross ~0 -> exactly one drop per pair
    for (pair <- Seq(Seq(1L, 2L), Seq(3L, 4L))) {
      val dropped = pair.filter(got(_)._3)
      assert(dropped.size == 1,
        s"neighborhood $pair must lose exactly one member, lost $dropped")
      val kept = (pair.toSet - dropped.head).head
      // the paper's keeper: LOWEST cosine to the centroid survives
      assert(got(kept)._2 <= got(dropped.head)._2,
        s"keeper $kept must be the least-prototypical of $pair: " +
          s"${got(kept)._2} vs ${got(dropped.head)._2}")
      // a duplicate pair shares a cell by construction
      assert(got(pair.head)._1 == got(pair(1))._1,
        s"fixture: pair $pair landed in different cells")
    }
    assert(!got(5L)._3, "the loner must survive")
    spark.catalog.clearCache()
  }

  test("occupancy guard: a template-flood cell above maxCell is " +
      "excluded from the pair stage (all members kept, warning fires) " +
      "while planted survivors in small cells still resolve") {
    ObservedWarn.clearFired("semdedup_hot_cells")
    // 20 identical flood vectors collapse into ONE cell (the skewed
    // embedding distribution the guard exists for), a near-dup pair on
    // e2 and a loner on e3 sit in their own small cells
    val flood = (100L until 120L).map(i => (i, vec(1.0, 0.0, 0.0, 0.0)))
    val all = flood ++ Seq(
      (1L, vec(0.0, 1.0, 0.0, 0.0)),
      (2L, vec(0.0, 0.95, 0.05, 0.0)),
      (3L, vec(0.0, 0.0, 1.0, 0.0)))
    val got = Similarity.semDedup(all.toDF("vec_id", "embedding"),
      "vec_id", "embedding", nCells = 3, trainIters = 1, dim = 4,
      eps = 0.9, maxCell = 8L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3)))
      .toMap
    assert(got.size == all.size, "one output row per input vector")
    // the guard FIRED and counted exactly the one hot cell.
    // QueryExecutionListener delivery is async (the DedupIndexStream /
    // ScaleSpec polling idiom): read under a deadline, or a loaded
    // host loses the race between collect() and the listener bus
    val deadline = System.nanoTime() + 10_000_000_000L
    var firedN = ObservedWarn.lastFired("semdedup_hot_cells")
    while (firedN.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      firedN = ObservedWarn.lastFired("semdedup_hot_cells")
    }
    assert(firedN.contains(1L),
      s"hot-cell warning must report 1 excluded cell, got $firedN")
    // flood members are all KEPT unexamined (conservative, never O(n^2))
    flood.foreach { case (id, _) =>
      assert(!got(id)._2, s"flood member $id must be kept unexamined") }
    // the small-cell near-dup pair still resolves to one survivor
    val pairDropped = Seq(1L, 2L).filter(got(_)._2)
    assert(pairDropped.size == 1,
      s"small-cell pair must still lose exactly one member: $pairDropped")
    assert(!got(3L)._2, "the loner must survive")
    spark.catalog.clearCache()
  }

  test("semDedupReleasable: release() drops the embedded assignment " +
      "cache after the result is materialized") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val (sd, release) = Similarity.semDedupReleasable(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nCells = 3, trainIters = 1, dim = 4, eps = 0.9)
    assert(sd.count() == rows.size)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "the assignment frame must be cached while the result computes")
    release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release() must unpersist the assignment cache")
  }

  test("eps above every pair cosine keeps the whole corpus") {
    val got = run(eps = 0.9999)
    assert(got.values.forall(!_._3),
      s"nothing reaches cosine 0.9999, so nothing may drop: $got")
    spark.catalog.clearCache()
  }

  test("semDedupCompact: the sink snapshot keeps exactly the semDedup " +
      "survivors, keeps every sink column, and sizes its files") {
    val root = java.nio.file.Files.createTempDirectory("semdedup-compact")
    val sink = root.resolve("sink").toString
    val outDir = root.resolve("snapshot").toString
    // a CurateStream-shaped sink: batch_id partitions, extra columns
    // riding along (the compactor must keep them)
    rows.take(3).map { case (id, v) => (id, s"text $id", v) }
      .toDF("doc_id", "text", "embedding")
      .withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(sink)
    rows.drop(3).map { case (id, v) => (id, s"text $id", v) }
      .toDF("doc_id", "text", "embedding")
      .withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(sink)

    spark.catalog.clearCache()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val n = Maintenance.semDedupCompact(spark, sink, outDir,
      "doc_id", "embedding", nCells = 3, trainIters = 1, dim = 4,
      eps = 0.9)
    assert(n >= 1L)
    // the periodic job must not leak cached blocks across runs — the
    // semDedupReleasable contract, released after the rewrite
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore,
      "semDedupCompact leaked assignment-cache blocks")
    val snap = spark.read.parquet(outDir)
    val expected = run(eps = 0.9).collect { case (id, (_, _, false)) => id }
    assert(snap.select("doc_id").as[Long].collect().toSet ==
      expected.toSet,
      "the snapshot must hold exactly the semDedup survivors")
    assert(snap.columns.toSet == Set("doc_id", "text", "embedding",
      "batch_id"), s"sink columns must survive: ${snap.columns.toSeq}")
    spark.catalog.clearCache()
  }
}
