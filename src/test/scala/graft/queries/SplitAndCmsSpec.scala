package graft.queries

import graft.SparkSpec
import graft.functions.Portable

/** Semantic guarantees of q123 (leakage-safe split) and q124 (count-min
  * sketch) that the oracle hash-compare can't express: the no-straddle
  * invariant over the verified near-dup graph, the sketch's one-sided
  * error, and cell-wise mergeability of shard grids.
  */
class SplitAndCmsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q123: no verified near-dup pair straddles a split boundary") {
    val split = run("q123_leakage_safe_split").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep"), r.getAs[String]("split"))).toMap
    val pairs = run("q28_lsh_dup_pairs").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty, "testdata must contain verified near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) got different reps")
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) straddles the split")
    }
    // the assignment is a pure function of the representative, and the
    // bucket rule is exactly the documented hash threshold
    split.foreach { case (_, (rep, sp)) =>
      val bucket = Portable.pmd5Local(s"split:$rep") % 100
      val expect = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
      assert(sp == expect, s"rep $rep: split $sp != rule $expect")
    }
    assert(split.values.map(_._2).toSet == Set("train", "val", "test"),
      "all three splits must be populated at sf0.001")
  }

  test("q124: estimate is never below exact, and matches the local grid") {
    val D = 4
    val W = 64L
    // local reference grid from first principles
    val toks = graft.queries.Tables.t(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).split(" "))
    val grid = Array.fill(D)(collection.mutable.Map.empty[Long, Long])
    toks.foreach { tok =>
      (0 until D).foreach { i =>
        val cell = Portable.pmd5Local(s"$i:$tok") % W
        grid(i)(cell) = grid(i).getOrElse(cell, 0L) + 1
      }
    }
    def localEst(tok: String): Long =
      (0 until D).map(i => grid(i)(Portable.pmd5Local(s"$i:$tok") % W)).min
    val out = run("q124_countmin_sketch").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (tok, exact, est, over) = (r.getAs[String]("tok"),
        r.getAs[Long]("exact_cnt"), r.getAs[Long]("est_cnt"),
        r.getAs[Long]("overcount"))
      assert(est >= exact, s"$tok: estimate $est below exact $exact")
      assert(over == est - exact)
      assert(est == localEst(tok), s"$tok: query est $est != local ${localEst(tok)}")
    }
  }

  test("q124: shard grids merge cell-wise into the full-corpus grid") {
    val D = 4
    val W = 64L
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def gridOf(rows: Seq[(Long, String)]): Map[(Int, Long), Long] =
      rows.flatMap { case (_, text) => text.split(" ") }
        .flatMap(tok => (0 until D).map(i => (i, Portable.pmd5Local(s"$i:$tok") % W)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (even, odd) = docs.partition(_._1 % 2 == 0)
    val (gEven, gOdd) = (gridOf(even), gridOf(odd))
    val merged = (gEven.keySet ++ gOdd.keySet).map { k =>
      k -> (gEven.getOrElse(k, 0L) + gOdd.getOrElse(k, 0L))
    }.toMap
    assert(merged == gridOf(docs.toSeq),
      "cell-wise sum of shard grids must equal the full grid")
  }
}
