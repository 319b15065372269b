package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on a warm mat near the door of the house"

  test("curate chains quality gate, exact dedup, and near-dup removal") {
    val docs = Seq(
      (0L, good),
      (1L, good),                                   // exact dup -> dropped
      (2L, good.replace("warm", "cold")),           // near dup  -> dropped
      (3L, "the a the a the a"),                    // low quality (tiny, repetitive)
      (4L, "a completely different long document describing how the spark engine shuffles data between partitions during a wide transformation of the corpus")
    ).toDF("doc_id", "text")

    val out = Curate(docs, "text", "doc_id",
      Curate.Config(minQuality = 0.4, nearDupThreshold = 0.7))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L), "representative survives")
    assert(!kept.contains(1L), "exact duplicate removed")
    assert(!kept.contains(2L), "near duplicate removed")
    assert(!kept.contains(3L), "low-quality doc gated out")
    assert(kept.contains(4L), "distinct quality doc survives")
    assert(out.columns.toSeq == docs.columns.toSeq, "schema preserved")
  }

  test("decontamination stage drops eval near-dups, keeps clean docs") {
    val evalSuite = Seq(
      (9000L, "what year did the treaty of westphalia end the thirty years war in central europe and reshape the continent"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (0L, good),
      // near-dups the eval doc (one word differs) -> tainted
      (1L, "what year did the treaty of westphalia end the thirty years war in central europe and reshape the region"),
      (4L, "a completely different long document describing how the spark engine shuffles data between partitions during a wide transformation of the corpus")
    ).toDF("doc_id", "text")
    val cfg = Curate.Config(minQuality = 0.4, nearDupThreshold = 0.7)

    val without = Curate(docs, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(without == Set(0L, 1L, 4L),
      s"without an eval suite the leaky doc survives: $without")

    val withEval = Curate(docs, "text", "doc_id", cfg, Some(evalSuite))
      .select("doc_id").as[Long].collect().toSet
    assert(withEval == Set(0L, 4L),
      s"decontamination must drop exactly the tainted doc: $withEval")
  }

  test("curate on the real corpus keeps a sane fraction") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Curate(docs, "text", "doc_id", Curate.Config(minQuality = 0.4))
    val n = out.count()
    assert(n > 0 && n <= 500)
  }

  test("cutRepeatedRuns removes a planted shared run, leaves the rest intact") {
    val run = (1 to 25).map(i => s"run$i").mkString(" ")
    val aTail = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val bTail = (1 to 30).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, s"$aTail $run"),            // shares the run with doc 2
      (2L, s"$run $bTail"),
      (3L, (1 to 40).map(i => s"solo$i").mkString(" "))) // untouched
      .toDF("doc_id", "text")
    val out = Dedup.cutRepeatedRuns(docs, "doc_id", "text", gramLen = 20)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == aTail, "doc 1 keeps only its unique prefix")
    assert(out(2L) == bTail, "doc 2 keeps only its unique suffix")
    assert(out(3L) == (1 to 40).map(i => s"solo$i").mkString(" "),
      "untouched doc is byte-identical")
  }

  test("cutRepeatedRuns drops fully-duplicated docs; matches q97's digests") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Dedup.cutRepeatedRuns(docs, "doc_id", "text", gramLen = 20)
    // the operator's rewritten texts must hash to exactly q97's cut_md5
    val q97 = graft.SparkEntry
      .queries("q97_exactsubstr_cut")(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("cut_md5"))
      .as[(Long, String)].collect().toMap
    val affected = out.join(
        docs.select(col("doc_id"), col("text").as("__orig")), "doc_id")
      .filter(col("text") =!= col("__orig"))
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(affected.nonEmpty, "real corpus must have repeated runs")
    affected.foreach { case (id, h) =>
      assert(q97(id) == h, s"doc $id digest diverged from q97")
    }
    // q97 rows not in `affected` are docs whose cut is empty (dropped
    // here) or... none: every q97 row either rewrites or drops
    val outIds = out.select("doc_id").as[Long].collect().toSet
    q97.keys.foreach { id =>
      assert(affected.contains(id) || !outIds.contains(id),
        s"doc $id in q97 but neither rewritten nor dropped")
    }
  }
}
