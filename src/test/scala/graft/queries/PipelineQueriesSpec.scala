package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic guarantees of the training-mix operators that the oracle
  * hash-compare can't express: the winnowing detection guarantee, the
  * packing invariants, and the integer-exact anomaly test's equivalence
  * to the floating z-score it replaces. */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pq-docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("src"), (col("doc_id") % 3).cast("string")))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("winnowing guarantee: a shared run of >= K+W-1 words always shares a fingerprint") {
    // WIN_K=5, WIN_W=4 -> guarantee threshold 8 words. Plant a
    // pair-distinct 8-word common run inside otherwise-disjoint noise:
    // the run spans a full window of 4 identical 5-gram hashes, whose
    // (rightmost-)min both docs must select — a shared fingerprint per
    // pair, by construction, at any surrounding offset.
    val rnd = new scala.util.Random(42)
    def noise(n: Int, tag: String) =
      (1 to n).map(i => s"$tag${rnd.nextInt(1000)}x$i").mkString(" ")
    def common(k: Int) =
      Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
        .map(w => s"$w$k").mkString(" ")
    val docs = (0 until 20).flatMap { k =>
      Seq(
        (k * 2L, s"${noise(30, s"a$k")} ${common(k)} ${noise(30, s"b$k")}"),
        (k * 2 + 1L, s"${noise(25, s"c$k")} ${common(k)} ${noise(35, s"d$k")}"))
    }
    val dir = writeDocs(docs)
    // each pair's run is unique to it, so every pair must contribute at
    // least one shared fingerprint of its own
    val fps = run("q74_winnow_fingerprints", dir).count()
    assert(fps >= 20, s"20 planted pairs must yield >= 20 shared fingerprints: $fps")
  }

  test("sequence packing invariants: per-source bins are dense and token-complete") {
    // ~105 tokens/doc x 30 docs/source -> each source spans 2 bins
    val dir = writeDocs((0L until 90L).map(i =>
      (i, (1 to (i % 50 + 80).toInt).map(j => s"w${i}_$j").mkString(" "))))
    val bins = run("q72_sequence_packing", dir).collect()
    // bin ids per source are dense from 0 (concat-and-chop never skips
    // a bin) and bin token totals reconstruct the source totals exactly
    bins.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ids = rows.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.head == 0, s"$src: first bin must be 0")
      assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
        s"$src: bin ids must be dense: ${ids.toSeq}")
    }
    val packedTokens = bins.map(_.getAs[Long]("bin_tokens")).sum
    val sourceTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long")).as[Long].collect().sum
    assert(packedTokens == sourceTokens, "packing must conserve tokens")
  }

  test("integer-exact anomaly test equals the floating 3-sigma z-test") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      val m = rnd.nextInt(50) + 3
      val counts = Seq.fill(m)(rnd.nextInt(1000).toLong + 1)
      val tot = counts.sum
      val ss = counts.map(c => c * c).sum
      counts.foreach { c =>
        val dev = m * c - tot
        val intFlag = dev * dev * (m - 1) > 9L * m * (m * ss - tot * tot)
        // floating reference: |c - mean| > 3 * sample stddev
        val mean = tot.toDouble / m
        val varS = (ss - m * mean * mean) / (m - 1)
        val zFlag = math.abs(c - mean) > 3 * math.sqrt(math.max(varS, 0))
        // the integer form is exact; the float form can disagree only
        // within rounding slack of the boundary — allow that sliver
        if (intFlag != zFlag) {
          val lhs = dev.toDouble * dev * (m - 1)
          val rhs = 9.0 * m * (m.toDouble * ss - tot.toDouble * tot)
          assert(math.abs(lhs - rhs) <= math.ulp(math.max(math.abs(lhs), math.abs(rhs))) * 64,
            s"trial $trial: integer flag diverged off-boundary (c=$c counts=$counts)")
        }
      }
    }
  }

  test("mixture downsample keep rule is the documented hash threshold, row for row") {
    val dir = "/root/testdata/sf0.001"
    val out = run("q73_mixture_downsample", dir).collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("n_orig"), r.getAs[Long]("n_kept")))
      .toMap
    // recompute the rule driver-side from first principles
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val orig = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val minN = orig.values.min
    val kept = docs.count { case (id, lang) =>
      graft.functions.Portable.pmd5Local(s"7:$id") % orig(lang) < minN
    }
    assert(out.values.map(_._2).sum == kept,
      s"query kept ${out.values.map(_._2).sum}, rule says $kept")
    out.foreach { case (lang, (n, _)) => assert(n == orig(lang)) }
  }

  test("q226: splits partition the events; chronology and embargo laws hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = run("q226_temporal_split", sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val total = graft.queries.Tables.t(spark, sf, "events").count()
    // partition law: every event lands in exactly one split
    assert(rows.values.map(_._1).sum == total)
    // chronology: train strictly before val strictly before test,
    // each separated by MORE than the embargo width implies a gap > 0
    for (s <- Seq("train", "val", "test")) assert(rows.contains(s), s"missing $s")
    val (tMax, vMin, vMax, teMin) =
      (rows("train")._3, rows("val")._2, rows("val")._3, rows("test")._2)
    assert(tMax < vMin, "train must end before val begins")
    assert(vMax < teMin, "val must end before test begins")
    // embargo rows (if any) sit strictly inside the gaps
    rows.get("embargo").foreach { case (_, eMin, eMax) =>
      assert(eMin > tMax || eMin > vMax)
      assert(eMax < teMin)
    }
  }

  test("q227: allocation realized exactly; sqrt weighting flattens the mix") {
    val sf = "/root/testdata/sf0.001"
    val rows = run("q227_mix_temperature", sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, w, alloc, nSampled) =>
      assert(w == math.floor(math.sqrt(nDocs.toDouble)).toLong, src)
      assert(alloc <= nDocs, src)
      assert(nSampled == alloc, s"$src realized $nSampled of $alloc")
    }
    // temperature flattening: the head source's share of the SAMPLE is
    // no larger than its share of the corpus (sqrt compresses ratios)
    val nTot = rows.map(_._2).sum.toDouble
    val aTot = rows.map(_._4).sum.toDouble
    val head = rows.maxBy(_._2)
    assert(head._4 / aTot <= head._2 / nTot + 1e-9,
      "sqrt weighting must not increase the head source's share")
  }
}
