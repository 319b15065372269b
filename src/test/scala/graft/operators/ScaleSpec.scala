package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-citizenship proofs: the physical plans do what ARCHITECTURE.md
  * claims (bucketed co-located joins avoid shuffles; salted aggregation
  * matches the direct result). */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join with ZERO shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    // disable auto-broadcast so the join would OTHERWISE shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the only exchange allowed is the final groupBy's, keyed on
      // o_orderpriority — the JOIN itself must be shuffle-free
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
        && !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // every lineitem row matched exactly one order
      assert(joined.agg(sum(col("n"))).collect().head.getLong(0) == 6000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed band index: the corpus-side scan joins without reshuffling") {
    // the scale claim behind CurateStream's ingest near-dup gate: the
    // PERSISTENT band index is bucketed on `key`, so a batch's candidate
    // lookup reshuffles only the (small) batch side — the index scan
    // feeds the join in place. Build a band index shape, bucket it, and
    // prove the plan has no Exchange above the bucketed scan.
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val banded = Dedup.bandKeys(
      Dedup.minhashSignature(docs, "text", 16, 3), 16, 4)
    spark.sql("DROP TABLE IF EXISTS bandidx_b")
    Dedup.bandRows(banded, "doc_id", "content_hash", 4)
      .write.bucketBy(8, "key").sortBy("key")
      .mode("overwrite").saveAsTable("bandidx_b")
    val batchBands = Dedup.bandRows(
      Dedup.bandKeys(Dedup.minhashSignature(
        docs.filter(col("doc_id") < 50), "text", 16, 3), 16, 4),
      "doc_id", "new_hash", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cands = spark.table("bandidx_b")
        .join(batchBands.hint("shuffle_merge"), Seq("key"))
        .filter(col("content_hash") =!= col("new_hash"))
      val plan = cands.queryExecution.executedPlan.toString
      // the index side must go FileScan -> (Sort) -> Join with no
      // Exchange in between; the batch side is allowed its shuffle
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val exchanges = "Exchange hashpartitioning\\(key".r
        .findAllIn(plan).size
      assert(exchanges == 1,
        s"only the batch side may shuffle (found $exchanges key exchanges):\n$plan")
      assert(cands.count() > 0, "candidate lookup must produce rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // the 100 TB shape: a huge fact scan joined to a small filtered
    // dimension. Spark's InjectRuntimeFilter can push a bloom filter of
    // the dim keys into the fact scan stage, so non-matching fact rows
    // die BEFORE the join shuffle. The optimization is size-gated
    // (creation side <= creationSideThreshold, application side >=
    // sizeThreshold), so testdata never triggers it naturally — lower
    // the application-side floor to prove the engine's sessions have
    // the rewrite available and correctly wired.
    val dir = "/root/testdata/sf0.001"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      val dim = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and the rewrite preserves the exact result
      val expected = fact.join(dim.hint("broadcast"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted aggregation == direct groupBy") {
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val salted = Skew.saltedCountSum(ev, Seq("event_type"), col("event_id"), 16,
      Seq((col("value").cast("decimal(12,2)"), "sum_value")))
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("sum_value"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("capped LSH candidates: identical on a healthy corpus, bounded on a saturated one") {
    import spark.implicits._
    import graft.operators.Dedup
    def banded(docs: org.apache.spark.sql.DataFrame) = Dedup.bandKeys(
      Dedup.minhashSignature(docs, "text", 16, 3), 16, 4)
    // healthy: the real testdata corpus — a generous cap changes nothing
    val real = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val b1 = banded(real)
    val uncapped = Dedup.lshCandidates(b1, "doc_id", 4)
    val capped = Dedup.lshCandidatesCapped(b1, "doc_id", 4, maxBucket = 10000)
    assert(uncapped.exceptAll(capped).isEmpty && capped.exceptAll(uncapped).isEmpty)
    spark.catalog.clearCache()
    // saturated: 300 docs over a 5-word vocabulary — every shingle set
    // collides, buckets approach corpus size, pair work ~ C(300, 2) —
    // plus five DUPLICATE PAIRS of unique docs, so the capped result is
    // non-empty (the partial-truncation case the ObservedWarn
    // guarantee covers: an all-excluded cap yields an empty result
    // that AQE prunes to an EmptyRelation, metric included — the
    // total-truncation caveat on ObservedWarn)
    val sat = ((0 until 300).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * 31 + j) % 5}").mkString(" ")))
      ++ (300 until 310).map(i =>
        (i.toLong, (0 until 30).map(j => s"u${i - i % 2}j$j").mkString(" "))))
      .toDF("doc_id", "text")
    val b2 = banded(sat)
    val full = Dedup.lshCandidates(b2, "doc_id", 4).count()
    graft.operators.ObservedWarn.clearFired("lsh_capped_hot_buckets")
    val bounded = Dedup.lshCandidatesCapped(b2, "doc_id", 4, maxBucket = 10)
      .collect().length.toLong
    spark.catalog.clearCache()
    assert(full > 10000, s"saturated corpus must show quadratic candidates, got $full")
    assert(bounded >= 5 && bounded < full / 10,
      s"cap must keep the planted pairs and bound the blowup: " +
        s"capped=$bounded full=$full")
    // no silent caps: the excluded-bucket count fired with the action
    val deadline = System.nanoTime() + 10_000_000_000L
    var fired = graft.operators.ObservedWarn.lastFired("lsh_capped_hot_buckets")
    while (fired.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      fired = graft.operators.ObservedWarn.lastFired("lsh_capped_hot_buckets")
    }
    assert(fired.exists(_ > 0L),
      s"capped run must report its excluded buckets, fired=$fired")
  }

  test("salted join == plain join, including under a planted hot key") {
    import spark.implicits._
    // 1000 rows of one hot key + a sprinkle of others; build side has
    // every key — the shape AQE's sort-merge split would miss under a
    // hash join
    val probe = ((1 to 1000).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, 10000L + i)))
      .toDF("k", "payload")
    val build = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val salted = Skew.saltedJoin(probe, build, "k",
      graft.functions.Portable.pmd5(col("payload").cast("string")), 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt must actually reach the join keys: (k, __salt) —
    // inspect the static plan (AQE wraps the adaptive one lazily)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val staticPlan =
      try Skew.saltedJoin(probe, build, "k",
        graft.functions.Portable.pmd5(col("payload").cast("string")), 8)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val keys = staticPlan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.length
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.length
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.length
    }
    assert(keys.nonEmpty && keys.forall(_ == 2),
      "join must run on (key, salt), not key alone")
  }

  test("salted join keeps probe rows whose salt expression is NULL") {
    import spark.implicits._
    // round-7 advice: pmod(null, b) is null and the (key, __salt)
    // equi-join silently dropped such probe rows, violating the
    // row-identical contract. The salt is now coalesced to bucket 0.
    val probe = Seq((1L, Some(10L)), (1L, None), (2L, None), (3L, Some(2L)))
      .toDF("k", "saltcol")
    val build = (0L to 3L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val salted = Skew.saltedJoin(probe, build, "k", col("saltcol"), 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "null-salt probe rows must survive exactly like the plain join")
    assert(salted.count() == 4)
  }
}
