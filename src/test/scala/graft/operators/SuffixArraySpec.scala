package graft.operators

import graft.SparkSpec

/** Prefix-doubling suffix ranks vs a from-first-principles reference
  * (materialize every suffix, sort, dense-rank) on corpora chosen to
  * hit the construction's edges: prefix-of-another suffixes (the
  * sentinel path), duplicate documents (ties that survive to the last
  * round), single-character runs (maximal tie depth — the loop must
  * run all log2(len) rounds), and degenerate inputs. */
class SuffixArraySpec extends SparkSpec {

  import spark.implicits._

  private def brute(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sfx = for ((id, t) <- docs; p <- 1 to t.length)
      yield ((id, p.toLong), t.substring(p - 1))
    val rankOf = sfx.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    sfx.map { case (k, s) => k -> rankOf(s) }.toMap
  }

  private def run(docs: Seq[(Long, String)],
      initKey: Int = 8): Map[(Long, Long), Long] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"), "doc_id", "text",
        initKey)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** Every corpus is checked on BOTH paths: initKey=1 forces the
    * active-set refinement loop to run its full log2(len) rounds (the
    * char-level classic construction), the default initKey=8 settles
    * most suffixes in round 0 and exercises the settled/tied split. */
  private def checkBoth(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val expected = brute(docs)
    val viaLoop = run(docs, initKey = 1)
    assert(viaLoop == expected, "initKey=1 (full doubling loop) diverged")
    val viaKey = run(docs)
    assert(viaKey == expected, "initKey=8 (round-0 settle) diverged")
    val viaAuto = run(docs, initKey = 0)
    assert(viaAuto == expected, "adaptive initKey diverged")
    expected
  }

  test("banana: the textbook suffix order") {
    val docs = Seq((7L, "banana"))
    val got = checkBoth(docs)
    // a(6) < ana(4) < anana(2) < banana(1) < na(5) < nana(3)
    assert(got == Map((7L, 6L) -> 1L, (7L, 4L) -> 2L, (7L, 2L) -> 3L,
      (7L, 1L) -> 4L, (7L, 5L) -> 5L, (7L, 3L) -> 6L))
  }

  test("prefix suffixes rank before their extensions; ranks dense across docs") {
    // "ab" is a prefix of "abab"'s pos-1 suffix: the sentinel-0 tail
    // must sort it first, exactly like the string compare
    checkBoth(Seq((1L, "abab"), (2L, "ab"), (3L, "ba")))
  }

  test("duplicate documents tie every suffix rank, dense over DISTINCT suffixes") {
    val docs = Seq((1L, "banana"), (2L, "banana"), (3L, "band"))
    val got = checkBoth(docs)
    assert((1 to 6).forall(p => got((1L, p.toLong)) == got((2L, p.toLong))),
      "identical docs must share every rank")
    val maxRank = got.values.max
    assert(got.values.toSet == (1L to maxRank).toSet, "rank space must be dense")
  }

  test("single-character runs force the deepest tie chains") {
    // every proper suffix of "aaaaaaaaaaaa" is a prefix of the longer
    // ones: ties resolve only as the doubled span reaches each length —
    // 12 chars also keeps the DEFAULT initKey=8 path in its loop
    checkBoth(Seq((1L, "aaaaaaaaaaaa"), (2L, "aaab")))
  }

  test("degenerates: empty slice and 1-char docs") {
    assert(run(Seq.empty[(Long, String)]).isEmpty)
    checkBoth(Seq((1L, "x"), (2L, "y"), (3L, "x")))
  }

  // brute-force longest repeated substring: max common prefix over all
  // DISTINCT suffix-instance pairs
  private def bruteLrs(docs: Seq[(Long, String)]): (Long, String) = {
    val sfx = for ((id, t) <- docs; p <- 1 to t.length)
      yield ((id, p), t.substring(p - 1))
    val best = (for {
      (a, sa) <- sfx; (b, sb) <- sfx if a != b
    } yield sa.zip(sb).takeWhile { case (x, y) => x == y }.length).max
    val snippet = (for {
      (a, sa) <- sfx; (b, sb) <- sfx if a != b
      if sa.zip(sb).takeWhile { case (x, y) => x == y }.length == best
    } yield sa.take(best)).min
    (best.toLong, snippet)
  }

  test("repeatedSubstrings finds the planted longest repeat with exact length and snippet") {
    // "abcdef" planted once per doc is the unique longest cross-doc
    // repeat; everything else shares at most 1 char
    val docs = Seq((1L, "xxabcdefyy"), (2L, "zzabcdefww"))
    val got = SuffixArray
      .repeatedSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(4), r.getString(5)))
    val (len, snip) = bruteLrs(docs)
    assert(len == 6L && snip == "abcdef", s"planted expectation, got $len/$snip")
    assert(got.map(_._1).max == len)
    assert(got.filter(_._1 == len).map(_._2).toSet == Set(snip))
  }

  test("duplicate documents report the full duplicated text as the top repeat") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
    val rows = SuffixArray
      .repeatedSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    val top = rows.maxBy(_._5)
    // the pos-1 suffixes of docs 1 and 2 are identical: full 11 chars
    assert(top._5 == 11L && top._6 == "hello world")
    assert(Set(top._1, top._3) == Set(1L, 2L) && top._2 == 1L && top._4 == 1L)
  }

  test("substringHits: cross-document overlapping occurrence counts == naive scan; misses scored 0") {
    // "anana" occurs nowhere; "ana" occurs at banana pos 2,4 (overlap!)
    // and bandana pos 5 — cross-document, multiplicity-exact; the
    // duplicate doc 3 doubles banana's contribution through the rank
    // multiplicities (one index row, weight 2)
    val corpus = Seq((1L, "banana"), (2L, "bandana"), (3L, "banana"))
    val queries = Seq((10L, "ana"), (11L, "and"), (12L, "zzz"), (13L, "toolong"))
    val got = SuffixArray.substringHits(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("eval_id", "q"), "eval_id", "q", qLen = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // naive reference: count every (doc, pos) with the query as prefix
    def naive(q: String): Long = corpus.map { case (_, t) =>
      (1 to t.length).count(p => t.substring(p - 1).startsWith(q)).toLong
    }.sum
    assert(got == Map((10L, "ana") -> naive("ana"), (11L, "and") -> naive("and"),
      (12L, "zzz") -> 0L), s"substring hits diverged: $got")
    assert(naive("ana") == 5L && naive("and") == 1L,
      "fixture lost its overlap/cross-document structure")
    assert(!got.contains((13L, "toolong")), "non-qLen queries must drop")
  }

  test("substringHitsAnyLen: mixed-length queries answered per length class, same counts") {
    val corpus = Seq((1L, "banana"), (2L, "bandana"))
    val queries = Seq((10L, "ana"), (11L, "an"), (12L, "banda"), (13L, "zz"))
    def naive(q: String): Long = corpus.map { case (_, t) =>
      (1 to t.length).count(p => t.substring(p - 1).startsWith(q)).toLong
    }.sum
    val got = SuffixArray.substringHitsAnyLen(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("eval_id", "q"), "eval_id", "q")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    spark.catalog.clearCache()
    assert(got == queries.map { case (id, q) => (id, q) -> naive(q) }.toMap,
      s"variable-length hits diverged: $got")
    assert(naive("an") == 4L && naive("banda") == 1L && naive("zz") == 0L,
      "fixture lost its multi-length structure")

    // FromRanks variant over the PERSISTED index — equal counts, and
    // the empty-queries early return never touches the index
    val viaIdx = SuffixArray.substringHitsAnyLenFromRanks(
      SuffixIndex.ranks(spark, "spec_anylen",
        corpus.toDF("doc_id", "text"), "doc_id", "text"),
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("eval_id", "q"), "eval_id", "q")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    spark.catalog.clearCache()
    assert(viaIdx == got, "index-backed any-length hits diverged")
    val empty = SuffixArray.substringHitsAnyLenFromRanks(
      sys.error("empty-queries path must not build/read the index"),
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("eval_id", "q")
        .filter(org.apache.spark.sql.functions.col("eval_id") < 0),
      "eval_id", "q")
    assert(empty.collect().isEmpty)
    spark.sql("DROP TABLE IF EXISTS graft_sufidx_spec_anylen")
  }

  test("cap saturates: a 100-char shared prefix reports lcp_len == cap") {
    val shared = "a" * 100 + "b"
    val docs = Seq((1L, shared + "x"), (2L, shared + "y"))
    val got = SuffixArray
      .repeatedSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text",
        cap = 80)
      .collect().map(r => r.getLong(4))
    // the two pos-1 suffixes differ only after 101 chars — beyond the
    // 80-char snippet, so the fold saturates at the cap
    assert(got.max == 80L)
  }

  test("SuffixIndex: build once, reuse while fresh, rebuild on a stale stamp; consumers equal the rebuild forms") {
    def tempView(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val a = Seq((1L, "banana"), (2L, "bandana"), (3L, "cabana"))

    // first touch builds; the returned table equals a fresh compute
    val idx1 = SuffixIndex.ranks(spark, "spec_idx", tempView(a), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(idx1 == brute(a), "persisted index diverged from reference")

    // fresh corpus -> the SAME table files are reused (no rebuild):
    // capture the table's location, touch again, location unchanged
    def location(): String =
      spark.sql("DESCRIBE TABLE EXTENDED graft_sufidx_spec_idx").collect()
        .find(_.getString(0) == "Location").map(_.getString(1)).get
    val loc1 = location()
    SuffixIndex.ranks(spark, "spec_idx", tempView(a), "doc_id", "text").count()
    assert(location() == loc1, "unchanged corpus must not rebuild the index")

    // appended document -> stamp moves -> REBUILD (suffix ranks are
    // global; the rebuild IS the increment). The managed table is
    // dropped and rewritten — the warehouse path is stable, the DATA
    // is fresh (proven by content, not path)
    val b = a :+ (4L, "banana")
    val idx2 = SuffixIndex.ranks(spark, "spec_idx", tempView(b), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(idx2 == brute(b), "post-append rebuild diverged from reference")

    // the FromRanks consumer halves over the persisted index equal
    // the self-building forms
    val viaIdx = SuffixArray.repeatedSubstringsFromRanks(
      SuffixIndex.ranks(spark, "spec_idx", tempView(b), "doc_id", "text"),
      tempView(b), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    val direct = SuffixArray.repeatedSubstrings(tempView(b), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(viaIdx == direct, "index-backed repeats diverged from direct form")

    val qs = Seq((10L, "ana"), (11L, "zzz"))
    val hitsIdx = SuffixArray.substringHitsFromRanks(
      SuffixIndex.ranks(spark, "spec_idx", tempView(b), "doc_id", "text"),
      tempView(b), "doc_id", "text", qs.toDF("eval_id", "q"), "eval_id", "q", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val hitsDirect = SuffixArray.substringHits(tempView(b), "doc_id", "text",
      qs.toDF("eval_id", "q"), "eval_id", "q", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hitsIdx == hitsDirect, "index-backed hits diverged from direct form")
    spark.sql("DROP TABLE IF EXISTS graft_sufidx_spec_idx")
  }

  test("SuffixIndex durable root: a catalog reset re-registers the " +
      "existing files (sidecar stamp), zero rebuild") {
    def tempView(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val a = Seq((1L, "banana"), (2L, "bandana"), (3L, "cabana"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-sufidx-root").toString
    try {
      val idx1 = SuffixIndex
        .ranks(spark, "spec_root", tempView(a), "doc_id", "text", Some(root))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(idx1 == brute(a), "externally-rooted index diverged")

      // snapshot the data files: a reuse must leave them untouched
      def files(): Map[String, Long] = {
        val d = new java.io.File(s"$root/spec_root/idx")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }
      val before = files()
      assert(before.nonEmpty, "fixture produced no parquet files")

      // catalog reset: the table vanishes from the catalog (external
      // DROP keeps the files) — a restarted session's view
      spark.sql("DROP TABLE graft_sufidx_spec_root")
      val idx2 = SuffixIndex
        .ranks(spark, "spec_root", tempView(a), "doc_id", "text", Some(root))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(idx2 == brute(a), "re-registered index diverged")
      assert(files() == before,
        "catalog reset with a fresh sidecar stamp must NOT rebuild " +
          "(same files, same mtimes)")

      // stale stamp still rebuilds under a durable root
      val b = a :+ (4L, "banana")
      val idx3 = SuffixIndex
        .ranks(spark, "spec_root", tempView(b), "doc_id", "text", Some(root))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(idx3 == brute(b), "post-append durable-root rebuild diverged")
      assert(files() != before, "stale stamp must rewrite the data files")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sufidx_spec_root")
    }
  }

  test("SuffixIndex managed build tolerates an ORPHANED warehouse dir " +
      "(previous JVM's files, empty catalog) — the q264 regression") {
    def tempView(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val a = Seq((1L, "banana"), (2L, "bandana"))
    // fabricate the orphan: files at the managed location with NO
    // catalog entry (what a prior session's exit leaves behind under
    // an in-memory catalog)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val orphan = java.nio.file.Paths.get(warehouse, "graft_sufidx_spec_orphan")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("stale.parquet"),
      Array[Byte](1, 2, 3))
    val got = SuffixIndex
      .ranks(spark, "spec_orphan", tempView(a), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brute(a),
      "orphaned managed dir must be cleared, never trusted or fatal")
    spark.sql("DROP TABLE IF EXISTS graft_sufidx_spec_orphan")
  }

  test("SuffixIndex lock striping: two TAGS build concurrently from " +
      "two threads, both correct; a same-tag concurrent pair builds once") {
    def tempView(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val ca = Seq((1L, "banana"), (2L, "bandana"))
    val cb = Seq((10L, "mississippi"), (11L, "sassafras"))
    // distinct tags from distinct threads: with per-tag stripes the
    // builds may overlap freely — the invariant under test is that
    // neither corrupts the other and both equal the reference
    val results = new java.util.concurrent.ConcurrentHashMap[String,
      Map[(Long, Long), Long]]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    def worker(tag: String, docs: Seq[(Long, String)]) = new Thread(() =>
      try {
        start.await()
        results.put(tag, SuffixIndex
          .ranks(spark, tag, tempView(docs), "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap)
      } catch { case t: Throwable => errs.add(t) })
    val ts = Seq(worker("spec_par_a", ca), worker("spec_par_b", cb))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent builds threw: ${errs.peek()}")
    assert(results.get("spec_par_a") == brute(ca), "tag A diverged")
    assert(results.get("spec_par_b") == brute(cb), "tag B diverged")

    // same tag, two threads, unchanged corpus: the stripe serializes
    // them — the second finds the first's fresh build and the table
    // location never moves (exactly one build)
    def location(tag: String): String =
      spark.sql(s"DESCRIBE TABLE EXTENDED graft_sufidx_$tag").collect()
        .find(_.getString(0) == "Location").map(_.getString(1)).get
    val loc1 = location("spec_par_a")
    val start2 = new java.util.concurrent.CountDownLatch(1)
    val ts2 = Seq.fill(2)(new Thread(() =>
      try {
        start2.await()
        SuffixIndex.ranks(spark, "spec_par_a", tempView(ca), "doc_id", "text")
          .count()
      } catch { case t: Throwable => errs.add(t) }))
    ts2.foreach(_.start()); start2.countDown(); ts2.foreach(_.join(120000))
    assert(errs.isEmpty, s"same-tag concurrent reuse threw: ${errs.peek()}")
    assert(location("spec_par_a") == loc1,
      "fresh same-tag concurrent reads must not rebuild")
    Seq("spec_par_a", "spec_par_b").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_sufidx_$t"))
  }

  test("SuffixIndex stamp: an id swap between different-length docs " +
      "moves the stamp (rebuild), not served stale") {
    def tempView(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    // same id SET, same total chars, same count — the old
    // (count, chars, id-sum) stamp was blind to this reassignment
    val a = Seq((1L, "banana"), (2L, "bandanaxy"), (3L, "cabana"))
    val swapped = Seq((2L, "banana"), (1L, "bandanaxy"), (3L, "cabana"))
    SuffixIndex.ranks(spark, "spec_swap", tempView(a), "doc_id", "text").count()
    val got = SuffixIndex
      .ranks(spark, "spec_swap", tempView(swapped), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brute(swapped),
      "id swap between different-length docs must rebuild the index")
    spark.sql("DROP TABLE IF EXISTS graft_sufidx_spec_swap")
  }
}
