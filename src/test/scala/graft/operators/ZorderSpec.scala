package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the z-order layout's pruning claim with measured scan rows.
  *
  * A linear sort order serves predicates on its leading column only:
  * every file spans the full domain of every OTHER column, so parquet
  * row-group stats prune nothing for them. The z-curve bounds both
  * dimensions per file, so (a) a 2-D box predicate reads no more than
  * the linear layout reads, and (b) a predicate on the NON-leading
  * dimension — where the linear layout must scan everything — reads a
  * small fraction.
  *
  * Timestamp caveat this spec also locks in: Spark 4.1 does not build
  * parquet row-group predicates for TIMESTAMP_NTZ columns (the NTZ
  * logical type never matches the pushdown schema types), so a layout
  * whose pruning dimension is a timestamp must store it as a TZ
  * timestamp written as TIMESTAMP_MICROS (or as epoch longs) for
  * stats to prune at all.
  */
class ZorderSpec extends SparkSpec {

  /** Rows the parquet reader actually emitted (post row-group/page
    * pruning, pre any residual filter) — the I/O proxy. AQE off so the
    * executed plan exposes the scan directly. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout prunes both dimensions; linear layout only its sort column") {
    val befAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val befTs = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // NTZ parquet predicates never reach row-group stats (see scaladoc)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val root = java.nio.file.Files.createTempDirectory("zorder").toString
      val orders = graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "orders")
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))

      // linear layout: sorted by custkey only — the best a 1-D sort does
      orders.repartitionByRange(64, col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.parquet(s"$root/linear")
      Maintenance.zorderWrite(orders, col("o_custkey"),
        unix_timestamp(col("o_orderdate")), s"$root/zorder", 64)

      // ~10% x ~10% box on (custkey, date), and the date slice alone
      def box(dir: String): DataFrame =
        spark.read.parquet(dir).filter(
          col("o_custkey").between(700, 850) &&
            col("o_orderdate").between("1997-01-01", "1997-08-31"))
      def dateOnly(dir: String): DataFrame =
        spark.read.parquet(dir).filter(
          col("o_orderdate").between("1997-01-01", "1997-08-31"))

      // identical answers first
      val a = box(s"$root/linear").collect().map(_.getLong(0)).sorted.toSeq
      val b = box(s"$root/zorder").collect().map(_.getLong(0)).sorted.toSeq
      assert(a == b && a.nonEmpty, s"layouts disagree: ${a.size} vs ${b.size}")

      val total = spark.read.parquet(s"$root/linear").count()
      val linBox = scanRows(box(s"$root/linear"))
      val zBox = scanRows(box(s"$root/zorder"))
      val linDate = scanRows(dateOnly(s"$root/linear"))
      val zDate = scanRows(dateOnly(s"$root/zorder"))

      // box: both layouts prune custkey; only z-order also prunes dates
      assert(zBox < linBox, s"box: z-order read $zBox vs linear $linBox")
      // non-leading dim: linear reads ~everything, z-order a fraction
      assert(linDate * 10 >= total * 9,
        s"linear layout unexpectedly pruned dates: $linDate of $total")
      assert(zDate * 3 <= linDate,
        s"date slice: z-order read $zDate vs linear $linDate — expected < 1/3")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", befAqe)
      befTs match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  test("manifest pruning: box query opens only intersecting files, same answer") {
    val root = java.nio.file.Files.createTempDirectory("manifest").toString
    // realistic layout table: epoch column carried for range pruning
    val orders = graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "orders")
      .withColumn("o_epoch", unix_timestamp(col("o_orderdate").cast("timestamp")))
    Maintenance.zorderWrite(orders, col("o_custkey"), col("o_epoch"),
      s"$root/data", 64)
    val nFiles = Maintenance.writeManifest(spark, s"$root/data",
      s"$root/manifest", Seq("o_custkey", "o_epoch"))
    assert(nFiles == 64L, s"manifested $nFiles files")

    val (ckLo, ckHi) = (700L, 850L)
    val epLo = java.time.LocalDate.parse("1997-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val epHi = java.time.LocalDate.parse("1997-08-31")
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val pruned = Maintenance.readWithManifest(spark, s"$root/data",
      s"$root/manifest", Map("o_custkey" -> (ckLo, ckHi), "o_epoch" -> (epLo, epHi)))
    // planning-level skip: far fewer files opened than the table holds
    assert(pruned.inputFiles.length * 4 <= 64,
      s"manifest kept ${pruned.inputFiles.length} of 64 files")
    // same answer as the full scan, after the residual filter both run
    def residual(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("o_custkey").between(ckLo, ckHi) &&
        col("o_epoch").between(epLo, epHi))
      .select("o_orderkey")
    val got = residual(pruned).collect().map(_.getLong(0)).sorted.toSeq
    val want = residual(spark.read.parquet(s"$root/data"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty, s"pruned read diverged: ${got.size} vs ${want.size}")

    // disjoint interval -> empty frame, schema preserved
    val none = Maintenance.readWithManifest(spark, s"$root/data",
      s"$root/manifest", Map("o_custkey" -> (100000L, 200000L)))
    assert(none.isEmpty && none.schema == spark.read.parquet(s"$root/data").schema)
  }

  test("manifest round-trips data paths containing spaces") {
    import spark.implicits._
    // input_file_name() URI-encodes; the pruned read must decode before
    // handing paths to Hadoop's non-decoding Path(String) parser
    val root = java.nio.file.Files.createTempDirectory("mani fest").toString
    val df = (1L to 100L).map(i => (i, i % 10)).toDF("a", "b")
    df.repartition(4).write.parquet(s"$root/da ta")
    Maintenance.writeManifest(spark, s"$root/da ta", s"$root/man", Seq("a"))
    val r = Maintenance.readWithManifest(spark, s"$root/da ta", s"$root/man",
      Map("a" -> (10L, 20L)))
    assert(r.filter(col("a").between(10, 20)).count() == 11)
  }

  test("degenerate constant dimension degrades to a plain sort, content intact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("zorder-const").toString
    val df = (1L to 1000L).map(i => (i, 42L)).toDF("a", "c")
    Maintenance.zorderWrite(df, col("c"), col("a"), s"$root/z", 8)
    val back = spark.read.parquet(s"$root/z")
    assert(back.count() == 1000L)
    assert(back.agg(sum("a")).head.getLong(0) == 500500L)
    assert(back.columns.sorted.toSeq == Seq("a", "c"))
  }
}
