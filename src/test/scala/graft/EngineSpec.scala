package graft

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EngineSpec extends SparkSpec {

  test("attach registers all tables + native functions for plain SQL use") {
    Engine.attach(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT (SELECT count(*) FROM lineitem) AS li,
             (SELECT count(*) FROM documents) AS docs,
             simhash60(array(1L)) AS sig""").collect().head
    assert(r.getLong(0) == 6000L)
    assert(r.getLong(1) == 500L)
    assert(r.getLong(2) == 1L)
    // events view carries the normalized timestamp type
    assert(spark.table("events").schema("ts").dataType.typeName == "timestamp")
  }

  test("registry invariants: oracle per query, unique qNN bench keys, docs present") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size >= 215)
    // the driver contract: every registered query carries a DuckDB oracle
    val missing = names.filterNot(SparkEntry.oracleSql.contains)
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    // Bench compresses names to their qNN prefix for the stdout JSON —
    // a duplicate prefix would silently drop a query from the record
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.length == prefixes.length,
      "qNN bench keys must stay unique")
    assert(SparkEntry.catalog.forall(_._2.nonEmpty), "every query documents itself")
    // the round-8 doc-drift guard: QUERIES.md is generated from this
    // registry (sbt "runMain graft.Catalog"), so its row count must
    // track the registry EXACTLY — a query landed without the catalog
    // regen (and the README/COVERAGE count bumps that ride along) goes
    // red here instead of shipping as a 239-vs-240 style drift
    val catalogRows = scala.io.Source.fromFile("QUERIES.md")(scala.io.Codec.UTF8)
      .getLines().count(_.startsWith("| `q"))
    assert(catalogRows == names.size,
      s"QUERIES.md lists $catalogRows queries, registry has ${names.size} — " +
        "regenerate with `sbt \"runMain graft.Catalog\"` and bump the " +
        "README.md / COVERAGE.md counts")
  }
}

/** Scale-citizenship proof: partition pruning reaches the scan. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned writes prune untouched partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part-orders").toString
    graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_year") && !scan.contains("PartitionFilters: []"),
      s"partition filter missing:\n$scan")
    // only the one partition directory is read
    val files = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("o_year=1997")))
  }
}
