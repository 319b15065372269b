package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Directory-partition pruning — the other half of the file-skipping
  * story beside manifests (BloomManifestSpec) and z-order
  * (ZorderSpec): a corpus written `partitionBy(col)` prunes at the
  * DIRECTORY listing, before manifests, footers, or rows exist to the
  * plan at all. Static pruning comes from a literal predicate; dynamic
  * partition pruning (DPP) derives the predicate at RUNTIME from the
  * dim side of a join — the mechanism that makes a star-schema fact
  * scan cheap without hand-written partition filters.
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("part-events").toString
    graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(d)
    d
  }

  test("literal predicate prunes partitions at plan time") {
    val df = spark.read.parquet(dir).filter(col("event_type") === "click")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters"),
      s"scan must carry partition filters:\n$physical")
    // the partition predicate must NOT degrade to a row-level filter
    // over all partitions: prove it by the files actually read
    val files = df.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("event_type=click")),
      s"read outside the pruned partition: ${files.filterNot(_.contains("event_type=click")).take(2).mkString}")
  }

  test("dynamic partition pruning: the dim side's filter prunes the fact scan") {
    import spark.implicits._
    val fact = spark.read.parquet(dir)
    // the dim must come from STORAGE: a literal in-memory dim constant-
    // folds into a static PartitionFilter (the previous test's path);
    // only values unknowable at plan time force the runtime subquery
    val dimDir = java.nio.file.Files.createTempDirectory("part-dim").toString
    Seq(("purchase", 1L), ("view", 0L), ("click", 0L))
      .toDF("etype", "flag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("flag") === 1L)
    val joined = fact.join(dim, fact("event_type") === dim("etype"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("dynamicpruning"),
      s"expected a dynamicpruning expression in the fact scan:\n${physical.take(4000)}")
    // and the join result is correct: exactly the purchase rows
    val expected = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase").count()
    assert(joined.count() == expected)
  }
}
