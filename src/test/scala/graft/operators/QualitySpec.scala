package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality.{RefCheck, RowCheck, UniqueCheck}

/** [[Quality.report]] semantics at the edges the q145 data cannot
  * reach: NULL predicates, NULL foreign keys, empty tables, and the
  * duplicated-ROWS (not keys) violation count. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  test("a NULL predicate is a violation — constraints pass only when provable") {
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(99.0)))
      .toDF("id", "v")
    val r = Quality.report(df, rowChecks = Seq(
      RowCheck("v in [0,10]", col("v") >= 0.0 && col("v") <= 10.0)))
      .collect().head
    // row 2 (NULL -> unknown) and row 3 (out of range) both violate
    assert(r.getAs[Long]("checked") == 3L)
    assert(r.getAs[Long]("violations") == 2L)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("unique counts duplicated ROWS, not duplicated keys") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val r = Quality.report(df,
      rowChecks = Nil, uniqueChecks = Seq(UniqueCheck("k unique", Seq("k"))))
      .collect().head
    // 3 rows of key 1 + 2 rows of key 3 = 5 rows a dedup would touch
    assert(r.getAs[Long]("checked") == 6L)
    assert(r.getAs[Long]("violations") == 5L)
  }

  test("empty table: unique check vacuously passes with checked = 0") {
    val df = Seq.empty[Long].toDF("k")
    val r = Quality.report(df,
      rowChecks = Nil, uniqueChecks = Seq(UniqueCheck("k unique", Seq("k"))))
      .collect().head
    assert(r.getAs[Long]("checked") == 0L)
    assert(r.getAs[Long]("violations") == 0L)
    assert(r.getAs[Boolean]("pass"))
  }

  test("empty table: row check vacuously passes (0 violations, not NULL)") {
    val df = Seq.empty[Long].toDF("k")
    val r = Quality.report(df,
      rowChecks = Seq(RowCheck("k not null", col("k").isNotNull)))
      .collect().head
    assert(r.getAs[Long]("checked") == 0L)
    assert(!r.isNullAt(r.fieldIndex("violations")) &&
      r.getAs[Long]("violations") == 0L)
    assert(!r.isNullAt(r.fieldIndex("pass")) && r.getAs[Boolean]("pass"))
  }

  test("NULL foreign keys are not referential violations (SQL FK semantics)") {
    val fact = Seq(Some(10L), Some(11L), None, Some(99L)).toDF("fk")
    val dim = Seq(10L, 11L, 12L).toDF("pk")
    val r = Quality.report(fact,
      rowChecks = Nil,
      refChecks = Seq(RefCheck("fk references pk", "fk", dim, "pk")))
      .collect().head
    // checked = the 3 non-null keys the constraint applies to;
    // only the dangling 99 violates — the NULL passes through
    assert(r.getAs[Long]("checked") == 3L)
    assert(r.getAs[Long]("violations") == 1L)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("any number of row checks compile to ONE scan of the table") {
    val dir = java.nio.file.Files.createTempDirectory("quality-scan")
      .resolve("t").toString
    Seq((1L, 5.0, "x"), (2L, 7.0, "y")).toDF("id", "v", "s")
      .write.parquet(dir)
    val df = spark.read.parquet(dir)
    val report = Quality.report(df, rowChecks = Seq(
      RowCheck("id not null", col("id").isNotNull),
      RowCheck("v in [0,10]", col("v") >= 0.0 && col("v") <= 10.0),
      RowCheck("v in [0,6]", col("v") <= 6.0),
      RowCheck("s accepted", col("s").isin("x", "y", "z")),
      RowCheck("s not null", col("s").isNotNull),
      RowCheck("id positive", col("id") > 0L)))
    val plan = report.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"6 row checks must cost exactly one scan, plan had $scans")
    assert(report.collect().forall(_.getAs[Boolean]("pass"))
      == false, "the v <= 6 check must fail on v = 7")
  }

  test("report stacks all three check classes into one ordered frame") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val dim = Seq("a", "b").toDF("s")
    val out = Quality.report(df,
      rowChecks = Seq(RowCheck("id not null", col("id").isNotNull)),
      uniqueChecks = Seq(UniqueCheck("id unique", Seq("id"))),
      refChecks = Seq(RefCheck("s references dim", "s", dim, "s")))
    val names = out.collect().map(_.getAs[String]("check_name")).toSeq
    assert(names == names.sorted && names.size == 3)
    assert(out.collect().forall(_.getAs[Boolean]("pass")))
  }
}
