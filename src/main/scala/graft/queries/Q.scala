package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation over a testdata
  * directory plus (when SQL-expressible) a bit-equivalent DuckDB oracle.
  *
  * The driver sorts columns by name and hash-compares values, so every
  * query keeps its output deterministic: exact decimal arithmetic for
  * money sums (double sums are order-dependent), total orders under any
  * `limit`, and portable hashes (see [[graft.functions.Portable]]).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** Read one testdata table from an sf directory.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/test
    * sessions) — it then surfaces as a LongType of nanos. Normalize it to
    * a micros TimestampType here so queries see the same value DuckDB does
    * (DuckDB also truncates nanos to micros).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer div — a double division would lose precision above 2^53 ns
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
