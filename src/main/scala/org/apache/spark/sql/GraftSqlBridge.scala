package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` seam the engine needs: build a DataFrame from
  * a custom LogicalPlan. Spark's public surface can only construct plans
  * the DataFrame DSL / SQL parser can express; a custom operator node
  * (graft.plans.TopKPerKeyNode) has no DSL spelling, so the wrapper
  * must call `Dataset.ofRows` — which Spark keeps `private[sql]`.
  * Living in `org.apache.spark.sql` is the standard extension-library
  * pattern for exactly this (no Spark internals are modified; this
  * compiles against the public jars).
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to this session (the runtime
    * path; cluster deployments get the same strategy via
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def ensureStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
