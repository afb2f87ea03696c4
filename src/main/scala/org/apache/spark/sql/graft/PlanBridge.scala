package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.SparkStrategy

/** LogicalPlan ↔ DataFrame bridge (sibling of [[ColumnBridge]]).
  *
  * A library contributing custom logical operators needs two `private[sql]`
  * hops: wrapping a hand-built [[LogicalPlan]] back into a [[DataFrame]]
  * (`Dataset.ofRows`) and reading a DataFrame's analyzed plan. Both are the
  * standard extension-library pattern, compiled into the
  * `org.apache.spark.sql` namespace.
  */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently add a planner strategy to the session (the runtime twin
    * of `SparkSessionExtensions.injectPlannerStrategy`, for sessions built
    * without the extensions config). Synchronized on the session's
    * experimental methods holder: extraStrategies is a plain var, so an
    * unsynchronized read-modify-write can drop a concurrent registration.
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(s))
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ s
    }
}
