package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** Bridge into `private[sql]` surface needed to hand a custom
  * `LogicalPlan` back to the public `DataFrame` API — the standard
  * technique for third-party whole-operator extensions (a planner
  * strategy can PLAN a custom node, but only `Dataset.ofRows` can
  * wrap one into a DataFrame). This is the only file in the repo
  * living outside the `graft` namespace, and it contains no logic.
  */
object GraftBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan): CDataFrame
}
