package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface needed to build a DataFrame from
  * a custom LogicalPlan (the standard pattern for libraries that add
  * whole-operator nodes — same approach as public Spark-extension
  * projects, e.g. the DatasetFactory in Qbeast or Pathling's
  * SqlStrategy setup; see SNIPPETS.md).
  */
object GraftSqlShims {

  /** DataFrame over an arbitrary (already-resolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Column over a raw catalyst Expression (classic-session bridge) —
    * for expressions with no public builder, e.g. a bloom-filter
    * membership probe over a Literal sketch. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The catalyst Expression behind a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The planner strategies an extensions instance would inject
    * (test hook for the spark.sql.extensions registration path). */
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** Names an extensions instance would add to a function registry
    * (test hook: registers into a throwaway clone of the builtins). */
  def injectedFunctionNames(ext: SparkSessionExtensions): Set[String] = {
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    val before = reg.listFunction().map(_.funcName).toSet
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName).toSet -- before
  }
}
