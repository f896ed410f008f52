package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4's unified Column API hides the
  * classic `ExpressionUtils` behind `private[sql]`; custom Catalyst
  * expressions (graft.functions.*) still need to surface as `Column`s.
  * Living under `org.apache.spark.sql` grants that access — the one
  * package-private reach-in in this codebase, kept to two one-liners.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a live session (sessionState is
    * likewise private[sql]). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Column → catalyst Expression via the SESSION converter — unlike
    * [[expression]] (lazy ColumnNodeExpression wrapper) this yields
    * real catalyst nodes (e.g. a proper SortOrder for `.desc`), which
    * custom logical operators need since the analyzer only unwraps the
    * lazy form inside built-in nodes. */
  def sessionExpression(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]) — how custom logical operators enter the Column
    * API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until the listener bus has delivered all queued events —
    * lets tests COUNT Spark jobs via a SparkListener deterministically
    * (event delivery is asynchronous; listenerBus is private[spark]). */
  def flushListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** A parquet DataFrame over a CUSTOM FileIndex — how a manifest-
    * backed table surfaces planning-time file skipping through the
    * ordinary scan machinery (HadoopFsRelation's constructor and
    * Dataset.ofRows are private[sql]). The index's `listFiles`
    * receives the scan's pushed data filters; everything downstream
    * (column pruning, row-level filtering, codegen) is stock
    * FileSourceScanExec. */
  def parquetRelation(spark: org.apache.spark.sql.SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = new org.apache.spark.sql.types.StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(cls)
    org.apache.spark.sql.classic.Dataset.ofRows(cls,
      org.apache.spark.sql.execution.datasources.LogicalRelation(relation))
  }

  /** Re-flag a batch DataFrame as STREAMING — what a V1
    * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
    * must return (MicroBatchExecution asserts `isStreaming` on the
    * plan it splices in; `internalCreateDataFrame` is private[sql]).
    * The batch plan executes exactly as built — only the flag moves. */
  def asStreaming(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** The inverse of [[asStreaming]]: a V1 Sink's `addBatch` receives a
    * streaming-flagged frame that refuses `.write`; re-wrapping its
    * physical rows drops the flag without copying data. */
  def asBatch(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)

  /** Idempotently add a planner strategy on a live session (the
    * build-time path is GraftExtensions.injectPlannerStrategy). */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }

  /** Idempotently add an optimizer rule on a live session — lands in
    * the optimizer's final "User Provided Optimizers" batch, i.e. the
    * rewritten plan is what physical planning (and V1 filter pushdown,
    * which reads Filters above the relation at PLANNING time) sees. */
  def addOptimizerRule(spark: org.apache.spark.sql.SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule)) {
      exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }
}
