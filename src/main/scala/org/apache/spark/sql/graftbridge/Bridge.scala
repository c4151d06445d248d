package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so custom
  * Catalyst expressions (graft.functions.FloatVectorDot) reach it through
  * this shim package — the conventional pattern for Spark extension
  * libraries that ship native expressions without a session extension.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (custom) logical plan — `Dataset.ofRows` is
    * private[sql], reached through this shim like the expression helpers.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-plan a streaming micro-batch DataFrame as a plain BATCH frame over
    * the same rows (`internalCreateDataFrame` is private[sql]). A v1
    * `Sink.addBatch` receives a frame whose plan is streaming-tagged; a
    * sink that runs several actions over it (the manifest merge does —
    * bucket split, per-bucket writes) must re-wrap it first, exactly as
    * DeltaSink does.
    */
  def batchDf(data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ss = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ss.internalCreateDataFrame(data.queryExecution.toRdd, data.schema,
      isStreaming = false)
  }
}
