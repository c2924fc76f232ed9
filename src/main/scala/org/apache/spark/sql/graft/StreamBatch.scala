package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** Stream→batch conversion (reference operator S4,
  * `/root/reference/src/main/java/org/apache/spark/sql/hudi/commands/BinlogSyncHoodieCommand.scala:65-81`).
  *
  * Inside `Sink.addBatch` the incoming DataFrame is flagged streaming and
  * refuses batch writes. The reference rebinds a row encoder over
  * `queryExecution.toRdd`; Spark exposes the same conversion directly as
  * `SparkSession.internalCreateDataFrame(..., isStreaming = false)`, which
  * is `private[sql]` — hence this one shim object inside the sql package
  * (the reference likewise lives inside `org.apache.spark.sql.hudi`).
  * Zero data movement: the physical RDD is reused as-is.
  */
object StreamBatch {

  def toBatch(df: DataFrame): DataFrame = {
    if (!df.isStreaming) return df
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** The inverse direction, for v1 `Source.getBatch` implementations: a
    * batch-planned DataFrame re-flagged streaming so MicroBatchExecution
    * accepts it (same zero-copy `internalCreateDataFrame` shim).
    */
  def toStreaming(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}

/** LogicalPlan→DataFrame bridge (`Dataset.ofRows` is `private[sql]`) —
  * lets a runnable command (the MERGE INTO rewrite) execute an analyzed
  * source sub-plan through the public DataFrame API.
  */
object Plans {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

/** Nullability-insensitive schema comparison (`DataType.sameType` is
  * `private[spark]`): the declared-vs-stored schema check must not fail
  * on nullability-only drift (catalogs and INSERT projections routinely
  * flip it).
  */
object Types {
  def sameIgnoreNullability(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)
}

/** Column↔Expression bridge (`Column(expr)`/`col.expr` went internal in Spark 4). */
object Exprs {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
