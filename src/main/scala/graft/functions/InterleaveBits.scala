package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.util.BitUtil

/** `interleave_bits(a, b)` — native Catalyst expression producing the
  * Morton (Z-order) code of two long keys (SURVEY.md §2.6: the one scalar
  * the reference implements that Spark lacks, `BitUtil.java:122-157`).
  *
  * Implemented with `doGenCode` so it stays inside whole-stage codegen
  * (one static call, no boxing, no UDF serialization) — usable in a write
  * path as `repartitionByRange(interleave_bits(x, y))` for Z-order
  * clustering at any scale.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.util.BitUtil.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  val fnName = "interleave_bits"

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(fnName),
    new ExpressionInfo(classOf[InterleaveBits].getName, fnName),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$fnName expects 2 arguments, got ${children.size}")
      InterleaveBits(children.head, children(1))
    })

  /** Idempotently register `interleave_bits` on an existing session (for
    * sessions built without `spark.sql.extensions=graft.functions.GraftExtensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, descriptor._3, "built-in")
}

/** Session extension entry point:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(InterleaveBits.descriptor)
    ext.injectFunction(InterleaveBits3.descriptor)
    ext.injectFunction(InterleaveBits4.descriptor)
    // the full native family (blocklist matching, LSH/IVF signatures,
    // cosine verifies) — see GraftSqlFunctions for the SQL shapes
    GraftSqlFunctions.all.foreach(ext.injectFunction)
    // SQL MERGE INTO over catalog-synced cdc-lake tables: Spark resolves
    // MergeIntoTable for any relation but rewrites it only for DSv2
    // row-level-op tables — this post-hoc rule routes a v1 lake target
    // through the table's native merge/upsert/delete (r16; see
    // graft.sources.LakeMergeIntoCommand for the supported shape)
    ext.injectPostHocResolutionRule(s => new graft.sources.LakeMergeIntoRule(s))
    // SQL DELETE FROM / UPDATE over the same v1 lake targets (r17; see
    // graft.sources.LakeDmlRule for the supported shapes)
    ext.injectPostHocResolutionRule(s => new graft.sources.LakeDmlRule(s))
    // PARTITIONED BY / DataFrameWriter.partitionBy on lake CREATE/CTAS
    // (r19): maps the catalog partition declaration onto the partitionCol
    // option the write path honors — both the SQL and programmatic routes
    ext.injectPostHocResolutionRule(s => new graft.sources.LakeCreateTableRule(s))
    // SQL time travel (VERSION AS OF / TIMESTAMP AS OF) + CALL
    // maintenance procedures over lake tables (r18): both must rewrite
    // BEFORE analysis — Spark's own resolution throws for v1 targets —
    // so they live in a parser wrapper (see graft.sources.GraftSqlParser)
    ext.injectParser((s, delegate) => new graft.sources.GraftSqlParser(s, delegate))
  }
}
