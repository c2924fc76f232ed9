package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.util.BitUtil

/** 3-D and 4-D Morton codes as native codegen'd expressions — the N-dim
  * generalization of [[InterleaveBits]] (VERDICT r12 #7: real tables
  * cluster on 3-4 mixed-type keys). Same design: one static call inside
  * whole-stage codegen, no boxing, no UDF. Dimension width shrinks with
  * arity (21 bits at 3-D, 16 at 4-D — 63/64 bits used); callers normalize
  * dimensions into that range first (LakeTable's clustering scales each
  * dimension by its per-commit min/max).
  */
case class InterleaveBits3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits3 requires (bigint, bigint, bigint), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits3"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    BitUtil.interleave3(
      a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.util.BitUtil.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): InterleaveBits3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class InterleaveBits4(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits4 requires (bigint, bigint, bigint, bigint), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits4"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    BitUtil.interleave4(
      a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.util.BitUtil.interleave4($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): InterleaveBits4 =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object InterleaveBits3 {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val fnName = "interleave_bits3"

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(fnName),
    new ExpressionInfo(classOf[InterleaveBits3].getName, fnName),
    (children: Seq[Expression]) => {
      require(children.size == 3, s"$fnName expects 3 arguments, got ${children.size}")
      InterleaveBits3(children(0), children(1), children(2))
    })
}

object InterleaveBits4 {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val fnName = "interleave_bits4"

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(fnName),
    new ExpressionInfo(classOf[InterleaveBits4].getName, fnName),
    (children: Seq[Expression]) => {
      require(children.size == 4, s"$fnName expects 4 arguments, got ${children.size}")
      InterleaveBits4(children(0), children(1), children(2), children(3))
    })
}
