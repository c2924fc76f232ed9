package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `PlaneSignature(emb, planes)` — random-hyperplane LSH signature of an
  * embedding vector in ONE pass over the array: bit `p` of the result is 1
  * iff `emb · planes(p) > 0`.
  *
  * Replaces the composed-`Column` formulation (one `aggregate(zip_with(...))`
  * per plane), which traversed — and allocated an intermediate array for —
  * the embedding once PER HYPERPLANE: 32 passes + 32 allocations per row for
  * a 32-plane signature. This expression reads the array elements once into
  * a stack `double[]`, then runs `planes × dim` primitive multiply-adds with
  * no allocation besides that buffer; `doGenCode` keeps it inside
  * whole-stage codegen (a single static call, no boxing).
  *
  * Exact-compatibility contract with the old formulation (verified by
  * property test against it in `PlaneSignatureSpec`):
  *  - per-plane dot = left-to-right fold `((0.0 + x0) + x1) + …` — identical
  *    IEEE addition order;
  *  - a null input array, any null element, or a length mismatch with the
  *    plane dimension yields signature 0 (the old `when(dot > 0, …)
  *    .otherwise(0)` collapsed null dots to 0 for every plane);
  *  - NaN dots set no bit (`NaN > 0` is false in both).
  */
case class PlaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, s"1..64 planes required, got ${planes.length}")
  require(planes.forall(_.length == planes(0).length), "planes must share one dimension")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"plane_signature requires array<float|double|int|bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "plane_signature"

  private def typeCode: Int = child.dataType match {
    case ArrayType(FloatType, _) => PlaneSignature.TFloat
    case ArrayType(DoubleType, _) => PlaneSignature.TDouble
    case ArrayType(IntegerType, _) => PlaneSignature.TInt
    case _ => PlaneSignature.TLong
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else PlaneSignature.compute(v.asInstanceOf[ArrayData], planes, typeCode)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull}
          ? 0L
          : graft.functions.PlaneSignature.compute(${childGen.value}, $planesRef, $typeCode);
      """,
      isNull = FalseLiteral)
  }

  // Content equality over the plane matrix (see QueryCosine: Array
  // fields default to reference identity, defeating plan/exchange reuse).
  override def equals(other: Any): Boolean = other match {
    case p: PlaneSignature =>
      child == p.child && planes.length == p.planes.length &&
        planes.indices.forall(i => java.util.Arrays.equals(planes(i), p.planes(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(
      child, Integer.valueOf(planes.map(java.util.Arrays.hashCode).toSeq.hashCode()))

  override protected def withNewChildInternal(newChild: Expression): PlaneSignature =
    copy(child = newChild)
}

object PlaneSignature {

  val TFloat = 0
  val TDouble = 1
  val TInt = 2
  val TLong = 3

  /** Single-pass signature kernel (called from generated code). */
  def compute(arr: ArrayData, planes: Array[Array[Double]], typeCode: Int): Long = {
    val dim = planes(0).length
    if (arr.numElements() != dim) return 0L
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return 0L
      v(d) = typeCode match {
        case TFloat => arr.getFloat(d).toDouble
        case TDouble => arr.getDouble(d)
        case TInt => arr.getInt(d).toDouble
        case _ => arr.getLong(d).toDouble
      }
      d += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v(i) * pl(i); i += 1 }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
