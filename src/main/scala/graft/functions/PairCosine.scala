package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `PairCosine(e1, e2, quantized)` — exact cosine of two embedding columns
  * in ONE pass over both arrays.
  *
  * Replaces the composed-`Column` pair verify (a `zip_with` allocation plus
  * THREE `aggregate` folds per candidate pair — the q37/q50 hot path),
  * keeping the bit-identical arithmetic contract the oracle compare
  * depends on (property-tested against the old formulation in
  * `PairCosineSpec`):
  *
  *  - quantized: `qz(x) = (long) floor(double(x) * scale)`; integer
  *    dot/norm sums (exact, order-free); final
  *    `dot / (sqrt(na) * sqrt(nb))` — the same two sqrts, one multiply,
  *    one IEEE division as the Column form;
  *  - double mode: products `double(a) * double(b)` accumulated
  *    left-to-right — the identical IEEE addition sequence to the
  *    `aggregate` folds — then `dot / (sqrt(na) * sqrt(nb))`;
  *  - a null array, mismatched lengths (zip_with padded with null and the
  *    fold collapsed to null), or any null element yields NULL;
  *  - NaN/Infinity elements flow through the same double->long cast
  *    semantics as Spark's CAST (NaN -> 0, Inf -> Long.MaxValue);
  *  - INTENTIONAL hardening divergence: a zero-norm vector yields NaN
  *    (dropped by every caller's threshold filter), where the Column
  *    division THREW under ANSI mode (DIVIDE_BY_ZERO) — a latent crash
  *    the verify paths inherited from default-ANSI Spark 4.
  */
case class PairCosine(
    left: Expression,
    right: Expression,
    quantized: Boolean,
    scale: Double) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pair_cosine requires two array<float|double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pair_cosine"

  private def tc(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => PairCosine.TFloat
    case _ => PairCosine.TDouble
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    PairCosine.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      tc(left), tc(right), quantized, scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("pairCos")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        java.lang.Double $boxed = graft.functions.PairCosine.compute(
          ${leftGen.value}, ${rightGen.value},
          ${tc(left)}, ${tc(right)}, $quantized, ${scale}D);
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PairCosine =
    copy(left = newLeft, right = newRight)
}

object PairCosine {

  val TFloat = 0
  val TDouble = 1

  /** Single-pass kernel (called from generated code). Returns null for
    * null elements or length mismatch (the composed form's semantics).
    */
  def compute(
      a: ArrayData,
      b: ArrayData,
      ta: Int,
      tb: Int,
      quantized: Boolean,
      scale: Double): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    def get(arr: ArrayData, t: Int, i: Int): Double =
      if (t == TFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    if (quantized) {
      var dot = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val qa = math.floor(get(a, ta, i) * scale).toLong
        val qb = math.floor(get(b, tb, i) * scale).toLong
        dot += qa * qb; na += qa * qa; nb += qb * qb
        i += 1
      }
      java.lang.Double.valueOf(
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
    } else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val da = get(a, ta, i)
        val db = get(b, tb, i)
        dot += da * db; na += da * da; nb += db * db
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }
}
