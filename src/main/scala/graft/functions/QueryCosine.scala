package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `QueryCosine(emb, query, quantized)` — cosine of an embedding column
  * against a CONSTANT query vector in ONE pass over the array: the
  * scoring primitive under every top-k/ANN/IVF path, replacing a
  * `zip_with` allocation plus two `aggregate` folds per row.
  *
  * Bit-identical arithmetic contract with the composed-`Column`
  * formulations it replaced (property-tested in `QueryCosineSpec`):
  *
  *  - double mode mirrors `Similarity.cosine`: products
  *    `double(a_i) * q_i` accumulated left-to-right, then
  *    `dot / (sqrt(na) * nb)` with `nb = sqrt(Σ q_i²)` precomputed in
  *    Scala exactly as before;
  *  - quantized mode mirrors `Similarity.quantizedCosine`:
  *    `qz(x) = (long) floor(double(x) * scale)`, integer dot/norms, final
  *    `dot / (sqrt(na) * sqrt(nb))` — `nb` from the quantized query;
  *  - null array / null element / length mismatch yields NULL (the
  *    zip_with-padding + fold-collapse semantics);
  *  - hardening divergence shared with [[PairCosine]]: zero norms divide
  *    to NaN/Infinity in plain Java where ANSI-mode Column division
  *    threw.
  */
case class QueryCosine(
    child: Expression,
    query: Array[Double],
    quantized: Boolean,
    scale: Double) extends UnaryExpression {

  require(query.nonEmpty, "query vector must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"query_cosine requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "query_cosine"

  private def tc: Int = child.dataType match {
    case ArrayType(FloatType, _) => QueryCosine.TFloat
    case _ => QueryCosine.TDouble
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else QueryCosine.compute(v.asInstanceOf[ArrayData], query, tc, quantized, scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val queryRef = ctx.addReferenceObj("query", query, "double[]")
    val boxed = ctx.freshName("qCos")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${childGen.isNull}) {
        java.lang.Double $boxed = graft.functions.QueryCosine.compute(
          ${childGen.value}, $queryRef, $tc, $quantized, ${scale}D);
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }
    """)
  }

  // Case-class equality on an Array field is reference identity, so two
  // semantically identical expressions built from separate `.toArray`
  // copies (q36/q43 build the exact and ANN sides independently) would
  // never compare equal — defeating canonicalization, common-subexpression
  // elimination, and exchange reuse (ADVICE r8). Compare contents.
  override def equals(other: Any): Boolean = other match {
    case q: QueryCosine =>
      child == q.child && quantized == q.quantized && scale == q.scale &&
        java.util.Arrays.equals(query, q.query)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(
      child, java.lang.Boolean.valueOf(quantized),
      java.lang.Double.valueOf(scale),
      Integer.valueOf(java.util.Arrays.hashCode(query)))

  override protected def withNewChildInternal(newChild: Expression): QueryCosine =
    copy(child = newChild)
}

object QueryCosine {

  val TFloat = 0
  val TDouble = 1

  /** Single-pass kernel (called from generated code). */
  def compute(
      arr: ArrayData,
      query: Array[Double],
      t: Int,
      quantized: Boolean,
      scale: Double): java.lang.Double = {
    val n = query.length
    if (arr.numElements() != n) return null
    def get(i: Int): Double =
      if (t == TFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    if (quantized) {
      var dot = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val qa = math.floor(get(i) * scale).toLong
        val qb = math.floor(query(i) * scale).toLong
        dot += qa * qb; na += qa * qa; nb += qb * qb
        i += 1
      }
      java.lang.Double.valueOf(
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
    } else {
      // nb exactly as the Scala-side constant: sqrt of a left-to-right sum
      var qs = 0.0
      var j = 0
      while (j < n) { qs += query(j) * query(j); j += 1 }
      val nb = math.sqrt(qs)
      var dot = 0.0; var na = 0.0
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val da = get(i)
        dot += da * query(i); na += da * da
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * nb))
    }
  }
}
