package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `NearestCentroid(emb, centroids)` — id of the centroid with the highest
  * cosine similarity to the embedding, in ONE pass over the array.
  *
  * Replaces the composed-`Column` IVF assignment (`array_max` over one
  * `aggregate(zip_with(...))` cosine struct per centroid), which traversed
  * — and allocated an intermediate array for — the embedding once PER
  * CENTROID. This expression reads the elements once into a local
  * `double[]`, then runs `k × dim` primitive multiply-adds.
  *
  * Exact-compatibility contract with the old formulation (property-tested
  * in `NearestCentroidSpec`):
  *  - per-centroid cosine = `dot / (sqrt(Σe²) * ‖c‖)` with left-to-right
  *    IEEE accumulation and the centroid norm precomputed driver-side —
  *    identical operations in identical order;
  *  - the winner follows Spark's `array_max(struct(sim, cid))` ordering:
  *    doubles compare with NaN greatest (java.lang.Double.compare), equal
  *    sims tie-break to the LARGEST centroid id;
  *  - a null array, null element, or length mismatch yields the same
  *    winner the null-propagated struct comparison produced: every cosine
  *    null → `array_max` returns the last struct → largest cid.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "at least one centroid required")
  require(centroids.forall(_.length == centroids(0).length),
    "centroids must share one dimension")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"

  /** Driver-side centroid norms, exactly as the legacy formulation's
    * `math.sqrt(c.map(x => x * x).sum)` literal.
    */
  private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) centroids.length - 1
    else NearestCentroid.compute(v.asInstanceOf[ArrayData], centroids, norms, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val centroidsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = ${childGen.isNull}
          ? ${centroids.length - 1}
          : graft.functions.NearestCentroid.compute(
              ${childGen.value}, $centroidsRef, $normsRef, $isFloat);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  // Content equality over the centroid matrix (see QueryCosine: Array
  // fields default to reference identity, defeating plan/exchange reuse).
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroid =>
      child == n.child && centroids.length == n.centroids.length &&
        centroids.indices.forall(i => java.util.Arrays.equals(centroids(i), n.centroids(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(
      child, Integer.valueOf(centroids.map(java.util.Arrays.hashCode).toSeq.hashCode()))

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Single-pass argmax kernel (called from generated code). Degenerate
    * inputs (null element / length mismatch) make every cosine null in the
    * legacy formulation, whose `array_max` then returns the last struct —
    * so they answer `k - 1` here.
    */
  def compute(
      arr: ArrayData,
      centroids: Array[Array[Double]],
      norms: Array[Double],
      isFloat: Boolean): Int = {
    val dim = centroids(0).length
    val k = centroids.length
    if (arr.numElements() != dim) return k - 1
    val v = new Array[Double](dim)
    var d = 0
    var sumSq = 0.0
    while (d < dim) {
      if (arr.isNullAt(d)) return k - 1
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      v(d) = x
      sumSq += x * x
      d += 1
    }
    val na = math.sqrt(sumSq)
    var best = 0
    var bestSim = 0.0
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v(i) * cent(i); i += 1 }
      val sim = dot / (na * norms(c))
      // Spark struct-max semantics: NaN greatest, ties -> larger cid
      if (c == 0 || java.lang.Double.compare(sim, bestSim) >= 0) {
        best = c
        bestSim = sim
      }
      c += 1
    }
    best
  }
}
