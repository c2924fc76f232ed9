package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Exprs

import graft.SparkSpec
import graft.ops.Similarity

/** The one-pass native pair cosine must be bit-identical to the composed
  * `Column` formulation it replaced (zip_with + three aggregate folds),
  * in BOTH arithmetic modes, including null/length-mismatch collapse to
  * null — the q37/q50 oracle hash-compares depend on it.
  */
class PairCosineSpec extends SparkSpec {

  private def native(e1: Column, e2: Column, quantized: Boolean): Column =
    Exprs.column(PairCosine(
      Exprs.expression(e1), Exprs.expression(e2), quantized, Similarity.Scale))

  /** The pre-round-8 formulation, kept here as the executable spec. */
  private def legacy(e1: Column, e2: Column, quantized: Boolean): Column = {
    def qz(x: Column): Column = floor(x.cast("double") * Similarity.Scale).cast("long")
    if (quantized) {
      val dot = aggregate(
        zip_with(e1, e2, (a, b) => qz(a) * qz(b)), lit(0L), (acc, x) => acc + x)
      def nrm(c: Column) =
        sqrt(aggregate(c, lit(0L), (acc, x) => acc + qz(x) * qz(x)).cast("double"))
      dot.cast("double") / (nrm(e1) * nrm(e2))
    } else {
      val dot = aggregate(
        zip_with(e1, e2, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      def nrm(c: Column) =
        sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
      dot / (nrm(e1) * nrm(e2))
    }
  }

  test("bit-identical to the legacy formulation on random float pairs, both modes") {
    import spark.implicits._
    for (seed <- 1L to 8L; quantized <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed * 31 + (if (quantized) 7 else 0))
      val dim = 1 + rnd.nextInt(16)
      val rows = Seq.fill(25)((
        Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat).toSeq,
        Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat).toSeq))
      val df = rows.toDF("a", "b")
      val got = df.select(
        native(col("a"), col("b"), quantized).as("n"),
        legacy(col("a"), col("b"), quantized).as("l")).collect()
      got.foreach { r =>
        assert(
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"seed=$seed quantized=$quantized: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("null array, null element, length mismatch -> null; zero vector -> NaN (hardened)") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(Option(1.0f), Option(2.0f))), Some(Seq(Option(3.0f), Option(4.0f)))),
      (2, None, Some(Seq(Option(1.0f), Option(1.0f)))), // null array
      (3, Some(Seq(Option(1.0f), None)), Some(Seq(Option(1.0f), Option(1.0f)))), // null element
      (4, Some(Seq(Option(1.0f))), Some(Seq(Option(1.0f), Option(1.0f)))) // mismatch
    ).toDF("id", "a", "b")
    for (quantized <- Seq(true, false)) {
      val rows = df.select(col("id"),
        native(col("a"), col("b"), quantized).as("n"),
        legacy(col("a"), col("b"), quantized).as("l"))
        .orderBy("id").collect()
      rows.foreach { r =>
        val (n, l) = (r.isNullAt(1), r.isNullAt(2))
        assert(n == l, s"id=${r.getInt(0)} q=$quantized null mismatch: native=$n legacy=$l")
        if (!n) assert(
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
          s"id=${r.getInt(0)} q=$quantized")
      }
      assert(rows(1).isNullAt(1) && rows(2).isNullAt(1) && rows(3).isNullAt(1))

      // INTENTIONAL divergence: under ANSI mode the legacy Column division
      // THROWS on a zero-norm vector (DIVIDE_BY_ZERO — a latent crash in
      // the old verify path); the native kernel divides in plain Java and
      // yields NaN, which the candidate threshold filter then drops.
      val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      assert(zero.select(native(col("a"), col("b"), quantized)).head().getDouble(0).isNaN)
      intercept[Exception] {
        zero.select(legacy(col("a"), col("b"), quantized)).head()
      }
    }
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = Seq((Seq(0.5f, -0.25f, 0.125f), Seq(0.25f, 0.5f, -0.75f))).toDF("a", "b")
    for (quantized <- Seq(true, false)) {
      val viaCodegen = df.select(native(col("a"), col("b"), quantized)).head().getDouble(0)
      val bound = PairCosine(
        BoundReference(0, ArrayType(FloatType), nullable = true),
        BoundReference(1, ArrayType(FloatType), nullable = true),
        quantized, Similarity.Scale)
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.5f, -0.25f, 0.125f)),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.25f, 0.5f, -0.75f)))
      val interpreted = bound.eval(row).asInstanceOf[Double]
      assert(
        java.lang.Double.doubleToRawLongBits(viaCodegen) ==
          java.lang.Double.doubleToRawLongBits(interpreted),
        s"quantized=$quantized")
    }
  }
}
