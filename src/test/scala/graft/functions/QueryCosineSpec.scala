package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Exprs

import graft.SparkSpec
import graft.ops.Similarity

/** The one-pass native query cosine must be bit-identical to the composed
  * `Column` formulations it replaced (`Similarity.cosine` /
  * `quantizedCosine` pre-round-8), including null/length-mismatch
  * collapse to null — the q35 oracle hash-compare and the q36/q43/q45
  * recall gates ride on it.
  */
class QueryCosineSpec extends SparkSpec {

  private def native(emb: Column, q: Seq[Double], quantized: Boolean): Column =
    Exprs.column(QueryCosine(
      Exprs.expression(emb), q.toArray, quantized, Similarity.Scale))

  /** The pre-round-8 formulations, kept here as the executable spec. */
  private def legacy(emb: Column, query: Seq[Double], quantized: Boolean): Column = {
    def qz(x: Column): Column = floor(x.cast("double") * Similarity.Scale).cast("long")
    val q = array(query.map(lit): _*)
    if (quantized) {
      val dot = aggregate(zip_with(emb, q, (a, b) => qz(a) * qz(b)), lit(0L), (acc, x) => acc + x)
      val na = aggregate(emb, lit(0L), (acc, x) => acc + qz(x) * qz(x))
      val nb = aggregate(q, lit(0L), (acc, x) => acc + qz(x) * qz(x))
      dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
    } else {
      val dot = aggregate(
        zip_with(emb, q, (a, b) => a.cast("double") * b), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
      val nb = math.sqrt(query.map(x => x * x).sum)
      dot / (na * lit(nb))
    }
  }

  test("bit-identical to the legacy formulations on random float vectors, both modes") {
    import spark.implicits._
    for (seed <- 1L to 8L; quantized <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed * 131 + (if (quantized) 17 else 0))
      val dim = 1 + rnd.nextInt(16)
      val query = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
      val rows = Seq.fill(25)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
      val df = rows.toDF("emb")
      val got = df.select(
        native(col("emb"), query, quantized).as("n"),
        legacy(col("emb"), query, quantized).as("l")).collect()
      got.foreach { r =>
        assert(
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"seed=$seed quantized=$quantized: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("null array, null element, length mismatch -> null (both modes)") {
    import spark.implicits._
    val query = Seq(1.0, 0.5)
    val df = Seq(
      (1, Some(Seq(Option(1.0f), Option(2.0f)))),
      (2, None), // null array
      (3, Some(Seq(Option(1.0f), None))), // null element
      (4, Some(Seq(Option(1.0f)))) // mismatch
    ).toDF("id", "emb")
    for (quantized <- Seq(true, false)) {
      val rows = df.select(col("id"),
        native(col("emb"), query, quantized).as("n"),
        legacy(col("emb"), query, quantized).as("l")).orderBy("id").collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2),
          s"id=${r.getInt(0)} q=$quantized: native null=${r.isNullAt(1)} legacy null=${r.isNullAt(2)}")
        if (!r.isNullAt(1)) assert(
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
      }
      assert(rows(1).isNullAt(1) && rows(2).isNullAt(1) && rows(3).isNullAt(1))
    }
  }
}
