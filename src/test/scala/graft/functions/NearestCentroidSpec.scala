package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

/** The one-pass native IVF assignment must match the composed
  * `array_max(struct(cosine, cid))` formulation it replaced, including its
  * tie and degenerate-input behavior.
  */
class NearestCentroidSpec extends SparkSpec {

  /** The pre-round-5 formulation, kept here as the executable spec. */
  private def legacyAssign(emb: Column, centroids: Array[Array[Double]]): Column = {
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      struct(Similarity.cosine(emb, c.toIndexedSeq).as("sim"), lit(i).as("cid"))
    }
    array_max(array(sims.toIndexedSeq: _*)).getField("cid")
  }

  test("matches the legacy array_max formulation on random vectors") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val rnd = new scala.util.Random(seed * 7919L)
      val dim = 2 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(9)
      val cents = Array.fill(k, dim)(rnd.nextDouble() * 2 - 1)
      val rows = Seq.fill(30)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)).map(_.toSeq)
      val got = rows.toDF("emb").select(
        org.apache.spark.sql.graft.Exprs.column(
          NearestCentroid(
            org.apache.spark.sql.graft.Exprs.expression(col("emb")), cents)).as("a"),
        legacyAssign(col("emb"), cents).as("b")).collect()
      got.foreach(r => assert(r.getInt(0) == r.getInt(1), s"seed=$seed"))
    }
  }

  test("duplicate centroids tie-break to the largest id, like struct max") {
    import spark.implicits._
    val c = Array(0.5, 0.5, 0.1)
    val cents = Array(c, Array(-1.0, 0.0, 0.0), c) // 0 and 2 identical
    val df = Seq(Seq(0.5f, 0.5f, 0.1f)).toDF("emb")
    val got = df.select(
      org.apache.spark.sql.graft.Exprs.column(
        NearestCentroid(
          org.apache.spark.sql.graft.Exprs.expression(col("emb")), cents)).as("a"),
      legacyAssign(col("emb"), cents).as("b")).head()
    assert(got.getInt(0) == 2 && got.getInt(1) == 2)
  }

  test("degenerate inputs (null element, wrong length) answer k-1 like null-struct max") {
    import spark.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    val df = Seq(
      (1, Some(Seq(Some(1.0f), None))), // null element
      (2, Some(Seq(Some(1.0f)))) // too short
    ).toDF("id", "emb")
    val got = df.orderBy("id").select(
      org.apache.spark.sql.graft.Exprs.column(
        NearestCentroid(
          org.apache.spark.sql.graft.Exprs.expression(col("emb")), cents)).as("a"),
      legacyAssign(col("emb"), cents).as("b")).collect()
    got.foreach(r => assert(r.getInt(0) == 2 && r.getInt(1) == 2, r.toString))
  }
}
