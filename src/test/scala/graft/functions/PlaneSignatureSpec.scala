package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

/** The one-pass native signature must be bit-identical to the composed
  * `Column` formulation it replaced (per-plane `aggregate(zip_with(...))` +
  * `when(dot > 0, 1L << p)`), including its null/length-mismatch collapse
  * to 0.
  */
class PlaneSignatureSpec extends SparkSpec {

  /** The pre-round-5 formulation, kept here as the executable spec. */
  private def legacySignature(emb: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(emb, array(p.map(lit).toIndexedSeq: _*), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  test("matches the legacy column formulation on random float vectors") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val rnd = new scala.util.Random(seed ^ 0x9e3779b97f4a7c15L)
      val dim = 1 + rnd.nextInt(8)
      val nPlanes = 1 + rnd.nextInt(12)
      val ps = Similarity.planes(nPlanes, dim, seed)
      val rows = Seq.fill(20)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)).map(_.toSeq)
      val df = rows.toDF("emb")
      val got = df.select(
        Similarity.signature(col("emb"), ps).as("a"),
        legacySignature(col("emb"), ps).as("b")).collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"seed=$seed"))
    }
  }

  test("null array, null element, and length mismatch all yield 0") {
    import spark.implicits._
    val ps = Similarity.planes(4, 3)
    val df = Seq(
      (1, Some(Seq(Some(1.0f), Some(2.0f), Some(3.0f)))),
      (2, None), // null array
      (3, Some(Seq(Some(1.0f), None, Some(3.0f)))), // null element
      (4, Some(Seq(Some(1.0f), Some(2.0f)))) // too short
    ).toDF("id", "emb")
    val out = df
      .select(col("id"), Similarity.signature(col("emb"), ps).as("sig"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == df.filter(col("id") === 1)
      .select(legacySignature(col("emb"), ps)).head().getLong(0))
    assert(out(1).getLong(1) == 0L)
    assert(out(2).getLong(1) == 0L)
    assert(out(3).getLong(1) == 0L)
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val ps = Similarity.planes(16, 4, seed = 7L)
    val rows = Seq.tabulate(50)(i => Seq(i * 0.1f - 2f, -i * 0.2f, 1f, i.toFloat))
    val df = rows.toDF("emb")
    val viaCodegen =
      df.select(Similarity.signature(col("emb"), ps).as("sig")).collect().map(_.getLong(0))
    val viaEval = rows.map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(r.toArray)
      PlaneSignature.compute(arr, ps, PlaneSignature.TFloat)
    }
    assert(viaCodegen.toSeq == viaEval)
  }
}
