package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.BitUtil

class InterleaveBitsSpec extends SparkSpec {
  import spark.implicits._

  test("interleave_bits matches BitUtil in codegen'd SQL and handles nulls") {
    InterleaveBits.register(spark)
    val df = Seq((3L, 5L), (0L, 0L), (0xFFFFFFFFL, 1L)).toDF("a", "b")
    val got = df.selectExpr("interleave_bits(a, b)").as[Long].collect()
    val want = Seq((3L, 5L), (0L, 0L), (0xFFFFFFFFL, 1L))
      .map { case (a, b) => BitUtil.interleave(a, b) }
    assert(got.toSeq == want)
    // nulls propagate
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .selectExpr("interleave_bits(a, b)").collect()
    assert(withNull(0).isNullAt(0))
    // type error surfaces at analysis
    val e = intercept[Exception](
      Seq(("x", 1L)).toDF("a", "b").selectExpr("interleave_bits(a, b)").collect())
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("z-order clustering: range filter on either dimension prunes z-ranges") {
    InterleaveBits.register(spark)
    // 16x16 grid; z-codes of a 4x4 corner block must be a contiguous-ish
    // prefix (the whole point of Morton order for file clustering)
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)).toDF("x", "y")
    val z = grid.selectExpr("x", "y", "interleave_bits(x, y) AS z")
    val corner = z.filter($"x" < 4 && $"y" < 4).agg(max($"z")).as[Long].head()
    val outside = z.filter($"x" >= 4 || $"y" >= 4).agg(min($"z")).as[Long].head()
    assert(corner < outside, "corner block z-codes must precede the rest")
  }
}
