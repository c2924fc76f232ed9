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

  test("interleave_bits3/4 match BitUtil, stay bit-exact vs a loop oracle, propagate nulls") {
    import org.apache.spark.sql.graft.Exprs
    // loop-reference oracle: bit i of dim d lands at position n*i + d
    def ref(vs: Seq[Long], bits: Int): Long = {
      val n = vs.size
      var z = 0L
      for (i <- 0 until bits; d <- 0 until n)
        z |= ((vs(d) >>> i) & 1L) << (n * i + d)
      z
    }
    val rnd = new scala.util.Random(7)
    val triples = (0 until 200).map(_ =>
      (rnd.nextLong() & 0x1FFFFFL, rnd.nextLong() & 0x1FFFFFL, rnd.nextLong() & 0x1FFFFFL))
    triples.foreach { case (a, b, c) =>
      assert(BitUtil.interleave3(a, b, c) === ref(Seq(a, b, c), 21))
    }
    val quads = (0 until 200).map(_ =>
      (rnd.nextLong() & 0xFFFFL, rnd.nextLong() & 0xFFFFL,
        rnd.nextLong() & 0xFFFFL, rnd.nextLong() & 0xFFFFL))
    quads.foreach { case (a, b, c, d) =>
      assert(BitUtil.interleave4(a, b, c, d) === ref(Seq(a, b, c, d), 16))
    }
    // out-of-lane bits are masked, not smeared
    assert(BitUtil.interleave3(1L << 21, 0L, 0L) === 0L)
    assert(BitUtil.interleave4(1L << 16, 0L, 0L, 0L) === 0L)
    // the codegen'd expression path agrees with the JVM call + nulls propagate
    val df = triples.take(20).toSeq.toDF("a", "b", "c")
    val got3 = df.select(Exprs.column(InterleaveBits3(
      Exprs.expression(col("a")), Exprs.expression(col("b")), Exprs.expression(col("c")))))
      .as[Long].collect()
    assert(got3.toSeq === triples.take(20).map { case (a, b, c) => BitUtil.interleave3(a, b, c) })
    val nulled = Seq((Some(1L), None: Option[Long], Some(2L))).toDF("a", "b", "c")
      .select(Exprs.column(InterleaveBits3(
        Exprs.expression(col("a")), Exprs.expression(col("b")), Exprs.expression(col("c")))))
      .collect()
    assert(nulled(0).isNullAt(0))
    val got4 = quads.take(20).toSeq.toDF("a", "b", "c", "d")
      .select(Exprs.column(InterleaveBits4(
        Exprs.expression(col("a")), Exprs.expression(col("b")),
        Exprs.expression(col("c")), Exprs.expression(col("d")))))
      .as[Long].collect()
    assert(got4.toSeq === quads.take(20).map { case (a, b, c, d) => BitUtil.interleave4(a, b, c, d) })
  }

  test("interleave_bits3/4 register as SQL functions (GraftExtensions surface)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      InterleaveBits3.fnName, InterleaveBits3.descriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      InterleaveBits4.fnName, InterleaveBits4.descriptor._3, "built-in")
    val r3 = Seq((3L, 5L, 7L)).toDF("a", "b", "c")
      .selectExpr("interleave_bits3(a, b, c)").as[Long].head()
    assert(r3 === BitUtil.interleave3(3L, 5L, 7L))
    val r4 = Seq((3L, 5L, 7L, 9L)).toDF("a", "b", "c", "d")
      .selectExpr("interleave_bits4(a, b, c, d)").as[Long].head()
    assert(r4 === BitUtil.interleave4(3L, 5L, 7L, 9L))
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
