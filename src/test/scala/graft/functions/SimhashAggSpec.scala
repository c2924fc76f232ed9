package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Exprs

import graft.SparkSpec
import graft.ops.TextStats

/** The one-pass simhash vote aggregate must be bit-identical to the
  * 32-column `sum(when(...))` formulation it replaced (which is also the
  * shape of the DuckDB oracle's 32 `sum(CASE ...)` terms).
  */
class SimhashAggSpec extends SparkSpec {

  /** The pre-round-6 formulation, kept here as the executable spec. */
  private def legacySimhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = explode(split(col(textCol), " ")).as("tok")
    val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val votes = (0 until 32).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$i")
    }
    docs.select(col(idCol), tok)
      .withColumn("h", h)
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(
        col(idCol),
        (0 until 32)
          .map(i => when(col(s"s_$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  test("matches the legacy 32-column formulation on random token streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
      "alpha", "beta", "gamma", "delta", "x1", "y2", "z3")
    val docs = Seq.tabulate(200) { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextStats.simhash32(docs).withColumnRenamed("simhash", "a")
      .join(legacySimhash32(docs, "doc_id", "text").withColumnRenamed("simhash", "b"), "doc_id")
      .collect()
    assert(got.length == 200)
    got.foreach(r => assert(r.getAs[Long]("a") == r.getAs[Long]("b"), s"doc ${r.get(0)}"))
  }

  test("null hashes vote -1 on every bit, like the legacy when/otherwise columns") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(0xFFFFFFFFL)), (1L, None), (1L, Some(0xFFFFFFFFL)),
      (2L, None)).toDF("id", "h")
    val agg = Exprs.column(SimhashAgg(Exprs.expression(col("h"))).toAggregateExpression())
    val got = df.groupBy("id").agg(agg.as("sig"))
    // the legacy shape over the same nullable column must agree exactly
    val votes = (0 until 32).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$i")
    }
    val legacy = df.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(
        col("id"),
        (0 until 32)
          .map(i => when(col(s"s_$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("legacy_sig"))
    val joined = got.join(legacy, "id").orderBy("id").collect()
    joined.foreach(r => assert(r.getAs[Long]("sig") == r.getAs[Long]("legacy_sig"), s"id ${r.get(0)}"))
    // group 1: +2 -1 = +1 per bit -> all 32 bits set; group 2: -1 -> 0.
    assert(joined(0).getAs[Long]("sig") == 0xFFFFFFFFL)
    assert(joined(1).getAs[Long]("sig") == 0L)
  }

  test("serialize/deserialize round-trips the vote buffer") {
    val a = SimhashAgg(Exprs.expression(lit(1L)))
    val buf = Array.tabulate(32)(i => i - 16)
    assert(a.deserialize(a.serialize(buf)).toSeq == buf.toSeq)
  }
}
