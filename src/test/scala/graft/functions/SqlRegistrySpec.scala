package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Exprs

import graft.SparkSpec

/** SQL surface == Column surface for the native expression family
  * (VERDICT r13 #4): each registered SQL function must build the SAME
  * expression the Scala Column API builds, so the bit-compatibility
  * specs for the expressions cover both. Also pins the literal-argument
  * contract (non-foldable config arguments fail loudly, not silently).
  */
class SqlRegistrySpec extends SparkSpec {
  import spark.implicits._

  GraftSqlFunctions.registerAll(spark)

  test("multi_contains_count/matches: SQL equals Column expression") {
    val texts = Seq("the cat sat", "dogs and cats", "nothing here", null)
      .toDF("t").withColumn("t", coalesce($"t", lit("")))
    val phrases = Seq("cat", "dog", "sat")
    val sqlRes = texts.selectExpr(
      "multi_contains_count(t, array('cat','dog','sat')) AS n",
      "multi_contains_matches(t, array('cat','dog','sat')) AS m")
      .as[(Long, Seq[String])].collect().toSeq
    val colRes = texts.select(
      Exprs.column(MultiContainsCount(Exprs.expression($"t"), phrases)).as("n"),
      Exprs.column(MultiContainsMatches(Exprs.expression($"t"), phrases)).as("m"))
      .as[(Long, Seq[String])].collect().toSeq
    assert(sqlRes == colRes)
    assert(sqlRes.map(_._1) == Seq(2L, 2L, 0L, 0L))
  }

  test("plane_signature and nearest_centroid: SQL equals Column expression") {
    val vecs = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, -1.0))
      .toDF("v")
    val planes = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val sqlRes = vecs.selectExpr(
      "plane_signature(v, array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS s",
      "nearest_centroid(v, array(array(1.0D, 0.0D), array(-1.0D, 0.0D))) AS c")
      .as[(Long, Int)].collect().toSeq
    val colRes = vecs.select(
      Exprs.column(PlaneSignature(Exprs.expression($"v"), planes)).as("s"),
      Exprs.column(NearestCentroid(Exprs.expression($"v"), cents)).as("c"))
      .as[(Long, Int)].collect().toSeq
    assert(sqlRes == colRes)
  }

  test("pair_cosine and query_cosine: SQL equals Column, 2- and 3-arg forms") {
    val pairs = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
      (Array(0.5, -0.25, 0.125), Array(1.0, 1.0, 1.0))).toDF("a", "b")
    val sqlRes = pairs.selectExpr(
      "pair_cosine(a, b) AS e",
      "pair_cosine(a, b, 1e7D) AS q",
      "query_cosine(a, array(1.0D, 1.0D, 1.0D)) AS qe",
      "query_cosine(a, array(1.0D, 1.0D, 1.0D), 1e7D) AS qq")
      .as[(Double, Double, Double, Double)].collect().toSeq
    val colRes = pairs.select(
      Exprs.column(PairCosine(
        Exprs.expression($"a"), Exprs.expression($"b"), quantized = false, 0.0)).as("e"),
      Exprs.column(PairCosine(
        Exprs.expression($"a"), Exprs.expression($"b"), quantized = true, 1e7)).as("q"),
      Exprs.column(QueryCosine(
        Exprs.expression($"a"), Array(1.0, 1.0, 1.0), quantized = false, 0.0)).as("qe"),
      Exprs.column(QueryCosine(
        Exprs.expression($"a"), Array(1.0, 1.0, 1.0), quantized = true, 1e7)).as("qq"))
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(sqlRes == colRes)
  }

  test("non-literal config arguments fail loudly at analysis") {
    val df = Seq(("abc", Seq("a"))).toDF("t", "ps")
    val e = intercept[Exception] {
      df.selectExpr("multi_contains_count(t, ps)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    val e2 = intercept[Exception] {
      Seq(Array(1.0)).toDF("v")
        .selectExpr("query_cosine(v, array(v[0]))").collect()
    }
    assert(e2.getMessage.contains("literal"), e2.getMessage)
  }

  test("wrong arity is rejected with a clear message") {
    val e = intercept[Exception] {
      Seq("x").toDF("t").selectExpr("multi_contains_count(t)").collect()
    }
    assert(e.getMessage.contains("2"), e.getMessage)
  }
}
