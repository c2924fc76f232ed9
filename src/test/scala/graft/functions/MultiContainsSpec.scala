package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-pass Aho-Corasick count must agree with the `contains`-chain
  * formulation it replaced for EVERY input: overlapping phrases, phrases
  * nested inside each other, repeats (count once), matches at either text
  * boundary, unicode, and null text (chain callers coalesced to "" — the
  * expression folds the collapse in).
  */
class MultiContainsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-9 formulation, kept here as the executable spec. */
  private def chain(t: Column, phrases: Seq[String]): Column =
    phrases
      .map(p => when(coalesce(t, lit("")).contains(p), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)

  private def native(t: Column, phrases: Seq[String]): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(MultiContainsCount(Exprs.expression(t), phrases))
  }

  test("fixture cases: overlap, nesting, repeats, boundaries, unicode, null") {
    val phrases = Seq("ab", "b", "abc", "cab", "日本")
    val texts = Seq(
      "abc",            // "ab", "b", "abc" — overlapping + nested
      "cabcab",         // repeats count once; "cab" overlaps "abc"
      "b",              // single char phrase = whole text
      "xyz",            // nothing
      "日本語テキスト",   // unicode match
      "",               // empty text
      null.asInstanceOf[String] // null text -> 0
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val got = df.select(
      native(col("t"), phrases).as("a"),
      chain(col("t"), phrases).as("b"),
      col("t")).collect()
    got.foreach(r =>
      assert(r.getLong(0) == r.getLong(1), s"text=${r.get(2)}"))
    // Spot-check absolute values too, not just agreement.
    val byText = df.select(col("i"), native(col("t"), phrases))
      .as[(Int, Long)].collect().toMap
    assert(byText(0) == 3L && byText(1) == 4L && byText(2) == 1L &&
      byText(3) == 0L && byText(4) == 1L && byText(5) == 0L && byText(6) == 0L)
  }

  test("property: random texts and phrase sets agree with the chain") {
    val alphabet = "aab bc"
    for (seed <- 1L to 6L) {
      val rnd = new scala.util.Random(seed * 0x9e3779b97f4a7c15L)
      def randStr(maxLen: Int): String =
        Seq.fill(1 + rnd.nextInt(maxLen))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val phrases = Seq.fill(1 + rnd.nextInt(6))(randStr(4)).distinct
      val texts = Seq.fill(60)(randStr(24))
      val df = texts.toDF("t")
      val got = df.select(
        native(col("t"), phrases).as("a"),
        chain(col("t"), phrases).as("b"),
        col("t")).collect()
      got.foreach(r =>
        assert(r.getLong(0) == r.getLong(1), s"seed=$seed phrases=$phrases text=${r.getString(2)}"))
    }
  }

  test("matches variant returns exactly the phrases contains() admits, in list order") {
    import org.apache.spark.sql.graft.Exprs
    def matchesCol(t: Column, phrases: Seq[String]): Column =
      Exprs.column(MultiContainsMatches(Exprs.expression(t), phrases))
    val phrases = Seq("ab", "b", "abc", "cab")
    val texts = Seq("abc", "cabcab", "xyz", "", null.asInstanceOf[String])
    val got = texts.toDF("t")
      .select(col("t"), matchesCol(col("t"), phrases).as("m"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (t, m) =>
      val expect = phrases.filter(p => t != null && t.contains(p))
      assert(m == expect, s"text=$t")
    }
    // Property: agreement with plain String.contains on random inputs.
    val alphabet = "aab bc"
    val rnd = new scala.util.Random(0x5eedL)
    def randStr(maxLen: Int): String =
      Seq.fill(1 + rnd.nextInt(maxLen))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val ps = Seq.fill(5)(randStr(3)).distinct
    val g2 = Seq.fill(50)(randStr(20)).toDF("t")
      .select(col("t"), matchesCol(col("t"), ps).as("m"))
      .as[(String, Seq[String])].collect()
    g2.foreach { case (t, m) => assert(m == ps.filter(t.contains), s"text=$t ps=$ps") }
  }

  test("validates phrases and stays off the interpreted path") {
    intercept[IllegalArgumentException](AhoCorasick.build(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("ok", "")))
    // The expression participates in whole-stage codegen: no interpreted
    // eval dispatch per row. A non-foldable child keeps the optimizer
    // from constant-folding the whole projection away (a literal input
    // collapses to a LocalTableScan before any codegen runs).
    val df = spark.range(3)
      .select(concat(lit("ab"), col("id").cast("string")).as("t"))
      .select(native(col("t"), Seq("ab", "b0")).as("n"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.nonEmpty,
      s"multi_contains_count must stay inside codegen:\n$plan")
    assert(df.as[Long].collect().toSeq == Seq(2L, 1L, 1L)) // ab0, ab1, ab2
  }
}
