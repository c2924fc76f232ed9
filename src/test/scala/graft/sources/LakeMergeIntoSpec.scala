package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** SQL MERGE INTO over catalog-registered cdc-lake tables (r16): the
  * GraftExtensions post-hoc rule routes a v1 lake target through the
  * native merge/upsert/delete, so SQL merges equal the DataFrame path.
  * The shared test session carries the extensions (SparkSpec).
  */
class LakeMergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(rows: Seq[(String, Long, Long)]): String = {
    n += 1
    val name = s"mrg_t$n"
    val dir = tempDir("merge-").resolve("t").toString
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(rows.toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount"))
    spark.sql(
      s"""CREATE TABLE $name USING `cdc-lake`
         |OPTIONS (path '$dir', buckets '2')""".stripMargin)
    name
  }
  private def state(t: String): Map[String, (Long, Long)] = {
    spark.catalog.refreshTable(t)
    spark.sql(s"SELECT _key, _ts, amount FROM $t")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("MERGE with UPDATE SET * + INSERT * runs the native LWW upsert (+ DELETE split)") {
    val t = freshTable(Seq(("a", 1L, 10L), ("b", 1L, 20L), ("c", 1L, 30L)))
    Seq(
      ("a", 5L, 11L, "u"), // newer ts: wins
      ("b", 0L, 99L, "u"), // stale ts: loses (the lake's LWW contract)
      ("c", 5L, 0L, "d"),  // delete branch
      ("d", 5L, 40L, "u")  // new key: inserts
    ).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "op")
      .createOrReplaceTempView("src1")
    spark.sql(
      s"""MERGE INTO $t t USING src1 s ON t._key = s._key
         |WHEN MATCHED AND s.op = 'd' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state(t) === Map(
      "a" -> (5L, 11L), "b" -> (1L, 20L), "d" -> (5L, 40L)))
    // SQL-faithful replay: 'c' is now UNMATCHED, so its op='d' source row
    // takes the NOT MATCHED branch and is INSERTED (the delete condition
    // guards only the MATCHED branch — code-review r16 #3)
    spark.sql(
      s"""MERGE INTO $t t USING src1 s ON t._key = s._key
         |WHEN MATCHED AND s.op = 'd' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state(t) === Map(
      "a" -> (5L, 11L), "b" -> (1L, 20L), "c" -> (5L, 0L), "d" -> (5L, 40L)))
  }

  test("unconditional MATCHED DELETE + INSERT: matched delete, unmatched insert (r16 review #1)") {
    val t = freshTable(Seq(("a", 1L, 10L), ("b", 1L, 20L)))
    Seq(("a", 5L, 0L), ("n", 5L, 70L))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .createOrReplaceTempView("srcud")
    spark.sql(
      s"""MERGE INTO $t t USING srcud s ON t._key = s._key
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // 'a' matched -> deleted; 'n' unmatched -> inserted (the same-commit
    // delete set must NOT swallow it); 'b' untouched
    assert(state(t) === Map("b" -> (1L, 20L), "n" -> (5L, 70L)))
  }

  test("a null ON-expression value fails loudly instead of merging a null-key group") {
    val t = freshTable(Seq(("a", 1L, 10L)))
    Seq((Option("a"), 5L, 11L), (Option.empty[String], 5L, 99L))
      .toDF("id", "ts", "amt").createOrReplaceTempView("srcnull")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $t t USING srcnull s ON t._key = s.id
         |WHEN MATCHED THEN UPDATE SET _key = s.id, _ts = s.ts, amount = s.amt
         |WHEN NOT MATCHED THEN INSERT (_key, _ts, amount) VALUES (s.id, s.ts, s.amt)"""
        .stripMargin))
    def msgs(x: Throwable): String =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("non-null"), msgs(e))
    assert(state(t) === Map("a" -> (1L, 10L)))
  }


  test("explicit equivalent assignments work; ON may equate a source expression") {
    val t = freshTable(Seq(("k1", 1L, 10L)))
    Seq(("k1", 5L, 77L), ("k9", 5L, 88L)).toDF("id", "ts", "amt")
      .createOrReplaceTempView("src2")
    // _key derives from the ON expression (no _key column in the source)
    spark.sql(
      s"""MERGE INTO $t t USING src2 s ON t._key = s.id
         |WHEN MATCHED THEN UPDATE SET _key = s.id, _ts = s.ts, amount = s.amt
         |WHEN NOT MATCHED THEN INSERT (_key, _ts, amount) VALUES (s.id, s.ts, s.amt)""".stripMargin)
    assert(state(t) === Map("k1" -> (5L, 77L), "k9" -> (5L, 88L)))
  }

  test("UPDATE-only touches matched keys; INSERT-only touches unmatched; DELETE-only deletes") {
    val t = freshTable(Seq(("a", 1L, 10L), ("b", 1L, 20L)))
    Seq(("a", 5L, 11L), ("x", 5L, 99L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .createOrReplaceTempView("src3")
    spark.sql(
      s"""MERGE INTO $t t USING src3 s ON t._key = s._key
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(state(t) === Map("a" -> (5L, 11L), "b" -> (1L, 20L)),
      "update-only must not insert unmatched keys")
    spark.sql(
      s"""MERGE INTO $t t USING src3 s ON t._key = s._key
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state(t) === Map("a" -> (5L, 11L), "b" -> (1L, 20L), "x" -> (5L, 99L)),
      "insert-only must not touch matched keys")
    Seq(("b", 9L, 0L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .createOrReplaceTempView("src4")
    spark.sql(
      s"""MERGE INTO $t t USING src4 s ON t._key = s._key
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(state(t).keySet === Set("a", "x"))
  }

  test("unsupported shapes fail loudly, never silently reinterpret") {
    val t = freshTable(Seq(("a", 1L, 10L)))
    Seq(("a", 5L, 11L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .createOrReplaceTempView("src5")
    def mustFail(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def msgs(x: Throwable): String =
        Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
          .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs(e).contains(needle), s"expected '$needle' in: ${msgs(e)}")
    }
    mustFail(
      s"""MERGE INTO $t t USING src5 s ON t.amount = s.amount
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
      "_key")
    mustFail(
      s"""MERGE INTO $t t USING src5 s ON t._key = s._key
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
      "NOT MATCHED BY SOURCE")
    mustFail(
      s"""MERGE INTO $t t USING src5 s ON t._key = s._key
         |WHEN MATCHED THEN UPDATE SET amount = s.amount + 1, _ts = s._ts, _key = s._key
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "equivalent")
    // (an unconditional DELETE before an UPDATE is already a parse error —
    // non-last MATCHED clauses must carry a condition — so the command's
    // ambiguity guard is defense-in-depth; the reachable rejection is the
    // conditional UPDATE:)
    mustFail(
      s"""MERGE INTO $t t USING src5 s ON t._key = s._key
         |WHEN MATCHED AND s.amount > 0 THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE""".stripMargin,
      "conditional WHEN MATCHED")
    // untouched by all the failures
    assert(state(t) === Map("a" -> (1L, 10L)))
  }
}
