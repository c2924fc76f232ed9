package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{LakeTable, PartitionedLakeTable}

/** SQL `DELETE FROM` / `UPDATE` over catalog-registered cdc-lake tables
  * (r17): the LakeDmlRule routes both through the native delete/upsert,
  * so the SQL statements equal the DataFrame path. The shared test
  * session carries the extensions (SparkSpec).
  */
class LakeDmlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(rows: Seq[(String, Long, Long, String)]): String = {
    n += 1
    val name = s"dml_t$n"
    val dir = tempDir("dml-").resolve("t").toString
    new LakeTable(spark, dir, numBuckets = 2)
      .upsert(rows.toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "cat"))
    spark.sql(s"CREATE TABLE $name USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    name
  }
  private def state(t: String): Map[String, (Long, Long, String)] = {
    spark.catalog.refreshTable(t)
    spark.sql(s"SELECT _key, _ts, amount, cat FROM $t")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
  private def msgs(x: Throwable): String =
    Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
      .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")

  private val seed = Seq(
    ("a", 1L, 10L, "x"), ("b", 1L, 20L, "y"), ("c", 1L, 30L, "x"), ("d", 1L, 40L, "z"))

  test("DELETE FROM with literal key predicates never scans; IN works; replay is a no-op") {
    val t = freshTable(seed)
    spark.sql(s"DELETE FROM $t WHERE _key = 'a'")
    assert(state(t).keySet === Set("b", "c", "d"))
    spark.sql(s"DELETE FROM $t WHERE _key IN ('b', 'nope')")
    assert(state(t).keySet === Set("c", "d"))
    // absent keys: bloom-pruned no-op, still green
    spark.sql(s"DELETE FROM $t WHERE _key = 'ghost'")
    assert(state(t).keySet === Set("c", "d"))
  }

  test("DELETE FROM with a payload predicate scan-filters to keys (and WHERE-less empties)") {
    val t = freshTable(seed)
    spark.sql(s"DELETE FROM $t WHERE cat = 'x' AND amount > 15")
    assert(state(t).keySet === Set("a", "b", "d"))
    spark.sql(s"DELETE FROM $t")
    assert(state(t) === Map.empty)
  }

  test("UPDATE projects assignments over the filtered snapshot; unassigned columns carry (RMW)") {
    val t = freshTable(seed)
    spark.sql(s"UPDATE $t SET amount = amount + 100, _ts = 5 WHERE cat = 'x'")
    assert(state(t) === Map(
      "a" -> ((5L, 110L, "x")), "b" -> ((1L, 20L, "y")),
      "c" -> ((5L, 130L, "x")), "d" -> ((1L, 40L, "z"))))
    // _ts unassigned: stored _ts carries, the update still wins (incoming
    // beats stored on equal _ts)
    spark.sql(s"UPDATE $t SET cat = 'w' WHERE _key = 'b'")
    assert(state(t)("b") === ((1L, 20L, "w")))
    // matches-nothing UPDATE is a no-op
    spark.sql(s"UPDATE $t SET amount = 0 WHERE _key = 'ghost'")
    assert(state(t)("a") === ((5L, 110L, "x")))
  }

  test("the statement AFTER a SQL write sees it — INSERT INTO included (relation-cache refresh)") {
    val t = freshTable(seed)
    // pin the cached relation with a read FIRST
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 4L)
    spark.sql(s"INSERT INTO $t VALUES ('e', 1, 50, 'x')")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 5L,
      "SELECT after INSERT INTO must see the inserted row without a manual REFRESH")
    spark.sql(s"DELETE FROM $t WHERE _key = 'e'")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 4L,
      "SELECT after DELETE must see the deletion")
    spark.sql(s"UPDATE $t SET amount = 99, _ts = 7 WHERE _key = 'a'")
    assert(spark.sql(s"SELECT amount FROM $t WHERE _key = 'a'").head().getLong(0) === 99L)
  }

  test("UPDATE equals the DataFrame-path state and widens int->long (r17)") {
    n += 1
    val name = s"dml_t$n"
    val dir = tempDir("dml-widen-").resolve("t").toString
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(Seq(("a", 1L, 10), ("b", 1L, 20))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "qty")) // qty: int
    spark.sql(s"CREATE TABLE $name USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    spark.sql(s"UPDATE $name SET qty = CAST(qty AS BIGINT) + 9000000000, _ts = 5 WHERE _key = 'a'")
    spark.catalog.refreshTable(name)
    val got = spark.sql(s"SELECT _key, _ts, qty FROM $name")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got === Seq(("a", 5L, 9000000010L), ("b", 1L, 20L)))
  }

  test("rekeying and partition reassignment fail loudly; partitioned DML routes by partition") {
    val t = freshTable(seed)
    val e1 = intercept[Exception](spark.sql(s"UPDATE $t SET _key = 'zz' WHERE _key = 'a'"))
    assert(msgs(e1).contains("rekeying"), msgs(e1))

    n += 1
    val name = s"dml_t$n"
    val dir = tempDir("dml-part-").resolve("t").toString
    val pt = new PartitionedLakeTable(spark, dir, "region", numBuckets = 2)
    pt.upsert(Seq(("a", 1L, 10L, "eu"), ("b", 1L, 20L, "us"), ("c", 1L, 30L, "eu"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region"))
    spark.sql(s"CREATE TABLE $name USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    val e2 = intercept[Exception](
      spark.sql(s"UPDATE $name SET region = 'ap' WHERE _key = 'a'"))
    assert(msgs(e2).contains("partition"), msgs(e2))
    // partition-predicate DELETE prunes to the named partition dirs (v1
    // pushdown) and routes the delete by the scanned partition value
    spark.sql(s"DELETE FROM $name WHERE region = 'eu' AND amount > 15")
    spark.catalog.refreshTable(name)
    val got = spark.sql(s"SELECT _key, region FROM $name")
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "eu", "b" -> "us"))
    // UPDATE on the partitioned table (region unassigned -> carries)
    spark.sql(s"UPDATE $name SET amount = 11, _ts = 9 WHERE _key = 'a'")
    spark.catalog.refreshTable(name)
    val got2 = spark.sql(s"SELECT _key, _ts, amount, region FROM $name")
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got2 === Map("a" -> ((9L, 11L, "eu")), "b" -> ((1L, 20L, "us"))))
  }
}
