package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** SQL DDL over lake tables (r18): `CREATE TABLE ... AS SELECT` /
  * direct `df.write.format("cdc-lake")` rows, and
  * `ALTER TABLE ADD COLUMNS` routing to the manifest-only evolution
  * commit. Pins the r18 bug fix: the batch-write path used to parse the
  * FIRST column of ANY batch as envelope JSON, so a CTAS of plain rows
  * silently committed NOTHING.
  */
class LakeDdlSpec extends SparkSpec {
  import spark.implicits._

  private def msgs(x: Throwable): String =
    Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
      .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")

  test("CTAS writes the selected rows through the native upsert (r18 bug fix)") {
    val dir = tempDir("ctas-").resolve("t").toString
    spark.sql(
      s"""CREATE TABLE ddl_ctas USING `cdc-lake` OPTIONS (path '$dir', buckets '2')
         |AS SELECT concat('k', id) AS _key, CAST(1 AS BIGINT) AS _ts,
         |          id * 10 AS amount
         |FROM range(5)""".stripMargin)
    try {
      val got = spark.sql("SELECT _key, amount FROM ddl_ctas")
        .as[(String, Long)].collect().toMap
      assert(got === Map("k0" -> 0L, "k1" -> 10L, "k2" -> 20L, "k3" -> 30L, "k4" -> 40L))
      // the path is a REAL lake table (manifest-committed, not bare files)
      assert(new LakeTable(spark, dir, numBuckets = 2).latestVersion === Some(1L))
    } finally spark.sql("DROP TABLE ddl_ctas")
  }

  test("direct df.write rows run the LWW upsert; overwrite and shapeless batches are loud") {
    val dir = tempDir("dfw-").resolve("t").toString
    Seq(("a", 1L, 10L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .write.format("cdc-lake").option("path", dir).option("buckets", "2").save()
    Seq(("a", 2L, 11L), ("b", 2L, 20L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .write.format("cdc-lake").option("path", dir).option("buckets", "2").save()
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    assert(lt.snapshot.select("_key", "amount").as[(String, Long)].collect().toMap
      === Map("a" -> 11L, "b" -> 20L))
    val e = intercept[Exception](
      Seq(("c", 3L, 30L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
        .write.format("cdc-lake").option("path", dir).mode("overwrite").save())
    assert(msgs(e).contains("Overwrite"), msgs(e))
    // neither an envelope batch nor contract rows: loud, nothing written
    val e2 = intercept[Exception](
      Seq((1, "x")).toDF("id", "name")
        .write.format("cdc-lake").option("path", dir).save())
    assert(msgs(e2).contains("contract"), msgs(e2))
    assert(lt.latestVersion === Some(2L), "failed writes must not commit")
  }

  test("single-string-column CTAS of non-envelope rows is loud, nothing committed (ADVICE r18)") {
    // One string column routes to the CDC envelope path — which for a
    // BATCH write must parse strictly: with the streaming drop default a
    // `CTAS ... AS SELECT name FROM users` would silently drop every
    // "malformed" row and commit an empty table.
    val dir = tempDir("ctasenv-").resolve("t").toString
    val e = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE ddl_envguard USING `cdc-lake` OPTIONS (path '$dir')
           |AS SELECT concat('name', id) AS name FROM range(3)""".stripMargin)
    }
    spark.sql("DROP TABLE IF EXISTS ddl_envguard")
    assert(msgs(e).contains("malformed CDC envelope"), msgs(e))
    assert(new LakeTable(spark, dir, numBuckets = 2).latestVersion.isEmpty,
      "a failed CTAS must not commit")
  }

  test("ALTER TABLE ADD COLUMNS == the manifest-only evolution commit") {
    val dir = tempDir("alter-").resolve("t").toString
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(Seq(("a", 1L, 10L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount"))
    spark.sql(s"CREATE TABLE ddl_alter USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    try {
      spark.sql("ALTER TABLE ddl_alter ADD COLUMNS (note STRING, score BIGINT)")
      // old rows null-fill; the catalog entry re-registered (read works
      // without a manual refresh)
      val got = spark.sql("SELECT _key, note, score FROM ddl_alter")
        .as[(String, Option[String], Option[Long])].collect().toSeq
      assert(got === Seq(("a", None, None)))
      // the new columns are writable through SQL right away
      spark.sql(
        "INSERT INTO ddl_alter VALUES ('b', CAST(2 AS BIGINT), CAST(20 AS BIGINT), 'hi', CAST(7 AS BIGINT))")
      val got2 = spark.sql("SELECT _key, note, score FROM ddl_alter WHERE _key = 'b'")
        .as[(String, Option[String], Option[Long])].collect().toSeq
      assert(got2 === Seq(("b", Some("hi"), Some(7L))))
      // duplicates and reserved names are loud
      val e = intercept[Exception](
        spark.sql("ALTER TABLE ddl_alter ADD COLUMNS (note STRING)"))
      assert(msgs(e).contains("already exist"), msgs(e))
      val e2 = intercept[Exception](
        spark.sql("ALTER TABLE ddl_alter ADD COLUMNS (b STRING)"))
      assert(msgs(e2).contains("reserved"), msgs(e2))
    } finally spark.sql("DROP TABLE ddl_alter")
  }

  test("ALTER COLUMN TYPE widens int->bigint manifest-only; narrowing is loud") {
    val dir = tempDir("widen-").resolve("t").toString
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(Seq(("a", 1L, 10)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "qty")) // qty: int
    spark.sql(s"CREATE TABLE ddl_widen USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    try {
      spark.sql("ALTER TABLE ddl_widen ALTER COLUMN qty TYPE BIGINT")
      // the OLD int-written file reads back under the widened schema, and
      // a beyond-int value is writable right away
      spark.sql("INSERT INTO ddl_widen VALUES ('b', CAST(2 AS BIGINT), CAST(7000000000 AS BIGINT))")
      val got = spark.sql("SELECT _key, qty FROM ddl_widen")
        .as[(String, Long)].collect().toMap
      assert(got === Map("a" -> 10L, "b" -> 7000000000L))
      assert(lt.snapshot.schema("qty").dataType ===
        org.apache.spark.sql.types.LongType)
      val e = intercept[Exception](
        spark.sql("ALTER TABLE ddl_widen ALTER COLUMN qty TYPE INT"))
      assert(msgs(e).contains("widening"), msgs(e))
    } finally spark.sql("DROP TABLE ddl_widen")
  }
}
