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

  test("CTAS with a declared partitionCol creates the partition-path layout (r19)") {
    val dir = tempDir("ctasp-").resolve("t").toString
    spark.sql(
      s"""CREATE TABLE ddl_ctasp USING `cdc-lake`
         |OPTIONS (path '$dir', buckets '2', partitionCol 'region')
         |AS SELECT concat('k', id) AS _key, CAST(1 AS BIGINT) AS _ts,
         |          id * 10 AS amount,
         |          CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END AS region
         |FROM range(6)""".stripMargin)
    try {
      val pt = graft.lake.PartitionedLakeTable.open(spark, dir, 2)
      assert(pt.isDefined, "CTAS must create the partitioned layout, not a plain table")
      assert(pt.get.partitionCol === "region")
      assert(pt.get.partitions === Seq("eu", "us"))
      // reads re-attach the partition value from the directory layout
      val got = spark.sql("SELECT _key, region FROM ddl_ctasp")
        .as[(String, String)].collect().toMap
      assert(got === Map(
        "k0" -> "eu", "k1" -> "us", "k2" -> "eu",
        "k3" -> "us", "k4" -> "eu", "k5" -> "us"))
      // INSERT INTO routes through the partitioned write (new partition born)
      spark.sql(
        "INSERT INTO ddl_ctasp VALUES ('k9', CAST(2 AS BIGINT), CAST(90 AS BIGINT), 'ap')")
      assert(pt.get.partitions === Seq("ap", "eu", "us"))
      // a conflicting partition declaration on the EXISTING table is loud
      val e = intercept[Exception](
        Seq(("x", 1L, 1L, "eu")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region")
          .write.format("cdc-lake")
          .option("path", dir).option("buckets", "2")
          .option("partitionCol", "amount").save())
      assert(msgs(e).contains("partitioned on 'region'"), msgs(e))
    } finally spark.sql("DROP TABLE ddl_ctasp")
  }

  test("CREATE TABLE with an explicit schema declares an empty table; INSERT bootstraps it (r19)") {
    val dir = tempDir("declare-").resolve("t").toString
    spark.sql(
      s"""CREATE TABLE ddl_decl (_key STRING, _ts BIGINT, amount BIGINT)
         |USING `cdc-lake` OPTIONS (path '$dir', buckets '2')""".stripMargin)
    try {
      // declared empty: readable with the declared shape before any write
      assert(spark.sql("SELECT _key, amount FROM ddl_decl").count() === 0)
      spark.sql(
        "INSERT INTO ddl_decl VALUES ('a', CAST(1 AS BIGINT), CAST(10 AS BIGINT))")
      assert(spark.sql("SELECT _key, amount FROM ddl_decl")
        .as[(String, Long)].collect().toSeq === Seq(("a", 10L)))
      assert(new LakeTable(spark, dir, numBuckets = 2).latestVersion === Some(1L))
    } finally spark.sql("DROP TABLE ddl_decl")
    // declared + PARTITIONED BY: the first INSERT creates the layout
    val dir2 = tempDir("declarep-").resolve("t").toString
    spark.sql(
      s"""CREATE TABLE ddl_declp (_key STRING, _ts BIGINT, amount BIGINT, region STRING)
         |USING `cdc-lake` PARTITIONED BY (region)
         |OPTIONS (path '$dir2', buckets '2')""".stripMargin)
    try {
      spark.sql(
        "INSERT INTO ddl_declp VALUES ('a', CAST(1 AS BIGINT), CAST(10 AS BIGINT), 'eu')")
      val pt = graft.lake.PartitionedLakeTable.open(spark, dir2, 2)
      assert(pt.isDefined && pt.get.partitionCol === "region",
        "the declared-empty INSERT must create the partitioned layout")
      assert(spark.sql("SELECT _key FROM ddl_declp WHERE region = 'eu'")
        .as[String].collect().toSeq === Seq("a"))
      // post-write catalog upkeep must NOT duplicate PARTITIONED-BY
      // columns into dataSchema (r20 — the catalog holds them
      // separately; q113's MERGE died on the duplicated declared schema)
      val ct = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("ddl_declp"))
      assert(ct.schema.fieldNames.toSeq.sorted
        === Seq("_key", "_ts", "amount", "region"),
        s"catalog schema corrupted: ${ct.schema.simpleString}")
      // and the statement AFTER the write still resolves + writes
      spark.sql(
        "INSERT INTO ddl_declp VALUES ('b', CAST(1 AS BIGINT), CAST(20 AS BIGINT), 'us')")
      assert(spark.sql("SELECT _key FROM ddl_declp ORDER BY _key")
        .as[String].collect().toSeq === Seq("a", "b"))
    } finally spark.sql("DROP TABLE ddl_declp")
    // a mismatched explicit schema against a committed table is loud
    val dir3 = tempDir("declarex-").resolve("t").toString
    new LakeTable(spark, dir3, numBuckets = 2)
      .upsert(Seq(("a", 1L, 10L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount"))
    val e = intercept[Exception](
      spark.read.schema("_key STRING, _ts BIGINT, wrong DOUBLE").format("cdc-lake")
        .option("path", dir3).option("buckets", "2").load().collect())
    assert(msgs(e).contains("does not match"), msgs(e))
  }

  test("CTAS with PARTITIONED BY maps to the partition-path layout (r19)") {
    val dir = tempDir("pby-").resolve("t").toString
    spark.sql(
      s"""CREATE TABLE ddl_pby USING `cdc-lake`
         |PARTITIONED BY (region)
         |OPTIONS (path '$dir', buckets '2')
         |AS SELECT concat('k', id) AS _key, CAST(1 AS BIGINT) AS _ts,
         |          id * 10 AS amount,
         |          CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END AS region
         |FROM range(4)""".stripMargin)
    try {
      val pt = graft.lake.PartitionedLakeTable.open(spark, dir, 2)
      assert(pt.isDefined && pt.get.partitionCol === "region",
        "PARTITIONED BY must create the partitioned layout, not a plain table")
      assert(pt.get.partitions === Seq("eu", "us"))
      assert(spark.sql("SELECT _key FROM ddl_pby WHERE region = 'eu'")
        .as[String].collect().toSet === Set("k0", "k2"))
    } finally spark.sql("DROP TABLE ddl_pby")
    // multi-column PARTITIONED BY creates the nested composite layout
    // (r20 — ComplexKeyGenerator partition-path parity)
    val dir2 = tempDir("pby2-").resolve("t").toString
    spark.sql(
      s"""CREATE TABLE ddl_pby2 USING `cdc-lake`
         |PARTITIONED BY (region, amount)
         |OPTIONS (path '$dir2', buckets '2')
         |AS SELECT 'k' AS _key, CAST(1 AS BIGINT) AS _ts,
         |          CAST(1 AS BIGINT) AS amount, 'eu' AS region""".stripMargin)
    try {
      val pt2 = graft.lake.PartitionedLakeTable.open(spark, dir2, 2)
      assert(pt2.isDefined && pt2.get.partitionCols === Seq("region", "amount"))
      assert(pt2.get.partitions === Seq("eu/1"))
      assert(spark.sql("SELECT amount FROM ddl_pby2 WHERE region = 'eu'")
        .as[Long].collect().toSeq === Seq(1L))
    } finally spark.sql("DROP TABLE IF EXISTS ddl_pby2")
  }

  test("DataFrameWriter partitionBy routes create the partitioned layout too (r19 review)") {
    // saveAsTable: the catalog route never touches the parser — the
    // post-hoc LakeCreateTableRule must map the declaration
    val dir = tempDir("pbywriter-").resolve("t").toString
    Seq(("a", 1L, 10L, "eu"), ("b", 1L, 20L, "us"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region")
      .write.format("cdc-lake")
      .option("path", dir).option("buckets", "2")
      .partitionBy("region")
      .saveAsTable("ddl_pbyw")
    try {
      val pt = graft.lake.PartitionedLakeTable.open(spark, dir, 2)
      assert(pt.isDefined && pt.get.partitionCol === "region",
        "partitionBy.saveAsTable must create the partitioned layout")
      assert(pt.get.partitions === Seq("eu", "us"))
      assert(spark.sql("SELECT _key FROM ddl_pbyw WHERE region = 'us'")
        .as[String].collect().toSeq === Seq("b"))
    } finally spark.sql("DROP TABLE ddl_pbyw")
    // path-only save(): partition columns arrive as the JSON-encoded
    // __partition_columns option
    val dir2 = tempDir("pbysave-").resolve("t").toString
    Seq(("a", 1L, 10L, "eu"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region")
      .write.format("cdc-lake").option("path", dir2).option("buckets", "2")
      .partitionBy("region").save()
    val pt2 = graft.lake.PartitionedLakeTable.open(spark, dir2, 2)
    assert(pt2.isDefined && pt2.get.partitionCol === "region",
      "partitionBy.save() must create the partitioned layout")
    // multi-column partitionBy builds the nested composite layout on the
    // path-only route too (r20); a degenerate EMPTY partitionBy() is a
    // no-op plain write, not an error (ADVICE r19)
    val dir3 = tempDir("pby2save-").resolve("t").toString
    Seq(("a", 1L, 10L, "eu"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region")
      .write.format("cdc-lake").option("path", dir3).option("buckets", "2")
      .partitionBy("region", "amount").save()
    val pt3 = graft.lake.PartitionedLakeTable.open(spark, dir3, 2)
    assert(pt3.isDefined && pt3.get.partitionCols === Seq("region", "amount"))
    assert(pt3.get.partitions === Seq("eu/10"))
    val dir4 = tempDir("pby0-").resolve("t").toString
    Seq(("a", 1L, 10L))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount")
      .write.format("cdc-lake").option("path", dir4).option("buckets", "2")
      .partitionBy().save()
    assert(graft.lake.PartitionedLakeTable.open(spark, dir4, 2).isEmpty,
      "empty partitionBy() must stay a plain-table write")
    assert(new LakeTable(spark, dir4, 2).snapshot.count() === 1)
  }

  test("partitionCol against an existing plain table is loud (r19)") {
    val dir = tempDir("plainp-").resolve("t").toString
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(Seq(("a", 1L, 10L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount"))
    val e = intercept[Exception](
      Seq(("b", 1L, 20L, "eu")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region")
        .write.format("cdc-lake")
        .option("path", dir).option("buckets", "2")
        .option("partitionCol", "region").save())
    assert(msgs(e).contains("PLAIN"), msgs(e))
    assert(lt.latestVersion === Some(1L), "the rejected write must not commit")
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
