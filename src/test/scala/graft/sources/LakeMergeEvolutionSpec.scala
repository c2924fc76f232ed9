package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{LakeTable, PartitionedLakeTable}

/** `MERGE ... WITH SCHEMA EVOLUTION` (r18): additive source columns
  * append to the lake schema at parse time (manifest-only commit) and
  * the merge then runs as a plain one over the widened schema — state
  * must match the DataFrame column-add path (VERDICT r17 #6 done-bar).
  */
class LakeMergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(tag: String): (String, LakeTable) = {
    n += 1
    val name = s"evo_t$n"
    val dir = tempDir(s"$tag-").resolve("t").toString
    val lt = new LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(Seq(("a", 1L, 10L), ("b", 1L, 20L))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount"))
    spark.sql(s"CREATE TABLE $name USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    (name, lt)
  }
  private def state4(name: String): Map[String, (Long, Long, Option[String])] = {
    spark.catalog.refreshTable(name)
    spark.sql(s"SELECT _key, _ts, amount, note FROM $name")
      .as[(String, Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
  private def msgs(x: Throwable): String =
    Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
      .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")

  test("SET * / INSERT * carry new source columns == the DataFrame column-add path") {
    val (name, lt) = fresh("evo-star")
    Seq(("a", 5L, 11L, "ha"), ("c", 5L, 33L, "hc"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "note")
      .createOrReplaceTempView("evostar_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING evostar_src s ON t._key = s._key
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // DataFrame column-add twin: upsert the same rows (extra column
    // drift-merges into the schema)
    val dir2 = tempDir("evo-star-df-").resolve("t").toString
    val lt2 = new LakeTable(spark, dir2, numBuckets = 2)
    lt2.upsert(Seq(("a", 1L, 10L), ("b", 1L, 20L))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount"))
    lt2.upsert(Seq(("a", 5L, 11L, "ha"), ("c", 5L, 33L, "hc"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "note"))
    val sql = state4(name)
    val df = lt2.snapshot.select(col(LakeTable.KeyCol), col(LakeTable.TsCol), col("amount"), col("note"))
      .as[(String, Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(sql === df)
    assert(sql === Map(
      "a" -> ((5L, 11L, Some("ha"))),
      "b" -> ((1L, 20L, None)),
      "c" -> ((5L, 33L, Some("hc")))))
    // the widened schema is catalog-visible and ordered user-first
    assert(lt.snapshot.schema.fieldNames.contains("note"))
    spark.sql(s"DROP TABLE $name")
  }

  test("explicit assignment lists may reference new source columns") {
    val (name, _) = fresh("evo-expl")
    Seq(("a", 5L, 11L, "ha"), ("c", 5L, 33L, "hc"))
      .toDF("id", "ts", "amt", "note").createOrReplaceTempView("evoexpl_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING evoexpl_src s ON t._key = s.id
         |WHEN MATCHED THEN UPDATE SET _ts = s.ts, note = s.note
         |WHEN NOT MATCHED THEN
         |  INSERT (_key, _ts, amount, note) VALUES (s.id, s.ts, s.amt, s.note)"""
        .stripMargin)
    // partial UPDATE: amount read-modify-writes through; b untouched
    assert(state4(name) === Map(
      "a" -> ((5L, 10L, Some("ha"))),
      "b" -> ((1L, 20L, None)),
      "c" -> ((5L, 33L, Some("hc")))))
    spark.sql(s"DROP TABLE $name")
  }

  test("WITHOUT the clause nothing evolves: stars drop extras, explicit refs stay loud") {
    val (name, lt) = fresh("evo-off")
    Seq(("a", 5L, 11L, "ha")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "note")
      .createOrReplaceTempView("evooff_src")
    spark.sql(
      s"""MERGE INTO $name t USING evooff_src s ON t._key = s._key
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(!lt.snapshot.schema.fieldNames.contains("note"),
      "star expansion without the clause must not add columns")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $name t USING evooff_src s ON t._key = s._key
         |WHEN MATCHED THEN UPDATE SET note = s.note""".stripMargin))
    assert(msgs(e).contains("note"), msgs(e))
    spark.sql(s"DROP TABLE $name")
  }

  test("evolution on a partitioned target appends per partition") {
    n += 1
    val name = s"evo_t$n"
    val dir = tempDir("evo-part-").resolve("t").toString
    val pt = new PartitionedLakeTable(spark, dir, "region", numBuckets = 2)
    pt.upsert(Seq(("a", 1L, 10L, "eu"), ("b", 1L, 20L, "us"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region"))
    spark.sql(s"CREATE TABLE $name USING `cdc-lake` OPTIONS (path '$dir', buckets '2')")
    Seq(("a", 5L, 11L, "eu", "ha")).toDF("id", "ts", "amt", "region", "note")
      .createOrReplaceTempView("evopart_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING evopart_src s ON t._key = s.id
         |WHEN MATCHED THEN UPDATE SET _ts = s.ts, note = s.note""".stripMargin)
    spark.catalog.refreshTable(name)
    val got = spark.sql(s"SELECT _key, _ts, note, region FROM $name")
      .as[(String, Long, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the un-named 'us' partition evolved too (one logical schema) and
    // reads back null for the new column
    assert(got === Map(
      "a" -> ((5L, Some("ha"), "eu")), "b" -> ((1L, None, "us"))))
    spark.sql(s"DROP TABLE $name")
  }
}
