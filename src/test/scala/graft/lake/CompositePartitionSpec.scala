package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-column (composite) partition paths — r20, Hudi
  * ComplexKeyGenerator partition-path parity. The partition IDENTITY is
  * the slash-joined component path (`eu/2024-01-01`); the layout nests
  * one `p=` level per column. Every lifecycle surface must speak that
  * identity: listing, routing, version vectors, savepoints, drops.
  */
class CompositePartitionSpec extends SparkSpec {
  import spark.implicits._

  private def msgs(x: Throwable): String =
    Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")

  private def plt(dir: String) =
    new PartitionedLakeTable(spark, dir, "region,day", numBuckets = 2)

  test("upsert + snapshot round-trip: nested dirs, identities, typed re-attach") {
    val dir = tempDir("comp-").resolve("t").toString
    val pt = plt(dir)
    pt.upsert(Seq(
      ("k1", 1L, 10L, "eu", 20240101),
      ("k2", 1L, 20L, "us", 20240101),
      ("k3", 1L, 30L, "eu", 20240102))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region", "day"))
    assert(pt.partitionCols === Seq("region", "day"))
    assert(pt.partitions === Seq("eu/20240101", "eu/20240102", "us/20240101"))
    // nested p= levels on disk, each component its own dir
    assert(new java.io.File(s"$dir/p=eu/p=20240101").isDirectory)
    // both partition columns re-attach with their ORIGINAL types
    val snap = pt.snapshot
    assert(snap.schema("day").dataType.typeName === "integer")
    assert(snap.select("_key", "region", "day").as[(String, String, Int)]
      .collect().sortBy(_._1).toSeq === Seq(
      ("k1", "eu", 20240101), ("k2", "us", 20240101), ("k3", "eu", 20240102)))
    // partition-pruned read by identity
    assert(pt.snapshot(Seq("eu/20240102")).select("_key").as[String]
      .collect().toSeq === Seq("k3"))
  }

  test("routed deletes dispatch by composite identity; null components go global") {
    val dir = tempDir("compdel-").resolve("t").toString
    val pt = plt(dir)
    pt.upsert(Seq(
      ("k1", 1L, "eu", "d1"), ("k2", 1L, "eu", "d2"), ("k3", 1L, "us", "d1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "region", "day"))
    val v0 = pt.currentVersions
    // routed: only eu/d1 is named — us/d1 must not commit a new version
    pt.deleteRouted(Seq(("k1", "eu", "d1")).toDF(LakeTable.KeyCol, "region", "day"))
    val v1 = pt.currentVersions
    assert(v1("eu/d1") === v0("eu/d1") + 1)
    assert(v1("us/d1") === v0("us/d1"), "unnamed partition must not be visited")
    assert(pt.snapshot.select(LakeTable.KeyCol).as[String].collect().sorted
      === Seq("k2", "k3"))
    // a null component is unroutable -> global bloom-pruned path still deletes
    pt.deleteRouted(Seq(("k3", null, "d1"))
      .toDF(LakeTable.KeyCol, "region", "day"))
    assert(pt.snapshot.select(LakeTable.KeyCol).as[String].collect().toSeq
      === Seq("k2"))
  }

  test("merge commits one version per touched partition; '/' components are loud") {
    val dir = tempDir("compmerge-").resolve("t").toString
    val pt = plt(dir)
    pt.upsert(Seq(("k1", 1L, 1L, "eu", "d1"), ("k2", 1L, 2L, "us", "d1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region", "day"))
    pt.merge(
      Seq(("k1", 2L, 9L, "eu", "d1"))
        .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region", "day"),
      Seq(("k2", "us", "d1")).toDF(LakeTable.KeyCol, "region", "day"))
    assert(pt.snapshot.select(LakeTable.KeyCol, "amount").as[(String, Long)]
      .collect().toSeq === Seq(("k1", 9L)))
    // a composite component embedding the separator would make the joined
    // identity ambiguous — rejected loudly at write time
    val e = intercept[Exception](pt.upsert(
      Seq(("k9", 1L, 1L, "eu/west", "d1"))
        .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region", "day")))
    assert(msgs(e).contains("path separator"), msgs(e))
  }

  test("a handle whose declaration disagrees with the stored layout is loud") {
    val dir = tempDir("compdecl-").resolve("t").toString
    plt(dir).upsert(Seq(("k1", 1L, "eu", "d1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "region", "day"))
    val wrong = new PartitionedLakeTable(spark, dir, "region", numBuckets = 2)
    val e = intercept[Exception](wrong.upsert(
      Seq(("k2", 1L, "eu", "d2")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "region", "day")))
    assert(msgs(e).contains("partitioned on 'region,day'"), msgs(e))
    // open() reconstructs the composite declaration from _table.json
    val reopened = PartitionedLakeTable.open(spark, dir, 2)
    assert(reopened.isDefined && reopened.get.partitionCols === Seq("region", "day"))
  }

  test("incremental vector + dropPartitions speak composite identities") {
    val dir = tempDir("compincr-").resolve("t").toString
    val pt = plt(dir)
    pt.upsert(Seq(("k1", 1L, "eu", "d1"), ("k2", 1L, "us", "d1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "region", "day"))
    val v0 = pt.currentVersions
    assert(v0.keySet === Set("eu/d1", "us/d1"))
    pt.upsert(Seq(("k3", 2L, "eu", "d2"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "region", "day"))
    val inc = pt.incrementalSince(v0)
    assert(inc.select(LakeTable.KeyCol).as[String].collect().toSeq === Seq("k3"))
    assert(inc.select("region", "day").as[(String, String)].collect().toSeq
      === Seq(("eu", "d2")))
    // drop by identity removes exactly the leaf dir
    assert(pt.dropPartitions(Seq("eu/d1")) === 1)
    assert(pt.partitions === Seq("eu/d2", "us/d1"))
    assert(new java.io.File(s"$dir/p=eu/p=d2").isDirectory)
    assert(!new java.io.File(s"$dir/p=eu/p=d1").exists)
    // a held position into the dropped partition fails loudly
    val e = intercept[IllegalStateException](pt.incrementalSince(v0))
    assert(e.getMessage.contains("eu/d1"))
  }

  test("widenColumn rejects every partition column; single-col '/' values still work") {
    val dir = tempDir("compwiden-").resolve("t").toString
    val pt = plt(dir)
    pt.upsert(Seq(("k1", 1L, 1, "eu", "d1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "amount", "region", "day"))
    intercept[IllegalArgumentException](pt.widenColumn("day", org.apache.spark.sql.types.LongType))
    pt.widenColumn("amount", org.apache.spark.sql.types.LongType)
    assert(pt.snapshot.schema("amount").dataType.typeName === "long")
    // pre-r20 contract preserved: SINGLE-column partition values may
    // contain '/' (one flat URL-encoded dir, identity = raw value)
    val dir2 = tempDir("slashv-").resolve("t").toString
    val single = new PartitionedLakeTable(spark, dir2, "cat", numBuckets = 2)
    single.upsert(Seq(("k1", 1L, "a/b")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "cat"))
    assert(single.partitions === Seq("a/b"))
    assert(single.snapshot.select("cat").as[String].collect().toSeq === Seq("a/b"))
  }
}
