package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read delta buckets (docs/MOR_DESIGN.md): the equivalence gate.
  * The core property — for any sequence of upsert/delete/merge batches and
  * any fold points, a `mor` table's snapshot (and every
  * `snapshotAt(v)`) equals the state a `cow` table reaches applying the
  * SAME batches — plus the structural invariants (delta stacks grow then
  * fold, vacuum keeps delta dirs, incremental reads and key probes see
  * merged state).
  */
class LakeMorSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (String, Long, String)*): DataFrame =
    t.toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload")

  private def keys(ks: String*): DataFrame = ks.toDF(LakeTable.KeyCol)

  private def state(t: LakeTable): Set[(String, Long, String)] =
    t.snapshot.select(LakeTable.KeyCol, LakeTable.TsCol, "payload")
      .as[(String, Long, String)].collect().toSet

  private def mor(root: String, buckets: Int = 4, compactAfter: Int = 3) =
    new LakeTable(spark, s"$root/mor", buckets,
      tableType = LakeTable.MorType, compactAfter = compactAfter)

  private def cow(root: String, buckets: Int = 4) =
    new LakeTable(spark, s"$root/cow", buckets)

  test("mor upserts layer as deltas and read back LWW-merged; snapshots match cow") {
    val root = tempDir("mor-").toString
    val (m, c) = (mor(root), cow(root))
    val batches = Seq(
      rows(("a", 1L, "a1"), ("b", 1L, "b1")),
      rows(("a", 3L, "a3"), ("c", 1L, "c1")),
      rows(("a", 2L, "aSTALE"), ("b", 2L, "b2"))) // stale _ts must lose
    batches.zipWithIndex.foreach { case (b, i) =>
      m.upsert(b, s"b$i"); c.upsert(b, s"b$i")
    }
    assert(state(m) == state(c))
    assert(state(m) == Set(("a", 3L, "a3"), ("b", 2L, "b2"), ("c", 1L, "c1")))
    // Structure: first commit wrote the base, the next two stacked deltas.
    val manifest = m.latestManifest().get
    assert(manifest.deltas.values.flatten.nonEmpty, "expected delta stacks")
    assert(manifest.buckets.nonEmpty, "expected a base layer")
  }

  test("SQL MERGE INTO on a mor-registered catalog table stacks deltas; reads collapse (r17)") {
    val root = tempDir("mor-sql-").toString
    val m = mor(root, buckets = 2, compactAfter = 8)
    m.bulkInsert(rows(("a", 1L, "a0"), ("b", 1L, "b0")), "c0")
    spark.sql(
      s"""CREATE TABLE mor_sql_t USING `cdc-lake`
         |OPTIONS (path '$root/mor', buckets '2', tableType 'mor', compactAfter '8')"""
        .stripMargin)
    try {
      Seq(("a", 5L, "a5", false), ("c", 5L, "c5", false), ("b", 5L, "", true))
        .toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload", "del")
        .createOrReplaceTempView("mor_sql_src")
      // probe-split shape (delete branch) through the OPTIONS-configured
      // mor handle: the commit must be a DELTA append, not a base fold
      spark.sql(
        s"""MERGE INTO mor_sql_t t USING mor_sql_src s ON t._key = s._key
           |WHEN MATCHED AND s.del THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val manifest = m.latestManifest().get
      assert(manifest.deltas.values.flatten.nonEmpty,
        "SQL MERGE through a mor-registered table must stack deltas, not fold the base")
      // the extra `del` column is part of SET * here — drop it for state
      val got = spark.sql(s"SELECT _key, _ts, payload FROM mor_sql_t")
        .as[(String, Long, String)].collect().toSet
      assert(got == Set(("a", 5L, "a5"), ("c", 5L, "c5")))
    } finally spark.sql("DROP TABLE IF EXISTS mor_sql_t")
  }

  test("delete tombstones kill earlier state but not later re-inserts; matches cow") {
    val root = tempDir("mor-").toString
    val (m, c) = (mor(root), cow(root))
    def apply(t: LakeTable): Unit = {
      t.upsert(rows(("k", 10L, "v10"), ("x", 1L, "x1")), "c0")
      t.delete(keys("k"), "c1") // kills v10 whatever its _ts
      t.upsert(rows(("k", 5L, "v5")), "c2") // re-insert with LOWER ts wins
    }
    apply(m); apply(c)
    assert(state(m) == state(c))
    assert(state(m) == Set(("k", 5L, "v5"), ("x", 1L, "x1")))
  }

  test("merge() (upserts+deletes one commit) writes one delta; in-batch delete wins") {
    val root = tempDir("mor-").toString
    val (m, c) = (mor(root), cow(root))
    def apply(t: LakeTable): Unit = {
      t.upsert(rows(("a", 1L, "a1"), ("b", 1L, "b1")), "c0")
      t.merge(rows(("a", 2L, "a2"), ("b", 9L, "bDOOMED")), keys("b"), "c1")
    }
    apply(m); apply(c)
    assert(state(m) == state(c))
    assert(state(m) == Set(("a", 2L, "a2")))
    val vs = (1L to 2L)
    vs.foreach { v =>
      val ms = m.snapshotAt(v).select(LakeTable.KeyCol, LakeTable.TsCol, "payload")
        .as[(String, Long, String)].collect().toSet
      val cs = c.snapshotAt(v).select(LakeTable.KeyCol, LakeTable.TsCol, "payload")
        .as[(String, Long, String)].collect().toSet
      assert(ms == cs, s"time travel diverged at v$v")
    }
  }

  test("compactAfter folds the stack: bases rewrite, deltas reset, state unchanged") {
    val root = tempDir("mor-").toString
    val m = mor(root, buckets = 1, compactAfter = 2) // one bucket: stack depth = commit count
    m.upsert(rows(("a", 1L, "a1")), "c0") // base
    m.upsert(rows(("b", 1L, "b1")), "c1") // delta 1
    m.upsert(rows(("c", 1L, "c1")), "c2") // delta 2 -> stack at cap
    val before = m.latestManifest().get
    assert(before.deltas(0).size == 2)
    m.upsert(rows(("d", 1L, "d1")), "c3") // must FOLD, not stack a third
    val after = m.latestManifest().get
    assert(after.deltas.getOrElse(0, Nil).isEmpty, "fold must reset the stack")
    assert(after.buckets(0) != before.buckets(0), "fold must rewrite the base")
    assert(state(m) == Set(
      ("a", 1L, "a1"), ("b", 1L, "b1"), ("c", 1L, "c1"), ("d", 1L, "d1")))
  }

  test("compact() folds every delta stack; vacuum then reclaims old dirs but keeps referenced deltas") {
    val root = tempDir("mor-").toString
    val m = mor(root, buckets = 2, compactAfter = 10)
    m.upsert(rows(("a", 1L, "a1"), ("b", 1L, "b1")), "c0")
    m.upsert(rows(("a", 2L, "a2"), ("c", 1L, "c1")), "c1")
    // Deltas live; a vacuum keeping all versions must not break reads.
    assert(m.latestManifest().get.deltas.values.flatten.nonEmpty)
    m.vacuum(keepVersions = 2)
    assert(state(m) == Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
    m.compact("c2")
    val folded = m.latestManifest().get
    assert(folded.deltas.values.flatten.isEmpty, "compact must fold all stacks")
    assert(state(m) == Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
    // Old delta dirs are now unreferenced by the latest manifest.
    m.vacuum(keepVersions = 1)
    assert(state(m) == Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
  }

  test("incremental reads over delta commits emit exactly the changed state; streams see merged rows") {
    val root = tempDir("mor-").toString
    val m = mor(root)
    m.upsert(rows(("a", 1L, "a1"), ("b", 1L, "b1")), "c0") // v1 base
    m.upsert(rows(("a", 2L, "a2"), ("c", 1L, "c1")), "c1") // v2 delta
    val inc = m.incrementalBetween(1L, 2L)
      .select(LakeTable.KeyCol, LakeTable.TsCol, "payload")
      .as[(String, Long, String)].collect().toSet
    assert(inc == Set(("a", 2L, "a2"), ("c", 1L, "c1")),
      s"incremental must emit merged changed state, got $inc")
  }

  test("lookup and probeKeys prune through layered blooms and see merged state") {
    val root = tempDir("mor-").toString
    val m = mor(root)
    m.upsert(rows(("a", 1L, "a1"), ("b", 1L, "b1")), "c0")
    m.upsert(rows(("a", 2L, "a2"), ("d", 1L, "d1")), "c1") // delta: new key d
    m.delete(keys("b"), "c2")                              // delta: tombstone
    val got = m.lookup(Seq("a", "b", "d", "zzz"))
      .select(LakeTable.KeyCol, "payload").as[(String, String)].collect().toSet
    assert(got == Set(("a", "a2"), ("d", "d1")),
      s"lookup through deltas must see merged state, got $got")
    val probed = m.probeKeys(keys("a", "b", "d", "zzz"))
      .as[String].collect().toSet
    assert(probed == Set("a", "d"), s"probeKeys got $probed")
  }

  test("schema widening across a delta commit reads back widened") {
    val root = tempDir("mor-").toString
    val m = mor(root)
    m.upsert(
      Seq(("a", 1L, 1)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "n"), "c0")
    m.upsert( // delta with n widened int -> long
      Seq(("b", 1L, 7L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, "n"), "c1")
    val got = m.snapshot.select(LakeTable.KeyCol, "n").as[(String, Long)]
      .collect().toSet
    assert(got == Set(("a", 1L), ("b", 7L)))
  }

  test("reserved meta column names are rejected loudly on ALL writes") {
    val root = tempDir("mor-").toString
    val m = mor(root)
    val bad = Seq(("a", 1L, "x")).toDF(LakeTable.KeyCol, LakeTable.TsCol, LakeTable.OpCol)
    val e = intercept[IllegalArgumentException] { m.upsert(bad, "c0") }
    assert(e.getMessage.contains("reserved lake meta column"))
    // Cow handles reject too (ADVICE r11 #1): the manifest schema never
    // carries _op/_dv, so a cow write with either name would persist the
    // column to parquet but silently drop it from every read.
    val c = cow(root)
    val e2 = intercept[IllegalArgumentException] { c.upsert(bad, "c0") }
    assert(e2.getMessage.contains("reserved lake meta column"))
    val bad2 = Seq(("a", 1L, 3L)).toDF(LakeTable.KeyCol, LakeTable.TsCol, LakeTable.DvCol)
    intercept[IllegalArgumentException] { c.bulkInsert(bad2, "c1") }
  }

  test("compact() folds a fully-tombstoned bucket's base+delta stack away") {
    val root = tempDir("mor-").toString
    // High compactAfter so the tombstone stays a live delta stack and no
    // cadence fold ever touches it — only compact() can (ADVICE r11 #3:
    // the emptied bucket has no snapshot keys, so a key-derived affected
    // set would skip it forever).
    val m = mor(root, buckets = 2, compactAfter = 100)
    // Two keys in DIFFERENT buckets, so tombstoning all of kDead's bucket
    // leaves it with zero snapshot keys while kLive keeps its own bucket.
    val cands = (1 to 100).map(i => s"k$i")
    val kDead = cands.find(k => LakeTable.bucketOfKey(k, 2) == 0).get
    val kLive = cands.find(k => LakeTable.bucketOfKey(k, 2) == 1).get
    m.upsert(
      Seq((kDead, 1L, "a1"), (kLive, 1L, "b1"))
        .toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"), "c0")
    m.delete(keys(kDead), "c1") // delta tombstone empties kDead's bucket
    assert(state(m) == Set((kLive, 1L, "b1")))
    m.compact("c2")
    val manifest = m.latestManifest().get
    assert(manifest.deltas.isEmpty,
      s"compact must fold ALL stacks incl. fully-tombstoned buckets, got ${manifest.deltas}")
    assert(state(m) == Set((kLive, 1L, "b1")))
    // The emptied bucket (kDead's) must not survive as a base either.
    val liveKeys = m.snapshot.select(LakeTable.KeyCol).as[String].collect().toSet
    assert(liveKeys == Set(kLive))
  }

  test("commitId replay of a delta commit is a no-op") {
    val root = tempDir("mor-").toString
    val m = mor(root)
    m.upsert(rows(("a", 1L, "a1")), "c0")
    m.upsert(rows(("a", 2L, "a2")), "c1")
    val v = m.latestVersion.get
    m.upsert(rows(("a", 9L, "REPLAY")), "c1") // same commitId
    assert(m.latestVersion.get == v, "replay must not commit")
    assert(state(m) == Set(("a", 2L, "a2")))
  }

  test("a delete-triggered fold that empties a bucket drops it from the manifest") {
    val root = tempDir("mor-").toString
    val m = mor(root, buckets = 1, compactAfter = 1) // every 2nd commit folds
    m.upsert(rows(("a", 1L, "a1")), "c0") // v1 base
    m.delete(keys("a"), "c1")             // v2 delta tombstone (stack 1 = cap)
    assert(state(m).isEmpty, "tombstone must hide the base row")
    m.delete(keys("a"), "c2")             // v3: stack at cap -> FOLD; merge is empty
    val manifest = m.latestManifest().get
    assert(manifest.deltas.isEmpty, "fold must clear the stack")
    assert(manifest.buckets.isEmpty, "an emptied bucket must leave the manifest")
    assert(state(m).isEmpty)
    // And the table remains writable afterwards.
    m.upsert(rows(("z", 1L, "z1")), "c3")
    assert(state(m) == Set(("z", 1L, "z1")))
  }

  test("async compaction: a concurrent fold and delta commits all land (separate handles)") {
    val root = tempDir("mor-").toString
    val dir = s"$root/t"
    // The async deployment (docs/MOR_DESIGN.md): inline folds off
    // (compactAfter high), compaction driven by a SEPARATE handle on its
    // own cadence, racing live delta writers through the optimistic
    // commit loop — no fold lock exists, losers retry with remerge.
    def handle() = new LakeTable(spark, dir, numBuckets = 4,
      tableType = LakeTable.MorType, compactAfter = 100)
    val h0 = handle()
    h0.upsert(rows(("a", 1L, "a1"), ("b", 1L, "b1")), "c0") // v1 base
    h0.upsert(rows(("a", 2L, "a2")), "c1")                  // v2 delta
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val results =
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[Either[Throwable, String]]] = Seq(
          () => try { handle().compact("fold"); Right("fold") }
                catch { case e: Throwable => Left(e) },
          () => try { handle().upsert(rows(("c", 3L, "c3")), "w1"); Right("w1") }
                catch { case e: Throwable => Left(e) },
          () => try { handle().upsert(rows(("b", 4L, "b2")), "w2"); Right("w2") }
                catch { case e: Throwable => Left(e) })
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty, s"racing fold/writers must all retry past conflicts: $failures")
    val t = handle()
    // All three commits durable on top of the two seed versions.
    assert(t.latestVersion.contains(5L), s"got version ${t.latestVersion}")
    assert(state(t) == Set(("a", 2L, "a2"), ("b", 4L, "b2"), ("c", 3L, "c3")),
      "final state must be the LWW collapse of every committed batch")
    // Quiesced compact folds whatever stacks the interleaving left over;
    // replaying the racing fold's commitId stays a no-op.
    t.compact("fold2")
    assert(t.latestManifest().get.deltas.isEmpty, "quiesced compact must clear all stacks")
    val v = t.latestVersion.get
    t.compact("fold")
    assert(t.latestVersion.contains(v), "replayed compaction commitId must be a no-op")
    assert(state(t) == Set(("a", 2L, "a2"), ("b", 4L, "b2"), ("c", 3L, "c3")))
  }

  test("partitioned mor table: per-partition delta stacks, routed deletes, merged reads") {
    val root = tempDir("mor-").toString
    val plt = new PartitionedLakeTable(
      spark, root, "day", numBuckets = 2,
      tableType = LakeTable.MorType, compactAfter = 8)
    def prows(t: (String, Long, String, String)*) =
      t.toDF(LakeTable.KeyCol, LakeTable.TsCol, "day", "payload")
    plt.upsert(prows(
      ("a", 1L, "d1", "a1"), ("b", 1L, "d2", "b1")), "c0") // bases per partition
    plt.upsert(prows(
      ("a", 2L, "d1", "a2"), ("c", 1L, "d2", "c1")), "c1") // deltas per partition
    assert(plt.partitionTable("d1").deltaDepths.nonEmpty, "d1 must carry a delta")
    assert(plt.partitionTable("d2").deltaDepths.nonEmpty, "d2 must carry a delta")
    plt.deleteRouted(
      Seq(("b", "d2")).toDF(LakeTable.KeyCol, "day"), "c2") // tombstone delta in d2 only
    val got = plt.snapshot
      .select(LakeTable.KeyCol, "day", "payload")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("a", "d1", "a2"), ("c", "d2", "c1")))
    // The routed delete must not have touched d1's version chain.
    assert(plt.partitionTable("d1").latestVersion.contains(2L))
    assert(plt.partitionTable("d2").latestVersion.contains(3L))
  }

  test("restoreTo republishes delta stacks: pre-fold states time-travel and restore exactly") {
    val root = tempDir("mor-").toString
    val m = mor(root, buckets = 1, compactAfter = 2)
    m.upsert(rows(("a", 1L, "a1")), "c0")         // v1 base
    m.upsert(rows(("a", 2L, "a2")), "c1")         // v2 delta (stack 1)
    m.upsert(rows(("b", 1L, "b1")), "c2")         // v3 delta (stack 2)
    m.upsert(rows(("c", 1L, "c1")), "c3")         // v4 FOLD (stack at cap)
    assert(m.deltaDepths.isEmpty, "v4 must have folded")
    // Restore to the mid-stack version: the republished manifest carries
    // v2's delta stack, and reads collapse it exactly as v2 did.
    val restored = m.restoreTo(2L, "restore")
    assert(restored == 5L)
    assert(m.deltaDepths.values.sum == 1, "restored manifest must carry v2's stack")
    assert(state(m) == Set(("a", 2L, "a2")))
    // Vacuum keeping the restored head must preserve its delta dirs.
    m.vacuum(keepVersions = 1)
    assert(state(m) == Set(("a", 2L, "a2")))
  }

  test("racing mor writers: all delta commits land via retry-with-remerge, stacks stay consistent") {
    val root = tempDir("mor-").toString
    val seedTable = mor(root, buckets = 2, compactAfter = 20)
    seedTable.upsert(rows(("seed", 0L, "s")), "seed") // base layer
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val results =
      try {
        import scala.jdk.CollectionConverters._
        val tasks = (0 until 6).map { i =>
          new java.util.concurrent.Callable[Either[Throwable, Int]] {
            def call() =
              try {
                new LakeTable(spark, s"$root/mor", 2,
                  tableType = LakeTable.MorType, compactAfter = 20)
                  .upsert(rows((s"t$i", 1L, s"v$i")), s"c$i")
                Right(i)
              } catch { case e: Throwable => Left(e) }
          }
        }.asJava
        pool.invokeAll(tasks).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty, s"racers must retry past publish conflicts: $failures")
    val t = new LakeTable(spark, s"$root/mor", 2)
    val keys = t.snapshot.select(LakeTable.KeyCol).as[String].collect().toSet
    assert(keys == (0 until 6).map(i => s"t$i").toSet + "seed",
      s"every racer's delta must be durable, got $keys")
    assert(t.latestVersion.contains(7L), "6 racers + seed = 7 versions")
    // Each version appended exactly one layer: total stack depth = 6 and
    // every delta dir in the stacks is distinct (no lost/duplicated link).
    val depths = t.deltaDepths
    assert(depths.values.sum == 6, s"expected 6 stacked deltas, got $depths")
  }

  test("randomized op-sequence equivalence: mor == cow at every version (3 seeds)") {
    for (seed <- Seq(7, 21, 42)) {
      val root = tempDir(s"mor-rand$seed-").toString
      val m = mor(root, buckets = 4, compactAfter = 2)
      val c = cow(root)
      val rnd = new scala.util.Random(seed)
      val keyPool = (0 until 12).map(i => s"k$i")
      var version = 0L
      (0 until 8).foreach { i =>
        val cid = s"b$i"
        rnd.nextInt(3) match {
          case 0 | 1 => // upsert 1-4 rows
            val b = rows(Seq.fill(1 + rnd.nextInt(4))(
              (keyPool(rnd.nextInt(keyPool.size)), rnd.nextInt(5).toLong,
                s"v$i-${rnd.nextInt(100)}")): _*)
            m.upsert(b, cid); c.upsert(b, cid)
          case 2 => // merge with deletes (may overlap the upserts)
            val ups = rows(Seq.fill(1 + rnd.nextInt(2))(
              (keyPool(rnd.nextInt(keyPool.size)), rnd.nextInt(5).toLong,
                s"m$i-${rnd.nextInt(100)}")): _*)
            val dels = keys(Seq.fill(1 + rnd.nextInt(2))(
              keyPool(rnd.nextInt(keyPool.size))): _*)
            m.merge(ups, dels, cid); c.merge(ups, dels, cid)
        }
        version += 1
        assert(state(m) == state(c), s"seed=$seed diverged after batch $i")
      }
      // Full-history time travel equivalence (both committed every batch —
      // random batches are never empty).
      (1L to version).foreach { v =>
        val ms = m.snapshotAt(v).select(LakeTable.KeyCol, LakeTable.TsCol, "payload")
          .as[(String, Long, String)].collect().toSet
        val cs = c.snapshotAt(v).select(LakeTable.KeyCol, LakeTable.TsCol, "payload")
          .as[(String, Long, String)].collect().toSet
        assert(ms == cs, s"seed=$seed time travel diverged at v$v")
      }
    }
  }

  test("mor partial: column fragments compose across delta commits; deletes reset composition") {
    val root = tempDir("mor-partial-").toString
    val m = new LakeTable(spark, s"$root/t", numBuckets = 2,
      tableType = LakeTable.MorType, compactAfter = 10, // stack stays un-folded
      mergeMode = LakeTable.PartialMode)
    def frag(t: (String, Long, java.lang.Long, String)*): DataFrame =
      t.toDF(LakeTable.KeyCol, LakeTable.TsCol, "va", "vb")
    m.upsert(frag(("k1", 1L, 10L, null)), "c1")          // base: a=10
    m.upsert(frag(("k1", 2L, null, "x")), "c2")          // delta: b=x
    m.upsert(frag(("k1", 1L, 11L, null)), "c3")          // delta: EQUAL ts -> later arrival wins
    def st = m.snapshot.select(LakeTable.KeyCol, LakeTable.TsCol, "va", "vb")
      .as[(String, Long, Option[Long], Option[String])].collect().toSet
    // composed across the stack: c3's a=11 beats c1's a=10 at equal
    // fragment time (later delta version = later arrival, same rule as the
    // cow fold's updates-beat-snapshot); b=x; _ts = max fragment time = 2
    assert(st == Set(("k1", 2L, Some(11L), Some("x"))))
    // a delete tombstone kills fragments at version <= its own — including
    // the SAME merge batch's upsert (in-batch deletes win, the cow rule)
    m.merge(frag(("k1", 5L, null, "y")), Seq("k1").toDF(LakeTable.KeyCol), "c4")
    assert(st == Set.empty[(String, Long, Option[Long], Option[String])],
      "the tombstone must kill the whole earlier composition")
    // later fragments compose from scratch — nothing resurrects
    m.upsert(frag(("k1", 6L, 42L, null)), "c5")
    assert(st == Set(("k1", 6L, Some(42L), None)))
    // _pts never leaks to external reads
    assert(!m.snapshot.columns.contains(LakeTable.PtsCol))
    // incremental reads emit COMPOSED visible rows (the partial branch
    // diffs on visible content, so a delta fragment that changes any
    // column re-emits the composed row once)
    val inc = m.incrementalBetween(1L, 3L)
      .select(LakeTable.KeyCol, LakeTable.TsCol, "va", "vb")
      .as[(String, Long, Option[Long], Option[String])].collect().toSet
    assert(inc == Set(("k1", 2L, Some(11L), Some("x"))),
      s"incremental over partial deltas must emit the composed row: $inc")
    assert(!m.incrementalBetween(1L, 3L).columns.contains(LakeTable.PtsCol))
  }

  test("randomized partial equivalence: mor partial == cow partial at every version (3 seeds)") {
    // The r14 gate for folding the `_pts` composition through the stack
    // collapse: any interleaving of fragment upserts, merges-with-deletes
    // and fold points must land on the same per-column winners as the
    // write-time cow fold — at the head AND through time travel.
    def frag(t: Seq[(String, Long, java.lang.Long, String)]): DataFrame =
      t.toDF(LakeTable.KeyCol, LakeTable.TsCol, "va", "vb")
    for (seed <- Seq(7, 21, 42)) {
      val root = tempDir(s"mor-prand$seed-").toString
      val m = new LakeTable(spark, s"$root/mor", numBuckets = 4,
        tableType = LakeTable.MorType, compactAfter = 2,
        mergeMode = LakeTable.PartialMode)
      val c = new LakeTable(spark, s"$root/cow", numBuckets = 4,
        mergeMode = LakeTable.PartialMode)
      val rnd = new scala.util.Random(seed)
      val keyPool = (0 until 10).map(i => s"k$i")
      def someA(): java.lang.Long =
        if (rnd.nextBoolean()) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong)
      def someB(): String = if (rnd.nextBoolean()) null else s"b${rnd.nextInt(100)}"
      var version = 0L
      (0 until 8).foreach { i =>
        val cid = s"b$i"
        val ups = frag(Seq.fill(1 + rnd.nextInt(3))(
          (keyPool(rnd.nextInt(keyPool.size)), rnd.nextInt(6).toLong, someA(), someB())))
        if (rnd.nextInt(3) < 2) { m.upsert(ups, cid); c.upsert(ups, cid) }
        else {
          val dels = Seq.fill(1 + rnd.nextInt(2))(
            keyPool(rnd.nextInt(keyPool.size))).toDF(LakeTable.KeyCol)
          m.merge(ups, dels, cid); c.merge(ups, dels, cid)
        }
        version += 1
        def st(t: LakeTable) = t.snapshot
          .select(LakeTable.KeyCol, LakeTable.TsCol, "va", "vb")
          .as[(String, Long, Option[Long], Option[String])].collect().toSet
        assert(st(m) == st(c), s"seed=$seed diverged after batch $i")
      }
      (1L to version).foreach { v =>
        def at(t: LakeTable) = t.snapshotAt(v)
          .select(LakeTable.KeyCol, LakeTable.TsCol, "va", "vb")
          .as[(String, Long, Option[Long], Option[String])].collect().toSet
        assert(at(m) == at(c), s"seed=$seed time travel diverged at v$v")
      }
    }
  }

  test("read-optimized view shows fold-time state; equals snapshot once compacted") {
    val root = tempDir("mor-").toString
    val m = mor(root, compactAfter = 10) // high cadence: no inline folds
    m.bulkInsert(rows(("a", 1L, "a1"), ("b", 1L, "b1"))) // base (v1)
    m.upsert(rows(("a", 2L, "a2"), ("c", 1L, "c1")))     // delta (v2)
    def ro = m.snapshotReadOptimized
      .select(LakeTable.KeyCol, "payload").as[(String, String)].collect().toSet
    // ro = base only: a's update and c's insert are invisible, no stale dupes
    assert(ro == Set(("a", "a1"), ("b", "b1")))
    assert(state(m).map(r => (r._1, r._3)) == Set(("a", "a2"), ("b", "b1"), ("c", "c1")))
    m.compact()
    assert(ro == Set(("a", "a2"), ("b", "b1"), ("c", "c1")), "post-fold ro == snapshot")
  }
}
