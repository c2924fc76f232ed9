package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Regression guards on the PLAN SHAPES the 100 TB story depends on —
  * these properties were verified by hand with `.explain("formatted")`
  * (VERDICT r4/r5 plan audits); this suite pins them so a refactor can't
  * silently reintroduce a full scan, a shuffle, or a lost pushdown.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def embs = graft.Tables.load(spark, sfDir, "embeddings")

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  private def shuffles(plan: SparkPlan): Seq[ShuffleExchangeExec] =
    plan.collect { case e: ShuffleExchangeExec => e }

  private def queryVec: Seq[Double] =
    embs.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("exact topK is TakeOrderedAndProject — no shuffle of the corpus") {
    val plan = Similarity.topK(embs, queryVec, 10).queryExecution.sparkPlan
    assert(plan.collectFirst { case t: TakeOrderedAndProjectExec => t }.isDefined,
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(shuffles(plan).isEmpty, s"exact top-k must not shuffle the corpus:\n$plan")
  }

  test("bandedIndex is one narrow pass — no shuffle, and codegen covers the signature") {
    val df = Similarity.bandedIndex(embs, Similarity.planes(16, 64))
    assert(shuffles(df.queryExecution.sparkPlan).isEmpty)
    // the signature expression participates in whole-stage codegen
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(
      codegenStages.exists(_.toString.contains("plane_signature")),
      s"signature pass must stay inside whole-stage codegen:\n${df.queryExecution.executedPlan}")
  }

  test("annTopKIndexed prunes the stored index to the probed (band, bh) dirs and reads ids only") {
    val ps = Similarity.planes(16, 64)
    val idxDir = tempDir("plan-ann").resolve("idx").toString
    Similarity.writeAnnIndex(embs, idxDir, ps)
    val probe = Similarity.annTopKIndexed(embs, idxDir, queryVec, 10, ps)
    val idxScans = scans(probe).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("plan-ann")))
    assert(idxScans.nonEmpty, "expected a scan of the stored index")
    idxScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"index scan must carry partition filters (directory pruning): $s")
      assert(s.requiredSchema.fieldNames.toSet == Set("vec_id"),
        s"index scan must read only ids, got ${s.requiredSchema.fieldNames.toSeq}")
    }
  }

  test("ivfTopKIndexed prunes the stored assignment to the probed centroid dirs") {
    val cents = Similarity.ivfCentroids(embs, 8)
    val idxDir = tempDir("plan-ivf").resolve("idx").toString
    Similarity.writeIvfIndex(embs, idxDir, cents)
    val probe = Similarity.ivfTopKIndexed(embs, idxDir, queryVec, 10, cents, nProbe = 2)
    val idxScans = scans(probe).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("plan-ivf")))
    assert(idxScans.nonEmpty && idxScans.forall(_.partitionFilters.nonEmpty),
      "assignment scan must carry centroid partition filters")
  }

  test("jaccardPairs df cap: the _df filter sits BELOW the shingle self-join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val plan = DedupDocs.jaccardPairs(docs, maxDf = 100).queryExecution.optimizedPlan
    def hasDfFilter(p: LogicalPlan): Boolean = p.collectFirst {
      case f: Filter if f.condition.references.exists(_.name == "_df") => f
    }.isDefined
    // The cap must prune hot shingles before the df² blow-up: some join in
    // the optimized plan must carry the _df filter in BOTH input subtrees
    // (the shingle self-join), not above the join output.
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"expected joins in:\n$plan")
    assert(joins.exists(j => hasDfFilter(j.left) && hasDfFilter(j.right)),
      s"_df cap must filter below both sides of the shingle self-join:\n$plan")
  }

  test("cdc-lake snapshot read: filter + projection reach the parquet scan (VERDICT r8 #1)") {
    import org.apache.spark.sql.sources.{GreaterThan, EqualTo}
    val dir = tempDir("plan-lake").resolve("t").toString
    val lt = new graft.lake.LakeTable(spark, dir, numBuckets = 4)
    lt.upsert(
      Seq(("a", 1L, 10, "x"), ("b", 1L, 20, "y"), ("c", 1L, 30, "z"))
        .toDF("_key", "_ts", "amount", "payload"))

    // Outer v1 plan: the relation reports the filter handled (pushed).
    val df = spark.read.format("cdc-lake").option("path", dir).load()
      .filter($"amount" > 15).select("_key", "amount")
    val rowScan = df.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(rowScan.isDefined, s"expected RowDataSourceScanExec in:\n${df.queryExecution.sparkPlan}")
    assert(rowScan.get.handledFilters.nonEmpty,
      s"relation must handle the pushed filter, got: ${rowScan.get}")
    assert(df.as[(String, Int)].collect().sorted.toSeq == Seq(("b", 20), ("c", 30)))

    // Inner scan plan: the filter reaches the parquet scan (dataFilters
    // non-empty) and the ReadSchema is pruned to the projection.
    val rel = new graft.sources.LakeSnapshotRelation(
      spark.sqlContext, Map("path" -> dir, "buckets" -> "4"))
    val inner = rel.scanPlan(Array("_key", "amount"), Array(GreaterThan("amount", 15)))
    val s = scans(inner).head
    assert(s.dataFilters.nonEmpty, s"filter must reach the lake parquet scan: $s")
    assert(s.requiredSchema.fieldNames.toSet == Set("_key", "amount"),
      s"projection must prune the lake scan schema, got ${s.requiredSchema.fieldNames.toSeq}")

    // EqualTo(_key) routes through bucket+bloom lookup: the scan opens a
    // strict subset of the table's bucket dirs.
    val keyed = rel.scanPlan(Array("_key", "payload"), Array(EqualTo("_key", "a")))
    val keyedScans = scans(keyed)
    assert(keyedScans.nonEmpty)
    val openedDirs = keyedScans.flatMap(_.relation.location.rootPaths).distinct
    assert(openedDirs.size < 4,
      s"_key equality must bucket-prune the lookup, opened: $openedDirs")
    assert(keyed.select("payload").as[String].collect().toSeq == Seq("x"))
  }

  test("cdc-lake partitioned read: partition equality opens only matching dirs") {
    import org.apache.spark.sql.sources.EqualTo
    val dir = tempDir("plan-plake").resolve("t").toString
    val pt = new graft.lake.PartitionedLakeTable(spark, dir, "day", numBuckets = 2)
    pt.upsert(
      Seq(("a", 1L, "d1", "x"), ("b", 1L, "d2", "y"), ("c", 1L, "d3", "z"))
        .toDF("_key", "_ts", "day", "payload"))
    val rel = new graft.sources.LakeSnapshotRelation(
      spark.sqlContext, Map("path" -> dir, "buckets" -> "2"))
    val pruned = rel.scanPlan(Array("_key", "day"), Array(EqualTo("day", "d2")))
    val opened = scans(pruned).flatMap(_.relation.location.rootPaths).map(_.toString)
    assert(opened.nonEmpty && opened.forall(_.contains("p=d2")),
      s"partition equality must open only p=d2 dirs, opened: ${opened.mkString(", ")}")
    assert(pruned.select("_key").as[String].collect().toSeq == Seq("b"))
    // a no-match partition value yields an empty, schema-stable frame
    val none = rel.scanPlan(Array("_key"), Array(EqualTo("day", "zzz")))
    assert(none.count() == 0 && none.columns.toSeq == Seq("_key"))
  }

  test("predicate and projection push into the base parquet scan") {
    val df = graft.Tables.load(spark, sfDir, "lineitem")
      .filter($"l_quantity" > 40).select("l_orderkey", "l_quantity")
    val s = scans(df).head
    assert(s.dataFilters.nonEmpty, "filter must reach the scan")
    assert(s.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"),
      s"projection must prune the scan schema, got ${s.requiredSchema.fieldNames.toSeq}")
  }

  test("cdc-lake partitioned read: typed partition values are not string-routed") {
    import org.apache.spark.sql.sources.EqualTo
    // A TIMESTAMP partition column: dirs are Spark's cast-to-string
    // ('2024-01-02 00:00:00'), but a pushed Timestamp literal's Java
    // toString is '2024-01-02 00:00:00.0' — routing on it would prune the
    // matching dir away and silently return nothing (r9 review). Typed
    // values must fall through to the full scan + filter.
    val dir = tempDir("plan-plake-ts").resolve("t").toString
    val pt = new graft.lake.PartitionedLakeTable(spark, dir, "day", numBuckets = 2)
    val d1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val d2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    pt.upsert(Seq(("a", 1L, d1, "x"), ("b", 1L, d2, "y"))
      .toDF("_key", "_ts", "day", "payload"))
    val rel = new graft.sources.LakeSnapshotRelation(
      spark.sqlContext, Map("path" -> dir, "buckets" -> "2"))
    val got = rel.scanPlan(Array("_key", "payload"), Array(EqualTo("day", d2)))
    assert(got.select("_key").as[String].collect().toSeq == Seq("b"),
      "typed partition equality must still find its rows via the full scan")
  }

  test("cdc-lake relation pins its version: routed reads agree with the full scan under a concurrent commit") {
    import org.apache.spark.sql.sources.EqualTo
    val dir = tempDir("plan-lake-pin").resolve("t").toString
    val lt = new graft.lake.LakeTable(spark, dir, numBuckets = 2)
    lt.upsert(Seq(("a", 1L, "v1")).toDF("_key", "_ts", "payload"))
    val rel = new graft.sources.LakeSnapshotRelation(
      spark.sqlContext, Map("path" -> dir, "buckets" -> "2"))
    val full = rel.scanPlan(Array("payload"), Array.empty) // resolves + pins v1
    assert(full.as[String].collect().toSeq == Seq("v1"))
    lt.upsert(Seq(("a", 2L, "v2")).toDF("_key", "_ts", "payload")) // concurrent commit
    // The bucket+bloom routed read built AFTER the commit must still see
    // the relation's pinned version, not v2 — one relation, one version.
    val keyed = rel.scanPlan(Array("payload"), Array(EqualTo("_key", "a")))
    assert(keyed.as[String].collect().toSeq == Seq("v1"),
      "routed read must resolve the relation's pinned version")
    // A fresh relation sees the new commit.
    val rel2 = new graft.sources.LakeSnapshotRelation(
      spark.sqlContext, Map("path" -> dir, "buckets" -> "2"))
    assert(rel2.scanPlan(Array("payload"), Array(EqualTo("_key", "a")))
      .as[String].collect().toSeq == Seq("v2"))
  }

  test("capPerGroup gets the WindowGroupLimit partial top-n rewrite") {
    // The cap must push a per-task partial limit BELOW the group exchange
    // — otherwise a hot domain ships its whole population into one window
    // partition (the non-scalable shape).
    val d = graft.Tables.load(spark, sfDir, "documents")
    val plan = Sampling.capPerGroup(d, "source", 15, "doc_id")
      .queryExecution.sparkPlan
    val limits = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.exists(_.mode == org.apache.spark.sql.execution.window.Partial),
      s"expected a Partial WindowGroupLimit below the exchange in:\n$plan")
  }

  test("span ops never shuffle text: every exchange payload is numeric-only") {
    // The span string is projected to its 8-byte fingerprint in the scan
    // stage; a refactor that lets gram/text STRINGS cross an exchange
    // reintroduces the widest shuffle payload in the engine (r8 q28
    // lesson, pre-hashing).
    val d = graft.Tables.load(spark, sfDir, "documents")
    for (df <- Seq(
        DedupDocs.spanStats(d),
        DedupDocs.contaminationAgainst(
          d.filter($"doc_id" % 50 =!= 0), d.filter($"doc_id" % 50 === 0)))) {
      val stringShuffles = shuffles(df.queryExecution.sparkPlan).filter(
        _.child.output.exists(_.dataType == org.apache.spark.sql.types.StringType))
      assert(stringShuffles.isEmpty,
        s"span-op exchanges must carry fingerprints, not strings:\n$stringShuffles")
    }
  }

  test("image near-dup exchanges carry signatures, never image bytes") {
    // The q90 shape: render → dHash (narrow, per-partition codec work) →
    // banded pairs. Every exchange must carry only ids/bands/hashes —
    // a refactor that lets the binary payload (or any string) cross a
    // shuffle ships the images themselves (the widest possible payload).
    val ids = (0L until 40L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 32, 32).toDF("doc_id", "payload")
    val sigs = Multimodal.dHashImagesBatched(base).toDF("doc_id", "decoded", "dhash")
    val pairs = DedupDocs.hammingNearDupPairs(sigs, "doc_id", "dhash", 64, 8)
    val wide = shuffles(pairs.queryExecution.sparkPlan).filter(_.child.output.exists(a =>
      a.dataType == org.apache.spark.sql.types.BinaryType ||
        a.dataType == org.apache.spark.sql.types.StringType))
    assert(wide.isEmpty,
      s"image near-dup exchanges must carry only numeric signatures:\n$wide")
    // Single evaluation of the signature pipeline (r13 verdict): after
    // exchange reuse, the decode mapPartitions must appear exactly ONCE —
    // the r13 shape joined candidates back to `sigs` for the verify,
    // paying a second full image decode (the dominant stage at scale).
    // Both self-join sides share one pinned (band, bh) exchange, so
    // ReuseExchange collapses them; counted on the non-AQE executedPlan
    // (AdaptiveSparkPlanExec hides its tree from collect).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p2 = DedupDocs.hammingNearDupPairs(sigs, "doc_id", "dhash", 64, 8)
      val plan = p2.queryExecution.executedPlan
      // ONE pipeline evaluation = exactly the render + dHash mapPartitions
      // pair (collect skips subtrees behind ReusedExchange, so a duplicated
      // evaluation would double the count — the r13 shape showed 4)
      val decodes = plan.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
      }
      assert(decodes.size == 2,
        s"expected one render+decode pipeline evaluation (2 mapPartitions), " +
          s"found ${decodes.size}:\n$plan")
      // and the second self-join side must REUSE the banded exchange,
      // not recompute it
      assert(plan.collect {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
        }.nonEmpty,
        s"the y side of the self-join must reuse the banded exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("keypoint shared-sig pairs: numeric-only shuffles, one decode pipeline, reused sig exchange") {
    // The q96 shape: render → keypoint hashes (narrow codec work) →
    // inverted-index self-join on the signature value. Same contracts as
    // the hamming family: image bytes never cross an exchange, and the
    // pinned sig exchange is evaluated once (both self-join sides reuse
    // it), so the decode+keypoint pass — the dominant stage — runs ONCE.
    val ids = (0L until 30L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 32, 32).toDF("doc_id", "payload")
    val sigs = Multimodal.keypointHashImagesBatched(base)
      .toDF("doc_id", "decoded", "sigs")
      .select($"doc_id", explode($"sigs").as("sig"))
    val pairs = DedupDocs.sharedSigPairs(sigs, "doc_id", "sig", 2)
    val wide = shuffles(pairs.queryExecution.sparkPlan).filter(_.child.output.exists(a =>
      a.dataType == org.apache.spark.sql.types.BinaryType ||
        a.dataType == org.apache.spark.sql.types.StringType))
    assert(wide.isEmpty,
      s"shared-sig exchanges must carry only ids and signatures:\n$wide")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = DedupDocs.sharedSigPairs(sigs, "doc_id", "sig", 2)
        .queryExecution.executedPlan
      val decodes = plan.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
      }
      assert(decodes.size == 2,
        s"expected one render+keypoint pipeline evaluation (2 mapPartitions), " +
          s"found ${decodes.size}:\n$plan")
      assert(plan.collect {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
        }.nonEmpty,
        s"the y side of the sig self-join must reuse the pinned exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("wide hamming pairs: one pipeline evaluation, reused banded exchange, numeric-only shuffles") {
    // The q95 shape: dHash8 families through the multi-word banding.
    // Same single-evaluation contract as the 64-bit operator — both
    // self-join sides share the one pinned (band, bh) exchange and the
    // verify reads carried sig words at the join, so the decode
    // mapPartitions pair appears exactly once after ReuseExchange.
    val ids = (0L until 30L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 32, 32).toDF("doc_id", "payload")
    def sigsOf(df: org.apache.spark.sql.DataFrame) =
      Multimodal.dHash8ImagesBatched(df).toDF("doc_id", "decoded", "hhashes", "vhashes")
        .select($"doc_id", posexplode(arrays_zip($"hhashes", $"vhashes")).as(Seq("o", "hv")))
        .select(($"doc_id" * 8 + $"o").as("oid"),
          $"hv.hhashes".as("h1"), $"hv.vhashes".as("h2"))
    val pairs = DedupDocs.hammingNearDupPairsWide(sigsOf(base), "oid", Seq("h1", "h2"), 20)
    val wide = shuffles(pairs.queryExecution.sparkPlan).filter(_.child.output.exists(a =>
      a.dataType == org.apache.spark.sql.types.BinaryType ||
        a.dataType == org.apache.spark.sql.types.StringType))
    assert(wide.isEmpty,
      s"wide-hamming exchanges must carry only numeric signatures:\n$wide")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p2 = DedupDocs.hammingNearDupPairsWide(sigsOf(base), "oid", Seq("h1", "h2"), 20)
      val plan = p2.queryExecution.executedPlan
      val decodes = plan.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
      }
      assert(decodes.size == 2,
        s"expected one render+decode pipeline evaluation (2 mapPartitions), " +
          s"found ${decodes.size}:\n$plan")
      assert(plan.collect {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
        }.nonEmpty,
        s"the y side of the self-join must reuse the banded exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("vocab encode probes the corpus through a broadcast join") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val plan = Vocab.encode(d, Vocab.build(d, size = 20)).queryExecution.sparkPlan
    assert(plan.collectFirst {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.isDefined,
      s"the vocab dimension must broadcast — a shuffle join here reshuffles the corpus:\n$plan")
  }

  test("temperature sampling joins its per-group counts by broadcast") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val plan = Sampling.sqrtTemperatureSample(d, "doc_id", "lang", c = 10.0)
      .queryExecution.sparkPlan
    // The count side is #groups rows: it must broadcast back onto the
    // corpus — a shuffle join here would reshuffle the whole corpus on
    // the group key just to attach one number per group.
    assert(plan.collectFirst {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.isDefined,
      s"per-group counts must broadcast:\n$plan")
    assert(plan.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }.isEmpty,
      s"no sort-merge join in temperature sampling:\n$plan")
  }
}
