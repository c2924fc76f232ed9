package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe for the banded dedup/ANN candidate-generation
  * cores (VERDICT r15 #4): the 100 TB claim for these operators rests on
  * plan SHAPE (bucket/band-local pair generation, signature-only
  * shuffles); this probe MEASURES it. It synthesizes corpora of the same
  * shape as `documents`/`embeddings` at 1x/4x/16x the sf0.1 row counts —
  * constant duplicate RATE (1 planted near-dup per 10 rows), constant
  * per-row size, Zipf-ish token head — runs each core to completion
  * through the noop sink, and reports wall/tasks/shuffle bytes per
  * (core, scale) plus the 16x/1x growth factors. A shape that is
  * genuinely row-linear shows ~16x shuffle bytes and pair counts at 16x
  * rows; anything superlinear (an uncapped hot bucket, an accidental
  * cross join) shows up as a >>16 factor long before a cluster run
  * would. Synthetic corpora (not testdata replication) because
  * replicating real docs 16x turns every near-dup pair into a 16-clique
  * — pair counts would grow quadratically BY CONSTRUCTION and mask real
  * regressions.
  *
  * Usage: `sbt "runMain graft.ScaleProbe"` (~2-5 min; prints one JSON
  * line per measurement — record the factors in BASELINE.md, the
  * MorWriteAmpProbe protocol).
  */
object ScaleProbe {
  private val BaseDocs = 5000L // sf0.1 documents.parquet row count
  private val BaseSigs = 5000L

  /** Synthetic documents: ~120 Zipf-ish tokens each; row 10k+9 is a
    * near-dup copy of row 10k+8 (every 29th token mutated), all other
    * rows unrelated. Token stream and mutations are pure column
    * expressions over the id — fully distributed, deterministic, no
    * driver data.
    *
    * Corpus-regime note (measured r16): the Zipf-1 token law
    * (`floor(1/u)`) concentrates mass in a few hot tokens at EVERY
    * scale, so hot-shingle df grows ~n and co-occurrence pair mass
    * grows superlinearly BY CORPUS CONSTRUCTION (the `vocab` cap binds
    * for <0.01% of draws — scaling it is a no-op, verified by identical
    * shuffle bytes at 30k vs 480k caps). jaccard/minhash therefore
    * measure the duplicate-density-GROWING regime, whose documented
    * control is the maxDf cap; the banded signature cores (hamming /
    * sharedsigs / dupgroups) have no such data dependence and measure
    * the pure engine shape. Numbers in BASELINE.md r16.
    */
  private def synthDocs(spark: SparkSession, n: Long, vocab: Long): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val doc = col("doc_id")
    val src = when(doc % 10 === 9, doc - 1).otherwise(doc)
    val tok = (p: org.apache.spark.sql.Column) => {
      val h = when(doc =!= src && p % 29 === 0, xxhash64(doc, p, lit(0x5EED)))
        .otherwise(xxhash64(src, p, lit(0x5EED)))
      val u = (pmod(h, lit(1000000L)).cast("double") + lit(1.0)) / lit(1000001.0)
      concat(lit("t"), least(lit(vocab), floor(pow(u, lit(-1.0))).cast("long")))
    }
    spark.range(0, n, 1, parts).toDF("doc_id")
      .withColumn("text", concat_ws(" ", transform(sequence(lit(0), lit(119)), tok)))
  }

  /** Synthetic 64-bit signatures (the dHash/simhash shape): row 10k+9 is
    * its predecessor's signature with 3 deterministic bits flipped
    * (inside the maxHamming=8 gate), everything else uniform random.
    */
  private def synthSigs(spark: SparkSession, n: Long): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val id = col("id")
    val src = when(id % 10 === 9, id - 1).otherwise(id)
    val base = xxhash64(src, lit(7))
    // dynamic shift amount needs the SQL form (the Scala shiftleft only
    // takes a literal amount)
    val flip = (k: Int) => expr(s"shiftleft(1L, int(pmod(xxhash64(id, $k), 64L)))")
    spark.range(0, n, 1, parts).toDF("id")
      .withColumn("sig",
        when(id =!= src, base.bitwiseXOR(flip(1)).bitwiseXOR(flip(2)).bitwiseXOR(flip(3)))
          .otherwise(base))
  }

  /** Synthetic keypoint-style signature SETS (24 sigs/doc, the q96
    * shape): a planted copy shares 20 of 24 values with its source;
    * unrelated docs share none (64-bit space).
    */
  private def synthSigSets(spark: SparkSession, n: Long): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val id = col("id")
    val src = when(id % 10 === 9, id - 1).otherwise(id)
    spark.range(0, n, 1, parts).toDF("id")
      .withColumn("k", explode(sequence(lit(0), lit(23))))
      .withColumn("sig",
        when(col("k") < 20, xxhash64(src, col("k"), lit(0xCAFE)))
          .otherwise(xxhash64(id, col("k"), lit(0xD00D))))
      .select(col("id"), col("sig"))
  }

  /** Synthetic 64-dim embeddings, components uniform in [-1, 1] derived
    * from `idExpr`: unrelated vectors sit near cosine 0 (sign-bit bands
    * collide at exactly 2^-bandBits per band — the same collision law
    * real embeddings obey), copies are exact.
    */
  private def synthEmb(idExpr: org.apache.spark.sql.Column, seed: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(63)), j =>
      ((pmod(xxhash64(idExpr, j, lit(seed)), lit(2001)).cast("double") / lit(1000.0))
        - lit(1.0)).cast("float"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new org.apache.spark.graft.BenchProbe
    probe.install(spark.sparkContext)

    def measure(op: String, scale: Int, rows: Long)(mk: => DataFrame): Map[String, Long] = {
      probe.harvest(spark.sparkContext) // reset counters
      val t0 = System.nanoTime()
      val df = mk
      df.write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val st = probe.harvest(spark.sparkContext)
      val out = st + ("wall_ms" -> wallMs) + ("rows" -> rows)
      println(s"""{"op":"$op","scale":$scale,""" + Seq(
        "rows", "wall_ms", "tasks", "shuffle_read_b", "shuffle_write_b", "spill_b")
        .map(k => s""""$k":${out(k)}""").mkString(",") + "}")
      out
    }

    val scales = Seq(1, 4, 16)
    val results = scala.collection.mutable.Map[(String, Int), Map[String, Long]]()
    for (s <- scales) {
      val nDocs = BaseDocs * s
      val nSigs = BaseSigs * s
      val docsDf = synthDocs(spark, nDocs, vocab = 30000L * s).persist()
      docsDf.count()
      results(("jaccard", s)) = measure("jaccard", s, nDocs) {
        ops.DedupDocs.jaccardPairs(docsDf, n = 3, num = 1, den = 2, maxDf = 512)
      }
      results(("minhash", s)) = measure("minhash", s, nDocs) {
        ops.DedupDocs.minhashVerifiedPairs(
          docsDf, n = 3, numHashes = 64, bands = 16, num = 1, den = 2, maxDf = 512)
      }
      docsDf.unpersist()
      val sigsDf = synthSigs(spark, nSigs).persist()
      sigsDf.count()
      results(("hamming", s)) = measure("hamming", s, nSigs) {
        ops.DedupDocs.hammingNearDupPairs(sigsDf, "id", "sig", 64, maxHamming = 8)
      }
      results(("dupgroups", s)) = measure("dupgroups", s, nSigs) {
        val pairs = ops.DedupDocs.hammingNearDupPairs(sigsDf, "id", "sig", 64, maxHamming = 8)
        ops.DedupDocs.dupGroups(sigsDf.select(col("id").as("doc_id")), pairs)
      }
      sigsDf.unpersist()
      val setsDf = synthSigSets(spark, nSigs).persist()
      setsDf.count()
      results(("sharedsigs", s)) = measure("sharedsigs", s, nSigs) {
        ops.DedupDocs.sharedSigPairs(setsDf, "id", "sig", minShared = 4, maxBucket = Some(512))
      }
      setsDf.unpersist()

      // Incremental semantic dedup (the q110 ingest shape): a FIXED
      // 2k-vector batch (half exact copies of corpus rows, half fresh)
      // probed against a 1x/4x/16x ANN index. Two measurements split the
      // cost story: `semincr_build` is the per-wave O(wave) index append
      // (here a full build — the worst case), `semincr_probe` is the
      // probe itself. Candidate mass follows batch × bands × n ×
      // 2^-bandBits by the sign-bit collision law, so at FIXED bandBits
      // the probe grows linearly with index occupancy per bucket — the
      // production control is raising planes/bandBits ~log2 with corpus
      // size (recall is per-band independent, so more, narrower bands
      // trade nothing for exact copies). The measurement pins the law.
      val corpusDf = spark.range(0, nSigs, 1, spark.sparkContext.defaultParallelism)
        .toDF("id").withColumn("embedding", synthEmb(col("id"), 0xE3B))
      val idxRoot = java.nio.file.Files.createTempDirectory(s"graft-scaleidx$s-")
      val idxDir = idxRoot.toString + "/idx"
      val ps = ops.Similarity.planes(32, 64)
      results(("semincr_build", s)) = measure("semincr_build", s, nSigs) {
        ops.Similarity.writeAnnIndex(
          corpusDf, idxDir, ps, bandBits = 8, idCol = "id",
          embCol = "embedding", probeLayout = false)
        spark.range(1).toDF("done")
      }
      val batch = spark.range(0, 2000, 1, spark.sparkContext.defaultParallelism).toDF("k")
        .select(
          (col("k") + lit(2000000000L)).as("id"),
          when(col("k") < 1000,
            synthEmb(pmod(xxhash64(col("k"), lit(9)), lit(nSigs)), 0xE3B))
            .otherwise(synthEmb(col("k") + lit(2000000000L), 0xE3B))
            .as("embedding"))
      results(("semincr_probe", s)) = measure("semincr_probe", s, nSigs) {
        ops.Similarity.nearDupsAgainstIndex(
          batch, corpusDf, idxDir, 0.95, ps, bandBits = 8,
          idCol = "id", embCol = "embedding")
      }

      // Persisted appendable IVF (the q114 ingest shape, r20): the
      // centroids are trained once; `ivf_append` assigns a FIXED
      // 2k-vector batch into the 1x/4x/16x index — cost ~ BATCH × k dot
      // products, so wall/shuffle must stay FLAT as the index grows —
      // and `ivf_probe` reads nProbe=4 of 16 centroid dirs, the
      // nProbe/k fraction of the corpus, vs `ivf_exact`'s full brute
      // scan (compare the per-scale lines: probe ≈ exact × nProbe/k at
      // every scale; both grow row-linearly).
      val ivfDir = idxRoot.toString + "/ivf"
      val cents = ops.Similarity.ivfCentroids(
        corpusDf, 16, idCol = "id", embCol = "embedding")
      ops.Similarity.writeIvfIndex(
        corpusDf, ivfDir, cents, idCol = "id", embCol = "embedding")
      results(("ivf_append", s)) = measure("ivf_append", s, nSigs) {
        ops.Similarity.appendToIvfIndex(
          batch, ivfDir, cents, idCol = "id", embCol = "embedding")
        spark.range(1).toDF("done")
      }
      val qv = Seq.tabulate(64)(j => if (j < 2) 1.0 else 0.0)
      results(("ivf_probe", s)) = measure("ivf_probe", s, nSigs) {
        ops.Similarity.ivfTopKIndexed(
          corpusDf, ivfDir, qv, 20, cents, nProbe = 4,
          idCol = "id", embCol = "embedding")
      }
      results(("ivf_exact", s)) = measure("ivf_exact", s, nSigs) {
        ops.Similarity.topK(corpusDf, qv, 20, idCol = "id", embCol = "embedding")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(idxRoot.toFile)
    }
    // growth factors: 16x rows should show ~16x shuffle bytes and wall
    // well under 16^2; print the per-op factor table for BASELINE.md
    for (op <- Seq("jaccard", "minhash", "hamming", "dupgroups", "sharedsigs",
        "semincr_build", "semincr_probe", "ivf_append", "ivf_probe", "ivf_exact")) {
      val a = results((op, 1)); val b = results((op, 16))
      // Locale.ROOT (a comma-decimal default locale would break the JSON
      // line) and JSON null for an undefined ratio
      def f(k: String): String =
        if (a(k) <= 0) "null"
        else String.format(java.util.Locale.ROOT, "%.1f",
          java.lang.Double.valueOf(b(k).toDouble / a(k)))
      println(s"""{"op":"$op","factor16":{"wall":${f("wall_ms")},""" +
        s""""shuffle_write":${f("shuffle_write_b")},"tasks":${f("tasks")}}}""")
    }
    spark.stop()
  }
}
