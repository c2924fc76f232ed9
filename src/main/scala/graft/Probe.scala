package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Scratch probe main (not part of the driver contract): measures ANN/IVF
  * recall against exact top-k at a given SF dir, for calibrating the
  * recall gates. Run:
  * `sbt "runMain graft.Probe /root/testdata/sf0.01"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
    val qv = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val exact = Similarity.topK(e, qv, 20).select(col("vec_id"), lit(1).as("hit"))
    def recall(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val hits = df.select(col("vec_id")).join(exact, Seq("vec_id"), "left")
        .agg(coalesce(sum(col("hit")), lit(0))).head().getLong(0)
      println(s"[probe] $name hits=$hits/20")
    }
    recall(Similarity.annTopK(e, qv, 20, Similarity.planes(16, 64)), "ann")
    val cents = Similarity.ivfCentroids(e, 16)
    recall(Similarity.ivfTopK(e, qv, 20, cents, nProbe = 4), "ivf nProbe=4")

    // Shingle-fingerprint collision check: since r10 the ENTIRE dedup index
    // space is keyed on xxhash64(shingle) — the inverted-index self-join,
    // the minhash signatures, and the verify sets all consume the
    // fingerprint column DedupDocs.shingles emits. Every hashed metric
    // (jaccard counts, candidate pairing, set intersections) is
    // bit-identical to the string-space metric iff this prints 0.
    val docs = Tables.load(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    // Reuse the production shingler (string form): the previous inline copy
    // crashed on any document shorter than 3 words (sequence(1, 0) DESCENDS
    // in Spark, so element_at(ws, 0) threw) and re-split the text per
    // element_at — exactly the pitfalls DedupDocs' shingler already handles.
    val sh = graft.ops.DedupDocs.shingleStrings(docs).select("shingle").distinct()
    val (nSh, nHash) = {
      val r = sh.agg(
        count(lit(1)).as("n"),
        countDistinct(xxhash64(col("shingle"))).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"[probe] shingle-fingerprint collisions=${nSh - nHash} over $nSh distinct shingles (index space = fingerprints)")
    // Same check for the BIGRAM space (q73 groups on xxhash64(bigram));
    // bigramStrings IS the production path's pre-fingerprint space.
    val bg = graft.ops.TextStats.bigramStrings(docs, "doc_id", "text")
      .select("bg").distinct()
    val (nBg, nBgHash) = {
      val r = bg.agg(
        count(lit(1)).as("n"),
        countDistinct(xxhash64(col("bg"))).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"[probe] bigram-fingerprint collisions=${nBg - nBgHash} over $nBg distinct bigrams (must be 0 for q73)")

    // LSH recall completeness (CLAUDE.md invariant): q28 shares q27's
    // exact-jaccard oracle only while banded-LSH recall is COMPLETE at both
    // oracle scales under the production parameters (n=3, 64 hashes, 16
    // bands, maxDf=100 — mirror OpsQueries.JaccardMaxDf). Any change to the
    // shingle/fingerprint space or seeds must re-run this at sf0.01 AND
    // sf0.1 and see missed=0.
    val exactPairs = graft.ops.DedupDocs.jaccardPairs(docs, maxDf = 100)
      .select(col("d1"), col("d2"))
    val lshPairs = graft.ops.DedupDocs.minhashVerifiedPairs(docs, maxDf = 100)
      .select(col("d1"), col("d2"))
    val missed = exactPairs.join(lshPairs, Seq("d1", "d2"), "left_anti").count()
    val total = exactPairs.count()
    println(s"[probe] LSH recall: missed=$missed of $total exact >=0.5-jaccard pairs (must be 0)")

    // q76 calibration: IVF probed recall on the SYNTHETIC clustered
    // corpus (the in-query corpus q76 generates — same formula), with
    // k-means-refined centroids vs raw hash seeds. The gate is >= 14/20;
    // a healthy build recovers ~20/20 refined. Margin printed here so a
    // gate trip can be attributed (geometry vs host) without editing the
    // query.
    val dim = 32
    val nClusters = 16
    val synth = spark.range(0, 4000).toDF("vec_id")
      .withColumn("embedding",
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)), j =>
            (when(j === (col("vec_id") % nClusters).cast("int") * 2, lit(1.0))
              .otherwise(lit(0.0))
              + (pmod(xxhash64(col("vec_id"), j), lit(1000)).cast("double")
                  / lit(500.0) - lit(1.0)) * lit(0.05)).cast("float")))
      .repartition(8)
    val sqv = Seq.tabulate(dim)(j => if (j == 6) 1.0 else 0.0)
    val sExact = Similarity.topK(synth, sqv, 20).select(col("vec_id"), lit(1).as("hit"))
    def synthHits(cents: Array[Array[Double]], name: String, nProbe: Int): Unit = {
      val h = Similarity.ivfTopK(synth, sqv, 20, cents, nProbe = nProbe)
        .select(col("vec_id")).join(sExact, Seq("vec_id"), "left")
        .agg(coalesce(sum(col("hit")), lit(0))).head().getLong(0)
      println(s"[probe] q76 clustered-IVF $name nProbe=$nProbe hits=$h/20 (gate >= 14)")
    }
    val km = Similarity.ivfCentroidsKMeans(synth, nClusters, iters = 3)
    val hs = Similarity.ivfCentroids(synth, nClusters)
    synthHits(km, "kmeans(3)", 4)
    synthHits(hs, "hash-seeds", 4)
    synthHits(km, "kmeans(3)", 1)
    synthHits(hs, "hash-seeds", 1)
    spark.stop()
  }
}
