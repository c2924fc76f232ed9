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

    // Shingle-hash collision check: the dedup verify joins compare
    // xxhash64(shingle) sets (DedupDocs.shingleHash); the hashed metric is
    // bit-identical to the string-set metric iff this prints 0.
    val docs = Tables.load(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    // Reuse the production shingler: the previous inline copy crashed on
    // any document shorter than 3 words (sequence(1, 0) DESCENDS in Spark,
    // so element_at(ws, 0) threw) and re-split the text per element_at —
    // exactly the pitfalls DedupDocs.shingles already handles.
    val sh = graft.ops.DedupDocs.shingles(docs).select("shingle").distinct()
    val (nSh, nHash) = {
      val r = sh.agg(
        count(lit(1)).as("n"),
        countDistinct(xxhash64(col("shingle"))).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"[probe] shingle-hash collisions=${nSh - nHash} over $nSh distinct shingles")
    spark.stop()
  }
}
