package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration probe for the image near-dup query (run manually, like
  * [[Probe]]): renders the synthetic corpus + resized copies at a given
  * sf dir's doc_id set, then reports the planted-pair dHash distance
  * distribution and the minimum cross-pair distance — the numbers that
  * justify the query's maxHamming gate. Usage:
  * `sbt "runMain graft.ProbeImg /root/testdata/sf0.01"`.
  */
object ProbeImg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ids = Tables.load(spark, args(0), "documents").select("doc_id")
      .repartition(spark.sparkContext.defaultParallelism)
    val base = ops.Multimodal.renderSyntheticImages(ids, 64, 64)
      .toDF("doc_id", "payload")
    val copies = ops.Multimodal.resizeImagesBatched(
      base.filter($"doc_id" % 5 === 0), 48, 48)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"payload")
    val all = base.unionByName(copies)
    val sigs = ops.Multimodal.dHashImagesBatched(all)
      .toDF("doc_id", "decoded", "dhash").cache()
    require(sigs.filter(!$"decoded").count() == 0, "all payloads must decode")

    val planted = sigs.as("a").join(
        sigs.as("b"), col("a.doc_id") + 1000000L === col("b.doc_id"))
      .select(graft.ops.TextStats.hamming(col("a.dhash"), col("b.dhash")).as("d"))
    println("planted pair distances: " + planted.groupBy("d").count()
      .orderBy("d").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))

    // cross pairs: exclude the planted mapping
    val cross = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          col("a.doc_id") + 1000000L =!= col("b.doc_id"))
      .select(graft.ops.TextStats.hamming(col("a.dhash"), col("b.dhash")).as("d"))
    println("min cross distance: " + cross.agg(min("d")).collect()(0).get(0))
    println("cross pairs under 16: " + cross.filter($"d" <= 16).count())
    spark.stop()
  }
}
