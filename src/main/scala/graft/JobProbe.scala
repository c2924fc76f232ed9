package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, PartitionedLakeTable}
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        println("JOB: " + j.stageInfos.map(_.name).mkString(" | ").take(200))
    })
    val root = java.nio.file.Files.createTempDirectory("jobprobe-").toString
    val pt = new PartitionedLakeTable(spark, s"$root/part", "p", numBuckets = 4)
    pt.bulkInsert(spark.range(0, 20000L, 1, 8).select(
      concat(lit("k"), col("id")).as(LakeTable.KeyCol),
      lit(1L).as(LakeTable.TsCol),
      concat(lit("p"), pmod(col("id"), lit(8))).as("p"),
      col("id").as("payload")))
    val keys = spark.range(0, 2000L, 1, 8)
      .select(concat(lit("k"), col("id")).as(LakeTable.KeyCol))
    println("=== PROBE START ===")
    pt.probeKeys(keys).count()
    println("=== PROBE END ===")
    spark.stop()
  }
}
