package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-amplification probe (test-scope scratch main, not driver
  * contract): load a table with N rows, apply K tiny upsert batches, and
  * report bytes written under `data/` beyond the initial load — cow vs
  * mor. Run:
  * `sbt "Test/runMain graft.lake.MorWriteAmpProbe"`.
  * Numbers go to BASELINE.md (r11 MOR section).
  */
object MorWriteAmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 200000
    val batches = 8
    val batchRows = 100
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    def run(tableType: String): (Long, Long, Double) = {
      val root = java.nio.file.Files.createTempDirectory(s"amp-$tableType-").toString
      val t = new LakeTable(spark, root, numBuckets = 16,
        bloomOnWrite = false, tableType = tableType, compactAfter = batches + 1)
      val base = spark.range(n).select(
        md5(concat_ws("_", lit("k"), col("id"))).as(LakeTable.KeyCol),
        lit(1L).as(LakeTable.TsCol),
        col("id"), md5(col("id").cast("string")).as("payload"))
      t.bulkInsert(base, commitId = "load")
      val loaded = dirBytes(s"$root/${LakeTable.DataDirName}")
      (1 to batches).foreach { i =>
        val upd = spark.range(i.toLong * 1000, i.toLong * 1000 + batchRows).select(
          md5(concat_ws("_", lit("k"), col("id"))).as(LakeTable.KeyCol),
          lit(i + 1L).as(LakeTable.TsCol),
          col("id"), md5(concat_ws("u", col("id").cast("string"))).as("payload"))
        t.upsert(upd, commitId = s"b$i")
      }
      val total = dirBytes(s"$root/${LakeTable.DataDirName}")
      val written = total - loaded
      (loaded, written, written.toDouble / batches)
    }
    val (cowLoad, cowW, cowPer) = run(LakeTable.CowType)
    val (morLoad, morW, morPer) = run(LakeTable.MorType)
    println(f"[amp] rows=$n batches=$batches x $batchRows rows")
    println(f"[amp] cow: load=${cowLoad / 1e6}%.1f MB, post-load written=${cowW / 1e6}%.1f MB (${cowPer / 1e3}%.0f KB/batch)")
    println(f"[amp] mor: load=${morLoad / 1e6}%.1f MB, post-load written=${morW / 1e6}%.1f MB (${morPer / 1e3}%.0f KB/batch)")
    println(f"[amp] write-amp ratio cow/mor = ${cowW.toDouble / morW}%.1f x")
    spark.stop()
  }
}
