package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.StreamBatch
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.cdc.CdcSyncCommand

/** Streaming sink registration (reference operators S2/S3,
  * `/root/reference/src/main/java/org/apache/spark/sql/hudi/sources/BinlogHoodieDataSource.scala:24-35`
  * and `BinlogHoodieSink.scala:12-21`): a `DataSourceRegister` shortname so
  * users can `writeStream.format("cdc-lake")`, plus a v1 `Sink` whose
  * `addBatch` hands each micro-batch to [[graft.cdc.CdcSyncCommand]].
  *
  * Registered via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`.
  * Output mode is accepted and ignored — the sink always merges
  * (last-write-wins upsert + delete routing), same as the reference
  * (`README.md:49`, mode stored unused at `BinlogHoodieSink.scala:12-16`).
  * Unlike the reference, `batchId` is propagated for idempotent replay.
  */
class CdcLakeSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = CdcLakeSinkProvider.ShortName

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink =
    new CdcLakeSink(parameters)
}

object CdcLakeSinkProvider {
  val ShortName = "cdc-lake"
}

/** Micro-batch dispatch (ref S3): convert the streaming DF to batch and run
  * the CDC merge command with the batch id.
  */
class CdcLakeSink(parameters: Map[String, String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit =
    CdcSyncCommand.run(StreamBatch.toBatch(data), parameters, batchId)
}
