package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.to_json

/** CDC envelope sources and JSON serialization helpers.
  *
  * The reference consumes a `spark-binlog` MySQL source that emits a
  * one-string-column streaming DataFrame of envelope JSON
  * (`/root/reference/README.md:34-45`); we don't rebuild MySQL I/O
  * (SURVEY.md §2.1 S1) — any streaming source with the same single-column
  * shape plugs into the `cdc-lake` sink. These helpers provide the two
  * common fixtures: a file directory tailer and `MemoryStream` (tests).
  */
object CdcSource {

  /** Stream envelope JSON lines from files appearing under `path`
    * (one envelope per line; column name `value`).
    */
  def jsonDirStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path).toDF(Envelope.ValueCol)

  /** Batch variant of [[jsonDirStream]] (replay an archived raw log —
    * the read side of the `option.keepraw.enable` archival sink).
    * Recursive: the archival sink writes identified batches into
    * `batch=<id>` subdirs (replay-idempotent overwrite), and recursive
    * lookup reads those and flat appends alike as one value column.
    */
  def jsonDirBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").text(path)
      .toDF(Envelope.ValueCol)

  /** JSON-serialize a struct column *keeping null fields* — the
    * reference's `WriteMapNullValue` semantics
    * (`BinlogSyncHoodieCommand.scala:259`): a CDC image that sets a column
    * to NULL must not be dropped from the serialized record, or the merge
    * would silently keep the old value.
    */
  def toJsonKeepNulls(c: Column): Column =
    to_json(c, Map("ignoreNullFields" -> "false"))
}
