package graft.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}

/** Look-ahead pull iterator — the reference's utility wrapper over a
  * pull-based record reader (`/root/reference/src/main/java/tech/odes/
  * common/util/ParquetReaderIterator.java:28-72`): adapts a `read()` that
  * returns null at end-of-stream into a standard `Iterator` with
  * IDEMPOTENT `hasNext` (repeated calls consume nothing) and
  * next-before-hasNext support. Generic over the source; pair with
  * [[ParquetRows.iterator]] for the parquet case.
  */
final class PullIterator[T >: Null <: AnyRef](read: () => T) extends Iterator[T] {
  private var pending: T = null

  override def hasNext: Boolean = {
    if (pending == null) pending = read()
    pending != null
  }

  override def next(): T = {
    if (!hasNext) throw new NoSuchElementException("no more records left to read")
    val r = pending
    pending = null
    r
  }
}

/** Row-level pull iteration over parquet — the Spark-first shape of the
  * reference's driver-side parquet-mr reader: the scan itself stays
  * Spark's vectorized distributed reader, and rows stream to the caller
  * one partition at a time (`toLocalIterator` — never the whole table on
  * the driver). For data-path work prefer operating on the DataFrame;
  * this exists for the genuinely-sequential consumers the reference's
  * iterator served (schema probes, spot checks, export trickles).
  */
object ParquetRows {
  def iterator(spark: SparkSession, paths: String*): Iterator[Row] =
    spark.read.parquet(paths: _*).toLocalIterator().asScala
}
