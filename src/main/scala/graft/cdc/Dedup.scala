package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins dedup (reference operators A1/A2,
  * `/root/reference/src/main/java/org/apache/spark/sql/hudi/commands/BinlogSyncHoodieCommand.scala:260-266`):
  * group records by `_key`, keep the one with the greatest ordering value
  * (the reference sorts each group by envelope timestamp and takes the
  * last — Hudi "precombine" done early, before the table write).
  *
  * Two physical strategies, same semantics:
  *  - [[lww]] — `max_by(struct(row), struct(order))` hash aggregation:
  *    partial-aggregates map-side (each shuffle partition ships at most one
  *    row per key), no sort. The right choice at scale; default.
  *  - [[lwwWindow]] — `row_number()` over a window: shuffle + per-partition
  *    sort. Kept for comparison and for callers that want rank > 1 rows.
  */
object Dedup {

  /** One row per `keyCol`: the row with the lexicographically greatest
    * `(orderCols...)` tuple. Ties beyond `orderCols` are broken arbitrarily —
    * pass a total order (e.g. append a unique column) for determinism.
    */
  def lww(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    val cols = df.columns
    df.groupBy(col(keyCol))
      .agg(max_by(
        struct(cols.map(col).toIndexedSeq: _*),
        struct(orderCols.map(col).toIndexedSeq: _*)).as("_r"))
      .select("_r.*")
  }

  /** Window-based LWW (same result as [[lww]] for a total order). */
  def lwwWindow(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(c => col(c).desc).toIndexedSeq: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
