package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg` / `hll_union_agg` — codegen'd native
  * aggregates, no UDF).
  *
  * The 100 TB pattern this enables: COUNT(DISTINCT) does not decompose —
  * distinct-per-day cannot be summed into distinct-per-month, so every
  * reporting window re-scans the raw corpus. Sketches decompose: compute
  * one small binary sketch per (group, bucket) ONCE — a single partial
  * agg pass over the data — persist them (kilobytes per bucket), then
  * answer any rollup window by unioning sketches, never re-touching the
  * raw rows. Union is exact over sketches (no added error), so the
  * rollup estimate equals the estimate of a direct sketch of the union.
  */
object Sketches {

  /** One HLL sketch of `keyCol` per (groupCols, bucketCol) cell — the
    * persistable unit. `lgK` trades size for accuracy (2^lgK registers;
    * 12 ≈ 1.6% relative standard error); sketches below ~2^lgK distinct
    * values stay in DataSketches' sparse mode and estimate EXACTLY.
    */
  def distinctSketches(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: String,
      keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy((groupCols :+ bucketCol).map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))

  /** Roll previously-built sketches up to `groupCols`, dropping the
    * bucket dimension: union the binary sketches (map-side combinable —
    * the shuffle carries one sketch per group per partition, not keys)
    * and estimate. Input volume is #cells sketch rows, so a year-over-
    * daily-buckets rollup aggregates 365 rows per group whatever the
    * raw-data volume was.
    */
  def rollupDistinct(
      sketches: DataFrame,
      groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("approx_distinct"))
}
