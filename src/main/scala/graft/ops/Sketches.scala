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

  /** Fixed-bin integer HISTOGRAM sketches (r15) — the quantile
    * counterpart of [[distinctSketches]]: percentiles do not decompose
    * either (p95-per-day cannot be combined into p95-per-month), so any
    * new reporting window re-scans raw data. A fixed-bin histogram
    * DOES decompose — merging is element-wise integer addition, exact,
    * associative, commutative — at the cost of quantiles resolved to
    * bin granularity (the caller picks `binWidth` = the error bound;
    * DataSketches KLL would bound RANK error instead, but Spark ships no
    * mergeable KLL aggregate and a fixed grid keeps every step exact
    * integer arithmetic, hence SQL-oracle-able end to end).
    *
    * One `bins` map (bin index → count) per (groupCols, bucketCol) cell,
    * at most `nBins` entries (the persistable unit, kilobytes). Values
    * clamp into the edge bins (bin 0 / bin nBins-1), so out-of-range
    * values are COUNTED, never dropped — rank queries stay exact even
    * when the grid misjudged the range; nulls are skipped. Two-phase
    * shape: a (cell, bin) count — map-side combinable, at most
    * #cells × nBins rows into the exchange — then an nBins-bounded
    * map_from_entries per cell.
    */
  def histSketches(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: String,
      valueCol: String,
      lo: Double,
      binWidth: Double,
      nBins: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(nBins > 1, s"nBins must exceed 1: $nBins")
    val keys = groupCols :+ bucketCol
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(binWidth)),
        lit(0.0)), lit((nBins - 1).toDouble)).cast("int").as("bin")
    df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(sort_array(collect_list(struct(col("bin"), col("n")))))
        .as("bins"))
  }

  /** Roll histogram sketches up to `groupCols`, dropping the bucket
    * dimension: element-wise integer bin addition (exact — the rolled-up
    * histogram EQUALS a direct histogram of the union). Input is #cells
    * sketch rows; the raw corpus is never re-touched.
    */
  def rollupHist(
      sketches: DataFrame,
      groupCols: Seq[String],
      binsCol: String = "bins"): DataFrame =
    sketches
      .select((groupCols.map(col) :+ explode(col(binsCol)).as(Seq("bin", "n"))): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(sort_array(collect_list(struct(col("bin"), col("n")))))
        .as("bins"))

  /** Quantile BINS from histogram sketches: for each q, the lowest bin
    * whose cumulative count reaches `ceil(q * total)` — the classic
    * histogram rank query, exact integer arithmetic over the bins (the
    * only doubles are `q * total`, exact below 2^53, and its ceil — both
    * engine-portable bit for bit, which is what lets a DuckDB oracle
    * re-derive identical bins from raw data). Emits one `p<q>_bin`
    * column per requested quantile (BIGINT); the value-space edge is
    * `lo + (bin + 1) * binWidth`, left to the caller so the sketch
    * output stays integer-exact.
    */
  def histQuantiles(
      hists: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      binsCol: String = "bins"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs in (0, 1]: $qs")
    // Each window partition holds <= nBins rows (one per histogram bin —
    // a fixed sketch parameter, never data-sized); with empty groupCols
    // this is the deliberate source of Spark's "WindowExec: No Partition
    // Defined" warning in Verify — bounded by nBins, not a scale bug.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = hists
      .select((groupCols.map(col) :+ explode(col(binsCol)).as(Seq("bin", "n"))): _*)
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(wAll))
    // Name from the EXACT q, decimal point as underscore (p99_9_bin for
    // q=0.999) — a rounded percent would collide distinct quantiles into
    // one duplicate column name (code-review r15: round(0.999*100) ==
    // round(1.0*100)) and surface only later as an ambiguous-reference
    // error in the caller's select.
    def qName(q: Double): String = "p" + java.math.BigDecimal.valueOf(q)
      .multiply(java.math.BigDecimal.valueOf(100L)).stripTrailingZeros()
      .toPlainString.replace('.', '_') + "_bin"
    val names = qs.map(qName)
    require(names.distinct.size == names.size, s"duplicate quantile names: $names")
    val aggs = qs.zip(names).map { case (q, name) =>
      min(when(col("cum") >= ceil(lit(q) * col("total")).cast("long"),
        col("bin").cast("long"))).as(name)
    }
    cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
