package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, shaped for the 100 TB case.
  *
  * Both operators are declarative plans (one keyed shuffle for
  * [[asofJoin]], one bucket equi-join for [[rangeJoin]]) — never a
  * cartesian/broadcast-nested-loop, which is what a naive
  * `l.ts >= r.ts` theta-join degenerates to in Spark.
  */
object Temporal {

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTs <= leftTs` (or `< leftTs` when `strict`) within
    * the same `keys` group — the classic point-in-time enrichment
    * (trade→latest-quote, event→latest-dimension-state). Left rows
    * without a qualifying right row keep null right columns (LEFT
    * semantics, like DuckDB `ASOF LEFT JOIN` / pandas `merge_asof`).
    *
    * Plan: tag sides, union, ONE shuffle on `keys`, then a running
    * `last(right payload, ignoreNulls)` over the per-key time-ordered
    * window. Cost is sort-merge on (key, ts) — no range explosion, no
    * per-row probe, and the window frame is running (rows UNBOUNDED
    * PRECEDING..CURRENT), which Spark evaluates in one streaming pass
    * per key. At equal timestamps the right row is visible to the left
    * row iff `strict` is false (side ordering encodes the bound).
    *
    * Contract: `right` shares ONLY `keys` with `left`'s column set;
    * `rightTs` must not collide with a left column. Right rows with a
    * duplicate (keys, rightTs) should be pre-deduplicated by the caller
    * (e.g. `max_by` on a tiebreak column) — otherwise which duplicate
    * wins follows the union's internal order, which is not
    * deterministic across runs.
    *
    * `toleranceMicros`: when set, a match older than the tolerance
    * (leftTs - rightTs > tolerance, in the ts columns' own unit) is
    * nulled out — pandas `merge_asof(tolerance=...)`.
    *
    * Scale notes: the shuffle is keyed, so a pathological single hot
    * key serializes in one task's sort — the standard fix (coarse
    * time-slice the key and carry the last right row of slice N into
    * slice N+1) is a two-pass variant worth adding only when a real
    * corpus needs it. Skewed-but-plural keys are handled by AQE.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      strict: Boolean = false,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    require(rPayload.contains(rightTs), s"right must contain ts column '$rightTs'")
    val overlap = rPayload.toSet.intersect(left.columns.toSet)
    require(
      overlap.isEmpty,
      s"right non-key columns collide with left: ${overlap.mkString(",")} — rename before joining")

    val side = "_graft_side" // 0 = right, 1 = left
    val ats = "_graft_ats"
    val rStruct = "_graft_r"
    // At equal ts: inclusive ⇒ right sorts BEFORE left (visible);
    // strict ⇒ right sorts AFTER left (invisible).
    val lTagged = left
      .withColumn(ats, col(leftTs))
      .withColumn(side, lit(if (strict) 0 else 1))
    val rTagged = right
      .withColumn(ats, col(rightTs))
      .withColumn(side, lit(if (strict) 1 else 0))
      // struct() is never null, so wrap per-side: left rows carry a NULL
      // payload struct for last(ignoreNulls) to skip.
      .withColumn(rStruct, struct(rPayload.map(col): _*))
      .drop(rPayload: _*)
    val isLeft = if (strict) col(side) === 0 else col(side) === 1

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ats).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = lTagged
      .unionByName(rTagged, allowMissingColumns = true)
      .withColumn(rStruct, last(col(rStruct), ignoreNulls = true).over(w))
      .where(isLeft)
    val bounded = toleranceMicros match {
      case Some(tol) =>
        joined.withColumn(
          rStruct,
          when(col(leftTs) - col(rStruct).getField(rightTs) <= tol, col(rStruct)))
      case None => joined
    }
    bounded.select(
      left.columns.map(col) ++ rPayload.map(c => col(rStruct).getField(c).as(c)): _*)
  }

  /** Range (interval-containment) join with NO equi key: every left
    * point row against every right interval `[startCol, endCol)` that
    * contains `pointCol`. Spark plans a raw `p >= s AND p < e` join as
    * BroadcastNestedLoopJoin (or cartesian) — fine for dozens of
    * intervals, catastrophic for millions.
    *
    * Plan: quantize the axis into `bucketWidth`-sized cells. Each
    * interval explodes to the cells it covers; each point keys by the
    * ONE cell containing it; an equi-join on the cell plus the exact
    * containment predicate finishes the job. A (point, interval) pair
    * can only meet in the point's own cell, so the join is
    * duplicate-free by construction — no distinct needed.
    *
    * Cost: shuffle = |points| + Σ ceil(len/bucketWidth) exploded
    * interval rows, both on 8-byte cell keys. Pick `bucketWidth` near
    * the median interval length (explosion factor ~2); a hot cell
    * (burst of points under a long interval) is an AQE skew-join case.
    * Empty intervals (end <= start) match nothing and are dropped.
    * When the interval side is small enough to broadcast, the join is
    * narrow and probe parallelism follows the POINTS side's
    * partitioning — spread a single-split scan upstream first.
    *
    * Column contract: left and right column sets must be disjoint;
    * all three bound columns are LONGs in the same unit.
    */
  /** `broadcastIntervals = true` pins a broadcast of the exploded
    * interval side instead of leaving the choice to AQE — measured
    * bistable on q82 (13 MB-shuffle broadcast plan vs 51 MB shuffle-join
    * plan, 3× the cpu) because the exploded side's size estimate
    * straddles the threshold. Pin it when the interval count is known
    * small; leave the default for interval sides that may grow past
    * broadcast scale.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(
      overlap.isEmpty,
      s"left/right columns collide: ${overlap.mkString(",")} — rename before joining")
    val cell = "_graft_cell"
    // floorDiv in exact 64-bit integer ops: align to the cell start with
    // pmod (always >= 0, so negative timestamps bucket correctly), then
    // `div` — the aligned value divides exactly, so truncation direction
    // is moot. Plain `/` would be IEEE double division (wrong past 2^53)
    // and bare `div` alone truncates toward zero on negatives.
    val w = bucketWidth
    def floorDiv(e: String): String =
      s"((($e) - (((($e) % $w) + $w) % $w)) div $w)"

    val points = left.withColumn(cell, expr(floorDiv(s"`$pointCol`")))
    val exploded = right
      .where(col(startCol) < col(endCol))
      .withColumn(cell, explode(expr(
        s"sequence(${floorDiv(s"`$startCol`")}, ${floorDiv(s"`$endCol` - 1")})")))
    val intervals =
      if (broadcastIntervals) org.apache.spark.sql.functions.broadcast(exploded)
      else exploded
    points
      .join(intervals, Seq(cell))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(cell)
  }
}
