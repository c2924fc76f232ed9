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
    * key (one bot user = one key in a clickstream) serializes in one
    * task's sort. Skewed-but-plural keys are handled by AQE; for the
    * single-hot-key case use [[asofJoinSliced]], which partitions by
    * (key, coarse time slice) instead and carries cross-slice state —
    * identical results, parallelism = slices even on one key.
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

  /** Skew-safe two-pass [[asofJoin]]: identical semantics (same contract,
    * same strict/tolerance rules), but the heavy window partitions by
    * (keys, coarse time slice of width `sliceWidth`) instead of keys
    * alone — a single pathological hot key (all rows one key) spreads
    * across `range/sliceWidth` tasks instead of serializing in one sort.
    *
    * Plan (two passes):
    *  1. slice summaries — per (key, slice), the LAST right payload in
    *     that slice (`max_by` over right rows, one partial-aggregated
    *     shuffle on (key, slice)); then a running `last(ignoreNulls)`
    *     over slices per key gives each slice its carry-in: the newest
    *     right row in ANY earlier slice. This window is per-key but runs
    *     over slice summaries (one row per occupied (key, slice)) — a
    *     hot key with a 30-day range and 1-hour slices sorts 720 rows,
    *     not 10^9.
    *  2. the within-slice running-last window, partitioned by
    *     (keys, slice), with the carry-in joined on (keys, slice) as the
    *     fallback (`coalesce`) when a slice has no earlier right row.
    *
    * Correctness of the slice cut: rows in different slices differ
    * strictly in slice index, and slice(ts) is monotone in ts, so every
    * carried right row from an earlier slice has ts strictly below every
    * left ts in this slice — both inclusive and strict bounds reduce to
    * the within-slice side ordering, exactly as in [[asofJoin]].
    *
    * Pick `sliceWidth` so the hot key's densest slice fits one task's
    * sort (e.g. axis range / (10 × parallelism)). Width does not affect
    * results (TemporalSpec proves equality across widths).
    *
    * Unlike [[asofJoin]] (which only ORDERS by ts and so accepts any
    * orderable type), the slice cut floor-divides the ts — both ts
    * columns must be INTEGRAL (epoch micros/nanos as long, int, ...).
    * Convert a TimestampType column first, e.g.
    * `withColumn(ts, unix_micros(col(ts)))`.
    */
  def asofJoinSliced(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      sliceWidth: Long,
      strict: Boolean = false,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoinSliced needs at least one key column")
    require(sliceWidth > 0, s"sliceWidth must be positive (got $sliceWidth)")
    for ((df, c, side) <- Seq((left, leftTs, "left"), (right, rightTs, "right"))) {
      import org.apache.spark.sql.types._
      // exact match first, case-insensitive fallback (Spark's default
      // resolution is case-insensitive — an exact-only lookup would let a
      // TimestampType "TS" slip past this guard when the caller wrote "ts")
      val dt = df.schema.find(_.name == c)
        .orElse(df.schema.find(_.name.equalsIgnoreCase(c)))
        .map(_.dataType)
      require(dt.isDefined,
        s"asofJoinSliced: $side ts column '$c' not found " +
          s"(columns: ${df.columns.mkString(",")})")
      require(dt.forall {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        },
        s"asofJoinSliced slices by integer floor division: $side ts column " +
          s"'$c' must be integral, got ${dt.map(_.simpleString).getOrElse("?")} — " +
          "convert first (e.g. unix_micros(col) for TimestampType); plain " +
          "asofJoin accepts any orderable ts")
    }
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    require(rPayload.contains(rightTs), s"right must contain ts column '$rightTs'")
    val overlap = rPayload.toSet.intersect(left.columns.toSet)
    require(
      overlap.isEmpty,
      s"right non-key columns collide with left: ${overlap.mkString(",")} — rename before joining")

    val side = "_graft_side"
    val ats = "_graft_ats"
    val rStruct = "_graft_r"
    val slice = "_graft_slice"
    val carry = "_graft_carry"
    val lTagged = left
      .withColumn(ats, col(leftTs))
      .withColumn(side, lit(if (strict) 0 else 1))
    val rTagged = right
      .withColumn(ats, col(rightTs))
      .withColumn(side, lit(if (strict) 1 else 0))
      .withColumn(rStruct, struct(rPayload.map(col): _*))
      .drop(rPayload: _*)
    val isLeft = if (strict) col(side) === 0 else col(side) === 1
    // exact integer floor division (same derivation as rangeJoin's cells)
    val u = lTagged
      .unionByName(rTagged, allowMissingColumns = true)
      .withColumn(slice, expr(floorDivExpr(s"`$ats`", sliceWidth)))

    // Pass 1: carry-in per occupied (key, slice). Right rows only feed the
    // per-slice last; slices occupied ONLY by left rows still get a carry
    // (the left-join keeps them with a null slice-last, and the
    // 1-PRECEDING running last looks past them to the newest earlier
    // right row). Cross-slice ties are impossible (ts strictly ordered
    // across slices), so max_by on ats alone honours the same
    // duplicate-(keys, rightTs) caller contract as asofJoin.
    val keyCols = keys.map(col)
    val sliceLast = u
      .where(col(rStruct).isNotNull)
      .groupBy(keyCols :+ col(slice): _*)
      .agg(max_by(col(rStruct), col(ats)).as("_graft_sl"))
    val occupied = u.select(keyCols :+ col(slice): _*).distinct()
    val carryW = Window
      .partitionBy(keyCols: _*)
      .orderBy(col(slice).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = occupied
      .join(sliceLast, keys :+ slice, "left")
      .withColumn(carry, last(col("_graft_sl"), ignoreNulls = true).over(carryW))
      .select(keyCols ++ Seq(col(slice), col(carry)): _*)

    // Pass 2: within-slice running last, carry-in as the fallback. The
    // join and the window share the (keys, slice) clustering, so the hot
    // key's rows spread across slices in BOTH the exchange and the sort.
    val wIn = Window
      .partitionBy(keyCols :+ col(slice): _*)
      .orderBy(col(ats).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = u
      .join(carries, keys :+ slice, "left")
      .withColumn(
        rStruct,
        coalesce(last(col(rStruct), ignoreNulls = true).over(wIn), col(carry)))
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

  /** `floorDiv(e, w)` as exact 64-bit integer SQL: align to the cell
    * start with pmod (always >= 0, so negative values bucket correctly),
    * then `div` — the aligned value divides exactly, so truncation
    * direction is moot. Plain `/` would be IEEE double division (wrong
    * past 2^53) and bare `div` alone truncates toward zero on negatives.
    */
  private def floorDivExpr(e: String, w: Long): String =
    s"((($e) - (((($e) % $w) + $w) % $w)) div $w)"

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
    *
    * `saltBuckets > 1` defends the SHUFFLE-join path against a single
    * pathological hot cell (a burst of points under one long interval):
    * each point picks a deterministic sub-cell (xxhash64 of its full row
    * mod saltBuckets) and each interval-cell row replicates to every
    * sub-cell, so the hot cell's probe work spreads across `saltBuckets`
    * tasks at the cost of `saltBuckets×` interval-side shuffle rows.
    * Duplicate-freedom is preserved — a point still meets each interval
    * in exactly one (cell, salt). Pointless with `broadcastIntervals`
    * (a broadcast join never partitions by cell; probe parallelism
    * already follows the points side), and AQE skew-join already splits
    * PLURAL hot cells — reach for salt only when one cell dominates.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      broadcastIntervals: Boolean = false,
      saltBuckets: Int = 1): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1 (got $saltBuckets)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(
      overlap.isEmpty,
      s"left/right columns collide: ${overlap.mkString(",")} — rename before joining")
    val cell = "_graft_cell"
    val salt = "_graft_salt"
    def floorDiv(e: String): String = floorDivExpr(e, bucketWidth)

    val points0 = left.withColumn(cell, expr(floorDiv(s"`$pointCol`")))
    val exploded0 = right
      .where(col(startCol) < col(endCol))
      .withColumn(cell, explode(expr(
        s"sequence(${floorDiv(s"`$startCol`")}, ${floorDiv(s"`$endCol` - 1")})")))
    val (points, exploded, joinKeys) =
      if (saltBuckets <= 1) (points0, exploded0, Seq(cell))
      else (
        points0.withColumn(
          salt, pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets.toLong))),
        exploded0.withColumn(
          salt, explode(expr(s"sequence(0L, ${saltBuckets - 1}L)"))),
        Seq(cell, salt))
    val intervals =
      if (broadcastIntervals) org.apache.spark.sql.functions.broadcast(exploded)
      else exploded
    points
      .join(intervals, joinKeys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(cell, salt)
  }
}
