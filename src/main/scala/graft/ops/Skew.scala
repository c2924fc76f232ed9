package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer; at
  * 100 TB one viral key stalls the stage. Salted two-phase aggregation
  * splits each key into `saltBuckets` sub-keys (uniform random salt),
  * partially aggregates per (key, salt), then merges the partials — the
  * hot key's work spreads across `saltBuckets` reducers. Correct for any
  * algebraic aggregate (sum/count/min/max, and avg via sum+count).
  *
  * (Spark's AQE skew-join handles *join* skew at runtime; this covers the
  * aggregation side, and doubles as the documented pattern for salting
  * join keys: salt the hot side, explode the dim side by the salt range.)
  */
object Skew {

  /** Salted sum/count/min/max aggregation: exactly
    * `groupBy(keyCols).agg(...)` semantics, executed in two shuffles with
    * bounded per-reducer fan-in. `aggs` maps output name ->
    * (column, "sum" | "count" | "min" | "max").
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      aggs: Map[String, (Column, String)],
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    // Phase 1: partial aggregate per (key, salt). The salt just needs to be
    // uniform — the merged result is identical for any salt assignment.
    val salted = df.withColumn("_salt", (rand(42) * saltBuckets).cast("int"))
    val phase1 = salted.groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partial(aggs.head), aggs.tail.map(partial).toSeq: _*)
    // Phase 2: merge partials per key (salt dropped).
    phase1.groupBy(keyCols.map(col): _*)
      .agg(merge(aggs.head), aggs.tail.map(merge).toSeq: _*)
  }

  private def partial(kv: (String, (Column, String))): Column = kv match {
    case (name, (c, "sum")) => sum(c).as(s"_p_$name")
    case (name, (c, "count")) => count(c).as(s"_p_$name")
    case (name, (c, "min")) => min(c).as(s"_p_$name")
    case (name, (c, "max")) => max(c).as(s"_p_$name")
    case (_, (_, op)) => throw new IllegalArgumentException(s"unsupported salted agg: $op")
  }

  private def merge(kv: (String, (Column, String))): Column = kv match {
    case (name, (_, "sum")) => sum(col(s"_p_$name")).as(name)
    case (name, (_, "count")) => sum(col(s"_p_$name")).as(name)
    case (name, (_, "min")) => min(col(s"_p_$name")).as(name)
    case (name, (_, "max")) => max(col(s"_p_$name")).as(name)
    case (_, (_, op)) => throw new IllegalArgumentException(s"unsupported salted agg: $op")
  }
}
