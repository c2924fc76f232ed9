package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.cdc.Transformer

/** One declared query: a Spark-side implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query run by the
  * driver over the same parquet files.
  *
  * Conventions that make the hash-compare deterministic across engines:
  *  - every query ends in a total ORDER BY (unique key last);
  *  - money/quantity arithmetic is done in exact DECIMAL: inputs are 2dp
  *    values stored as doubles, so `CAST(x AS DECIMAL(18,2))` recovers the
  *    exact value identically in Spark and DuckDB (both convert doubles via
  *    the shortest decimal representation). Sums of decimals are exact; the
  *    final output is `CAST(... AS DOUBLE)` of the same exact decimal, so
  *    both engines emit the same double. Never `round()` a double — Spark
  *    (HALF_UP on the shortest repr) and DuckDB diverge at .xx5 boundaries
  *    (VERDICT r1 "What's wrong" #2);
  *  - averages are `CAST(exact decimal sum AS DOUBLE) / count` — one IEEE
  *    division of identical operands, bit-identical in both engines;
  *  - grouping-set NULLs are coalesced to a sentinel;
  *  - output column names are identical (and lowercase) on both sides;
  *  - `events.ts` is BIGINT epoch-nanos on the Spark side (see
  *    [[graft.Tables]]) and a µs TIMESTAMP on the DuckDB side; it is used
  *    only for ORDERING (never output), and µs-truncated orderings agree.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The declared relational query surface (SURVEY.md §2.7 / FIXTURES.md §3).
  *
  * The reference exposes all of this through its SQL transformer hook
  * (`BinlogSyncHoodieCommand.scala:104-111`): arbitrary Spark SQL over the
  * registered batch view. We exercise the same surface through
  * [[graft.cdc.Transformer]] / `spark.sql` over the TESTDATA tables.
  */
object CoreQueries {

  /** Run a Spark-dialect SQL string over the registered TESTDATA views. */
  private def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(q) }

  /** A query whose text is valid and equivalent in both dialects. */
  private def same(q: String): QueryDef = QueryDef(sql(q), Some(q))

  // Exact-decimal building blocks (identical text in both dialects).
  private def d2(c: String) = s"CAST($c AS DECIMAL(18,2))"
  private val revTerm = s"${d2("l_extendedprice")} * (1 - ${d2("l_discount")})"

  val all: Map[String, QueryDef] = Map(

    // ---- projections / filters (P-ops) --------------------------------
    // Routed through the <SRC> transformer hook on purpose: this is the
    // reference's Q1 operator applied to a filter+project query.
    "q01_filter_project" -> QueryDef(
      (spark, dir) =>
        Transformer.transform(
          Tables.load(spark, dir, "lineitem"),
          s"""SELECT l_orderkey, l_linenumber,
             CAST(round($revTerm, 2) AS DOUBLE) AS revenue
             FROM <SRC>
             WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
             ORDER BY l_orderkey, l_linenumber"""),
      Some(s"""SELECT l_orderkey, l_linenumber,
              CAST(round($revTerm, 2) AS DOUBLE) AS revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
              ORDER BY l_orderkey, l_linenumber""")),

    // ---- hash aggregation (TPC-H Q1 shape) ----------------------------
    "q02_agg_tpch_q1" -> same(
      s"""SELECT l_returnflag, l_linestatus,
         CAST(sum(${d2("l_quantity")}) AS DOUBLE)        AS sum_qty,
         CAST(sum(${d2("l_extendedprice")}) AS DOUBLE)   AS sum_base,
         CAST(sum($revTerm) AS DOUBLE)                   AS sum_disc,
         CAST(sum(${d2("l_quantity")}) AS DOUBLE) / count(*)  AS avg_qty,
         CAST(sum(${d2("l_discount")}) AS DOUBLE) / count(*)  AS avg_disc,
         count(*)                                        AS cnt
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    // ---- multi-way equi join + agg + top-k (TPC-H Q3 shape) -----------
    "q03_join_topk" -> same(
      s"""SELECT l_orderkey,
         CAST(sum($revTerm) AS DOUBLE) AS revenue,
         CAST(o_orderdate AS TIMESTAMP) AS odate
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
           AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10"""),

    // ---- broadcast dim-join enrich (region ⋈ nation ⋈ customer) -------
    "q04_broadcast_enrich" -> same(
      s"""SELECT r_name, n_name,
         count(*) AS n_cust,
         CAST(sum(${d2("c_acctbal")}) AS DOUBLE) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name"""),

    // ---- five/six-way join + agg (TPC-H Q5 shape) ---------------------
    "q05_join_q5_shape" -> same(
      s"""SELECT n_name,
         CAST(sum($revTerm) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders   ON c_custkey  = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey  = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name"""),

    // ---- semi join (EXISTS) -------------------------------------------
    "q06_semi_join" -> same(
      """SELECT c_custkey, c_name
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                       AND o_totalprice > 400000)
         ORDER BY c_custkey"""),

    // ---- anti join (NOT EXISTS) ---------------------------------------
    "q07_anti_join" -> same(
      """SELECT c_custkey, c_name
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey"""),

    // ---- window LWW dedup as SQL (the engine's A2 operator) -----------
    // ts is BIGINT nanos (Spark) vs µs TIMESTAMP (DuckDB): ordering-only.
    "q08_window_lww" -> same(
      """SELECT user_id, event_id, event_type, value
         FROM (SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) t
         WHERE rn = 1
         ORDER BY user_id"""),

    // ---- rollup --------------------------------------------------------
    "q09_rollup" -> same(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         coalesce(l_linestatus, 'ALL') AS ls,
         count(*) AS cnt,
         CAST(sum(${d2("l_quantity")}) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls"""),

    // ---- cube ----------------------------------------------------------
    "q10_cube" -> same(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS st,
         coalesce(o_orderpriority, 'ALL') AS prio,
         count(*) AS cnt,
         CAST(sum(${d2("o_totalprice")}) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY st, prio"""),

    // ---- set ops -------------------------------------------------------
    "q11_union_all" -> same(
      """SELECT k, count(*) AS cnt FROM (
           SELECT c_nationkey AS k FROM customer
           UNION ALL
           SELECT s_nationkey AS k FROM supplier) t
         GROUP BY k ORDER BY k"""),

    "q12_intersect" -> same(
      """SELECT c_custkey AS k FROM customer
         INTERSECT
         SELECT o_custkey AS k FROM orders
         ORDER BY k"""),

    "q13_except" -> same(
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey AS k FROM orders
         ORDER BY k"""),

    // ---- scalar fns: md5 record-key derivation (the engine's P3 op) ----
    "q14_md5_keys" -> QueryDef(
      sql("""SELECT c_custkey,
             md5(concat_ws('_', 'tpch', 'customer', CAST(c_custkey AS STRING))) AS _key
             FROM customer
             ORDER BY c_custkey
             LIMIT 100"""),
      Some("""SELECT c_custkey,
              md5(concat_ws('_', 'tpch', 'customer', CAST(c_custkey AS VARCHAR))) AS _key
              FROM customer
              ORDER BY c_custkey
              LIMIT 100""")),

    // ---- scalar fns: JSON extraction ----------------------------------
    "q15_json_extract" -> QueryDef(
      sql("""SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k
             FROM events
             ORDER BY event_id
             LIMIT 500"""),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
              FROM events
              ORDER BY event_id
              LIMIT 500""")),

    // ---- scalar fns: date_trunc buckets --------------------------------
    "q16_date_trunc" -> same(
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
         count(*) AS cnt,
         CAST(sum(${d2("o_totalprice")}) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY 1
         ORDER BY mon"""),

    // ---- sort / top-k per group ----------------------------------------
    "q17_topk_per_group" -> same(
      """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
         FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
               rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders) t
         WHERE rk <= 10
         ORDER BY o_orderpriority, rk"""),

    // ---- exact distinct ------------------------------------------------
    "q18_count_distinct" -> same(
      """SELECT count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supp,
         count(*) AS total
         FROM lineitem"""),

    // ---- approx distinct (HLL) — tolerance-band oracle -----------------
    // The sketch itself is engine-specific, so the hash-checked contract is
    // the tolerance: |approx - exact| <= 5% of exact, asserted in Spark and
    // trivially true in the oracle (VERDICT r2 "What's wrong" #1).
    "q19_approx_distinct" -> QueryDef(
      sql("""SELECT
             abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
               <= 0.05 * count(DISTINCT l_partkey) AS parts_ok,
             abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
               <= 0.05 * count(DISTINCT l_orderkey) AS orders_ok
             FROM lineitem"""),
      Some("SELECT true AS parts_ok, true AS orders_ok")),

    // ---- scalar subquery ----------------------------------------------
    // avg over raw doubles is summation-order dependent (shuffle-fetch
    // order in Spark vs sequential in DuckDB) — rows within ~1e-5 of the
    // threshold could flip membership. DECIMAL sum is exact in both
    // engines; one final cast + division is deterministic.
    "q20_scalar_subquery" -> same(
      """SELECT o_orderkey, o_totalprice
         FROM orders
         WHERE o_totalprice > 2 * (
           SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           FROM orders)
         ORDER BY o_orderkey"""),

    // ---- grouping sets --------------------------------------------------
    "q21_grouping_sets" -> QueryDef(
      sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(CAST(l_suppkey AS STRING), 'ALL') AS sk,
             count(*) AS cnt
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
             ORDER BY rf, sk"""),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              coalesce(CAST(l_suppkey AS VARCHAR), 'ALL') AS sk,
              count(*) AS cnt
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
              ORDER BY rf, sk""")),

    // ---- windowed running agg (frames) ---------------------------------
    // value is a 2dp double: decimal-sum the window frame so the running
    // total is exact (a double running sum could associate differently
    // between engines), then emit as DOUBLE.
    "q22_window_frames" -> same(
      s"""SELECT user_id, event_id,
         CAST(sum(${d2("value")}) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_sum,
         lag(event_id) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_event
         FROM events
         ORDER BY user_id, event_id
         LIMIT 1000"""
    )
  )
}
