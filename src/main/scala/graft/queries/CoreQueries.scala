package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.cdc.Transformer

/** One declared query: a Spark-side implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query run by the
  * driver over the same parquet files.
  *
  * Conventions that make the hash-compare deterministic:
  *  - every query ends in a total ORDER BY (unique key last);
  *  - float aggregates are round()ed (sum → 2dp, avg → 4dp) so the
  *    summation-order noise between engines vanishes;
  *  - grouping-set NULLs are coalesced to a sentinel so NULL ordering
  *    differences between Spark and DuckDB cannot bite;
  *  - output column names are identical (and lowercase) on both sides.
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

  val all: Map[String, QueryDef] = Map(

    // ---- projections / filters (P-ops) --------------------------------
    // Routed through the <SRC> transformer hook on purpose: this is the
    // reference's Q1 operator applied to a filter+project query.
    "q01_filter_project" -> QueryDef(
      (spark, dir) =>
        Transformer.transform(
          Tables.load(spark, dir, "lineitem"),
          """SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount), 2) AS revenue
             FROM <SRC>
             WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
             ORDER BY l_orderkey, l_linenumber"""),
      Some("""SELECT l_orderkey, l_linenumber,
              round(l_extendedprice * (1 - l_discount), 2) AS revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
              ORDER BY l_orderkey, l_linenumber""")),

    // ---- hash aggregation (TPC-H Q1 shape) ----------------------------
    "q02_agg_tpch_q1" -> QueryDef(
      sql("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                           AS sum_qty,
             round(sum(l_extendedprice), 2)                      AS sum_base,
             round(sum(l_extendedprice * (1 - l_discount)), 2)   AS sum_disc,
             round(avg(l_quantity), 4)                           AS avg_qty,
             round(avg(l_discount), 4)                           AS avg_disc,
             count(*)                                            AS cnt
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""),
      Some("""SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2)                          AS sum_qty,
              round(sum(l_extendedprice), 2)                     AS sum_base,
              round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc,
              round(avg(l_quantity), 4)                          AS avg_qty,
              round(avg(l_discount), 4)                          AS avg_disc,
              count(*)                                           AS cnt
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // ---- multi-way equi join + agg + top-k (TPC-H Q3 shape) -----------
    "q03_join_topk" -> QueryDef(
      sql("""SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(o_orderdate AS DATE) AS odate
             FROM customer
             JOIN orders   ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             WHERE c_mktsegment = 'BUILDING'
               AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
               AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
             GROUP BY l_orderkey, o_orderdate
             ORDER BY revenue DESC, l_orderkey
             LIMIT 10"""),
      Some("""SELECT l_orderkey,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              CAST(o_orderdate AS DATE) AS odate
              FROM customer
              JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
              GROUP BY l_orderkey, o_orderdate
              ORDER BY revenue DESC, l_orderkey
              LIMIT 10""")),

    // ---- broadcast dim-join enrich (region ⋈ nation ⋈ customer) -------
    "q04_broadcast_enrich" -> QueryDef(
      sql("""SELECT r_name, n_name,
             count(*) AS n_cust,
             round(sum(c_acctbal), 2) AS sum_bal
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name
             ORDER BY r_name, n_name"""),
      Some("""SELECT r_name, n_name,
              count(*) AS n_cust,
              round(sum(c_acctbal), 2) AS sum_bal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name
              ORDER BY r_name, n_name""")),

    // ---- five/six-way join + agg (TPC-H Q5 shape) ---------------------
    "q05_join_q5_shape" -> QueryDef(
      sql("""SELECT n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
      Some("""SELECT n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM customer
              JOIN orders   ON c_custkey  = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey  = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY n_name
              ORDER BY revenue DESC, n_name""")),

    // ---- semi join (EXISTS) -------------------------------------------
    "q06_semi_join" -> QueryDef(
      sql("""SELECT c_custkey, c_name
             FROM customer
             WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_totalprice > 400000)
             ORDER BY c_custkey"""),
      Some("""SELECT c_custkey, c_name
              FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // ---- anti join (NOT EXISTS) ---------------------------------------
    "q07_anti_join" -> QueryDef(
      sql("""SELECT c_custkey, c_name
             FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             ORDER BY c_custkey"""),
      Some("""SELECT c_custkey, c_name
              FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // ---- window LWW dedup as SQL (the engine's A2 operator) -----------
    "q08_window_lww" -> QueryDef(
      sql("""SELECT user_id, event_id, event_type, value
             FROM (SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
                   FROM events) t
             WHERE rn = 1
             ORDER BY user_id"""),
      Some("""SELECT user_id, event_id, event_type, value
              FROM (SELECT user_id, event_id, event_type, value,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events) t
              WHERE rn = 1
              ORDER BY user_id""")),

    // ---- rollup --------------------------------------------------------
    "q09_rollup" -> QueryDef(
      sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS cnt,
             round(sum(l_quantity), 2) AS sum_qty
             FROM lineitem
             GROUP BY ROLLUP(l_returnflag, l_linestatus)
             ORDER BY rf, ls"""),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              coalesce(l_linestatus, 'ALL') AS ls,
              count(*) AS cnt,
              round(sum(l_quantity), 2) AS sum_qty
              FROM lineitem
              GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY rf, ls""")),

    // ---- cube ----------------------------------------------------------
    "q10_cube" -> QueryDef(
      sql("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
             coalesce(o_orderpriority, 'ALL') AS prio,
             count(*) AS cnt,
             round(sum(o_totalprice), 2) AS sum_price
             FROM orders
             GROUP BY CUBE(o_orderstatus, o_orderpriority)
             ORDER BY st, prio"""),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
              coalesce(o_orderpriority, 'ALL') AS prio,
              count(*) AS cnt,
              round(sum(o_totalprice), 2) AS sum_price
              FROM orders
              GROUP BY CUBE(o_orderstatus, o_orderpriority)
              ORDER BY st, prio""")),

    // ---- set ops -------------------------------------------------------
    "q11_union_all" -> QueryDef(
      sql("""SELECT k, count(*) AS cnt FROM (
               SELECT c_nationkey AS k FROM customer
               UNION ALL
               SELECT s_nationkey AS k FROM supplier) t
             GROUP BY k ORDER BY k"""),
      Some("""SELECT k, count(*) AS cnt FROM (
                SELECT c_nationkey AS k FROM customer
                UNION ALL
                SELECT s_nationkey AS k FROM supplier) t
              GROUP BY k ORDER BY k""")),

    "q12_intersect" -> QueryDef(
      sql("""SELECT c_custkey AS k FROM customer
             INTERSECT
             SELECT o_custkey AS k FROM orders
             ORDER BY k"""),
      Some("""SELECT c_custkey AS k FROM customer
              INTERSECT
              SELECT o_custkey AS k FROM orders
              ORDER BY k""")),

    "q13_except" -> QueryDef(
      sql("""SELECT c_custkey AS k FROM customer
             EXCEPT
             SELECT o_custkey AS k FROM orders
             ORDER BY k"""),
      Some("""SELECT c_custkey AS k FROM customer
              EXCEPT
              SELECT o_custkey AS k FROM orders
              ORDER BY k""")),

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
    "q16_date_trunc" -> QueryDef(
      sql("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             count(*) AS cnt,
             round(sum(o_totalprice), 2) AS sum_price
             FROM orders
             GROUP BY 1
             ORDER BY mon"""),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
              count(*) AS cnt,
              round(sum(o_totalprice), 2) AS sum_price
              FROM orders
              GROUP BY 1
              ORDER BY mon""")),

    // ---- sort / top-k per group ----------------------------------------
    "q17_topk_per_group" -> QueryDef(
      sql("""SELECT o_orderpriority, rk, o_orderkey, o_totalprice
             FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                   rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
                   FROM orders) t
             WHERE rk <= 10
             ORDER BY o_orderpriority, rk"""),
      Some("""SELECT o_orderpriority, rk, o_orderkey, o_totalprice
              FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                    rank() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rk
                    FROM orders) t
              WHERE rk <= 10
              ORDER BY o_orderpriority, rk""")),

    // ---- exact distinct ------------------------------------------------
    "q18_count_distinct" -> QueryDef(
      sql("""SELECT count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supp,
             count(*) AS total
             FROM lineitem"""),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supp,
              count(*) AS total
              FROM lineitem""")),

    // ---- approx distinct (HLL) — engine-specific, rows-only check ------
    "q19_approx_distinct" -> QueryDef(
      sql("""SELECT approx_count_distinct(l_partkey) AS approx_parts,
             approx_count_distinct(l_orderkey) AS approx_orders
             FROM lineitem"""),
      None),

    // ---- scalar subquery ----------------------------------------------
    "q20_scalar_subquery" -> QueryDef(
      sql("""SELECT o_orderkey, o_totalprice
             FROM orders
             WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
             ORDER BY o_orderkey"""),
      Some("""SELECT o_orderkey, o_totalprice
              FROM orders
              WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
              ORDER BY o_orderkey""")),

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
    "q22_window_frames" -> QueryDef(
      sql("""SELECT user_id, event_id,
             round(sum(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_sum,
             lag(event_id) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_event
             FROM events
             ORDER BY user_id, event_id
             LIMIT 1000"""),
      Some("""SELECT user_id, event_id,
              round(sum(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS running_sum,
              lag(event_id) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_event
              FROM events
              ORDER BY user_id, event_id
              LIMIT 1000"""))
  )
}
