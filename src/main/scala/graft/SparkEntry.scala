package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, LakeQueries, OpsQueries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds the DuckDB-equivalent SQL for every entry whose
  * semantics are ANSI-expressible (the driver hash-compares results).
  */
object SparkEntry {

  private def allQueries: Map[String, QueryDef] =
    CoreQueries.all ++ LakeQueries.all ++ OpsQueries.all

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * full CDC pipeline — envelopes → explode → keygen → LWW dedup →
    * upsert/delete routing → copy-on-write lake merge → readback.
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries("q25_cdc_end_to_end").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
