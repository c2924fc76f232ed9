package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Record-key derivation (reference operator P3,
  * `/root/reference/src/main/java/org/apache/spark/sql/hudi/commands/BinlogSyncHoodieCommand.scala:251-259`
  * + `Md5Util.scala:7-11`): `_key = md5("<db>_<table>_<k1>_<k2>_...")` with
  * composite key fields taken from per-table config.
  *
  * Spark-first: the reference runs a driver-configured map() over JSON
  * objects; we build one codegen'd column expression — a `CASE WHEN` chain
  * over the (db, table) pairs present in config, each arm extracting the
  * configured key fields with `get_json_object` — so keying for every table
  * happens in a single distributed pass with no per-table job.
  */
object KeyGen {

  /** `md5(concat_ws("_", db, table, keyValues))` for already-typed columns. */
  def key(db: Column, table: Column, keyValues: Seq[Column]): Column =
    md5(concat_ws("_", (db +: table +: keyValues).map(_.cast("string")): _*))

  /** Key column over raw record JSON: one CASE arm per configured table.
    * Records of tables absent from `keyFields` get a null key (callers
    * validate observed tables against config first — ref `:253-255` throws).
    *
    * A key FIELD missing from (or null in) the payload contributes the
    * literal "null", NOT an empty slot: `concat_ws` silently skips nulls,
    * so without the coalesce `{"a":"x"}` and `{"a":"x","b":null}` under
    * key fields [a,b] would collapse to one `_key` and LWW would silently
    * drop a record. (The reference's Java string-join renders a null
    * value as "null" — same distinctness.)
    */
  def forTables(
      dbCol: Column,
      tableCol: Column,
      valueCol: Column,
      keyFields: Map[(String, String), Seq[String]]): Column = {
    val keyVals: Column = keyFields.toSeq.sortBy(t => (t._1._1, t._1._2))
      .foldLeft(lit(null).cast("string")) { case (acc, ((db, table), fields)) =>
        when(
          dbCol === db && tableCol === table,
          concat_ws("_", fields.map(f =>
            coalesce(get_json_object(valueCol, s"$$.$f"), lit("null"))): _*))
          .otherwise(acc)
      }
    // keyVals is null exactly for unconfigured tables: keep the key null
    // there (concat_ws would skip the null and mint a shared md5(db_table)
    // key that collapses the whole table to one row).
    when(keyVals.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws("_", dbCol, tableCol, keyVals)))
  }
}
