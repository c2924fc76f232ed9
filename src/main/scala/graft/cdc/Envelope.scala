package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC event envelope: parse + explode (reference operators P1/P2,
  * `/root/reference/src/main/java/org/apache/spark/sql/hudi/commands/BinlogSyncHoodieCommand.scala:241-249`,
  * constants `:44-63`).
  *
  * Each input row is one JSON string:
  * `{databaseName, tableName, schema, rows: [...], timestamp, type}` where
  * `rows` is an array of per-record JSON objects and `schema` is a Spark
  * `StructType` JSON string (in-band schema, ref `:152-157`).
  *
  * Spark-first: instead of the reference's driver-side fastjson flatMap we
  * parse with `from_json` — `rows` is declared `array<string>`, which makes
  * Jackson capture each raw JSON object subtree as a string — and explode
  * with the Catalyst `Generator`. Whole pipeline stays in codegen; nothing
  * touches the driver.
  */
object Envelope {

  val MetaCol = "__meta__"
  val ValueCol = "value"
  val OpUpsert = "upsert"
  val OpDelete = "delete"

  /** Default timestamp format for in-band payload decode (ref `:59-60`). */
  val DefaultTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss'['.SSS']['XXX']'"

  /** Envelope struct (ref key constants `:44-52`). */
  val Schema: StructType = StructType(Seq(
    StructField("databaseName", StringType),
    StructField("tableName", StringType),
    StructField("schema", StringType),
    StructField("timestamp", LongType),
    StructField("type", StringType),
    StructField("rows", ArrayType(StringType))))

  /** Parse envelope strings and explode to one row per record:
    * `value: string` (raw record JSON) + `__meta__: struct` (envelope sans
    * rows) — the shape the rest of the pipeline consumes.
    *
    * Malformed input: `strict = true` raises (with the offending text) at
    * execution time via a zero-cost `raise_error` guard in the same pass;
    * `strict = false` drops unparseable rows silently (`explode` of a null
    * array yields nothing — the quiet-loss default the reference has).
    */
  def parse(df: DataFrame, valueCol: String = ValueCol, strict: Boolean = false): DataFrame = {
    val parsed = df.select(col(valueCol).as("_raw"), from_json(col(valueCol), Schema).as("env"))
    val guarded =
      if (!strict) parsed
      else parsed.filter(
        when(
          col("env").isNull || col("env.rows").isNull,
          raise_error(concat(lit("malformed CDC envelope: "), col("_raw"))))
          .otherwise(lit(true)))
    guarded.select(
      explode(col("env.rows")).as(ValueCol),
      struct(
        col("env.databaseName").as("databaseName"),
        col("env.tableName").as("tableName"),
        col("env.schema").as("schema"),
        col("env.timestamp").as("timestamp"),
        col("env.type").as("type")).as(MetaCol))
  }

  /** Decode raw record JSON strings into typed payload columns using the
    * in-band `StructType` JSON (reference P7, `:152-157` + `:197-206` — the
    * same `JsonToStructs` expression via `from_json`).
    */
  def decode(df: DataFrame, schemaJson: String, timestampFormat: String = DefaultTimestampFormat): DataFrame = {
    val schema = DataType.fromJson(schemaJson) match {
      case t: StructType => t
      case other => throw new IllegalArgumentException(
        s"in-band schema must be a struct, got: ${other.simpleString}")
    }
    val keep = df.columns.filter(c => c != ValueCol && c != MetaCol).map(col)
    df.select(
        (from_json(col(ValueCol), schema, Map("timestampFormat" -> timestampFormat)).as("data")
          +: keep.toIndexedSeq): _*)
      .select((col("data.*") +: keep.toIndexedSeq): _*)
  }

  def isDelete: Column = col(s"$MetaCol.type") === OpDelete
}
