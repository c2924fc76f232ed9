package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * **`events.ts` is BIGINT epoch-nanoseconds in this engine, whatever the
  * file stores** — the generator has shipped both parquet TIMESTAMP(NANOS)
  * (pre-2026-08-13 regens; Spark 4 refuses to read nanos as a timestamp,
  * so `spark.sql.legacy.parquet.nanosAsLong=true` surfaces them as longs)
  * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (the 2026-08-13 regen;
  * Spark reads TIMESTAMP_NTZ, which `load` converts back to epoch-nanos
  * here — exact, micros always fit). Normalizing at the loader keeps every
  * consumer (q51's `ts DIV 1000` micros bucketing, q25's `_ts` ordering)
  * and the DuckDB oracle (which reads the same column as a naive µs
  * TIMESTAMP either way) bit-identical across generator versions. The
  * NTZ→nanos conversion interprets naive values in the session timezone —
  * every engine session pins UTC, matching DuckDB's naive reading.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Defensive: the driver may hand us a session built without these
    // confs. UTC matters as much as nanosAsLong — the NTZ→epoch-nanos
    // conversion below reads naive values in the SESSION timezone, and a
    // non-UTC session would shift every events.ts by the zone offset
    // (ADVICE r11 #2); DuckDB reads the same column naive/UTC.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) => df // nanos already
      case Some(_: org.apache.spark.sql.types.TimestampNTZType) |
           Some(_: org.apache.spark.sql.types.TimestampType) =>
        df.withColumn(
          "ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected nanos-as-long " +
          "or a timestamp (TESTDATA generator changed again?)")
    }
  }

  // One registration per (session, dir): repeated per-query registration was
  // 10 redundant parquet footer reads per query, and coupled every query to
  // every table's readability (VERDICT r1 "What's wrong" #1). Weak keys so
  // stopped sessions can be collected; memoized only when every table
  // registered, so a transient failure is retried on the next call instead
  // of poisoning the session (ADVICE r2).
  private val registeredDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Register every table as a temp view named after itself (memoized per
    * session; re-registers only when `dir` changes). A table that fails to
    * load is skipped with a warning so it cannot sink unrelated queries —
    * those tables are retried on the next registerAll call.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (registeredDir.get(spark) != dir) {
      // map-then-forall, NOT a bare forall: forall short-circuits on the
      // first failure and would leave every LATER table unregistered —
      // exactly the all-queries-sink coupling this method exists to avoid.
      val allOk = names.map { n =>
        try { load(spark, dir, n).createOrReplaceTempView(n); true }
        catch {
          case e: Exception =>
            System.err.println(s"[tables] skipping $n: ${e.getMessage}")
            false
        }
      }.forall(identity)
      if (allOk) registeredDir.put(spark, dir)
    }
  }
}
