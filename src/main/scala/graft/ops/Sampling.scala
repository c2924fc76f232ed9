package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/split operators for training-data pipelines.
  *
  * The split must be a pure function of the RECORD KEY — not of row order,
  * partitioning, or corpus size — so that (a) re-runs and engine changes
  * reproduce it bit-for-bit, (b) a document keeps its split when the
  * corpus around it grows (no train/test leakage across dataset
  * versions), and (c) any engine can recompute it for audit. Hash is
  * md5-derived (not xxhash64/crc32, whose integer variants differ across
  * engines): bucket = first 15 hex digits of md5(key-as-string) mod 100 —
  * 60 bits, exact in BIGINT and DOUBLE alike, uniform to ~1e-16.
  *
  * Scale shape: one codegen'd per-row projection, zero shuffles — the
  * split column is computable inside any scan.
  */
object Sampling {

  /** THE portable 60-bit key hash every sampling op derives from — one
    * definition, because its exact shape is what keeps keep-sets
    * bit-identical with the SQL oracles' `('0x'||substr(md5(...),1,15))`.
    */
  private def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic per-key bucket in [0, 100). */
  def hashBucket(key: Column): Column = hash60(key) % 100

  /** Attach a `split` column from cumulative percentage ranges, e.g.
    * `Seq("train" -> 98, "val" -> 1, "test" -> 1)` (must sum to 100).
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2).sum == 100,
      s"split percentages must be positive and sum to 100: $splits")
    val bucket = hashBucket(col(keyCol))
    val bounds = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val expr = splits.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), rest) => when(bucket < bound, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic per-group cap — the DOMAIN-BALANCING primitive (bound
    * how much any one crawl domain / source contributes): keep at most
    * `n` rows per `groupCol`, selected by ascending 60-bit md5 hash of
    * the key (key ascending as tiebreak for hash collisions). The kept
    * set is a pure function of the group's key population — engine- and
    * run-reproducible — but unlike [[stratifiedSample]] it is NOT
    * growth-stable: a cap is a top-N, so a new key hashing below the
    * group's cutoff evicts the old rank-n survivor. Use percentage
    * strata when growth-stability matters more than a hard bound.
    *
    * Scale shape: `row_number <= n` over `(group, hash)` — Spark's
    * WindowGroupLimit rewrites it to a per-task partial top-n BEFORE the
    * exchange, so a hot domain ships at most n·tasks rows into its
    * window partition, not its whole population.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      n: Int,
      keyCol: String): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val w = Window.partitionBy(groupCol).orderBy(hash60(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** Deterministic stratified downsampling — the corpus-MIXING primitive
    * (rebalance languages/sources toward a target distribution): keep a
    * row iff its [[hashBucket]] falls under its stratum's percentage.
    * Because the bucket is a pure function of the record key (not of the
    * stratum, row order, or corpus size), a document's keep/drop fate is
    * stable as the corpus grows, reproducible across engines, and
    * CONSISTENT across pipelines sampling at different rates: the kept
    * set at 20% is a subset of the kept set at 50%.
    *
    * Zero shuffle — a codegen'd filter computable inside any scan.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Seq[(String, Int)],
      defaultPct: Int): DataFrame = {
    require((rates.map(_._2) :+ defaultPct).forall(p => p >= 0 && p <= 100),
      s"stratum percentages must be in [0, 100]: $rates default=$defaultPct")
    val pct = rates.foldRight(lit(defaultPct): Column) {
      case ((stratum, p), rest) => when(col(strataCol) === stratum, lit(p)).otherwise(rest)
    }
    df.filter(hashBucket(col(keyCol)) < pct)
  }

  /** Sequence packing for training: documents are concatenated in a
    * deterministic key order and chopped into fixed `budget`-token bins;
    * a document's `bin` is the bin index of its FIRST token in the
    * concatenated stream (concat-and-chunk packing — sequences may cross
    * bin boundaries, as GPT-style pretraining loaders allow). The
    * assignment is a pure function of (key order, token counts), so
    * re-runs reproduce it bit-for-bit.
    *
    * Packing is per-SHARD (`key mod shards`): the running-sum window
    * partitions by shard, so `shards` tasks pack concurrently. A single
    * global ordered cumsum would serialize the whole corpus through one
    * window partition — the non-scalable shape this deliberately avoids.
    * Bins are therefore numbered within a shard; `(shard, bin)` is the
    * global bin identity. Keys must be UNIQUE: a duplicated key makes the
    * running-sum order within the tie unspecified, and with it the bin
    * assignment of everything after the tie.
    *
    * Output: input columns plus `shard`, `n_tok`, `bin`.
    */
  def packBins(
      df: DataFrame,
      keyCol: String,
      tokens: Column,
      budget: Int,
      shards: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(shards > 0, s"shard count must be positive: $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", col(keyCol) % shards)
      .withColumn("n_tok", tokens.cast("long"))
      .withColumn("bin",
        // Integer `div` (IntegralDivide), not IEEE `/`: past 2^53 cumulative
        // tokens a double quotient can round across the bin boundary and
        // silently disagree with the oracle's integer division.
        call_function("div", sum(col("n_tok")).over(w) - col("n_tok"), lit(budget.toLong)))
  }

  /** Temperature (square-root) corpus mixing — [[stratifiedSample]]'s
    * data-driven sibling: instead of user-fixed percentages, each group's
    * keep fraction derives from the corpus's OWN counts,
    * `f_g = min(1, c / sqrt(n_g))`, so the expected kept count is
    * `c * sqrt(n_g)` — the square-root sampling scheme multilingual
    * pretraining uses to upweight rare languages/sources without fully
    * flattening the distribution. Exponent 0.5 specifically because IEEE
    * `sqrt` is correctly rounded in every engine (a general `pow` is
    * not), and there is NO cross-group normalizing sum — `c` is an
    * absolute scale — so the threshold is a short chain of
    * order-independent IEEE ops any engine reproduces bit-for-bit.
    *
    * The keep test is the same portable 60-bit md5 key hash as
    * [[hashBucket]]: a document's fate is a pure function of
    * (key, its group's count). Rows with a NULL group are dropped — a
    * null group has no count and no weight (same as SQL's equi-join).
    *
    * Scale shape: one tiny per-group count agg (rows = #groups),
    * broadcast back onto the corpus, then a codegen'd filter — the
    * corpus itself never shuffles.
    */
  def sqrtTemperatureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      c: Double): DataFrame = {
    require(c > 0 && !c.isInfinite, s"scale constant must be positive finite: $c")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_n"))
    // floor(min(1, c/sqrt(n)) * 2^60) as the integer keep threshold:
    // 2^60 is an exact double, so f = 1 admits the full hash range.
    val thr = floor(
      least(lit(1.0), lit(c) / sqrt(col("_n").cast("double")))
        * lit(1152921504606846976.0)).cast("long")
    df.join(broadcast(counts), groupCol)
      .filter(hash60(col(keyCol)) < thr)
      .drop("_n")
  }

  /** Context-window chunking — [[packBins]]'s per-document sibling: split
    * each document into token windows of `size` starting every `stride`
    * tokens (overlap = `size - stride`; RAG indexing and
    * fixed-context-pretraining both consume this shape). A window starts
    * at every token offset `i * stride < n_tok`, so the tail chunk may be
    * short but no token is dropped; empty/null documents emit no chunks.
    * Chunk identity `(id, chunk_id)` and content are pure functions of
    * the text — re-runs and engines reproduce them bit-for-bit.
    *
    * Scale shape: tokenize once into a bound array column, explode the
    * start offsets, and `slice` AFTER the explode over the bound
    * attribute — slice/concat_ws are codegen'd per chunk row; no lambda
    * re-walks the array per element, and nothing shuffles (a pure
    * per-row flatMap any scan can pipeline).
    *
    * Output: `idCol`, `chunk_id` (0-based), `n_chunk_tok`, `chunk`.
    */
  def chunkDocs(
      docs: DataFrame,
      size: Int,
      stride: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1 token: $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size]: stride=$stride size=$size")
    val ws = col("_ws")
    val start = col("chunk_id") * stride + 1 // slice is 1-based
    docs
      .withColumn("_ws",
        filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= ""))
      .select(
        col(idCol), ws,
        // Empty docs are dropped by exploding an EMPTY array, not by a
        // .filter: Catalyst pushes a filter below the _ws projection by
        // substituting the expression, which would run the (interpreted)
        // tokenize lambda twice per row. The when-guard also keeps
        // `sequence` away from a negative bound (sequence DESCENDS on
        // end < start). Integer division via int cast (Column `/` is
        // double division; operands non-negative so truncation = floor).
        explode(when(size_(ws) >= 1,
            sequence(lit(0), ((size_(ws) - 1) / stride).cast("int")))
          .otherwise(array().cast("array<int>"))).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        size_(slice(ws, start, lit(size))).cast("long").as("n_chunk_tok"),
        concat_ws(" ", slice(ws, start, lit(size))).as("chunk"))
  }

  // `size` the Int parameter shadows functions.size in chunkDocs.
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
