package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-level vocabulary construction and token-id encoding — the
  * tokenizer-prep stage of a training-data pipeline: rank the corpus'
  * tokens by frequency, keep the top `size` as the vocabulary
  * (id = dense rank, 0-based), then rewrite every document into integer
  * token ids with a reserved out-of-vocabulary id.
  *
  * Ranking is by `(count DESC, token ASC)` — a total order (tokens are
  * unique), so the vocabulary is a deterministic pure function of the
  * corpus' token histogram: engine-portable and reproducible across runs,
  * which is what makes the encoded corpus auditable.
  *
  * Scale shape: the histogram is one map-side-combinable shuffle on the
  * token; the top-`size` cut is a distributed TakeOrdered (per-partition
  * top-k, never a global sort of the full token space); the id window
  * then runs over the already-vocab-sized result — `size` rows, bounded
  * by the parameter, never by the corpus. Encoding joins the exploded
  * corpus against the vocab with an explicit broadcast (a vocabulary is
  * the canonical small dimension table).
  */
object Vocab {

  /** Top-`size` vocabulary: `(tok, n, id)` with id 0 = most frequent.
    * Empty tokens (split artifacts of repeated separators) are excluded.
    */
  def build(
      docs: DataFrame,
      size: Int,
      textCol: String = "text"): DataFrame = {
    require(size > 0, s"vocab size must be positive: $size")
    val top = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(size)
    // The single-partition window is over <= `size` rows by construction.
    top.withColumn("id",
      (row_number().over(Window.orderBy(col("n").desc, col("tok").asc)) - 1)
        .cast("long"))
  }

  /** Distributed BPE merge learning (byte-pair encoding, the
    * tokenizer-TRAINING stage; word-level, Sennrich et al. 2016 shape):
    * learn `numMerges` merge rules `(rank, left, right, pair_count)` from
    * the corpus. Returns the ordered merge table — the artifact a BPE
    * tokenizer applies at encode time.
    *
    * Algorithm = the classic iteration, shaped for scale:
    *  1. ONE corpus pass builds the distinct-WORD frequency table
    *     (map-side-combinable shuffle); every later step runs on that
    *     table, whose size is the corpus' vocabulary — millions of rows
    *     at web scale, never corpus-sized. Each word starts as its
    *     character sequence plus a terminal `</w>` symbol.
    *  2. Per merge round: adjacent symbol pairs explode from the word
    *     table weighted by word frequency, one agg picks the top pair
    *     (ONE driver collect of a single row), and a fold over each
    *     word's symbol array rewrites left-to-right non-overlapping
    *     occurrences — the same greedy order the reference algorithm
    *     uses. The word table is eagerly localCheckpoint'ed per round
    *     (lineage truncation — nested cached plans blow up plan
    *     analysis super-linearly past a few dozen rounds) and the
    *     previous round unpersisted; the fold HOF evaluates interpreted
    *     but only over distinct words, not the corpus.
    *
    * The top pair orders by `(count DESC, left ASC, right ASC)` — a
    * total order, so the learned merges are a deterministic pure
    * function of the corpus (the Python reference's `max(stats)` is
    * dict-order-dependent on ties; this one is reproducible).
    * Early-stops when no adjacent pair remains (every word fully
    * merged). Convergence cost: one shuffle + one 1-row collect per
    * merge — rank-k tokenizers (10-50k merges at production scale) batch
    * naturally by raising `numMerges`; rounds are independent of corpus
    * size after step 1.
    */
  def bpeTrain(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text"): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val endMark = "</w>"
    // EVERY round eagerly localCheckpoints its word table: plain persist
    // keeps the full logical chain, and by a few dozen rounds the nested
    // cached plans make analysis/AQE plan rendering blow up super-linearly
    // (measured: a 26-round chain OOM'd the driver building a 2 GB plan
    // string). Checkpointing truncates each round to its materialized
    // blocks — the legitimate iterative-algorithm use, distinct from the
    // shared-subplan anti-pattern BASELINE.md r6 documents — and the
    // table is vocabulary-sized, so the per-round block write is noise.
    // Old rounds' blocks are released by df.unpersist plus the
    // ContextCleaner as references drop.
    var words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat(split(col("w"), ""), array(lit(endMark))).as("syms"),
        col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var rank = 0
      var exhausted = false
      while (rank < numMerges && !exhausted) {
        // (left, right) adjacency counts, weighted by word frequency.
        val top = words
          .filter(size(col("syms")) >= 2)
          .select(
            col("freq"),
            // Equal-length slices (head, tail): arrays_zip would
            // null-pad a ragged pair and leak (last, null) adjacencies.
            explode(arrays_zip(
              slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
              slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("pr"))
          .select(col("pr.l").as("l"), col("pr.r").as("r"), col("freq"))
          .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((rank, l, r, n))
          // Greedy left-to-right merge of (l, r) occurrences via an array
          // fold: append each symbol unless it is `r` arriving right
          // after an unconsumed `l` — then the two collapse. Matches the
          // reference's pairwise walk on overlaps ("aaa" + (a,a) -> [aa, a]).
          val next = words
            .withColumn("syms",
              aggregate(
                col("syms"),
                array().cast("array<string>"),
                (acc, s) => when(
                  size(acc) > 0 &&
                    element_at(acc, size(acc)) === lit(l) && s === lit(r),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                  .otherwise(concat(acc, array(s)))))
            .localCheckpoint()
          words.unpersist(blocking = false)
          words = next
          rank += 1
        }
      }
    } finally words.unpersist(blocking = false)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
      .select(
        col("rank").cast("long").as("rank"),
        col("left"), col("right"), col("pair_count"))
  }

  /** Apply learned BPE merges (from [[bpeTrain]]) to documents: every
    * word segments into its BPE subword tokens, emitted as
    * `(idCol, pos, sub, token)` — `pos` the word's 1-based position in
    * the raw token array (empty split artifacts skipped, not renumbered,
    * matching [[encode]]), `sub` the 1-based subword index within the
    * word, `token` the subword string (terminal symbol carries the
    * `</w>` marker).
    *
    * Scale shape: merges are a learned ARTIFACT (10-50k rows at
    * production scale) — collected once and shipped in the task closure;
    * segmentation runs over the DISTINCT-word table (vocabulary-sized,
    * never corpus-sized) as per-partition imperative logic (the ranked
    * merge loop is a genuine pointer-walking algorithm — a 10k-deep
    * nested Column expression would neither plan nor codegen), and the
    * corpus then broadcast-joins words to their cached segmentations.
    */
  def bpeSegment(
      docs: DataFrame,
      merges: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules: Array[(String, String)] = merges
      .orderBy(col("rank").asc)
      .select(col("left"), col("right"))
      .as[(String, String)].collect()
    val endMark = "</w>"
    val segmented = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .as[String]
      .mapPartitions { words =>
        words.map { w =>
          var syms = (w.map(_.toString) :+ endMark).toBuffer
          rules.foreach { case (l, r) =>
            // Greedy left-to-right pass, same order as bpeTrain's fold.
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == l && syms(i + 1) == r) {
                syms(i) = l + r
                syms.remove(i + 1)
              }
              i += 1
            }
          }
          (w, syms.toSeq)
        }
      }.toDF("w", "syms")
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("_p", "w")))
      .filter(col("w") =!= "")
      .join(broadcast(segmented), Seq("w"))
      .select(
        col(idCol),
        (col("_p") + 1).cast("long").as("pos"),
        posexplode(col("syms")).as(Seq("_s", "token")))
      .select(
        col(idCol), col("pos"),
        (col("_s") + 1).cast("long").as("sub"), col("token"))
  }

  /** Encode documents against `vocab` (from [[build]]) into exploded
    * `(id, pos, token_id)` rows — `pos` is the 1-based index in the RAW
    * token array (positions of empty split artifacts are skipped, not
    * renumbered), `token_id` is the vocab id or `oovId` when the token is
    * out-of-vocabulary.
    */
  def encode(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      oovId: Long = -1L): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("_p", "tok")))
      .filter(col("tok") =!= "")
      .join(broadcast(vocab.select(col("tok"), col("id"))), Seq("tok"), "left")
      .select(
        col(idCol),
        (col("_p") + 1).cast("long").as("pos"),
        coalesce(col("id"), lit(oovId)).as("token_id"))
}
