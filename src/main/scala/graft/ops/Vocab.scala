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
