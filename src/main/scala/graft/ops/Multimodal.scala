package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with frame sampling and feature extraction as narrow per-row
  * transformations.
  *
  * The decode step is STUBBED: this container has no image/audio codecs,
  * so "decode" is a deterministic fake (md5 of the sampled bytes). The
  * Spark-side contract is real and tested — schema (payload binary +
  * metadata struct), deterministic offset arithmetic, per-frame explode,
  * and batch-friendly shapes (everything is codegen'd builtins; a real
  * decoder would drop in as `mapInPandas`/`mapPartitions` over the same
  * schema without touching the surrounding plan).
  */
object Multimodal {

  /** Wrap a text corpus as binary assets: `payload: binary` + metadata
    * struct — the canonical multimodal storage schema.
    */
  def toAssets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        // length over the ENCODED payload = bytes; length(text) would be
        // a char count and under-report for any multi-byte text, breaking
        // consumers doing offset math against the binary payload.
        length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** Sample `nFrames` fixed-width windows at evenly spaced offsets of the
    * payload (video-frame-sampling shape: offset_i = floor(i*len/n)).
    * Returns one row per (asset, frame) with the stubbed decoded feature.
    */
  def sampleFrames(
      assets: DataFrame,
      nFrames: Int = 4,
      frameBytes: Int = 16,
      idCol: String = "doc_id"): DataFrame = {
    val len = length(col("payload"))
    val frames = transform(
      sequence(lit(0), lit(nFrames - 1)),
      i => col("payload").substr(
        floor(i.cast("double") * len.cast("double") / lit(nFrames.toDouble)).cast("int") + lit(1),
        lit(frameBytes)))
    assets
      .select(col(idCol), col("meta"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .withColumn("feature", decodeStub(col("frame")))
  }

  /** Deterministic fake decoder (see class doc): md5 hex of the bytes. */
  def decodeStub(frame: Column): Column = md5(frame)

  /** One decoded frame produced by [[decodeFramesBatched]]. */
  final case class DecodedFrame(doc_id: Long, frame_idx: Int, feature: String)

  /** Batched decode plumbing: the partition-iterator shape a real codec
    * needs (open one decoder handle per partition, stream record batches
    * through it) — Scala's equivalent of `mapInPandas`. The decode itself
    * is the same deterministic stub; swapping in a JNI/codec call changes
    * only the marked line, not the plan, schema, or batching.
    */
  def decodeFramesBatched(
      frames: DataFrame,
      idCol: String = "doc_id"): org.apache.spark.sql.Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.select(col(idCol), col("frame_idx"), col("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "decoder handle" (a real impl opens its codec here)
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, idx, bytes) =>
          digest.reset()
          val feature = digest.digest(bytes).map("%02x".format(_)).mkString // <- codec call
          DecodedFrame(id, idx, feature)
        }
      }
  }
}
