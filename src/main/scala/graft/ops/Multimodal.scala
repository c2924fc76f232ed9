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

  /** One decoded image produced by [[decodeImagesBatched]]: real pixel
    * dimensions + a hash over the decoded ARGB raster (`decoded = true`),
    * or the opaque-payload md5 fallback with -1 dims for payloads no
    * installed codec can read (`decoded = false`).
    */
  final case class DecodedImage(
      doc_id: Long, width: Int, height: Int, decoded: Boolean, feature: String)

  /** One resized image produced by [[resizeImagesBatched]]: the re-encoded
    * PNG payload plus a hash of the resized ARGB raster (`resized = true`),
    * or the original payload passed through untouched with -1 dims when no
    * installed codec can read it (`resized = false`).
    */
  final case class ResizedImage(
      doc_id: Long, width: Int, height: Int, resized: Boolean,
      payload: Array[Byte], feature: String)

  /** REAL resize path (JDK-only, `java.awt` software rendering — no
    * external libraries): decode, scale to `targetW`×`targetH` with
    * explicit NEAREST-NEIGHBOR interpolation (integer pixel selection —
    * deterministic across platforms, unlike filtered kernels whose
    * float rounding may vary), re-encode as PNG (lossless, so
    * decode(payload) reproduces exactly the hashed raster). Payloads
    * ImageIO cannot read pass through unchanged with `resized = false`.
    * Same batched `mapPartitions` contract as [[decodeImagesBatched]].
    */
  def resizeImagesBatched(
      assets: DataFrame,
      targetW: Int,
      targetH: Int,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): org.apache.spark.sql.Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    import assets.sparkSession.implicits._
    assets.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = {
          digest.reset()
          digest.digest(b).map("%02x".format(_)).mkString
        }
        it.map { case (id, bytes) =>
          // JDK codecs throw RuntimeExceptions (NegativeArraySizeException,
          // IllegalArgumentException, CCE) on some malformed payloads, not
          // just IOException — NonFatal keeps the unreadable-pass-through
          // contract on raw-crawl garbage instead of killing the task.
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) ResizedImage(id, -1, -1, resized = false, bytes, hex(bytes))
            else {
              val dst = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_ARGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
                g.drawImage(img, 0, 0, targetW, targetH, null)
              } finally g.dispose()
              val argb = dst.getRGB(0, 0, targetW, targetH, null, 0, targetW)
              val bb = java.nio.ByteBuffer.allocate(argb.length * 4)
              argb.foreach(bb.putInt)
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              ResizedImage(id, targetW, targetH, resized = true, out.toByteArray, hex(bb.array()))
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              ResizedImage(id, -1, -1, resized = false, bytes, hex(bytes))
          }
        }
      }
  }

  /** REAL decode path for formats the JDK ships codecs for (PNG, JPEG, GIF,
    * BMP via `javax.imageio` — no external libraries): decodes the binary
    * payload to pixels per partition and emits dimensions + a
    * platform-independent md5 over the ARGB raster (lossless formats decode
    * bit-identically everywhere, so the hash is deterministic). Payloads
    * ImageIO cannot read (no codec / not an image) keep the md5-of-bytes
    * stub with `decoded = false` — same column shape, so mixed corpora scan
    * in one pass. Same batched `mapPartitions` contract as
    * [[decodeFramesBatched]]: one reusable digest per partition, streaming
    * iterator, no per-row handle churn.
    */
  def decodeImagesBatched(
      assets: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): org.apache.spark.sql.Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = {
          digest.reset()
          digest.digest(b).map("%02x".format(_)).mkString
        }
        it.map { case (id, bytes) =>
          // NonFatal, not just IOException: JDK codecs throw runtime
          // exceptions on some malformed payloads (see resizeImagesBatched).
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) DecodedImage(id, -1, -1, decoded = false, hex(bytes))
            else {
              val w = img.getWidth
              val h = img.getHeight
              // getRGB normalizes every color model to packed ARGB ints, so
              // the hash doesn't depend on the file's internal pixel layout.
              val argb = img.getRGB(0, 0, w, h, null, 0, w)
              val bb = java.nio.ByteBuffer.allocate(argb.length * 4)
              argb.foreach(bb.putInt)
              DecodedImage(id, w, h, decoded = true, hex(bb.array()))
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              DecodedImage(id, -1, -1, decoded = false, hex(bytes))
          }
        }
      }
  }
}
