package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r21 optimization gate: the fused render→transform→hash pipelines
  * (`renderDHash8Batched` / `renderDHashBatched` / `renderKeypointsBatched`)
  * must be BIT-IDENTICAL to composing `renderSyntheticImages` with the
  * standalone batched operators through their lossless-PNG payload hops —
  * every ProbeImg calibration (q90/q95/q96/q100/q101 gates) rides on the
  * fused variants producing exactly the hashes the composed chain did.
  * Each case covers one transform chain a bench query uses.
  */
class ImageFusionSpec extends SparkSpec {
  import Multimodal.RasterXform._

  // a spread of ids incl. the %7 plant class the queries transform
  private lazy val ids =
    spark.range(0, 60).select((col("id") * lit(7)).as("doc_id"))
      .unionAll(spark.range(100, 130).select(col("id").as("doc_id")))

  private def base = Multimodal.renderSyntheticImages(ids, 64, 64)
    .toDF("doc_id", "payload")

  private def d8Map(df: org.apache.spark.sql.Dataset[Multimodal.ImageDHash8]) =
    df.collect().map(r =>
      r.doc_id -> ((r.hhashes.toSeq, r.vhashes.toSeq, r.decoded))).toMap

  test("fused dHash8 == composed render→PNG→dHash8 (identity chain)") {
    val fused = d8Map(Multimodal.renderDHash8Batched(ids, 64, 64))
    val composed = d8Map(Multimodal.dHash8ImagesBatched(base))
    assert(fused == composed)
  }

  test("fused rotate chain == composed rotate operator (q95 rot90 branch)") {
    val fused = d8Map(Multimodal.renderDHash8Batched(
      ids, 64, 64, Seq(Rotate(1))))
    val composed = d8Map(Multimodal.dHash8ImagesBatched(
      Multimodal.rotateImagesBatched(base, 1).toDF()
        .select(col("doc_id"), col("payload"))))
    assert(fused == composed)
  }

  test("fused resize+rotate(mirror) chain == composed (q95 chain branch)") {
    val fused = d8Map(Multimodal.renderDHash8Batched(
      ids, 64, 64, Seq(Resize(48, 48), Rotate(3, mirror = true))))
    val composed = d8Map(Multimodal.dHash8ImagesBatched(
      Multimodal.rotateImagesBatched(
        Multimodal.resizeImagesBatched(base, 48, 48).toDF()
          .select(col("doc_id"), col("payload")), 3, mirror = true).toDF()
        .select(col("doc_id"), col("payload"))))
    assert(fused == composed)
  }

  test("fused jpeg round-trip == composed reencode operator (q100 branches)") {
    val fusedPure = d8Map(Multimodal.renderDHash8Batched(
      ids, 64, 64, Seq(Jpeg(0.5f))))
    val composedPure = d8Map(Multimodal.dHash8ImagesBatched(
      Multimodal.reencodeJpegImagesBatched(base, 0.5f).toDF()
        .select(col("doc_id"), col("payload"))))
    assert(fusedPure == composedPure)
    val fusedChain = d8Map(Multimodal.renderDHash8Batched(
      ids, 64, 64, Seq(Resize(48, 48), Jpeg(0.7f))))
    val composedChain = d8Map(Multimodal.dHash8ImagesBatched(
      Multimodal.reencodeJpegImagesBatched(
        Multimodal.resizeImagesBatched(base, 48, 48).toDF()
          .select(col("doc_id"), col("payload")), 0.7f).toDF()
        .select(col("doc_id"), col("payload"))))
    assert(fusedChain == composedChain)
  }

  private def kpMap(df: org.apache.spark.sql.Dataset[Multimodal.ImageKeypoints]) =
    df.collect().map(r => r.doc_id -> ((r.sigs.toSeq, r.decoded))).toMap

  test("fused keypoints == composed crop chains (q96 exact family)") {
    for ((x0, y0, cw, ch) <- Seq((6, 6, 52, 52), (8, 4, 48, 48))) {
      val fused = kpMap(Multimodal.renderKeypointsBatched(
        ids, 64, 64, Seq(Crop(x0, y0, cw, ch))))
      val composed = kpMap(Multimodal.keypointHashImagesBatched(
        Multimodal.cropImagesBatched(base, x0, y0, cw, ch).toDF()
          .select(col("doc_id"), col("payload"))))
      assert(fused == composed, s"crop($x0,$y0,${cw}x$ch)")
    }
    // base (no chain) on the exact family too
    assert(kpMap(Multimodal.renderKeypointsBatched(ids, 64, 64)) ==
      kpMap(Multimodal.keypointHashImagesBatched(base)))
  }

  test("fused keypoints == composed crop+jpeg chain (q101 blur=2 family)") {
    val fused = kpMap(Multimodal.renderKeypointsBatched(
      ids, 64, 64, Seq(Crop(6, 6, 52, 52), Jpeg(0.8f)), blur = 2))
    val composed = kpMap(Multimodal.keypointHashImagesBatched(
      Multimodal.reencodeJpegImagesBatched(
        Multimodal.cropImagesBatched(base, 6, 6, 52, 52).toDF()
          .select(col("doc_id"), col("payload")), 0.8f).toDF()
        .select(col("doc_id"), col("payload")), blur = 2))
    assert(fused == composed)
    // base branch of the blur=2 family
    assert(
      kpMap(Multimodal.renderKeypointsBatched(ids, 64, 64, Nil, blur = 2)) ==
        kpMap(Multimodal.keypointHashImagesBatched(base, blur = 2)))
  }

  test("fused 64-bit dHash == composed (q90 base + resize branches)") {
    def dMap(df: org.apache.spark.sql.Dataset[Multimodal.ImageDHash]) =
      df.collect().map(r => r.doc_id -> ((r.dhash, r.decoded))).toMap
    assert(dMap(Multimodal.renderDHashBatched(ids, 64, 64)) ==
      dMap(Multimodal.dHashImagesBatched(base)))
    assert(dMap(Multimodal.renderDHashBatched(ids, 64, 64, Seq(Resize(48, 48)))) ==
      dMap(Multimodal.dHashImagesBatched(
        Multimodal.resizeImagesBatched(base, 48, 48).toDF()
          .select(col("doc_id"), col("payload")))))
  }
}
