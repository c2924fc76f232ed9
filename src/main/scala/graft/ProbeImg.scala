package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration probe for the image near-dup query (run manually, like
  * [[Probe]]): renders the synthetic corpus + resized copies at a given
  * sf dir's doc_id set, then reports the planted-pair dHash distance
  * distribution and the minimum cross-pair distance — the numbers that
  * justify the query's maxHamming gate. Usage:
  * `sbt "runMain graft.ProbeImg /root/testdata/sf0.01"`.
  */
object ProbeImg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ids = Tables.load(spark, args(0), "documents").select("doc_id")
      .repartition(spark.sparkContext.defaultParallelism)
    val base = ops.Multimodal.renderSyntheticImages(ids, 64, 64)
      .toDF("doc_id", "payload")
    val copies = ops.Multimodal.resizeImagesBatched(
      base.filter($"doc_id" % 5 === 0), 48, 48)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"payload")
    val all = base.unionByName(copies)
    val sigs = ops.Multimodal.dHashImagesBatched(all)
      .toDF("doc_id", "decoded", "dhash").cache()
    require(sigs.filter(!$"decoded").count() == 0, "all payloads must decode")

    val planted = sigs.as("a").join(
        sigs.as("b"), col("a.doc_id") + 1000000L === col("b.doc_id"))
      .select(graft.ops.TextStats.hamming(col("a.dhash"), col("b.dhash")).as("d"))
    println("planted pair distances: " + planted.groupBy("d").count()
      .orderBy("d").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))

    // cross pairs: exclude the planted mapping
    val cross = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          col("a.doc_id") + 1000000L =!= col("b.doc_id"))
      .select(graft.ops.TextStats.hamming(col("a.dhash"), col("b.dhash")).as("d"))
    println("min cross distance: " + cross.agg(min("d")).collect()(0).get(0))
    println("cross pairs under 16: " + cross.filter($"d" <= 16).count())

    // ---- rotation-robust family calibration (r14, q95) -----------------
    // Planted copies: pure 90°/180° rotations, a mirrored 270°, and a
    // rotation of a RESIZED copy (augmentation chain). Family distance =
    // min hamming over orientation pairs; the q95 gate must sit above
    // every planted family distance and below the closest unrelated one.
    // The exact q95 plant sets: pure 90° rotations at +2000000, the full
    // augmentation chain (resize 48x48 -> mirror -> 270°) at +4000000.
    val every7 = base.filter($"doc_id" % 7 === 0)
    val rot90 = ops.Multimodal.rotateImagesBatched(every7, 1)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"payload")
    val chain = ops.Multimodal.rotateImagesBatched(
        ops.Multimodal.resizeImagesBatched(every7, 48, 48)
          .select($"doc_id", $"payload"), 3, mirror = true)
      .select(($"doc_id" + 4000000L).as("doc_id"), $"payload")
    val fam = ops.Multimodal.dHash8ImagesBatched(
        base.unionByName(rot90).unionByName(chain))
      .toDF("doc_id", "decoded", "hhashes", "vhashes").cache()
    require(fam.filter(!$"decoded").count() == 0, "all rotated payloads must decode")
    val ex = fam
      .select($"doc_id", posexplode(arrays_zip($"hhashes", $"vhashes")).as(Seq("o", "hv")))
      .select($"doc_id", $"o", $"hv.hhashes".as("h1"), $"hv.vhashes".as("h2"))
    def d128 = graft.ops.TextStats.hamming(col("a.h1"), col("b.h1")).cast("long") +
      graft.ops.TextStats.hamming(col("a.h2"), col("b.h2")).cast("long")
    val exBase = ex.filter($"doc_id" < 1000000L)
    for (off <- Seq(2000000L, 4000000L)) {
      val d = exBase.as("a").join(ex.as("b"), col("a.doc_id") + off === col("b.doc_id"))
        .groupBy(col("a.doc_id")).agg(min(d128).as("d"))
      println(s"family dist base->plant (offset $off): " + d.groupBy("d").count()
        .orderBy("d").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    }
    // the plant-vs-plant pairs (rot90 of d vs chained copy of d) are
    // same-source too — the q95 output maps pairs back to base ids and
    // dedups, but their distance must ALSO clear the gate to pair
    val p2p = ex.filter($"doc_id" >= 2000000L && $"doc_id" < 3000000L).as("a")
      .join(ex.as("b"), col("a.doc_id") + 2000000L === col("b.doc_id"))
      .groupBy(col("a.doc_id")).agg(min(d128).as("d"))
    println("family dist plant->plant (rot90 vs chain): " + p2p.groupBy("d").count()
      .orderBy("d").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    // closest unrelated family pair, found via the banded wide operator
    // itself at a wide gate (pigeonhole recall is complete, so absence at
    // 40 bounds the true min above 40)
    val oids = ex.select(($"doc_id" * 8 + $"o").as("oid"), $"h1", $"h2")
    val at40 = ops.DedupDocs.hammingNearDupPairsWide(oids, "oid", Seq("h1", "h2"), 40)
      .select(floor($"d1" / 8).cast("long").as("a"),
        floor($"d2" / 8).cast("long").as("b"), $"dist")
      // same-source pairs (any two orientations/copies of one base image)
      // share the base id residue — everything else is unrelated
      .filter($"a" % 1000000L =!= $"b" % 1000000L)
    val unrelated = at40.groupBy($"a", $"b").agg(min($"dist").as("d"))
    println("closest unrelated family pair <= 40 (128-bit): " +
      unrelated.agg(min("d")).collect()(0).get(0) +
      " (pairs: " + unrelated.count() + ")")

    // ---- crop-robust keypoint calibration (r15, q96) -------------------
    // Planted copies of every 7th image: a 52x52 crop at (6,6)
    // (+3000000) and a 48x48 crop at (8,4) (+5000000). Report keypoint
    // counts, the planted pairs' shared-distinct-signature distribution
    // (the q96 minShared gate must sit at or below its minimum), and the
    // max shared count among unrelated pairs (the gate must sit above
    // it). Interior keypoints of a lossless crop reproduce bit-exactly,
    // so planted sharing is bounded only by border loss + top-K churn.
    val crop1 = ops.Multimodal.cropImagesBatched(every7, 6, 6, 52, 52)
      .select(($"doc_id" + 3000000L).as("doc_id"), $"payload")
    val crop2 = ops.Multimodal.cropImagesBatched(every7, 8, 4, 48, 48)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"payload")
    val kp = ops.Multimodal.keypointHashImagesBatched(
        base.unionByName(crop1).unionByName(crop2))
      .toDF("doc_id", "decoded", "sigs").cache()
    require(kp.filter(!$"decoded").count() == 0, "all cropped payloads must decode")
    println("keypoints per image (min/avg/max): " +
      kp.select(size($"sigs").as("n")).agg(min("n"), avg("n"), max("n")).collect()(0))
    val nPlanted = every7.count()
    val kpx = kp.select($"doc_id", explode($"sigs").as("sig"))
    val shared = ops.DedupDocs.sharedSigPairs(kpx, "doc_id", "sig", 1).cache()
    for (off <- Seq(3000000L, 5000000L)) {
      val p = shared.filter($"d1" + off === $"d2")
      println(s"planted shared-sig counts (offset $off): " +
        p.groupBy("shared").count().orderBy("shared")
          .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ") +
        s" | pairs sharing >=1: ${p.count()} / $nPlanted planted")
    }
    // crop1 <-> crop2 of one source share only keypoints interior to BOTH
    // crops — the weakest same-source pair class; q96's output maps pairs
    // to base ids, so these too must clear (or the query must exclude them)
    val p2pCrop = shared.filter($"d1" >= 3000000L && $"d1" < 4000000L &&
      $"d2" === $"d1" + 2000000L)
    println("crop1<->crop2 shared-sig counts: " +
      p2pCrop.groupBy("shared").count().orderBy("shared")
        .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ") +
      s" | pairs sharing >=1: ${p2pCrop.count()} / $nPlanted")
    val unrelatedShared = shared.filter($"d1" % 1000000L =!= $"d2" % 1000000L)
    println("unrelated pairs sharing >=1 sig: " + unrelatedShared.count() +
      ", max shared: " +
      unrelatedShared.agg(max("shared")).collect()(0).get(0))

    // ---- lossy re-encode calibration (r16, q100) -----------------------
    // JPEG-re-encoded copies (the most common real duplicate class) of
    // every 7th image, at several qualities, plus the chained classes
    // (jpeg of a resized copy — the dHash8 lane; jpeg of a crop — the
    // keypoint lane). Reports: dHash8 family distance distributions per
    // quality (the q100 gate must sit above every planted distance and
    // below the unrelated floor measured above), exact-keypoint sig
    // survival under JPEG noise (expected ~zero — bit-exact integer
    // functions of raw pixels), and the banded/quantized variant if one
    // is calibrated later.
    for (q <- Seq(0.9f, 0.7f, 0.5f)) {
      val jp = ops.Multimodal.reencodeJpegImagesBatched(every7, q)
        .select(($"doc_id" + 6000000L).as("doc_id"), $"payload")
      val famJ = ops.Multimodal.dHash8ImagesBatched(base.unionByName(jp))
        .toDF("doc_id", "decoded", "hhashes", "vhashes")
      require(famJ.filter(!$"decoded").count() == 0, "all jpeg payloads must decode")
      val exJ = famJ
        .select($"doc_id", posexplode(arrays_zip($"hhashes", $"vhashes")).as(Seq("o", "hv")))
        .select($"doc_id", $"o", $"hv.hhashes".as("h1"), $"hv.vhashes".as("h2"))
      val dJ = exJ.filter($"doc_id" < 1000000L).as("a")
        .join(exJ.as("b"), col("a.doc_id") + 6000000L === col("b.doc_id"))
        .groupBy(col("a.doc_id")).agg(min(d128).as("d"))
      println(s"jpeg($q) dHash8 family dist base->reencode: " + dJ.groupBy("d").count()
        .orderBy("d").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      // exact keypoint sig survival under this quality
      val kpJ = ops.Multimodal.keypointHashImagesBatched(base.unionByName(jp))
        .toDF("doc_id", "decoded", "sigs")
        .select($"doc_id", explode($"sigs").as("sig"))
      val sharedJ = ops.DedupDocs.sharedSigPairs(kpJ, "doc_id", "sig", 1)
        .filter($"d1" + 6000000L === $"d2")
      println(s"jpeg($q) exact-keypoint planted pairs sharing >=1 sig: " +
        sharedJ.count() + s" / $nPlanted, shared dist: " +
        sharedJ.groupBy("shared").count().orderBy("shared")
          .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    }
    // chained: resize 48x48 -> jpeg(0.7) (the q100 dHash8 chain class)
    val chainJ = ops.Multimodal.reencodeJpegImagesBatched(
        ops.Multimodal.resizeImagesBatched(every7, 48, 48)
          .select($"doc_id", $"payload"), 0.7f)
      .select(($"doc_id" + 7000000L).as("doc_id"), $"payload")
    val famC = ops.Multimodal.dHash8ImagesBatched(base.unionByName(chainJ))
      .toDF("doc_id", "decoded", "hhashes", "vhashes")
    val exC = famC
      .select($"doc_id", posexplode(arrays_zip($"hhashes", $"vhashes")).as(Seq("o", "hv")))
      .select($"doc_id", $"o", $"hv.hhashes".as("h1"), $"hv.vhashes".as("h2"))
    val dC = exC.filter($"doc_id" < 1000000L).as("a")
      .join(exC.as("b"), col("a.doc_id") + 7000000L === col("b.doc_id"))
      .groupBy(col("a.doc_id")).agg(min(d128).as("d"))
    println("resize48+jpeg(0.7) dHash8 family dist: " + dC.groupBy("d").count()
      .orderBy("d").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    // unrelated floor WITH jpeg copies in the pool (must stay >> the gate)
    val oidsJ = exC.select(($"doc_id" * 8 + $"o").as("oid"), $"h1", $"h2")
    val at40J = ops.DedupDocs.hammingNearDupPairsWide(oidsJ, "oid", Seq("h1", "h2"), 40)
      .select(floor($"d1" / 8).cast("long").as("a"),
        floor($"d2" / 8).cast("long").as("b"), $"dist")
      .filter($"a" % 1000000L =!= $"b" % 1000000L)
    println("closest unrelated (incl. jpeg copies) <= 40: " +
      at40J.agg(min("dist")).collect()(0).get(0))

    // ---- blurred keypoint family (r16): jpeg + crop chain --------------
    // The exact family is bit-fragile under JPEG (measured above); the
    // blur-preprocessed variant attenuates the noise while keeping crop
    // exactness. Measure, per blur radius: pure jpeg survival, the
    // jpeg-after-crop chain, the lossless crop (sanity — blur must not
    // hurt it), and the unrelated floor (blur lowers descriptor entropy,
    // so the floor must be re-measured for this family).
    // r16 sweep (sf0.01) measured (blur, maxKeypoints, minGradient) in
    // {(2,32,3),(3,32,3),(2,48,2),(3,48,2)}: every variant paired 72/72
    // crop+jpeg(0.8) plants with unrelated floor 0; blur=2 at the default
    // keypoint params had the best worst-case (min shared 3 vs 2 for
    // blur=3) — that is the shipped q101 family. The jpeg<->crop+jpeg
    // plant-to-plant class measured min 1 in EVERY variant, which is why
    // q101 plants only one copy class.
    for ((blurR, mk, mg) <- Seq((2, 32, 3))) {
      val tag = s"blur=$blurR,mk=$mk,mg=$mg"
      val jpeg07 = ops.Multimodal.reencodeJpegImagesBatched(every7, 0.7f)
        .select(($"doc_id" + 6000000L).as("doc_id"), $"payload")
      val cropJpeg = ops.Multimodal.reencodeJpegImagesBatched(
          ops.Multimodal.cropImagesBatched(every7, 6, 6, 52, 52)
            .select($"doc_id", $"payload"), 0.8f)
        .select(($"doc_id" + 8000000L).as("doc_id"), $"payload")
      val kpRows = ops.Multimodal.keypointHashImagesBatched(
          base.unionByName(jpeg07).unionByName(cropJpeg),
          maxKeypoints = mk, minGradient = mg, blur = blurR)
        .toDF("doc_id", "decoded", "sigs").cache()
      println(s"$tag keypoints per image (min/avg/max): " +
        kpRows.select(size($"sigs").as("n")).agg(min("n"), avg("n"), max("n")).collect()(0))
      val kpB = kpRows.select($"doc_id", explode($"sigs").as("sig"))
      val sharedB = ops.DedupDocs.sharedSigPairs(kpB, "doc_id", "sig", 1).cache()
      for ((off, namE) <- Seq((6000000L, "jpeg(0.7)"), (8000000L, "crop+jpeg(0.8)"))) {
        val p = sharedB.filter($"d1" + off === $"d2")
        println(s"$tag $namE planted shared: " +
          p.groupBy("shared").count().orderBy("shared")
            .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ") +
          s" | pairs >=1: ${p.count()} / $nPlanted")
      }
      // jpeg <-> crop+jpeg of one source (the weakest same-source class
      // if a query plants both)
      val p2pJ = sharedB.filter($"d1" >= 6000000L && $"d1" < 7000000L &&
        $"d2" === $"d1" + 2000000L)
      println(s"$tag jpeg<->crop+jpeg shared: " +
        p2pJ.groupBy("shared").count().orderBy("shared")
          .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ") +
        s" | pairs >=1: ${p2pJ.count()} / $nPlanted")
      val unrelB = sharedB.filter($"d1" % 1000000L =!= $"d2" % 1000000L)
      println(s"$tag unrelated pairs sharing >=1 sig: " + unrelB.count() +
        ", max shared: " + unrelB.agg(max("shared")).collect()(0).get(0))
      sharedB.unpersist()
      kpRows.unpersist()
    }
    spark.stop()
  }
}
