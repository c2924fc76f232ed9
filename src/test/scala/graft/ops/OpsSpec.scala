package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.Tables.load(spark, sfDir, "documents")
  private def embs = graft.Tables.load(spark, sfDir, "embeddings")

  // ---- dedup --------------------------------------------------------------

  test("exactDups groups identical texts and keeps the min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = DedupDocs.exactDups(df)
      .select("n_dups", "keeper").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((2L, 1L), (1L, 3L)))
  }

  test("shingles: word trigrams, distinct, none for short docs") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val got = DedupDocs.shingleStrings(df).as[(Long, String)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((1L, "a b c"), (1L, "b c d")))
    // The production (fingerprint) form is exactly xxhash64 of the string
    // form — same rows, 8-byte keys (what every index consumer shuffles).
    val fp = DedupDocs.shingles(df).as[(Long, Long)].collect().toSet
    val expected = DedupDocs.shingleStrings(df)
      .select($"doc_id", xxhash64($"shingle"))
      .as[(Long, Long)].collect().toSet
    assert(fp == expected)
  }

  test("minhash-LSH candidates achieve full recall on >=0.5-jaccard pairs (sf0.001)") {
    // ground truth: exact inverted-index jaccard pairs
    val exact = DedupDocs.jaccardPairs(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val cand = DedupDocs.minhashCandidates(docs)
      .as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand),
      s"LSH missed ${exact -- cand} of ${exact.size} true pairs")
    // verified output == exact output (same pairs, same stats)
    val verified = DedupDocs.minhashVerifiedPairs(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(verified == exact)
  }

  test("maxDf drops hot shingles: capped jaccard keeps only discriminating pairs") {
    // Docs 1-5 share the viral trigram "common common common" (df = 5);
    // each also carries one unique trigram. Docs 6-7 are identical.
    val hot = (1 to 5).map(i => (i.toLong, s"common common common tail$i"))
    val dup = Seq((6L, "x y z q r"), (7L, "x y z q r"))
    val d = (hot ++ dup).toDF("doc_id", "text")
    // Uncapped at jac >= 1/3: every hot pair shares 1 of its 2 shingles
    // (jac = 1/3) plus the planted dup — 10 + 1 pairs.
    val uncapped = DedupDocs.jaccardPairs(d, num = 1, den = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 11, s"uncapped must keep boilerplate pairs: $uncapped")
    // maxDf = 4 drops the df-5 viral shingle (its ONLY discriminating
    // content was boilerplate) but keeps the df-2 dup shingles.
    val capped = DedupDocs.jaccardPairs(d, num = 1, den = 3, maxDf = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped == Set((6L, 7L)), s"capped must keep only the true dup: $capped")
    // Same cap through the minhash-LSH path computes the identical metric.
    val mh = DedupDocs.minhashVerifiedPairs(d, num = 1, den = 3, maxDf = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(mh == capped, s"minhash path must match capped exact path: $mh")
  }

  test("maxDf is stamped on the minhash index and enforced end-to-end") {
    val hot = (1 to 5).map(i => (i.toLong, s"common common common tail$i"))
    val dup = Seq((6L, "x y z q r"), (7L, "x y z q r"))
    val corpus = (hot ++ dup).toDF("doc_id", "text")
    val idxDir = tempDir("mh-dfcap").resolve("idx").toString
    DedupDocs.writeMinhashIndex(corpus, idxDir, maxDf = 4)
    // probing with a different cap = incompatible minhash spaces -> loud
    val e = intercept[IllegalArgumentException](
      DedupDocs.dedupeAgainstIndex(corpus.limit(1), corpus, idxDir))
    assert(e.getMessage.contains("maxDf"))
    val e2 = intercept[IllegalArgumentException](
      DedupDocs.appendToMinhashIndex(corpus.limit(1), idxDir, maxDf = 3))
    assert(e2.getMessage.contains("maxDf"))
    // matching cap: a batch copy of the planted dup matches both sources
    // (signatures agree because the dup shingles survive the cap on both
    // sides; verify is symmetric capped-vs-capped)
    val batch = Seq((106L, "x y z q r")).toDF("doc_id", "text")
    val pairs = DedupDocs.dedupeAgainstIndex(batch, corpus, idxDir, maxDf = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((106L, 6L), (106L, 7L)), s"dup batch must match sources: $pairs")
    // a batch that is ONLY boilerplate finds nothing: the hot shingle was
    // dropped from the index at build, so no band can collide with it
    val boiler = Seq((200L, "common common common common common")).toDF("doc_id", "text")
    assert(DedupDocs.dedupeAgainstIndex(boiler, corpus, idxDir, maxDf = 4).isEmpty,
      "boilerplate-only batch must not match a capped index")
  }

  test("incremental dedup finds batch-vs-corpus duplicates via the stored index") {
    val corpus = docs.limit(60)
    val idxDir = tempDir("mh-idx").resolve("idx").toString
    DedupDocs.writeMinhashIndex(corpus, idxDir)
    // batch: copies of three corpus docs (re-keyed) + one unrelated doc
    val copies = corpus.filter($"doc_id".isin(0L, 7L, 14L))
      .withColumn("doc_id", $"doc_id" + 5000L)
    val fresh = Seq((9999L, "zq xv qj wk pf mz unique gibberish tokens nowhere else at all"))
      .toDF("doc_id", "text")
    val batch = copies.select("doc_id", "text").unionByName(fresh)
    val pairs = DedupDocs.dedupeAgainstIndex(batch, corpus, idxDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(Set((5000L, 0L), (5007L, 7L), (5014L, 14L)).subsetOf(pairs),
      s"each copy must match its source: $pairs")
    assert(!pairs.exists(_._1 == 9999L), s"unrelated doc must not match: $pairs")
  }

  test("incremental ingestion loop: dedupe, accept survivors, next batch sees them") {
    val corpus = docs.limit(40)
    val idxDir = tempDir("mh-loop").resolve("idx").toString
    DedupDocs.writeMinhashIndex(corpus, idxDir)
    // batch 1: one fresh doc — no duplicates — gets accepted into the index
    val b1 = Seq((7001L, "entirely novel tokens xqz wvu rrt ppl mmx kkj hhg ffd ssa")).toDF("doc_id", "text")
    assert(DedupDocs.dedupeAgainstIndex(b1, corpus, idxDir).isEmpty)
    DedupDocs.appendToMinhashIndex(b1, idxDir)
    // batch 2: a copy of batch 1's doc — must now be caught against the index
    val b2 = Seq((8001L, "entirely novel tokens xqz wvu rrt ppl mmx kkj hhg ffd ssa")).toDF("doc_id", "text")
    val allDocs = corpus.select("doc_id", "text").unionByName(b1)
    val hits = DedupDocs.dedupeAgainstIndex(b2, allDocs, idxDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(hits.contains((8001L, 7001L)), s"appended doc must be dedup-visible: $hits")
  }

  test("streaming ingestion loop: foreachBatch dedupes each micro-batch against the stored index") {
    // The production shape end-to-end: a document STREAM flows through
    // dedupeAgainstIndex per micro-batch; survivors append to the stored
    // minhash index (and the corpus), so later batches dedup against
    // everything accepted before them — corpus work never re-runs.
    implicit val sqlCtx = spark.sqlContext
    val corpus = docs.limit(40)
    val idxDir = tempDir("mh-stream").resolve("idx").toString
    DedupDocs.writeMinhashIndex(corpus, idxDir)
    @volatile var corpusAll = corpus.select("doc_id", "text")
    @volatile var rejected = Set.empty[Long]
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.localCheckpoint() // stable across the two uses below
        val dups = DedupDocs.dedupeAgainstIndex(b, corpusAll, idxDir)
          .select(col("d1")).distinct().as[Long].collect().toSet
        rejected = rejected ++ dups
        val survivors = b.filter(!col("doc_id").isin(dups.toSeq: _*))
        if (!survivors.isEmpty) {
          DedupDocs.appendToMinhashIndex(survivors, idxDir)
          corpusAll = corpusAll.unionByName(survivors.select("doc_id", "text")).localCheckpoint()
        }
      }
      .start()
    try {
      // batch 1: one fresh doc (accepted) + one corpus copy (rejected)
      val freshText = "entirely novel stream tokens xqz wvu rrt ppl mmx kkj hhg"
      val copyText = corpus.filter($"doc_id" === 3L).select("text").as[String].head()
      input.addData((7001L, freshText), (7002L, copyText))
      q.processAllAvailable()
      assert(rejected == Set(7002L), s"corpus copy must be caught in batch 1: $rejected")
      // batch 2: a copy of batch 1's ACCEPTED doc — caught via the appended index
      input.addData((8001L, freshText))
      q.processAllAvailable()
      assert(rejected == Set(7002L, 8001L),
        s"batch-2 copy of an accepted batch-1 doc must be caught: $rejected")
    } finally q.stop()
  }

  test("incremental embedding near-dups catch re-keyed copies via the stored index") {
    val ps = Similarity.planes(32, 64)
    val idxDir = tempDir("emb-incr").resolve("idx").toString
    val corpus = embs.limit(60)
    Similarity.writeAnnIndex(corpus, idxDir, ps, bandBits = 8)
    val batch = corpus.filter($"vec_id".isin(3L, 9L))
      .withColumn("vec_id", $"vec_id" + 7000L)
    val pairs = Similarity
      .nearDupsAgainstIndex(batch, corpus, idxDir, 0.99, ps, bandBits = 8, quantized = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(Set((7003L, 3L), (7009L, 9L)).subsetOf(pairs), s"copies must match sources: $pairs")
  }

  test("index artifacts are stamped; probing with mismatched parameters fails loudly") {
    val ps = Similarity.planes(16, 64)
    val idxDir = tempDir("idx-meta").resolve("idx").toString
    Similarity.writeAnnIndex(embs, idxDir, ps, bandBits = 4)
    // wrong band width -> incompatible hash space -> must throw, not lose recall
    val e = intercept[IllegalArgumentException](
      Similarity.annTopKIndexed(embs, idxDir, Seq.fill(64)(0.1), 5, ps, bandBits = 8))
    assert(e.getMessage.contains("bandBits"))
    // wrong planes (different seed) -> different signatures -> must throw
    val e2 = intercept[IllegalArgumentException](
      Similarity.annTopKIndexed(embs, idxDir, Seq.fill(64)(0.1), 5,
        Similarity.planes(16, 64, seed = 7L), bandBits = 4))
    assert(e2.getMessage.contains("planesFp"))
    // matching parameters pass validation
    assert(Similarity.annTopKIndexed(embs, idxDir, Seq.fill(64)(0.1), 5, ps, bandBits = 4)
      .count() >= 0)
    // minhash: mismatched shingle width at probe time fails loudly too
    val mhDir = tempDir("idx-meta-mh").resolve("idx").toString
    DedupDocs.writeMinhashIndex(docs.limit(20), mhDir)
    val e3 = intercept[IllegalArgumentException](
      DedupDocs.dedupeAgainstIndex(docs.limit(5), docs.limit(20), mhDir, n = 2))
    assert(e3.getMessage.contains("shingle"))
  }

  test("bandBits must divide the plane count; query dimension must match planes") {
    val ps = Similarity.planes(32, 64)
    intercept[IllegalArgumentException](Similarity.bandedIndex(embs, ps, bandBits = 5))
    intercept[IllegalArgumentException](Similarity.queryBands(Seq.fill(64)(0.1), ps, 5))
    intercept[IllegalArgumentException](
      Similarity.queryBands(Seq.fill(32)(0.1), ps, 8)) // 32-dim query, 64-dim planes
  }

  test("appendToAnnIndex makes new vectors probe-visible") {
    val ps = Similarity.planes(16, 64)
    val idxDir = tempDir("ann-app").resolve("idx").toString
    val base = embs.filter($"vec_id" =!= 0)
    Similarity.writeAnnIndex(base, idxDir, ps)
    // vector 0 is absent from the index: a self-query can't return it
    val before = Similarity.annTopKIndexed(embs, idxDir, queryVec, 5, ps)
      .select("vec_id").as[Long].collect()
    assert(!before.contains(0L))
    Similarity.appendToAnnIndex(embs.filter($"vec_id" === 0), idxDir, ps)
    val after = Similarity.annTopKIndexed(embs, idxDir, queryVec, 5, ps)
      .select("vec_id").as[Long].collect()
    assert(after.contains(0L), s"appended vector must be its own nearest neighbor: ${after.toSeq}")
  }

  test("simhash near-dup pairs: banded candidates equal brute-force hamming pairs") {
    val d = docs.limit(80)
    val banded = DedupDocs.simhashNearDupPairs(d, maxHamming = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // brute force on the same simhashes (completeness is the pigeonhole claim)
    val sigs = TextStats.simhash32(d).as[(Long, Long)].collect()
    val brute = (for {
      (i1, h1) <- sigs; (i2, h2) <- sigs
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("dupGroups assigns min-reachable-id components; chains converge; singletons stand alone") {
    val ds = (1L to 7L).toDF("doc_id")
    // components: {1,2,3} via a CHAIN (1-2, 2-3 — needs multiple
    // propagation rounds), {5,6}, singletons {4}, {7}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val got = DedupDocs.dupGroups(ds, pairs)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // a longer chain, worst case for min-label propagation: 10-11-...-15
    val chain = (10L until 15L).map(i => (i, i + 1)).toDF("d1", "d2")
    val chained = DedupDocs.dupGroups((10L to 15L).toDF("doc_id"), chain)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(chained.forall(_._2 == 10L), s"chain must collapse to one group: ${chained.toSeq}")
    // a maxIters too small for the chain fails LOUDLY instead of
    // returning half-propagated groups
    val e = intercept[IllegalStateException] {
      DedupDocs.dupGroups((10L to 15L).toDF("doc_id"), chain, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("canonicalDocs keeps the best-ranked doc per group, tiebreaks by id, singletons survive") {
    // components {1,2,3} (chain), {5,6}; singletons {4}, {7}
    val ds = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L), (5L, 9L), (6L, 9L), (7L, 1L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val got = DedupDocs.canonicalDocs(ds, pairs, rankBy = Seq(col("n_chars").desc))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // group 1: docs 2 and 3 tie on n_chars=30 -> lower id (2) wins over 3
    // AND over the shorter 1; group 5: tie -> 5 wins; singletons keep.
    assert(got.toSeq == Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 0L), (4L, 4L, 1L),
      (5L, 5L, 1L), (6L, 5L, 0L), (7L, 7L, 1L)))
    // exactly one keeper per group
    val keepers = got.filter(_._3 == 1L).map(_._2)
    assert(keepers.toSeq.sorted == got.map(_._2).distinct.toSeq.sorted)
  }

  test("chunkDocs windows every stride tokens, keeps the short tail, skips empty docs") {
    val d = Seq(
      (1L, "a b c d e f g"), // 7 tokens: starts 0,3,6 at stride 3
      (2L, "x y"),           // single short chunk
      (3L, ""),              // no chunks
      (4L, null)             // no chunks
    ).toDF("doc_id", "text")
    val got = Sampling.chunkDocs(d, size = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "a b c d"),
      (1L, 1L, 4L, "d e f g"),
      (1L, 2L, 1L, "g"),
      (2L, 0L, 2L, "x y")))
    // stride == size: non-overlapping cover, every token exactly once
    val cover = Sampling.chunkDocs(d.filter($"doc_id" === 1L), size = 3, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(cover.map(_._4).mkString(" ") == "a b c d e f g")
    intercept[IllegalArgumentException](Sampling.chunkDocs(d, size = 4, stride = 5))
    intercept[IllegalArgumentException](Sampling.chunkDocs(d, size = 0, stride = 1))
  }

  test("withBlocklist counts multi-word phrase hits; clean docs keep") {
    val d = Seq(
      (1L, "nothing to see"),
      (2L, "some bad stuff here"),
      (3L, "bad stuff and worse stuff"),
      (4L, "badstuff run together"),  // substring: matches only with space
      (5L, null.asInstanceOf[String]) // total on null text: no match, keep
    ).toDF("doc_id", "text")
    val got = TextStats.withBlocklist(d, Seq("bad stuff", "worse stuff"))
      .select("doc_id", "n_blocked", "keep")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 0L, 1L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 0L, 1L), (5L, 0L, 1L)))
    intercept[IllegalArgumentException](TextStats.withBlocklist(d, Seq.empty))
    intercept[IllegalArgumentException](TextStats.withBlocklist(d, Seq("ok", "")))
  }

  test("capPerGroup bounds each group deterministically; under-cap groups pass whole") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
      .union(Seq((1000L, "tiny")).toDF("k", "g"))
    val got = Sampling.capPerGroup(df, "g", 5, "k")
    val sizes = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes("g0") == 5 && sizes("g1") == 5 && sizes("g2") == 5)
    assert(sizes("tiny") == 1, "groups under the cap pass through whole")
    // deterministic: same input -> identical kept set
    val again = Sampling.capPerGroup(df, "g", 5, "k").select("k").as[Long].collect().sorted
    assert(again.toSeq == got.select("k").as[Long].collect().sorted.toSeq)
    // kept set at a lower cap is a subset of the higher cap (hash order is
    // a fixed total order per group)
    val cap3 = Sampling.capPerGroup(df, "g", 3, "k").select("k").as[Long].collect().toSet
    assert(cap3.subsetOf(got.select("k").as[Long].collect().toSet))
    intercept[IllegalArgumentException](Sampling.capPerGroup(df, "g", 0, "k"))
  }

  test("hashSplit is deterministic, key-stable under corpus growth, and validates") {
    val small = (1L to 500L).toDF("id")
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val assign1 = Sampling.hashSplit(small, "id", splits)
      .as[(Long, String)].collect().toMap
    // same keys -> same split on re-run
    val assign2 = Sampling.hashSplit(small, "id", splits)
      .as[(Long, String)].collect().toMap
    assert(assign1 == assign2)
    // growing the corpus never moves an existing key's split (no leakage)
    val grown = Sampling.hashSplit((1L to 2000L).toDF("id"), "id", splits)
      .as[(Long, String)].collect().toMap
    assert(assign1.forall { case (k, s) => grown(k) == s })
    // fractions are approximately honored
    val counts = grown.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1600 && counts("val") > 40 && counts("test") > 40,
      s"badly skewed split: $counts")
    // invalid percentages rejected
    intercept[IllegalArgumentException](
      Sampling.hashSplit(small, "id", Seq("a" -> 50, "b" -> 49)))
  }

  test("salted aggregation equals plain groupBy on a skewed key distribution") {
    // 90% of rows hit one hot key
    val rows = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong, i.toDouble)
    }
    val df = rows.toDF("k", "n", "v")
    val plain = df.groupBy("k")
      .agg(sum($"n").as("sum_n"), count($"v").as("cnt"), max($"n").as("max_n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), Map(
      "sum_n" -> ($"n", "sum"), "cnt" -> ($"v", "count"), "max_n" -> ($"n", "max")))
      .select("k", "sum_n", "cnt", "max_n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
  }

  // ---- text stats ---------------------------------------------------------

  test("topTerms ranks by (tf desc, df asc, term asc) under the df cap") {
    val df = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry date"))
      .toDF("doc_id", "text")
    // maxDf=1: banana/cherry (df 2) dropped; doc1 keeps apple, doc2 date.
    val capped = TextStats.topTerms(df, k = 5, maxDf = 1)
      .select("doc_id", "tok", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
    assert(capped.toSeq == Seq(
      (1L, "apple", 2L, 1L, 1L),
      (2L, "date", 1L, 1L, 1L)))
    // uncapped: tf dominates, df breaks ties, then the term string.
    val full = TextStats.topTerms(df, k = 2, maxDf = 100)
      .select("doc_id", "tok", "rank")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._3))
    assert(full.toSeq == Seq(
      (1L, "apple", 1L), (1L, "banana", 2L), // banana ties cherry on tf+df, wins on name
      (2L, "cherry", 1L), (2L, "date", 2L))) // date df=1 beats banana df=2 at tf=1
  }

  test("withScrubbed replaces URLs then emails and counts both") {
    val df = Seq(
      (1L, "see https://ex.com/a?x=1 or mail bob@ex.com and ann@site.org"),
      (2L, "no pii here"),
      (3L, "http://plain.link only"))
      .toDF("doc_id", "text")
    val got = TextStats.withScrubbed(df)
      .select("doc_id", "n_urls", "n_emails", "scrubbed")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 2L, "see <URL> or mail <EMAIL> and <EMAIL>")))
    assert(got(1) == ((2L, 0L, 0L, "no pii here")))
    assert(got(2) == ((3L, 1L, 0L, "<URL> only")))
  }

  test("withStats computes token/punct/stopword counts") {
    val df = Seq((1L, "the cat, and a dog.", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.withStats(df)
      .select("n_tokens", "punct_cnt", "stop_cnt").as[(Int, Int, Int)].head()
    assert(r == ((5, 2, 3))) // tokens: the cat, and a dog. | punct: , . | stops: the and a
  }

  test("fingerprint is the min md5 8-gram and is stable under duplication") {
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij")).toDF("doc_id", "text")
    val fps = TextStats.withFingerprint(df).select("fingerprint").as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("simhash: near-identical texts have small hamming distance, unrelated large") {
    val df = Seq(
      (1L, "spark hash join shuffle partition codegen filter scan merge sort"),
      (2L, "spark hash join shuffle partition codegen filter scan merge sorted"),
      (3L, "zebra quark lattice polymer osmosis vector quantum widget acorn")
    ).toDF("doc_id", "text")
    val h = TextStats.simhash32(df).orderBy("doc_id").select("simhash").as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) < ham(h(0), h(2)),
      s"near-dup hamming ${ham(h(0), h(1))} should be < unrelated ${ham(h(0), h(2))}")
    assert(ham(h(0), h(1)) <= 6)
  }

  // ---- similarity ---------------------------------------------------------

  private def queryVec: Seq[Double] =
    embs.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("quantized and double cosine top-k agree on ranking") {
    val a = Similarity.topK(embs, queryVec, 20).select("vec_id").as[Long].collect()
    val b = Similarity.topK(embs, queryVec, 20, quantized = true).select("vec_id").as[Long].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("ANN top-k recall >= 0.5 vs exact top-k, and never returns non-corpus ids") {
    val exact = Similarity.topK(embs, queryVec, 10).select("vec_id").as[Long].collect().toSet
    val ann = Similarity.annTopK(embs, queryVec, 10, Similarity.planes(16, 64))
      .select("vec_id").as[Long].collect().toSet
    assert(ann.nonEmpty)
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }

  test("indexed ANN (stored index) returns exactly what inline annTopK returns") {
    val ps = Similarity.planes(16, 64)
    val idxDir = tempDir("ann-idx").resolve("idx").toString
    Similarity.writeAnnIndex(embs, idxDir, ps)
    // index layout: one dir per (band, bh) — the probe's pruning unit
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(idxDir))
      .iterator().asScala.exists(_.getFileName.toString.startsWith("band=")))
    val inline = Similarity.annTopK(embs, queryVec, 10, ps)
      .select("vec_id").as[Long].collect().toSeq
    val indexed = Similarity.annTopKIndexed(embs, idxDir, queryVec, 10, ps)
      .select("vec_id").as[Long].collect().toSeq
    assert(indexed == inline)
  }

  test("indexed IVF (stored assignment) returns exactly what inline ivfTopK returns") {
    val cents = Similarity.ivfCentroids(embs, 8)
    val idxDir = tempDir("ivf-idx").resolve("idx").toString
    Similarity.writeIvfIndex(embs, idxDir, cents)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(idxDir))
      .iterator().asScala.exists(_.getFileName.toString.startsWith("centroid=")))
    val inline = Similarity.ivfTopK(embs, queryVec, 10, cents, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val indexed = Similarity.ivfTopKIndexed(embs, idxDir, queryVec, 10, cents, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(indexed == inline)
  }

  test("appendToIvfIndex: batch assigns into the stored layout; drifted centroids are loud (r20)") {
    val wave1 = embs.filter($"vec_id" % 2 === 0)
    val wave2 = embs.filter($"vec_id" % 2 === 1)
    val cents = Similarity.ivfCentroids(wave1, 8)
    val idxDir = tempDir("ivf-app").resolve("idx").toString
    Similarity.writeIvfIndex(wave1, idxDir, cents)
    Similarity.appendToIvfIndex(wave2, idxDir, cents)
    // the appended artifact == a one-shot build over the union (same
    // centroids → same assignment; append only adds files)
    val oneShot = tempDir("ivf-one").resolve("idx").toString
    Similarity.writeIvfIndex(embs, oneShot, cents)
    val a = spark.read.parquet(idxDir).select("vec_id", "centroid")
      .as[(Long, Int)].collect().toSet
    val b = spark.read.parquet(oneShot).select("vec_id", "centroid")
      .as[(Long, Int)].collect().toSet
    assert(a == b, "append must reproduce the one-shot assignment")
    // probes see appended rows immediately
    val indexed = Similarity.ivfTopKIndexed(embs, idxDir, queryVec, 10, cents, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val inline = Similarity.ivfTopK(embs, queryVec, 10, cents, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(indexed == inline)
    // a drifted ingest loop (retrained centroids = a DIFFERENT space
    // partitioning) must fail the stamp, not silently split generations
    val drifted = Similarity.ivfCentroids(wave1, 8).map(_.map(_ * -1.0))
    val e = intercept[IllegalArgumentException](
      Similarity.appendToIvfIndex(wave2, idxDir, drifted))
    assert(e.getMessage.contains("centroidsFp"), e.getMessage)
  }

  test("nearDupPairs finds planted identical/near-identical vectors via LSH buckets") {
    val base = embs.limit(50)
    // plant: vec 9001 = copy of vec 0's embedding, vec 9002 = tiny perturbation
    val v0 = queryVec.map(_.toFloat)
    val planted = Seq(
      (9001L, v0),
      (9002L, v0.zipWithIndex.map { case (x, i) => if (i == 0) x + 1e-4f else x })
    ).toDF("vec_id", "embedding")
    val df = base.select($"vec_id", $"embedding").unionByName(planted)
    val pairs = Similarity.nearDupPairs(df, 0.99, Similarity.planes(32, 64))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9001L)), s"missed exact dup: $pairs")
    assert(pairs.contains((0L, 9002L)), s"missed near dup: $pairs")
    assert(pairs.contains((9001L, 9002L)))
  }

  test("k-means-refined IVF centroids align partitions with planted clusters") {
    // 4 well-separated directions in 8-dim, 40 noisy members each: after
    // Lloyd refinement every ground-truth cluster must land in ONE
    // partition (purity), and nProbe=1 must recall the exact top-k for an
    // in-cluster query — the clustered-corpus quality story hash-sampled
    // centroids can't tell (a random member seed may sit in a cluster's
    // noise fringe; the refined centroid is the cluster mean).
    val rnd = new scala.util.Random(7)
    val dirs = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val vecs = for {
      (d, ci) <- dirs.zipWithIndex
      j <- 0 until 40
    } yield (ci * 40L + j, d.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f), ci)
    val df = vecs.toDF("vec_id", "embedding", "truth")
    val cents = Similarity.ivfCentroidsKMeans(df, 4, iters = 4)
    // purity: every truth-cluster assigned to exactly one centroid, and
    // distinct clusters to distinct centroids
    val assign = Similarity.ivfAssign(df, cents)
      .select($"truth", $"centroid").as[(Int, Int)].collect()
    val byTruth = assign.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byTruth.values.forall(_.size == 1), s"impure partitions: $byTruth")
    assert(byTruth.values.flatten.toSet.size == 4, s"merged clusters: $byTruth")
    // nProbe=1 with refined centroids: full recall for an in-cluster query
    val q = dirs.head.map(_.toDouble).toSeq
    val exact = Similarity.topK(df, q, 10).select("vec_id").as[Long].collect().toSet
    val probed = Similarity.ivfTopK(df, q, 10, cents, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(probed == exact, s"nProbe=1 must be exact on a pure partition")
  }

  test("IVF top-k: probed search recalls most of exact top-k") {
    val cents = Similarity.ivfCentroids(embs, 8)
    assert(cents.length == 8 && cents.head.length == 64)
    val exact = Similarity.topK(embs, queryVec, 10).select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(embs, queryVec, 10, cents, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low for nProbe=4 of 8 centroids")
    // probing all centroids must recover exact top-k
    val full = Similarity.ivfTopK(embs, queryVec, 10, cents, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)
  }

  // ---- multimodal ---------------------------------------------------------

  test("multimodal assets: binary payload round-trips and frames are deterministic") {
    val assets = Multimodal.toAssets(docs)
    val one = assets.orderBy("doc_id").limit(1)
    val text = docs.orderBy("doc_id").limit(1).select("text").as[String].head()
    val payload = one.select("payload").collect()(0).getAs[Array[Byte]](0)
    assert(new String(payload, "UTF-8") == text)
    val frames = Multimodal.sampleFrames(one)
      .select("frame_idx", "feature").as[(Int, String)].collect().sortBy(_._1)
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2, 3))
    // stub decode = md5 of the sampled window, reproducible
    val again = Multimodal.sampleFrames(one)
      .select("frame_idx", "feature").as[(Int, String)].collect().sortBy(_._1)
    assert(frames.toSeq == again.toSeq)
    // frame 0 = first 16 bytes
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(text.take(16).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames.head._2 == expected)
  }

  test("batched (mapPartitions) decode produces the same features as the expression stub") {
    val assets = Multimodal.toAssets(docs).limit(10)
    val framed = Multimodal.sampleFrames(assets)
    val exprSide = framed.select($"doc_id", $"frame_idx".cast("int"), $"feature")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    val batched = Multimodal.decodeFramesBatched(framed)
      .collect().map(f => (f.doc_id, f.frame_idx, f.feature)).sortBy(r => (r._1, r._2))
    assert(batched.toSeq == exprSide.toSeq)
  }

  test("decodeImagesBatched decodes real PNG pixels; opaque payloads fall back to the stub") {
    // Deterministic generated PNGs: the JDK ships the codec (javax.imageio),
    // so this is a REAL decode — width/height/raster come from pixel data,
    // not metadata. Expected values computed driver-side from the same
    // BufferedImage before encoding.
    def png(seed: Int, w: Int, h: Int): (Array[Byte], String) = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (seed * 31 + x * 7 + y * 13) & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      val bb = java.nio.ByteBuffer.allocate(argb.length * 4)
      argb.foreach(bb.putInt)
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(bb.array()).map("%02x".format(_)).mkString
      (out.toByteArray, expected)
    }
    val (png1, hash1) = png(1, 5, 3)
    val (png2, hash2) = png(2, 8, 8)
    val opaque = "not an image".getBytes("UTF-8")
    val opaqueHash = java.security.MessageDigest.getInstance("MD5")
      .digest(opaque).map("%02x".format(_)).mkString
    val assets = Seq((1L, png1), (2L, png2), (3L, opaque))
      .toDF("doc_id", "payload").repartition(3)
    val got = Multimodal.decodeImagesBatched(assets)
      .collect().map(d => d.doc_id -> d).toMap
    assert(got(1L).width == 5 && got(1L).height == 3 && got(1L).decoded)
    assert(got(1L).feature == hash1)
    assert(got(2L).width == 8 && got(2L).height == 8 && got(2L).decoded)
    assert(got(2L).feature == hash2)
    // Non-image payload: dims -1, md5-of-bytes stub, flagged undecoded.
    assert(got(3L).width == -1 && !got(3L).decoded && got(3L).feature == opaqueHash)
  }

  test("resizeImagesBatched scales real pixels; output PNG round-trips to the hashed raster") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 37 + y * 101) & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val opaque = "not an image".getBytes("UTF-8")
    val assets = Seq((1L, png(8, 8)), (2L, opaque)).toDF("doc_id", "payload")
    val got = Multimodal.resizeImagesBatched(assets, 4, 4)
      .collect().map(r => r.doc_id -> r).toMap
    val r1 = got(1L)
    assert(r1.resized && r1.width == 4 && r1.height == 4)
    // The emitted PNG is lossless: decoding it reproduces the hashed raster.
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r1.payload))
    assert(back.getWidth == 4 && back.getHeight == 4)
    val argb = back.getRGB(0, 0, 4, 4, null, 0, 4)
    val bb = java.nio.ByteBuffer.allocate(argb.length * 4)
    argb.foreach(bb.putInt)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(bb.array()).map("%02x".format(_)).mkString
    assert(r1.feature == expected)
    // Determinism: a second run produces the identical feature.
    assert(Multimodal.resizeImagesBatched(assets, 4, 4)
      .collect().find(_.doc_id == 1L).get.feature == r1.feature)
    // Non-image payload passes through untouched.
    val r2 = got(2L)
    assert(!r2.resized && r2.width == -1 && r2.payload.toSeq == opaque.toSeq)
  }

  // ---- span dedup / packing / repetition filter ---------------------------

  test("spanStats flags spans shared across documents; short docs get zero spans") {
    val df = Seq(
      (1L, "a b c d e f g h p1 q1"),   // 3 spans; "a b c d e f g h" also in doc 2
      (2L, "z a b c d e f g h q2"),    // 3 spans; one shared with doc 1
      (3L, "k l m n o p q r s t"),     // 3 spans, all unique
      (4L, "one two")                  // shorter than k=8 -> no spans
    ).toDF("doc_id", "text")
    val got = DedupDocs.spanStats(df)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 1.0 / 3.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 3L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("spanStats counts every position of a contaminated span") {
    // The shared span appears twice in doc 1 (positions 1 and 9) and once
    // in doc 2: all three positions are contaminated.
    val span = "a b c d e f g h"
    val df = Seq(
      (1L, s"$span $span"),
      (2L, s"x $span")
    ).toDF("doc_id", "text")
    val got = DedupDocs.spanStats(df)
      .select("doc_id", "n_dup_spans").as[(Long, Long)].collect().toMap
    assert(got(1L) == 2L && got(2L) == 1L)
  }

  test("blockDedup keeps the globally-first block occurrence and rebuilds documents") {
    // k=4 blocks: doc 1 = ["a b c d", "e f g h", "x y"]; doc 2's two
    // blocks both repeat doc 1's -> doc 2 empties; doc 3's single short
    // block "x y" repeats doc 1's trailing short block -> empties too;
    // doc 4 repeats a block of ITSELF (positions 0 and 1) keeping pos 0.
    val df = Seq(
      (1L, "a b c d e f g h x y"),
      (2L, "e f g h a b c d"),
      (3L, "x y"),
      (4L, "p q r s p q r s tail")
    ).toDF("doc_id", "text")
    val got = DedupDocs.blockDedup(df, k = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, "a b c d e f g h x y"),
      (2L, 2L, 0L, ""),
      (3L, 1L, 0L, ""),
      (4L, 3L, 2L, "p q r s tail")))
  }

  test("contaminationAgainst counts train spans occurring verbatim in the eval set") {
    val span = "a b c d e f g h"
    val train = Seq(
      (1L, s"$span tail1 tail2"),      // 3 spans, 1 shared with eval
      (2L, "k l m n o p q r s"),       // clean
      (3L, "x y")                      // too short for spans
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, s"pre $span post")).toDF("doc_id", "text")
    val got = DedupDocs.contaminationAgainst(train, eval_)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("packBins assigns bins by start offset in the concatenated shard stream") {
    // shards=1: one stream. Token counts 4,5,3,8,10 -> start offsets
    // 0,4,9,12,20 -> bins 0,0,0,1,2 under budget 10.
    val df = Seq((0L, 4), (1L, 5), (2L, 3), (3L, 8), (4L, 10)).toDF("k", "n")
    val got = Sampling.packBins(df, "k", col("n"), budget = 10, shards = 1)
      .select("k", "bin").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("packBins packs shards independently and deterministically") {
    val df = Seq((0L, 6), (1L, 6), (2L, 6), (3L, 6)).toDF("k", "n")
    val got = Sampling.packBins(df, "k", col("n"), budget = 10, shards = 2)
      .select("k", "shard", "bin").as[(Long, Long, Long)].collect().toSet
    // shard 0 = keys 0,2 (offsets 0,6 -> bins 0,0); shard 1 = keys 1,3.
    assert(got == Set((0L, 0L, 0L), (2L, 0L, 0L), (1L, 1L, 0L), (3L, 1L, 0L)))
  }

  test("vocab build ranks by (count desc, token asc); encode maps OOV to -1") {
    val df = Seq(
      (1L, "b a a c"),
      (2L, "a b  z")          // double space -> empty split artifact at pos 3
    ).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1, z=1 -> vocab(2) = a:0, b:1; c,z OOV.
    val voc = Vocab.build(df, size = 2)
      .select("tok", "n", "id").as[(String, Long, Long)].collect().sortBy(_._3)
    assert(voc.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 1L)))
    val enc = Vocab.encode(df, Vocab.build(df, size = 2))
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(enc.toSeq == Seq(
      (1L, 1L, 1L), (1L, 2L, 0L), (1L, 3L, 0L), (1L, 4L, -1L),
      // doc 2: empty artifact at raw pos 3 skipped, 'z' keeps raw pos 4.
      (2L, 1L, 0L), (2L, 2L, 1L), (2L, 4L, -1L)))
  }

  test("bigramNovelty: df counts documents, empties don't break pairs, short docs omitted") {
    val df = Seq(
      (1L, "the cat sat"),        // bigrams: "the cat", "cat sat"
      (2L, "the  cat ran"),       // double space: "the cat" survives; "cat ran"
      (3L, "the cat sat the cat sat"), // repeats: 5 occurrences, 3 distinct
      (4L, "one"),                // no bigram -> omitted
      (5L, "")                    // empty -> omitted
    ).toDF("doc_id", "text")
    // df("the cat")=3 docs, df("cat sat")=2, df("cat ran")=1, df("sat the")=1.
    val got = TextStats.bigramNovelty(df)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      // doc 1: 2 occ, 2 distinct; rare (df<=2): "cat sat" -> 1/2
      (1L, 2L, 2L, 1L, 0.5),
      // doc 2: 2 occ, 2 distinct; rare: "cat ran" -> 1/2
      (2L, 2L, 2L, 1L, 0.5),
      // doc 3: 5 occ; distinct {the cat, cat sat, sat the}; rare: cat sat + sat the
      (3L, 5L, 3L, 2L, 2.0 / 3.0)),
      s"got ${got.toSeq}")
  }

  test("bpeTrain learns the canonical Sennrich merges deterministically; overlaps merge greedily") {
    // The BPE paper's worked corpus: low x5, lower x2, newest x6, widest x3.
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(docs, numMerges = 5)
      .select("rank", "left", "right", "pair_count")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    // Ties (es/st/t</w> all 9; lo/ow both 7) break lexicographically —
    // the deterministic total order the scaladoc promises.
    assert(merges.toSeq == Seq(
      (0L, "e", "s", 9L),
      (1L, "es", "t", 9L),
      (2L, "est", "</w>", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L)))
    // Overlap semantics: "aaa" (freq 2) counts (a,a) NAIVELY per
    // adjacency (2 per word -> 4), like the reference's get_stats, and
    // the fold merges greedily left-to-right: [a,a,a] -> [aa,a], so the
    // next round sees (aa,a) and (a,</w>) at 2 each — lexicographic
    // tie-break picks (a,</w>). A wrong double-consuming fold ([aa,aa])
    // would surface as different round-1 pairs.
    val tri = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m2 = Vocab.bpeTrain(tri, numMerges = 2)
      .select("rank", "left", "right", "pair_count")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(m2.toSeq == Seq((0L, "a", "a", 4L), (1L, "a", "</w>", 2L)))
    // Early stop: a fully-merged word table stops before numMerges.
    val tiny = Seq((1L, "x x")).toDF("doc_id", "text")
    val m3 = Vocab.bpeTrain(tiny, numMerges = 10)
      .select("left", "right").as[(String, String)].collect()
    assert(m3.toSeq == Seq(("x", "</w>")), "one merge then exhausted")
    // Long merge chains (crosses the 24-round lineage truncation): the
    // alphabet word chains 26 lexicographic merges (a+b, ab+c, ...) down
    // to one symbol, then exhausts before numMerges.
    val alpha = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
    val chain = Vocab.bpeTrain(alpha, numMerges = 30)
      .select("rank", "left", "right").as[(Long, String, String)].collect().sortBy(_._1)
    assert(chain.length == 26, s"27 symbols need 26 merges, got ${chain.length}")
    assert(chain.last == (25L, "abcdefghijklmnopqrstuvwxyz", "</w>"))
    // Applying the learned rules segments words into the classic subwords.
    val seg = Vocab.bpeSegment(
      Seq((7L, "newest lower")).toDF("doc_id", "text"),
      Vocab.bpeTrain(docs, numMerges = 5))
      .as[(Long, Long, Long, String)].collect().sortBy(t => (t._2, t._3))
    assert(seg.map(_._4).toSeq == Seq(
      "n", "e", "w", "est</w>",      // newest
      "low", "e", "r", "</w>"),      // lower
      s"got ${seg.toSeq}")
  }

  // Reference BPE: one merge per round, driver-side — the sequential
  // semantics bpeTrain's BATCHED rounds and bpeSegment's MIN-RANK loop
  // must reproduce byte-identically.
  private def naiveApply(syms: Array[String], l: String, r: String): Array[String] = {
    val buf = syms.toBuffer
    var i = 0
    while (i < buf.length - 1) {
      if (buf(i) == l && buf(i + 1) == r) { buf(i) = l + r; buf.remove(i + 1) }
      i += 1
    }
    buf.toArray
  }

  private def naiveBpeTrain(text: String, numMerges: Int): Seq[(Long, String, String, Long)] = {
    val freq = text.split(" ").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var words: Seq[(Array[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.map(_.toString).toArray :+ "</w>", f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 0L
    var stop = false
    while (rank < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((rank, l, r, n))
        words = words.map { case (syms, f) => (naiveApply(syms, l, r), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  test("batched bpeTrain == sequential one-merge-per-round reference (randomized + guard corpus)") {
    // The tie corpus where symbol-disjointness ALONE mis-batches: top-2
    // disjoint candidates (a,z)60 and (d,</w>)50, but merging (a,z)
    // births (az,q)50 which lex-beats (d,</w>) at the tied count — the
    // neighbor-bound guard must drop (d,</w>) from the batch so rank 1
    // comes out as (az,q), exactly as the sequential loop produces.
    val guardText = (Seq.fill(50)("azq") ++ Seq.fill(10)("az") ++ Seq.fill(50)("md")).mkString(" ")
    val expectedGuard = naiveBpeTrain(guardText, 4)
    assert(expectedGuard.take(2) == Seq((0L, "a", "z", 60L), (1L, "az", "q", 50L)),
      s"test corpus must exercise the tie, got ${expectedGuard.take(2)}")
    val gotGuard = Vocab.bpeTrain(Seq((1L, guardText)).toDF("doc_id", "text"), 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(gotGuard == expectedGuard, s"guard corpus: got $gotGuard, want $expectedGuard")

    // Randomized corpora over a tiny alphabet (dense pair collisions):
    // batched rounds must stay byte-identical to the reference, and
    // min-rank segmentation must match naive per-rule replay.
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val words = (1 to (5 + rnd.nextInt(8))).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(5))(w)).mkString(" ")
      val nm = 3 + rnd.nextInt(8)
      val expected = naiveBpeTrain(text, nm)
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val got = Vocab.bpeTrain(df, nm, batchSize = 1 + rnd.nextInt(5))
        .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"trial $trial corpus '$text': got $got, want $expected")
      // Segmentation equivalence on the same trial: min-rank merging ==
      // replaying every rule sequentially (plus an unseen word).
      val rules = expected.map(m => (m._2, m._3))
      val segDocs = Seq((1L, text), (2L, "zebra")).toDF("doc_id", "text")
      val gotSeg = Vocab.bpeSegment(segDocs, Vocab.bpeTrain(df, nm))
        .as[(Long, Long, Long, String)].collect()
        .groupBy(t => (t._1, t._2)).view
        .mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap
      segDocs.as[(Long, String)].collect().foreach { case (id, t) =>
        t.split(" ").filter(_.nonEmpty).zipWithIndex.foreach { case (w, p) =>
          var syms: Array[String] = w.map(_.toString).toArray :+ "</w>"
          rules.foreach { case (l, r) => syms = naiveApply(syms, l, r) }
          assert(gotSeg((id, p + 1L)) == syms.toSeq,
            s"trial $trial word '$w': got ${gotSeg((id, p + 1L))}, want ${syms.toSeq}")
        }
      }
    }
  }

  test("stratifiedSample: nested rates, growth stability, 0/100 strata") {
    val d1 = (0L until 400L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("doc_id", "lang")
    val kept50 = Sampling.stratifiedSample(d1, "doc_id", "lang", Seq("en" -> 50), 100)
      .filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    val kept20 = Sampling.stratifiedSample(d1, "doc_id", "lang", Seq("en" -> 20), 100)
      .filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    // Nested-rate consistency: the 20% sample is a subset of the 50% one.
    assert(kept20.subsetOf(kept50) && kept20.size < kept50.size)
    // 0 and 100 are exact.
    assert(Sampling.stratifiedSample(d1, "doc_id", "lang", Seq("en" -> 0), 100)
      .filter($"lang" === "en").count() == 0)
    assert(Sampling.stratifiedSample(d1, "doc_id", "lang", Seq.empty, 100).count() == 400)
    // Growth stability: adding rows never flips an existing doc's fate.
    val d2 = (0L until 800L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("doc_id", "lang")
    val keptGrown = Sampling.stratifiedSample(d2, "doc_id", "lang", Seq("en" -> 50), 100)
      .filter($"lang" === "en" && $"doc_id" < 400).select("doc_id").as[Long].collect().toSet
    assert(keptGrown == kept50)
  }

  test("sqrtTemperatureSample: small groups clamp to keep-all, big groups match the formula") {
    // rare: 4 docs (4 <= c^2 = 9 -> f = 1, all kept);
    // big: 400 docs (f = 3/20 = 0.15 -> hash-thresholded subsample).
    val df = ((0L until 4L).map(i => (i, "rare")) ++
      (100L until 500L).map(i => (i, "big"))).toDF("doc_id", "lang")
    val got = Sampling.sqrtTemperatureSample(df, "doc_id", "lang", c = 3.0)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.filter(_._2 == "rare").map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // Big group: exactly the keys the 60-bit md5 threshold admits.
    val thr = math.floor(math.min(1.0, 3.0 / math.sqrt(400.0)) * math.pow(2, 60)).toLong
    def h60(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expect = (100L until 500L).filter(h60(_) < thr).toSet
    assert(got.filter(_._2 == "big").map(_._1).toSet == expect)
    assert(expect.nonEmpty && expect.size < 400)
    // Determinism across runs; null-group rows are dropped; c validates.
    val again = Sampling.sqrtTemperatureSample(df, "doc_id", "lang", c = 3.0)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
    val withNull = df.union(Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "lang"))
    assert(Sampling.sqrtTemperatureSample(withNull, "doc_id", "lang", c = 3.0)
      .filter($"doc_id" === 9999L).count() == 0)
    intercept[IllegalArgumentException](
      Sampling.sqrtTemperatureSample(df, "doc_id", "lang", c = 0.0))
  }

  test("rarityScore sums corpus-wide token frequencies per doc; tokenless docs are omitted") {
    val d = Seq(
      (1L, "a b a"),                   // freq: a=3 (2 here + 1 in d2), b=2
      (2L, "a b c"),                   // c=1
      (3L, ""),                        // no tokens -> omitted
      (4L, null.asInstanceOf[String])  // null -> omitted
    ).toDF("doc_id", "text")
    val got = TextStats.rarityScore(d)
      .select("doc_id", "n_tok", "sum_freq", "mean_freq")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 8L, 8.0 / 3.0),  // a(3) + b(2) + a(3)
      (2L, 3L, 6L, 2.0)))       // a(3) + b(2) + c(1)
  }

  test("repetitionStats rejects repetitive docs and keeps diverse ones") {
    val df = Seq(
      (1L, "x x x x x"),               // top 5/5, dup bigrams 3/4 -> reject
      (2L, "a b c d e f g h i j"),     // all distinct -> keep
      (3L, "a")                        // single token: top = 100% -> reject
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(df)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 5L, 5L, 4L, 1L, 0L),
      (2L, 10L, 1L, 9L, 9L, 1L),
      (3L, 1L, 1L, 0L, 0L, 0L)))
    // Total on null text: zero counts, trivially kept — never null stats.
    val withNull = Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextStats.repetitionStats(withNull)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((9L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("heavyHitters == naive GROUP BY/HAVING on a Zipf corpus across partition layouts") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: key k_i appears ~ 2000/i times — a long tail of singletons
    // plus a handful of heavy keys, the shape the pigeonhole prune targets.
    val terms = (1 to 400).flatMap(i => Seq.fill(2000 / i)(s"k_$i"))
    val shuffled = rnd.shuffle(terms)
    val naive = terms.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 100L).toMap
    assert(naive.nonEmpty && naive.size < 25) // genuinely selective
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.sparkContext.parallelize(shuffled, parts).toDF("term")
      val got = TextStats.heavyHitters(df, "term", 100L)
        .as[(String, Long)].collect().toMap
      assert(got === naive, s"mismatch at $parts partitions")
    }
    // Boundary: a key with count exactly minCount survives; minCount-1 dies.
    val edge = (Seq.fill(5)("at") ++ Seq.fill(4)("below") ++ Seq("tail"))
    val edgeDf = spark.sparkContext.parallelize(rnd.shuffle(edge), 3).toDF("term")
    assert(TextStats.heavyHitters(edgeDf, "term", 5L)
      .as[(String, Long)].collect().toMap === Map("at" -> 5L))
    // non-string keys work (counted through their string form in pass 1,
    // recounted by the RAW key) and keep their type in the output
    val intKeys = (1 to 50).flatMap(i => Seq.fill(if (i <= 3) 20 else 1)(i.toLong))
    val intDf = spark.sparkContext.parallelize(rnd.shuffle(intKeys), 4).toDF("term")
    val gotInt = TextStats.heavyHitters(intDf, "term", 10L)
    assert(gotInt.schema("term").dataType == org.apache.spark.sql.types.LongType)
    assert(gotInt.as[(Long, Long)].collect().toMap ===
      Map(1L -> 20L, 2L -> 20L, 3L -> 20L))
  }

  test("hammingNearDupPairs == brute-force all-pairs at several signature widths") {
    val rnd = new scala.util.Random(11)
    // random signatures + planted near copies (flip k bits of an original)
    val bases = (0L until 150L).map(i => i -> rnd.nextLong())
    val copies = bases.filter(_._1 % 4 == 0).map { case (i, h) =>
      var flipped = h
      (0 until rnd.nextInt(4)).foreach(_ => flipped ^= 1L << rnd.nextInt(64))
      (i + 1000L) -> flipped
    }
    val all = bases ++ copies
    for (maxD <- Seq(0, 3, 8)) {
      val brute = (for {
        (i1, h1) <- all; (i2, h2) <- all
        if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= maxD
      } yield (i1, i2)).toSet
      val got = DedupDocs.hammingNearDupPairs(
          all.toDF("id", "sig"), "id", "sig", 64, maxD)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, s"mismatch at maxHamming=$maxD")
    }
    // narrower signature width: only the low bits participate
    val narrow = Seq((1L, 0x0FL), (2L, 0x0EL), (3L, 0xF0L)).toDF("id", "sig")
    val got16 = DedupDocs.hammingNearDupPairs(narrow, "id", "sig", 16, 1)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got16 === Set((1L, 2L)))
  }

  test("withPiiScrubbed counts and redacts IPs, phones, and card-like runs") {
    val rows = Seq(
      (1L, "call +1 555-0100 or +44 207-946 maybe"),
      (2L, "ip 192.168.0.1 and 8.8.8.8 ok"),
      (3L, "pay 4111111111111111 thanks"),
      (4L, "long run 12345678901234567890 is not a card"), // 20 digits: no \b split
      (5L, "clean text with nothing to hide"))
      .toDF("doc_id", "text")
    val got = TextStats.withPiiScrubbed(rows)
      .select("doc_id", "n_ips", "n_phones", "n_cards", "pii_scrubbed")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    assert(got(1L) === ((0L, 2L, 0L), "call <PHONE> or <PHONE> maybe"))
    assert(got(2L) === ((2L, 0L, 0L), "ip <IP> and <IP> ok"))
    assert(got(3L) === ((0L, 0L, 1L), "pay <CARD> thanks"))
    assert(got(4L) === ((0L, 0L, 0L), "long run 12345678901234567890 is not a card"))
    assert(got(5L) === ((0L, 0L, 0L), "clean text with nothing to hide"))
  }

  test("hammingNearDupPairs maxBucket drops hot bands but keeps cold-band pairs") {
    // All 200 signatures share band 0 (low 8 bits of a 64-bit/7-hamming
    // split = band widths 8,8,8,8,8,8,8,8 -> band 0 = bits 0-7): that
    // bucket holds everyone and is pure df² noise. A planted near pair
    // also agrees on its OTHER bands (distance 0 overall is too easy —
    // make them differ in band 0's bits only... then they agree on all
    // higher bands). Unrelated ids get distinct random high bits.
    val rnd = new scala.util.Random(5)
    val common = 0x2AL // shared band-0 value
    val sigs = (0L until 200L).map { i =>
      (i, (rnd.nextLong() << 8) | common)
    }
    // planted pair: same high bits, band-0 bits differ by 2 flips
    val planted = Seq((500L, sigs(3)._2 ^ 0x03L))
    val all = (sigs ++ planted).toDF("id", "sig")
    val uncapped = DedupDocs.hammingNearDupPairs(all, "id", "sig", 64, 7)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = DedupDocs.hammingNearDupPairs(all, "id", "sig", 64, 7, maxBucket = Some(50))
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // the planted pair agrees on every band EXCEPT hot band 0 — it must
    // survive the cap through its cold bands
    assert(capped.contains((3L, 500L)), s"cold-band pair lost under cap: $capped")
    // and the capped run must agree with uncapped here (no hot-only pairs
    // exist in this fixture: unrelated highs are random)
    assert(capped === uncapped)
  }

  test("hamming index round-trip: probe == in-memory pairs; stamp validates") {
    val rnd = new scala.util.Random(21)
    val corpus = (0L until 120L).map(i => i -> rnd.nextLong())
    val batch = corpus.filter(_._1 % 6 == 0).map { case (i, h) =>
      (i + 500L) -> (h ^ 3L) // 2-bit-flip near copies
    } ++ (900L until 920L).map(i => i -> rnd.nextLong()) // fresh
    val idxDir = tempDir("hamming-idx").resolve("idx").toString
    DedupDocs.writeHammingIndex(corpus.toDF("id", "sig"), idxDir, "id", "sig", 64)
    val got = DedupDocs.hammingDedupeAgainstIndex(
        batch.toDF("id", "sig"), idxDir, "id", "sig", 64, 4)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (bi, bh) <- batch; (ci, ch) <- corpus
      if java.lang.Long.bitCount(bh ^ ch) <= 4
    } yield (bi, ci)).toSet
    assert(got === brute)
    assert(brute.size >= 20, "planted copies must actually pair")
    // append accepted batch, then a re-delivery of the same batch pairs
    // against its earlier self through the grown index
    DedupDocs.appendToHammingIndex(batch.toDF("id", "sig"), idxDir, "id", "sig", 64)
    val again = DedupDocs.hammingDedupeAgainstIndex(
        batch.toDF("id", "sig"), idxDir, "id", "sig", 64, 0)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.map { case (i, _) => (i, i) }.toSet.subsetOf(again),
      "appended signatures must be probeable")
    // wrong sigBits fails loudly against the stamp
    val e = intercept[IllegalArgumentException] {
      DedupDocs.hammingDedupeAgainstIndex(
        batch.toDF("id", "sig"), idxDir, "id", "sig", 32, 4)
    }
    assert(e.getMessage.contains("sigBits"))
  }

  test("hammingNearDupPairsWide == brute force over 128-bit signatures") {
    val rnd = new scala.util.Random(5)
    val baseSigs = (0L until 150L).map(i => (i, rnd.nextLong(), rnd.nextLong()))
    // planted near pairs flip bits in BOTH words, including bit 63 of
    // word 2 (a band straddling the word boundary must see it)
    val planted = baseSigs.take(30).map { case (i, a, b) =>
      (i + 500L, a ^ 0x8000000000000011L, b ^ (1L << 63) ^ 1L)
    }
    val all = baseSigs ++ planted
    val got = DedupDocs.hammingNearDupPairsWide(
        all.toDF("id", "h1", "h2"), "id", Seq("h1", "h2"), 25)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val brute = (for {
      (i, a1, b1) <- all
      (j, a2, b2) <- all
      if i < j
      d = java.lang.Long.bitCount(a1 ^ a2) + java.lang.Long.bitCount(b1 ^ b2)
      if d <= 25
    } yield ((i, j), d.toLong)).toMap
    assert(got === brute)
    assert(brute.size >= 30, "planted 5-bit pairs must all qualify")
    // maxHamming < words: bands must still fit one 64-bit word each (a
    // 128-bit band would wrap its shift and collapse to an OR of words) —
    // the nb = max(maxHamming+1, words) floor. Exact duplicates and
    // 1-bit-off pairs at gates 0 and 1:
    for (mh <- Seq(0, 1)) {
      val dup = baseSigs.take(20).map { case (i, a, b) =>
        (i + 900L, if (mh == 0) a else a ^ 1L, b)
      }
      val tiny = baseSigs ++ dup
      val g = DedupDocs.hammingNearDupPairsWide(
          tiny.toDF("id", "h1", "h2"), "id", Seq("h1", "h2"), mh)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val b = (for {
        (i, a1, b1) <- tiny
        (j, a2, b2) <- tiny
        if i < j
        d = java.lang.Long.bitCount(a1 ^ a2) + java.lang.Long.bitCount(b1 ^ b2)
        if d <= mh
      } yield ((i, j), d.toLong)).toMap
      assert(g === b, s"maxHamming=$mh diverged")
      assert(b.size >= 20)
    }
  }

  test("compactIndex: appendxN then compact — identical probes, collapsed file count, stamp kept") {
    def parquetFiles(dir: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    }
    val rnd = new scala.util.Random(33)
    // plain layout: hamming index, five appended batches
    val idxDir = tempDir("hamming-compact").resolve("idx").toString
    val base = (0L until 60L).map(i => i -> rnd.nextLong())
    DedupDocs.writeHammingIndex(base.toDF("id", "sig"), idxDir, "id", "sig", 64)
    val appended = (1 to 5).flatMap { b =>
      val batch = (0L until 20L).map(i => (b * 1000L + i) -> rnd.nextLong())
      DedupDocs.appendToHammingIndex(batch.toDF("id", "sig"), idxDir, "id", "sig", 64)
      batch
    }
    val probe = (base ++ appended).take(30).map { case (i, h) => (i + 90000L, h ^ 1L) }
    def probeSet = DedupDocs.hammingDedupeAgainstIndex(
        probe.toDF("id", "sig"), idxDir, "id", "sig", 64, 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probeSet
    val filesBefore = parquetFiles(idxDir).size
    IndexMeta.compactIndex(spark, idxDir, targetFiles = 2)
    assert(parquetFiles(idxDir).size < filesBefore,
      s"compaction must shrink file count (was $filesBefore)")
    assert(parquetFiles(idxDir).size <= 2)
    assert(probeSet === before, "probe results must be byte-identical after compaction")
    // stamp survived: the wrong-parameter probe still fails loudly
    intercept[IllegalArgumentException] {
      DedupDocs.hammingDedupeAgainstIndex(
        probe.toDF("id", "sig"), idxDir, "id", "sig", 32, 2)
    }
    // partitioned layout: minhash band index, one file per band dir after
    val docs = (0L until 40L).map(i => (i, s"common shingle text block $i " * 3))
    val mIdx = tempDir("minhash-compact").resolve("idx").toString
    DedupDocs.writeMinhashIndex(docs.toDF("doc_id", "text"), mIdx)
    val mAppended = (1 to 3).flatMap { b =>
      val batch = (0L until 10L).map(i => (b * 100L + i, s"other text body $b $i " * 3))
      DedupDocs.appendToMinhashIndex(batch.toDF("doc_id", "text"), mIdx)
      batch
    }
    val allDocs = (docs ++ mAppended).toDF("doc_id", "text")
    val q = docs.take(10).map { case (i, t) => (i + 5000L, t) }
    def mProbe = DedupDocs.dedupeAgainstIndex(q.toDF("doc_id", "text"), allDocs, mIdx)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mBefore = mProbe
    val mFilesBefore = parquetFiles(mIdx).size
    IndexMeta.compactIndex(spark, mIdx)
    val bandDirs = new java.io.File(mIdx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("band=")).map(_.toString)
    assert(bandDirs.nonEmpty)
    assert(bandDirs.forall(d => parquetFiles(d).size == 1),
      "each band dir must collapse to one file")
    assert(parquetFiles(mIdx).size < mFilesBefore)
    assert(mProbe === mBefore)
  }

  test("deleteIds: corpus deletes propagate to persisted indexes, layout + stamp preserved") {
    val rnd = new scala.util.Random(77)
    // plain layout: hamming index — deleted ids stop pairing, others keep
    val idxDir = tempDir("hamming-del").resolve("idx").toString
    val corpus = (0L until 80L).map(i => i -> rnd.nextLong())
    DedupDocs.writeHammingIndex(corpus.toDF("id", "sig"), idxDir, "id", "sig", 64)
    val probe = corpus.map { case (i, h) => (i + 90000L, h ^ 1L) }
    def pairs = DedupDocs.hammingDedupeAgainstIndex(
        probe.toDF("id", "sig"), idxDir, "id", "sig", 64, 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs
    assert((0L until 80L).forall(i => before.contains((i + 90000L, i))))
    IndexMeta.deleteIds(spark, idxDir, (0L until 80L by 4L).toDF("id"), "id")
    val after = pairs
    assert((0L until 80L by 4L).forall(i => !after.contains((i + 90000L, i))),
      "deleted ids must stop pairing")
    assert(after === before.filterNot { case (_, d2) => d2 % 4 == 0 },
      "surviving pairs must be untouched")
    // stamp survived the rewrite: wrong-parameter probes stay loud
    intercept[IllegalArgumentException] {
      DedupDocs.hammingDedupeAgainstIndex(
        probe.toDF("id", "sig"), idxDir, "id", "sig", 32, 2)
    }
    // partitioned layout: minhash band index — band dirs preserved
    val docs = (0L until 30L).map(i => (i, s"common shingle text block $i " * 3))
    val mIdx = tempDir("minhash-del").resolve("idx").toString
    DedupDocs.writeMinhashIndex(docs.toDF("doc_id", "text"), mIdx)
    val q = docs.map { case (i, t) => (i + 5000L, t) }
    val allDocs = docs.toDF("doc_id", "text")
    def mPairs = DedupDocs.dedupeAgainstIndex(q.toDF("doc_id", "text"), allDocs, mIdx)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mBefore = mPairs
    assert((0L until 30L).forall(i => mBefore.contains((i + 5000L, i))))
    IndexMeta.deleteIds(spark, mIdx, (0L until 30L by 3L).toDF("doc_id"), "doc_id")
    val mAfter = mPairs
    assert(mAfter === mBefore.filterNot { case (_, d2) => d2 % 3 == 0 })
    assert(new java.io.File(mIdx).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("band=")),
      "partition layout must survive the delete rewrite")
  }

  test("compactEvery cadence: appends auto-compact once over threshold; crash recovery restores") {
    def parquetFiles(dir: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    }
    val rnd = new scala.util.Random(71)
    val idxDir = tempDir("hamming-cadence").resolve("idx").toString
    val base = (0L until 40L).map(i => i -> rnd.nextLong())
    DedupDocs.writeHammingIndex(base.toDF("id", "sig").repartition(1), idxDir, "id", "sig", 64)
    assert(parquetFiles(idxDir).size == 1)
    // threshold 4: appends 1-3 accumulate fragments (single-file batches:
    // counts 2,3,4 — none over), append 4 pushes the count to 5 > 4 and
    // triggers EXACTLY ONE compaction back to targetless default layout
    var compactions = 0
    val appended = (1 to 4).flatMap { b =>
      val batch = (0L until 10L).map(i => (b * 1000L + i) -> rnd.nextLong())
      val before = parquetFiles(idxDir).toSet
      DedupDocs.appendToHammingIndex(
        batch.toDF("id", "sig").repartition(1), idxDir, "id", "sig", 64,
        compactEvery = 4)
      // an append only ADDS files; a compaction rewrites the whole layout,
      // so no pre-existing file path survives it
      if (!before.subsetOf(parquetFiles(idxDir).toSet)) compactions += 1
      batch
    }
    assert(compactions == 1, s"exactly one auto-compaction expected, got $compactions")
    val probe = (base ++ appended).take(20).map { case (i, h) => (i + 90000L, h ^ 1L) }
    val pairs = DedupDocs.hammingDedupeAgainstIndex(
        probe.toDF("id", "sig"), idxDir, "id", "sig", 64, 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size >= 20, "every planted 1-bit neighbor must survive the auto-compaction")
    // crash recovery (ADVICE r14): a crash between compactIndex's two
    // publish renames leaves the live index stranded at `.precompact` and
    // nothing at the root — the next compactIndex must restore it.
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(idxDir),
      new org.apache.hadoop.fs.Path(idxDir + ".precompact")))
    IndexMeta.compactIndex(spark, idxDir, targetFiles = 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxDir + ".precompact")))
    val pairsAfter = DedupDocs.hammingDedupeAgainstIndex(
        probe.toDF("id", "sig"), idxDir, "id", "sig", 64, 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAfter === pairs, "restored + recompacted index must probe identically")
    // ...and when an APPEND (not a rewrite) arrives first after the crash
    // (code-review r15): without the validate-path restore, the append
    // would recreate the root holding only its own batch — probes would
    // silently pair against that near-empty index and the NEXT rewrite
    // would delete the stranded corpus for good.
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(idxDir),
      new org.apache.hadoop.fs.Path(idxDir + ".precompact")))
    val late = (0L until 5L).map(i => (9000L + i) -> rnd.nextLong())
    DedupDocs.appendToHammingIndex(
      late.toDF("id", "sig"), idxDir, "id", "sig", 64)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxDir + ".precompact")),
      "the append must restore the stranded corpus before writing")
    val probeLate = late.map { case (i, h) => (i + 90000L, h ^ 1L) }
    val all = DedupDocs.hammingDedupeAgainstIndex(
        (probe ++ probeLate).toDF("id", "sig"), idxDir, "id", "sig", 64, 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(all), "the stranded corpus must survive the append")
    assert(probeLate.map(_._1).forall(p => all.exists(_._1 == p)),
      "the appended batch must be probe-visible")
  }

  test("dHash8 family pairs rotated/flipped copies; plain dHash misses them") {
    val ids = (0L until 40L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload")
    val rot = Multimodal.rotateImagesBatched(base, 1)
      .select(($"doc_id" + 1000L).as("doc_id"), $"payload")
    val mir = Multimodal.rotateImagesBatched(base, 2, mirror = true)
      .select(($"doc_id" + 2000L).as("doc_id"), $"payload")
    val fam = Multimodal.dHash8ImagesBatched(base.unionByName(rot).unionByName(mir))
      .toDF("doc_id", "decoded", "hhashes", "vhashes")
    assert(fam.filter(!$"decoded").count() == 0, "all rotated PNGs must decode")
    val sigs = fam
      .select($"doc_id", posexplode(arrays_zip($"hhashes", $"vhashes")).as(Seq("o", "hv")))
      .select(($"doc_id" * 8 + $"o").as("oid"),
        $"hv.hhashes".as("h1"), $"hv.vhashes".as("h2"))
    // PURE rotations/mirrors: the symmetric grid makes the permutation
    // exact, so the aligned orientation pair is at distance ZERO
    val pairs = DedupDocs.hammingNearDupPairsWide(sigs, "oid", Seq("h1", "h2"), 0)
      .select(floor($"d1" / 8).cast("long").as("a"), floor($"d2" / 8).cast("long").as("b"))
      .filter($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 40L).flatMap(d =>
      Seq((d, d + 1000L), (d, d + 2000L), (d + 1000L, d + 2000L))).toSet
    assert(expected.subsetOf(pairs),
      s"every rotated/mirrored copy must pair AT DISTANCE 0, missing: ${expected -- pairs}")
    assert(pairs.forall { case (a, b) => a % 1000L == b % 1000L },
      s"no unrelated pair at distance 0: ${pairs.filter(p => p._1 % 1000L != p._2 % 1000L)}")
    // the hole this closes: plain dHash misses every 90-degree rotation
    val plain = Multimodal.dHashImagesBatched(base.unionByName(rot))
      .toDF("doc_id", "decoded", "dhash")
    assert(DedupDocs.hammingNearDupPairs(plain, "doc_id", "dhash", 64, 8).count() == 0,
      "plain dHash should NOT pair rotated copies (else dHash8 is redundant)")
    // exact pixel permutation: two 180-degree rotations reproduce the
    // original raster bit for bit (feature = md5 over ARGB ints)
    val once = Multimodal.rotateImagesBatched(base, 2)
      .toDF().select($"doc_id", $"payload")
    val idFeat = Multimodal.rotateImagesBatched(base, 0)
      .toDF().select($"doc_id", $"feature".as("f0"))
    val mism = Multimodal.rotateImagesBatched(once, 2).toDF()
      .select($"doc_id", $"feature".as("f2"))
      .join(idFeat, "doc_id").filter($"f2" =!= $"f0").count()
    assert(mism == 0, "rot180 twice must reproduce the exact raster")
  }

  test("keypoint signatures pair cropped copies; banded pairs == brute-force intersection") {
    val ids = (0L until 40L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload")
    val crop = Multimodal.cropImagesBatched(base, 6, 6, 52, 52)
      .select(($"doc_id" + 1000L).as("doc_id"), $"payload")
    // crop is EXACT pixel extraction: decoding the cropped payload
    // reproduces the source's sub-rectangle bit for bit
    val srcBytes = base.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val cropBytes = crop.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    locally {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(srcBytes(0L)))
      val cr = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cropBytes(1000L)))
      assert(cr.getWidth == 52 && cr.getHeight == 52)
      for (x <- 0 until 52; y <- 0 until 52)
        assert((cr.getRGB(x, y) & 0xFFFFFF) == (src.getRGB(x + 6, y + 6) & 0xFFFFFF),
          s"crop pixel ($x,$y) diverged")
    }
    val kp = Multimodal.keypointHashImagesBatched(base.unionByName(crop))
      .toDF("doc_id", "decoded", "sigs").cache()
    assert(kp.filter(!$"decoded").count() == 0, "all cropped PNGs must decode")
    val perDoc = kp.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("sigs").toSet).toMap
    assert(perDoc.values.forall(_.size >= 6),
      s"every synthetic image needs keypoints to gate on, min ${perDoc.values.map(_.size).min}")
    // operator output == brute-force distinct-intersection oracle
    val sigRows = kp.select($"doc_id", explode($"sigs").as("sig"))
    val got = DedupDocs.sharedSigPairs(sigRows, "doc_id", "sig", 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val docsSorted = perDoc.keys.toSeq.sorted
    val brute = (for {
      i <- docsSorted; j <- docsSorted if i < j
      n = (perDoc(i) & perDoc(j)).size.toLong if n >= 1
    } yield ((i, j), n)).toMap
    assert(got === brute, "banded shared-sig pairs must equal brute-force intersection")
    // separation: every planted crop pair shares clearly more than any
    // unrelated pair (gate calibration lives in ProbeImg at corpus scale)
    val planted = (0L until 40L).map(i => brute.getOrElse((i, i + 1000L), 0L))
    val unrelated = brute.collect { case ((a, b), n) if a % 1000L != b % 1000L => n }
    assert(planted.min > (unrelated ++ Seq(0L)).max,
      s"planted min ${planted.min} must clear unrelated max ${(unrelated ++ Seq(0L)).max}")
    // determinism: re-rendered + re-hashed signatures are identical
    val again = Multimodal.keypointHashImagesBatched(
        Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r.sigs.toSet).toMap
    (0L until 40L).foreach(i => assert(again(i) === perDoc(i)))
    // the hole this closes: plain dHash misses cropped copies entirely
    val plain = Multimodal.dHashImagesBatched(base.unionByName(crop))
      .toDF("doc_id", "decoded", "dhash")
    assert(DedupDocs.hammingNearDupPairs(plain, "doc_id", "dhash", 64, 8)
      .filter($"d1" + 1000L === $"d2").count() == 0,
      "plain dHash should NOT pair cropped copies (else keypoints are redundant)")
    // hot-signature cap: capping at 1 drops every shared signature bucket
    // with two members — planted pairs then need their count from cold
    // buckets only (here: none survive, the recall trade made explicit)
    val capped = DedupDocs.sharedSigPairs(sigRows, "doc_id", "sig", 1, maxBucket = Some(1))
    assert(capped.count() == 0, "cap=1 must drop every 2-member signature bucket")
  }

  test("jpeg re-encode is real + lossy; blurred keypoint family survives it, exact family does not") {
    val ids = (0L until 24L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload")
    val jp = Multimodal.reencodeJpegImagesBatched(base, 0.7f).cache()
    assert(jp.filter(!$"resized").count() == 0, "all PNGs must re-encode")
    val srcBytes = base.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    var anyPixelDiff = false
    jp.collect().foreach { r =>
      assert(r.width == 64 && r.height == 64, "re-encode must preserve dimensions")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img != null && img.getWidth == 64 && img.getHeight == 64,
        "jpeg payload must decode at source dimensions")
      assert(!java.util.Arrays.equals(r.payload, srcBytes(r.doc_id)),
        "re-encoded bytes must differ from the source PNG")
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(srcBytes(r.doc_id)))
      var x = 0
      while (!anyPixelDiff && x < 64) {
        var y = 0
        while (!anyPixelDiff && y < 64) {
          if ((img.getRGB(x, y) & 0xFFFFFF) != (src.getRGB(x, y) & 0xFFFFFF))
            anyPixelDiff = true
          y += 1
        }
        x += 1
      }
    }
    assert(anyPixelDiff, "quality 0.7 must actually be lossy on some pixel")
    // unreadable payloads pass through unchanged
    val junk = Seq((99L, Array.fill[Byte](16)(3))).toDF("doc_id", "payload")
    val pj = Multimodal.reencodeJpegImagesBatched(junk, 0.7f).collect()(0)
    assert(!pj.resized && pj.payload.length == 16, "junk must pass through")
    // the family motivation, in miniature (corpus-scale calibration lives
    // in ProbeImg): over the same base<->jpeg pool, the blur=2 family
    // pairs nearly every planted copy at >= 3 shared sigs while the
    // exact family loses most of them
    val pool = base.unionByName(jp.select(($"doc_id" + 1000L).as("doc_id"), $"payload"))
    def plantedShared(blur: Int): Map[Long, Long] = {
      val kp = Multimodal.keypointHashImagesBatched(pool, blur = blur)
        .toDF("doc_id", "decoded", "sigs")
      DedupDocs.sharedSigPairs(
          kp.select($"doc_id", explode($"sigs").as("sig")), "doc_id", "sig", 1)
        .filter($"d1" + 1000L === $"d2")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    val blurred = plantedShared(2)
    val exact = plantedShared(0)
    val blurredStrong = (0L until 24L).count(i => blurred.getOrElse(i, 0L) >= 3L)
    val exactStrong = (0L until 24L).count(i => exact.getOrElse(i, 0L) >= 3L)
    assert(blurredStrong >= 20,
      s"blur=2 family must survive jpeg(0.7) on most copies, got $blurredStrong/24")
    assert(exactStrong < blurredStrong,
      s"exact family should be weaker under jpeg ($exactStrong vs $blurredStrong) — " +
        "else the blur variant is redundant")
    // blur preserves crop-exactness: a lossless crop still shares
    // interior signatures under the blurred family
    val crop = Multimodal.cropImagesBatched(base, 6, 6, 52, 52)
      .select(($"doc_id" + 2000L).as("doc_id"), $"payload")
    val kpC = Multimodal.keypointHashImagesBatched(
        base.unionByName(crop), blur = 2)
      .toDF("doc_id", "decoded", "sigs")
    val cropShared = DedupDocs.sharedSigPairs(
        kpC.select($"doc_id", explode($"sigs").as("sig")), "doc_id", "sig", 1)
      .filter($"d1" + 2000L === $"d2")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert((0L until 24L).count(i => cropShared.getOrElse(i, 0L) >= 3L) >= 20,
      "box blur must preserve crop interior signatures (translation invariance)")
  }

  test("sig-set index: incremental probe == inline pairs; appends visible; stamp loud") {
    val ids = (0L until 30L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload")
    val corpusSigs = Multimodal.keypointHashImagesBatched(base)
      .toDF("doc_id", "decoded", "sigs")
      .select($"doc_id", explode($"sigs").as("sig"))
    val fam = "kp|p16r2g3k32|test"
    val idxDir = tempDir("sigset").resolve("idx").toString
    DedupDocs.writeSigSetIndex(corpusSigs, idxDir, "doc_id", "sig", fam)
    val batchSigs = Multimodal.keypointHashImagesBatched(
        Multimodal.cropImagesBatched(base.filter($"doc_id" % 3 === 0), 6, 6, 52, 52)
          .select(($"doc_id" + 1000L).as("doc_id"), $"payload"))
      .toDF("doc_id", "decoded", "sigs")
      .select($"doc_id", explode($"sigs").as("sig")).cache()
    val got = DedupDocs
      .sharedSigsAgainstIndex(batchSigs, idxDir, "doc_id", "sig", fam, 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // oracle: the inline operator over the union, restricted to
    // batch x corpus pairs (batch ids are +1000, so they sort second)
    val inline = DedupDocs
      .sharedSigPairs(corpusSigs.unionByName(batchSigs), "doc_id", "sig", 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .collect { case ((a, b), n) if a < 1000L && b >= 1000L => ((b, a), n) }
      .toMap
    assert(got === inline, "incremental probe must equal inline batch x corpus pairs")
    assert((0L until 30L by 3).forall(i => got.contains((i + 1000L, i))),
      "every planted crop must pair its source")
    // append: new corpus images become probe-visible through the same index
    val extra = Multimodal.renderSyntheticImages(
        (100L until 110L).toDF("doc_id"), 64, 64).toDF("doc_id", "payload")
    DedupDocs.appendToSigSetIndex(
      Multimodal.keypointHashImagesBatched(extra).toDF("doc_id", "decoded", "sigs")
        .select($"doc_id", explode($"sigs").as("sig")),
      idxDir, "doc_id", "sig", fam)
    val batch2 = Multimodal.keypointHashImagesBatched(
        Multimodal.cropImagesBatched(extra, 6, 6, 52, 52)
          .select(($"doc_id" + 1000L).as("doc_id"), $"payload"))
      .toDF("doc_id", "decoded", "sigs")
      .select($"doc_id", explode($"sigs").as("sig"))
    val got2 = DedupDocs
      .sharedSigsAgainstIndex(batch2, idxDir, "doc_id", "sig", fam, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((100L until 110L).forall(i => got2.contains((i + 1000L, i))),
      "appended corpus images must be probe-visible")
    // hot-signature cap: capped counts never exceed uncapped
    val capped = DedupDocs
      .sharedSigsAgainstIndex(batchSigs, idxDir, "doc_id", "sig", fam, 1,
        maxBucket = Some(2))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(capped.forall { case (k, n) => n <= got.getOrElse(k, 0L) },
      "capping must only remove shared values")
    // a drifted family stamp fails loudly instead of pairing nothing
    intercept[IllegalArgumentException](
      DedupDocs.sharedSigsAgainstIndex(
        batchSigs, idxDir, "doc_id", "sig", "kp|OTHER", 1).collect())
    intercept[IllegalArgumentException](
      DedupDocs.appendToSigSetIndex(batchSigs, idxDir, "doc_id", "sig", "kp|OTHER"))
    batchSigs.unpersist()
  }

  test("image dHash: resized copies land within the gate, unrelated images far outside") {
    val ids = (0L until 60L).toDF("doc_id")
    val base = Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload")
    val copies = Multimodal.resizeImagesBatched(base, 48, 48)
      .select((col("doc_id") + lit(1000L)).as("doc_id"), col("payload"))
    val sigs = Multimodal.dHashImagesBatched(base.unionByName(copies))
      .collect().map(s => s.doc_id -> (s.decoded, s.dhash)).toMap
    assert(sigs.values.forall(_._1), "synthetic PNGs must all decode")
    // determinism: a re-render hashes identically
    val again = Multimodal.dHashImagesBatched(
      Multimodal.renderSyntheticImages(ids, 64, 64).toDF("doc_id", "payload"))
      .collect().map(s => s.doc_id -> s.dhash).toMap
    (0L until 60L).foreach(i => assert(again(i) === sigs(i)._2))
    val planted = (0L until 60L).map(i =>
      java.lang.Long.bitCount(sigs(i)._2 ^ sigs(i + 1000L)._2))
    assert(planted.max <= 8, s"planted resize pair beyond the gate: ${planted.max}")
    val cross = for {
      i <- 0L until 60L; j <- 0L until 60L if i < j
    } yield java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
    assert(cross.min > 8, s"unrelated pair inside the gate: ${cross.min}")
  }

  test("sketch rollup: union of per-bucket HLL sketches == direct distinct (sparse-exact)") {
    // keys overlap across buckets — a rollup that double-counted would
    // overshoot; sparse-mode HLL estimates exactly at this cardinality.
    val rows = for {
      day <- 0 to 9
      k <- 0 until 50
    } yield (if (k % 2 == 0) "a" else "b", day.toLong, (k + day * 10).toLong)
    val df = rows.toDF("grp", "day", "key")
    val sk = Sketches.distinctSketches(df, Seq("grp"), "day", "key")
    assert(sk.count() === 20) // one sketch per (grp, day) cell
    val rolled = Sketches.rollupDistinct(sk, Seq("grp"))
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(_._1).view
      .mapValues(_.map(_._3).distinct.size.toLong).toMap
    assert(rolled === exact)
  }

  test("histogram sketches: rollup == direct histogram; quantile bins == brute force; clamps count") {
    val rnd = new scala.util.Random(11)
    // values straddle the [0, 100) grid on both sides — clamping must
    // COUNT them in the edge bins, never drop them
    val rows = (0 until 2000).map(i =>
      ("g" + (i % 3), (i % 7).toLong, rnd.nextDouble() * 120.0 - 10.0))
    val df = rows.toDF("g", "bucket", "v")
    def toBin(v: Double): Long =
      math.min(math.max(math.floor(v / 10.0), 0.0), 9.0).toLong
    def binsOf(frame: org.apache.spark.sql.DataFrame): Map[String, Map[Int, Long]] =
      frame.collect().map(r => r.getString(0) ->
        r.getMap[Int, Long](r.fieldIndex("bins")).toMap).toMap
    val sk = Sketches.histSketches(df, Seq("g"), "bucket", "v",
      lo = 0.0, binWidth = 10.0, nBins = 10)
    assert(sk.count() === 21) // one sketch per (g, bucket) cell
    val rolled = Sketches.rollupHist(sk, Seq("g"))
    val rolledBins = binsOf(rolled)
    // exact-merge property: the rollup equals a direct histogram of the
    // union (single-cell build over the same rows)
    val direct = binsOf(Sketches.histSketches(
      df.withColumn("one", lit(1)), Seq("g"), "one", "v", 0.0, 10.0, 10))
    assert(rolledBins === direct, "rollup must equal the direct histogram")
    // nothing dropped: totals equal raw row counts per group
    val perG = rows.groupBy(_._1)
    assert(rolledBins.map { case (g, m) => g -> m.values.sum } ===
      perG.view.mapValues(_.size.toLong).toMap)
    // brute-force bins match the Scala-side binning
    assert(rolledBins === perG.view.mapValues(
      _.groupBy(r => toBin(r._3).toInt).view.mapValues(_.size.toLong).toMap).toMap)
    // quantile bins == brute-force rank queries over the binned values
    val got = Sketches.histQuantiles(rolled, Seq("g"), Seq(0.5, 0.9, 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val brute = perG.view.mapValues { rs =>
      val sorted = rs.map(r => toBin(r._3)).sorted.toIndexedSeq
      def rank(q: Double): Long = sorted(math.ceil(q * sorted.size).toInt - 1)
      (rank(0.5), rank(0.9), rank(1.0))
    }.toMap
    assert(got === brute, "histogram rank queries must match brute force")
  }
}
