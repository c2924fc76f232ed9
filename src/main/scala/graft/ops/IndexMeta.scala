package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Build-parameter stamping for persisted index artifacts (`_graft_index
  * .json` beside the parquet): a probe whose parameters (band width, plane
  * matrix, hash scheme) differ from the ones the index was BUILT with
  * joins incompatible hash spaces and silently loses recall — the exact
  * verify step can only remove false positives, never restore missed
  * candidates. Stamping turns that silent wrong answer into an immediate
  * error.
  *
  * The `_` prefix keeps the file invisible to parquet directory listings.
  * Validation is skipped when the file is absent (pre-stamping artifact).
  */
object IndexMeta {

  private val FileName = "_graft_index.json"

  /** Deterministic fingerprint of a numeric matrix (planes / centroids). */
  def fingerprint(m: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    m.foreach(_.foreach { d =>
      bb.clear(); bb.putDouble(d); md.update(bb.array())
    })
    md.digest().map("%02x".format(_)).mkString
  }

  def write(spark: SparkSession, path: String, meta: Map[String, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    meta.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    val p = new HPath(path, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  /** Require every expected key to match the stamped value (no-op when the
    * artifact carries no stamp).
    *
    * `heal = true` (the WRITER entry points — every `appendTo*Index` —
    * plus [[compactIndex]]'s own entry) additionally restores an index
    * stranded at `.precompact` by a rewrite crash (code-review r15):
    * without the restore there, the next append would recreate `path`
    * holding only its own batch (validate no-ops on a missing stamp),
    * later probes would silently pair against that near-empty root, and
    * the next rewrite would delete the stranded corpus for good.
    * READ-ONLY probes deliberately do NOT heal (advice r15): a probe on
    * another session renaming `.precompact` back mid-rewrite would abort
    * the rewriter's publish rename. A probe that lands in the crash
    * window instead fails loudly on the missing path (retryable; the
    * single-writer's next append/compact heals).
    */
  def validate(
      spark: SparkSession,
      path: String,
      expected: Map[String, String],
      heal: Boolean = false): Unit = {
    if (heal) restoreStranded(spark, path)
    val p = new HPath(path, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val in = fs.open(p)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    expected.foreach { case (k, v) =>
      val stored = Option(root.get(k)).map(_.asText())
      require(
        stored.forall(_ == v),
        s"index at $path was built with $k=${stored.get}, probe expects $k=$v — " +
          "rebuild the index or match the build parameters")
    }
  }

  /** Restore an index stranded at `.precompact` by a crash between the
    * rewrite publish's two renames — no-op in the healthy state. Called
    * from [[validate]] with `heal = true` (writer entry points only) and
    * [[compactIndex]]'s rewrite entry, so the single writer's next
    * operation after the crash heals the artifact; read-only probes
    * never mutate (they'd race a live rewrite on another session).
    */
  private def restoreStranded(spark: SparkSession, path: String): Unit = {
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pre = new HPath(path + ".precompact")
    if (!fs.exists(root) && fs.exists(pre))
      require(fs.rename(pre, root),
        s"index rewrite: could not restore stranded $pre to $path")
  }

  /** Number of parquet data files under an index root (recursive) — the
    * fragmentation measure the auto-compaction cadence keys on. */
  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Automatic compaction cadence behind the `appendTo*Index` family's
    * `compactEvery` knob (VERDICT r14 #5 — [[compactIndex]] existed but
    * nothing called it, so an ingest loop had to know to): compact when
    * the index's parquet fragment count exceeds `maxFiles`; `maxFiles <=
    * 0` disables (the manual contract). Deterministic — the decision
    * reads only the file listing, so a single-writer ingest loop
    * triggers at the same batch wherever it runs. Returns true when a
    * compaction ran.
    */
  def compactIfFragmented(spark: SparkSession, path: String, maxFiles: Int): Boolean =
    maxFiles > 0 && parquetFileCount(spark, path) > maxFiles && {
      compactIndex(spark, path)
      true
    }

  /** Rewrite an append-accumulated index artifact to a compact file
    * layout, stamp preserved (VERDICT r13 #5): every `appendTo*Index`
    * call adds one parquet fragment per ingest batch, so after thousands
    * of batches a probe pays file COUNT instead of bytes (the q50
    * lesson re-manifesting slowly). Works on any of the engine's index
    * layouts — partition dirs (`band=`/`bh=`/`centroid=`) are
    * self-detected from the directory tree and preserved, one file per
    * leaf dir; a plain bucketless layout rewrites to `targetFiles` files
    * (default: the session's parallelism, so a compacted index still
    * scans in parallel).
    *
    * Same single-writer contract as the appends themselves: run it from
    * the ingest loop between batches, never concurrently with an append
    * (the swap is two renames, not atomic). A probe running concurrently
    * on ANOTHER session may transiently fail and should retry; rows and
    * stamp are byte-preserved, so results before == after.
    */
  def compactIndex(spark: SparkSession, path: String, targetFiles: Int = 0): Unit =
    rewriteIndex(spark, path, identity, targetFiles)

  /** DELETE ids from a persisted index artifact in place (r15): the
    * lifecycle half every dedup/ANN index family needs — a corpus
    * delete (user opt-out, takedown, retention sweep) must propagate to
    * the persisted signatures or probes keep pairing content the corpus
    * no longer holds. Anti-joins the stored rows on `idCol` (AQE
    * broadcasts a small id set) and republishes through the same
    * two-rename + crash-recovery swap as [[compactIndex]] — layout
    * self-detected and preserved, stamp byte-preserved, same
    * single-writer contract. The rewrite costs one pass over the index
    * (rows are 8-16 bytes; the decode/hash work the index exists to
    * avoid is NOT re-paid). Deleting every row of a value-bucket leaves
    * an empty dir — probes read empty, correct.
    */
  def deleteIds(
      spark: SparkSession,
      path: String,
      ids: org.apache.spark.sql.DataFrame,
      idCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val del = ids.select(col(idCol)).distinct()
    rewriteIndex(spark, path,
      df => df.join(del, df(idCol) === del(idCol), "left_anti"))
  }

  private def rewriteIndex(
      spark: SparkSession,
      path: String,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      targetFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery (ADVICE r14): the publish below is two renames; a
    // crash between them leaves nothing at `path` and the live data
    // stranded at `.precompact` — restored here AND in validate(heal=true)
    // (writer entry points), so the writer's next operation heals it. (A
    // stale `.compacting` dir — crash before the first rename — is torn
    // down below before the rewrite either way.)
    restoreStranded(spark, path)
    require(fs.exists(root), s"no index at $path")
    // partition column chain from the directory names (band=…/bh=…)
    val pcols = scala.collection.mutable.ArrayBuffer[String]()
    var cur = root
    var next = fs.listStatus(cur).filter(_.isDirectory)
      .map(_.getPath).find(_.getName.contains("="))
    while (next.isDefined) {
      pcols += next.get.getName.split("=")(0)
      cur = next.get
      next = fs.listStatus(cur).filter(_.isDirectory)
        .map(_.getPath).find(_.getName.contains("="))
    }
    val metaPath = new HPath(path, FileName)
    val meta =
      if (!fs.exists(metaPath)) None
      else {
        val in = fs.open(metaPath)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val b = new Array[Byte](8192)
          var r = in.read(b)
          while (r >= 0) { buf.write(b, 0, r); r = in.read(b) }
          Some(buf.toByteArray)
        } finally in.close()
      }
    val df = transform(spark.read.parquet(path))
    val tmp = new HPath(path + ".compacting")
    fs.delete(tmp, true)
    val n = if (targetFiles > 0) targetFiles else spark.sparkContext.defaultParallelism
    val out =
      if (pcols.nonEmpty)
        // hash on the partition combo: each leaf dir's rows land in one
        // task -> one file per dir
        df.repartition(pcols.toSeq.map(col): _*)
          .write.partitionBy(pcols.toSeq: _*)
      else df.repartition(n).write
    out.parquet(tmp.toString)
    meta.foreach { bytes =>
      val o = fs.create(new HPath(tmp, FileName), true)
      try o.write(bytes) finally o.close()
    }
    val old = new HPath(path + ".precompact")
    fs.delete(old, true)
    require(fs.rename(root, old), s"index rewrite: could not move $path aside")
    if (!fs.rename(tmp, root)) {
      fs.rename(old, root) // restore; the index was never unreadable
      throw new java.io.IOException(s"index rewrite: could not publish $tmp")
    }
    fs.delete(old, true)
  }
}
