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
    */
  def validate(spark: SparkSession, path: String, expected: Map[String, String]): Unit = {
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
}
