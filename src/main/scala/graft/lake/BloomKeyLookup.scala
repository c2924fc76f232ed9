package graft.lake

import org.apache.spark.unsafe.types.UTF8String

/** Key-might-exist test against a table version's bucket layout + bloom
  * sidecars: a key whose bucket holds no data at all is definitely absent;
  * a key whose bucket has a bloom sidecar is absent if the bloom says so; a
  * data-bearing bucket without a sidecar conservatively answers true.
  *
  * Ships to executors serialized inside [[graft.functions.BloomMightContainExpr]]
  * carrying only the sidecars' PATHS — never the filter bytes. At
  * production bucket counts (thousands of buckets x ~MB filters) an
  * eagerly-decoded byte map would serialize GBs into every delete plan;
  * instead each task lazily loads just the blooms of the buckets its rows
  * actually hash to (once per task per bucket, cached in a concurrent map).
  * `LakeTable.bloomPrune` bucket-aligns the key set first when the table
  * is wide, so a task touches O(buckets/tasks) sidecars, not all of them.
  *
  * Hashing works on the raw UTF-8 bytes: Spark's `BloomFilter.putString`
  * hashes the UTF-8 encoding, and the bucket function
  * ([[LakeTable.bucketOfKeyBytes]] — the same implementation behind the
  * write path's `bucketOf`) xxhash64's the same bytes — no String
  * materialization per key.
  */
final class BloomKeyLookup(
    bloomPaths: Map[Int, String],
    basePath: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    presentBuckets: Set[Int],
    numBuckets: Int)
    extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, AnyRef]()
  private val Missing = "missing" // sentinel for buckets without a sidecar

  private def bloomFor(b: Int): Option[org.apache.spark.util.sketch.BloomFilter] =
    cache.computeIfAbsent(b, _ =>
      bloomPaths.get(b) match {
        case Some(rel) =>
          val p = new org.apache.hadoop.fs.Path(basePath, rel)
          // A sidecar can disappear mid-job (concurrent commit + vacuum
          // reclaiming the version dir the plan captured): degrade to "no
          // sidecar" — conservative true, the prune just prunes less. The
          // eager-bytes design had a microsecond version of this window;
          // lazy loading stretches it to job lifetime, so it must be
          // handled, not assumed away.
          try {
            val in = p.getFileSystem(conf.value).open(p)
            try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
            finally in.close()
          } catch { case _: java.io.FileNotFoundException => Missing }
        case None => Missing
      }) match {
      case bf: org.apache.spark.util.sketch.BloomFilter => Some(bf)
      case _ => None
    }

  /** Called from generated code (one static-shaped call per row). */
  def contains(key: UTF8String): Boolean =
    key != null && {
      val bytes = key.getBytes
      val b = LakeTable.bucketOfKeyBytes(bytes, numBuckets)
      presentBuckets.contains(b) && {
        bloomFor(b) match {
          case Some(bf) => bf.mightContainBinary(bytes)
          case None => true
        }
      }
    }
}
