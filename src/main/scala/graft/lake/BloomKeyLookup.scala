package graft.lake

import org.apache.spark.unsafe.types.UTF8String

/** Key-might-exist test against a table version's bucket layout + bloom
  * sidecars: a key whose bucket holds no data at all is definitely absent;
  * a key whose bucket has a bloom sidecar is absent if the bloom says so; a
  * data-bearing bucket without a sidecar conservatively answers true.
  *
  * Ships to executors serialized inside [[graft.functions.BloomMightContainExpr]];
  * the blooms deserialize ONCE per task (`@transient lazy`), not per row.
  * Works on the raw UTF-8 bytes: Spark's `BloomFilter.putString` hashes the
  * UTF-8 encoding, and `LakeTable.bucketOfKey` xxhash64's the same bytes —
  * so no String materialization per key.
  */
final class BloomKeyLookup(
    bloomBytes: Map[Int, Array[Byte]],
    presentBuckets: Set[Int],
    numBuckets: Int)
    extends Serializable {

  @transient private lazy val blooms
      : Map[Int, org.apache.spark.util.sketch.BloomFilter] =
    bloomBytes.map { case (b, bytes) =>
      b -> org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    }

  /** Called from generated code (one static-shaped call per row). */
  def contains(key: UTF8String): Boolean =
    key != null && {
      val bytes = key.getBytes
      val b = LakeTable.bucketOfKeyBytes(bytes, numBuckets)
      presentBuckets.contains(b) && {
        blooms.get(b) match {
          case Some(bf) => bf.mightContainBinary(bytes)
          case None => true
        }
      }
    }

  def containsString(key: String): Boolean =
    key != null && contains(UTF8String.fromString(key))
}
