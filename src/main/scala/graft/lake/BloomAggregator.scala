package graft.lake

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Distributed bloom-filter construction: a typed Aggregator whose partial
  * buffers are bloom filters merged with `mergeInPlace` — each executor
  * ships one ~KB filter per group, never the keys themselves (the naive
  * `collect_set(keys)` alternative is a driver OOM at scale).
  *
  * Capability mirror of the reference's sizing math
  * (`/root/reference/src/main/java/tech/odes/common/util/BloomFilter.java:51-58`):
  * Spark's sketch library computes the same optimal `m = -n ln(eps)/ln^2 2`,
  * `k = ln 2 * m/n` internally.
  */
class BloomAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems.max(1L), fpp)

  override def reduce(b: BloomFilter, key: String): BloomFilter = {
    b.putString(key)
    b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
