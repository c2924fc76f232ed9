package graft.util

/** Bit-twiddling utilities: Morton (Z-order) interleave, zigzag codes,
  * popcount helpers, power-of-two sizing.
  *
  * Same capability surface as the reference's
  * `/root/reference/src/main/java/tech/odes/common/util/BitUtil.java`
  * (interleave/deinterleave `:122-157`, zigzag `:160-182`, popcounts
  * `:44-90`, nextHighestPowerOfTwo `:93-115`), re-derived from the
  * standard magic-mask formulations (Hacker's Delight / Bit Twiddling
  * Hacks) rather than ported.
  *
  * Z-order is the write-clustering primitive: interleaving the bits of two
  * dimension keys gives a 1-D sort key whose ranges are 2-D locality
  * blocks, so range predicates on either dimension prune files.
  */
object BitUtil {

  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Inverse of [[spread]]: compact the even bit positions into 32 bits. */
  def compact(z0: Long): Long = {
    var z = z0 & 0x5555555555555555L
    z = (z | (z >>> 1)) & 0x3333333333333333L
    z = (z | (z >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    z = (z | (z >>> 4)) & 0x00FF00FF00FF00FFL
    z = (z | (z >>> 8)) & 0x0000FFFF0000FFFFL
    z = (z | (z >>> 16)) & 0x00000000FFFFFFFFL
    z
  }

  /** Morton interleave of the low 32 bits of `a` (even positions) and `b`
    * (odd positions).
    */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Even-position half of a Morton code (the first interleaved value). */
  def deinterleaveEven(z: Long): Long = compact(z)

  /** Odd-position half of a Morton code (the second interleaved value). */
  def deinterleaveOdd(z: Long): Long = compact(z >>> 1)

  /** Zigzag-encode a signed long to an unsigned-ordered long. */
  def zigzagEncode(x: Long): Long = (x << 1) ^ (x >> 63)

  /** Inverse of [[zigzagEncode]]. */
  def zigzagDecode(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  /** Number of set bits across an array of longs (bitset cardinality). */
  def popArray(words: Array[Long]): Long = {
    var i = 0
    var n = 0L
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }

  /** Smallest power of two >= v (v in [1, 2^62]). */
  def nextHighestPowerOfTwo(v0: Long): Long = {
    var v = v0 - 1
    v |= v >> 1; v |= v >> 2; v |= v >> 4
    v |= v >> 8; v |= v >> 16; v |= v >> 32
    v + 1
  }
}
