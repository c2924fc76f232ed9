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

  /** Spread the low 21 bits of `v` to every 3rd bit position (3-D Morton
    * lane) — standard magic-mask sequence.
    */
  def spread3(v0: Long): Long = {
    var v = v0 & 0x1FFFFFL
    v = (v | (v << 32)) & 0x001F00000000FFFFL
    v = (v | (v << 16)) & 0x001F0000FF0000FFL
    v = (v | (v << 8)) & 0x100F00F00F00F00FL
    v = (v | (v << 4)) & 0x10C30C30C30C30C3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** Spread the low 16 bits of `v` to every 4th bit position (4-D Morton
    * lane).
    */
  def spread4(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 24)) & 0x000000FF000000FFL
    v = (v | (v << 12)) & 0x000F000F000F000FL
    v = (v | (v << 6)) & 0x0303030303030303L
    v = (v | (v << 3)) & 0x1111111111111111L
    v
  }

  /** 3-D Morton code over the low 21 bits of each dimension. */
  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)

  /** 4-D Morton code over the low 16 bits of each dimension. */
  def interleave4(a: Long, b: Long, c: Long, d: Long): Long =
    spread4(a) | (spread4(b) << 1) | (spread4(c) << 2) | (spread4(d) << 3)

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

  private val EvenMask = 0x5555555555555555L

  /** Swap the even- and odd-position bit lanes of a Morton code: the
    * Z-order key with the two dimensions exchanged (ref `BitUtil.java:155`)
    * — `flipFlop(interleave(a, b)) == interleave(b, a)`.
    */
  def flipFlop(z: Long): Long = ((z & EvenMask) << 1) | ((z >>> 1) & EvenMask)

  // ---- long[]-backed bitset navigation (ref BitUtil.java:193-308) --------
  // Re-derived from the standard word-index/mask formulation; bit indexes
  // beyond the array answer like an infinite sea of zeros.

  /** True iff bit `i` is set. */
  def isBitSet(bits: Array[Long], i: Int): Boolean = {
    val w = i >>> 6
    i >= 0 && w < bits.length && (bits(w) & (1L << (i & 63))) != 0
  }

  /** Total set bits (alias of [[popArray]] with the reference's name). */
  def countBits(bits: Array[Long]): Long = popArray(bits)

  /** Set bits strictly below bit index `i`. */
  def countBitsUpTo(bits: Array[Long], i: Int): Long = {
    if (i <= 0) return 0L
    val w = math.min(i >>> 6, bits.length)
    var n = 0L
    var k = 0
    while (k < w) { n += java.lang.Long.bitCount(bits(k)); k += 1 }
    if (w < bits.length && (i & 63) != 0)
      n += java.lang.Long.bitCount(bits(w) & ((1L << (i & 63)) - 1))
    n
  }

  /** Index of the first set bit at or above `from`, or -1. */
  def nextBitSet(bits: Array[Long], from: Int): Int = {
    if (from < 0) return nextBitSet(bits, 0)
    var w = from >>> 6
    if (w >= bits.length) return -1
    var word = bits(w) & (-1L << (from & 63))
    while (true) {
      if (word != 0) return (w << 6) + java.lang.Long.numberOfTrailingZeros(word)
      w += 1
      if (w >= bits.length) return -1
      word = bits(w)
    }
    -1 // unreachable
  }

  /** Index of the last set bit at or below `from`, or -1. */
  def previousBitSet(bits: Array[Long], from: Int): Int = {
    if (from < 0) return -1
    var w = math.min(from >>> 6, bits.length - 1)
    if (w < 0) return -1
    var word =
      if (w == from >>> 6) bits(w) & (-1L >>> (63 - (from & 63)))
      else bits(w)
    while (true) {
      if (word != 0) return (w << 6) + 63 - java.lang.Long.numberOfLeadingZeros(word)
      w -= 1
      if (w < 0) return -1
      word = bits(w)
    }
    -1 // unreachable
  }

  /** Cardinalities of pairwise bitset combinations without materializing
    * the combined set (ref `BitUtil.java:54-90`).
    */
  def popIntersect(a: Array[Long], b: Array[Long]): Long =
    popZip(a, b)(_ & _)
  def popUnion(a: Array[Long], b: Array[Long]): Long =
    popZip(a, b)(_ | _)
  def popAndNot(a: Array[Long], b: Array[Long]): Long =
    popZip(a, b)(_ & ~_)
  def popXor(a: Array[Long], b: Array[Long]): Long =
    popZip(a, b)(_ ^ _)

  private def popZip(a: Array[Long], b: Array[Long])(op: (Long, Long) => Long): Long = {
    val n = math.min(a.length, b.length)
    var i = 0
    var c = 0L
    while (i < n) { c += java.lang.Long.bitCount(op(a(i), b(i))); i += 1 }
    // words past the shorter array pair with zero
    while (i < a.length) { c += java.lang.Long.bitCount(op(a(i), 0L)); i += 1 }
    while (i < b.length) { c += java.lang.Long.bitCount(op(0L, b(i))); i += 1 }
    c
  }
}
