package graft.util

import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the bit utilities (SURVEY.md §5.2: interleave /
  * zigzag round-trips).
  */
object BitUtilProps extends Properties("BitUtil") {

  property("interleave round-trips through deinterleave") = forAll { (a: Int, b: Int) =>
    val al = a.toLong & 0xFFFFFFFFL
    val bl = b.toLong & 0xFFFFFFFFL
    val z = BitUtil.interleave(al, bl)
    BitUtil.deinterleaveEven(z) == al && BitUtil.deinterleaveOdd(z) == bl
  }

  property("interleave of small ints preserves z-curve order blocks") = forAll { (a: Short, b: Short) =>
    val al = a.toLong & 0xFFFFL
    val bl = b.toLong & 0xFFFFL
    // Morton code of (a, b) is bounded by interleave of the bit-or upper bound
    BitUtil.interleave(al, bl) <= BitUtil.interleave(0xFFFFL, 0xFFFFL)
  }

  property("spread/compact round-trip") = forAll { (a: Int) =>
    val al = a.toLong & 0xFFFFFFFFL
    BitUtil.compact(BitUtil.spread(al)) == al
  }

  property("zigzag round-trips and orders by magnitude") = forAll { (x: Long) =>
    val enc = BitUtil.zigzagEncode(x)
    BitUtil.zigzagDecode(enc) == x && (x < 0 || enc == 2 * x || x > (Long.MaxValue >> 1))
  }

  property("popArray equals sum of bitCounts") = forAll { (ws: Array[Long]) =>
    BitUtil.popArray(ws) == ws.map(java.lang.Long.bitCount(_).toLong).sum
  }

  property("nextHighestPowerOfTwo is the least power of two >= v") = forAll { (v0: Long) =>
    val v = (v0 & 0x3FFFFFFFFFFFFFFFL).max(1)
    val p = BitUtil.nextHighestPowerOfTwo(v)
    p >= v && java.lang.Long.bitCount(p) == 1 && (p == 1 || p / 2 < v)
  }

  property("flipFlop swaps the interleaved dimensions; involution") = forAll { (a: Int, b: Int) =>
    val al = a.toLong & 0xFFFFFFFFL
    val bl = b.toLong & 0xFFFFFFFFL
    val z = BitUtil.interleave(al, bl)
    BitUtil.flipFlop(z) == BitUtil.interleave(bl, al) && BitUtil.flipFlop(BitUtil.flipFlop(z)) == z
  }

  // Reference oracle for the bitset navigation: java.util.BitSet.
  private def toBitSet(ws: Array[Long]) = java.util.BitSet.valueOf(ws)

  property("isBitSet matches java.util.BitSet") = forAll { (ws: Array[Long], i0: Int) =>
    val i = math.abs(i0 % (ws.length * 64 + 130))
    BitUtil.isBitSet(ws, i) == toBitSet(ws).get(i)
  }

  property("countBits / countBitsUpTo match BitSet cardinality") = forAll { (ws: Array[Long], i0: Int) =>
    val i = math.abs(i0 % (ws.length * 64 + 130))
    val bs = toBitSet(ws)
    BitUtil.countBits(ws) == bs.cardinality().toLong &&
      BitUtil.countBitsUpTo(ws, i) == bs.get(0, i).cardinality().toLong
  }

  property("nextBitSet matches BitSet.nextSetBit") = forAll { (ws: Array[Long], i0: Int) =>
    val i = math.abs(i0 % (ws.length * 64 + 130))
    BitUtil.nextBitSet(ws, i) == toBitSet(ws).nextSetBit(i)
  }

  property("previousBitSet matches BitSet.previousSetBit") = forAll { (ws: Array[Long], i0: Int) =>
    val i = math.abs(i0 % (ws.length * 64 + 130))
    BitUtil.previousBitSet(ws, i) == toBitSet(ws).previousSetBit(i)
  }

  property("pairwise pop counts match set-algebra on BitSets") = forAll { (a: Array[Long], b: Array[Long]) =>
    def card(op: (java.util.BitSet, java.util.BitSet) => Unit): Long = {
      val x = toBitSet(a); val y = toBitSet(b); op(x, y); x.cardinality().toLong
    }
    BitUtil.popIntersect(a, b) == card(_ and _) &&
      BitUtil.popUnion(a, b) == card(_ or _) &&
      BitUtil.popAndNot(a, b) == card(_ andNot _) &&
      BitUtil.popXor(a, b) == card(_ xor _)
  }
}
