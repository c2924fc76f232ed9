package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass 32-bit SimHash vote aggregation: folds a group's token hashes
  * into the packed simhash long directly.
  *
  * Replaces the 32-column formulation (one `sum(when(shiftright(h, i)...))`
  * aggregate per bit, then a 32-term packing select), which evaluated 32
  * branchy aggregate expressions per input row and carried a 32-field
  * aggregation buffer through the shuffle. This aggregate reads each hash
  * ONCE (a tight 32-iteration primitive loop per row), carries one
  * `int[32]` buffer, and emits the packed result itself — the same
  * one-pass move [[PlaneSignature]] made for embedding signatures
  * (VERDICT r5 "Next round" #3).
  *
  * Exact-compatibility contract with the old formulation (and the DuckDB
  * oracle's 32 `sum(CASE ...)` terms — see OpsQueries.duckSimhashCore):
  * each row votes +1 on bit `i` if bit `i` of its hash is set, else -1 —
  * INCLUDING NULL hashes, which vote -1 on every bit exactly like
  * `when(... === 1, 1).otherwise(-1)` does for a null condition (`when`
  * treats null as false and takes the otherwise branch). Vote counters
  * are Int: overflow needs 2^31 tokens in ONE document — not a real
  * document. Verified bit-identical to the composed-Column formulation in
  * SimhashAggSpec (nulls included).
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"simhash_agg requires BIGINT, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    // A null hash votes -1 on every bit (h = 0 has no bit set), exactly
    // like the legacy when(...).otherwise(-1) columns.
    val h = if (v == null) 0L else v.asInstanceOf[Long]
    var i = 0
    while (i < 32) {
      // +1 when bit set, -1 when clear: branch-free via 2*bit - 1.
      buf(i) += (((h >>> i) & 1L).toInt << 1) - 1
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 32) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32 * 4)
    var i = 0
    while (i < 32) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](32)
    var i = 0
    while (i < 32) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashAgg =
    copy(child = newChild)
}
