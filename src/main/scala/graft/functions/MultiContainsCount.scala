package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable Aho-Corasick automaton over UTF-8 BYTES: one pass over the
  * text finds every occurrence of every pattern. Matching on bytes — not
  * decoded chars — makes the semantics identical to Spark's own
  * byte-level `Contains` for EVERY input, including malformed UTF-8 (a
  * `toString` decode would replace bad sequences with U+FFFD and silently
  * diverge from the `contains`-chain/oracle on raw-crawl garbage), and
  * the text is matched via `UTF8String.getBytes` with no per-row decode.
  *
  * State transitions are (sorted byte array, parallel target array) pairs
  * probed by binary search — fully primitive, nothing but these arrays to
  * serialize to executors. Standard construction: goto trie + BFS failure
  * links, with each state's output set pre-merged with its failure
  * chain's so matching never walks suffix links. Per-row scratch is a
  * thread-local generation-marked int array — no allocation on the
  * per-document hot path.
  */
final class AhoCorasick private (
    bytes: Array[Array[Byte]],
    targets: Array[Array[Int]],
    fail: Array[Int],
    outs: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  // Shared across every task in the executor JVM (codegen reference
  // objects are per-plan, not per-thread) — scratch must be thread-local.
  @transient private lazy val scratch: ThreadLocal[AhoCorasick.Scratch] =
    ThreadLocal.withInitial(() => new AhoCorasick.Scratch(nPatterns))

  /** How many DISTINCT patterns occur in `s` (each counted once no matter
    * how often it repeats) — `contains`-chain semantics in one pass, with
    * an early exit once every pattern has been seen (the chain always
    * pays all its passes).
    */
  def countDistinct(s: UTF8String): Long = {
    val buf = s.getBytes
    val sc = scratch.get()
    sc.gen += 1L
    val gen = sc.gen
    val seen = sc.seen
    var found = 0
    var st = 0
    var i = 0
    val n = buf.length
    while (i < n && found < nPatterns) {
      st = step(st, buf(i))
      val out = outs(st)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        if (seen(p) != gen) { seen(p) = gen; found += 1 }
        j += 1
      }
      i += 1
    }
    found.toLong
  }

  /** The DISTINCT pattern ids occurring in `s`, ascending — the audit
    * sibling of [[countDistinct]] (which phrases fired, not just how
    * many). Same early exit: once every pattern has been seen there is
    * nothing left to collect.
    */
  def collectDistinct(s: UTF8String): Array[Int] = {
    val buf = s.getBytes
    val sc = scratch.get()
    sc.gen += 1L
    val gen = sc.gen
    val seen = sc.seen
    var found = 0
    var st = 0
    var i = 0
    val n = buf.length
    while (i < n && found < nPatterns) {
      st = step(st, buf(i))
      val out = outs(st)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        if (seen(p) != gen) { seen(p) = gen; found += 1 }
        j += 1
      }
      i += 1
    }
    val ids = new Array[Int](found)
    var k = 0
    var p = 0
    while (p < nPatterns && k < found) {
      if (seen(p) == gen) { ids(k) = p; k += 1 }
      p += 1
    }
    ids
  }

  private def step(state0: Int, b: Byte): Int = {
    var st = state0
    while (true) {
      val t = lookup(st, b)
      if (t >= 0) return t
      if (st == 0) return 0
      st = fail(st)
    }
    0 // unreachable
  }

  private def lookup(st: Int, b: Byte): Int = {
    val bs = bytes(st)
    var lo = 0
    var hi = bs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = bs(mid)
      if (m == b) return targets(st)(mid)
      else if (m < b) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }
}

object AhoCorasick {
  /** Generation-marked seen set: `seen(p) == gen` means pattern p matched
    * in the current call — no per-row clear, no per-row allocation (Long
    * generations never wrap in practice).
    */
  private[functions] final class Scratch(n: Int) {
    val seen = new Array[Long](n)
    var gen = 0L
  }

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "at least one pattern required")
    require(patterns.forall(_.nonEmpty), s"empty pattern in $patterns")
    import scala.collection.mutable
    val goto = mutable.ArrayBuffer(mutable.TreeMap.empty[Byte, Int])
    val out = mutable.ArrayBuffer(mutable.Set.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var st = 0
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        st = goto(st).getOrElseUpdate(b, {
          goto += mutable.TreeMap.empty[Byte, Int]
          out += mutable.Set.empty[Int]
          goto.length - 1
        })
      }
      out(st) += pid
    }
    val fail = new Array[Int](goto.length)
    val queue = mutable.Queue.empty[Int]
    goto(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).foreach { case (b, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !goto(f).contains(b)) f = fail(f)
        fail(s) = if (goto(f).contains(b) && goto(f)(b) != s) goto(f)(b) else 0
        out(s) ++= out(fail(s)) // pre-merge the failure chain's outputs
      }
    }
    new AhoCorasick(
      goto.map(_.keys.toArray).toArray,
      goto.map(_.values.toArray).toArray,
      fail,
      out.map(_.toArray.sorted).toArray,
      patterns.length)
  }
}

/** `MultiContainsCount(text, phrases)` — how many DISTINCT phrases of a
  * blocklist occur in the text (case-sensitive byte-substring semantics,
  * exactly Spark's `Contains`), in ONE Aho-Corasick pass over the text.
  *
  * Replaces the composed `contains`-chain formulation
  * (`when(contains(t, p1), 1).otherwise(0) + …`), which scans the text
  * once PER PHRASE: a thousand-phrase NSFW/boilerplate blocklist costs a
  * thousand passes per document there (and a flat `reduce(_ + _)` of
  * that size overflows the column converter before planning at all) and
  * exactly one here, with an early exit once every phrase has matched.
  * Measured at 1000 phrases on sf0.1 documents: 0.37 s vs 3.91 s for a
  * balanced chain (BASELINE.md r9).
  *
  * Exact-compatibility contract with the chain (verified by property
  * test in `MultiContainsSpec`): identical count for every input — each
  * phrase contributes at most 1 no matter how often it occurs, phrases
  * may overlap or nest freely, matching is byte-level so malformed
  * UTF-8 behaves exactly like `contains` — and a null text yields 0
  * (the chain's callers coalesce null to "" first; this expression
  * folds that in).
  */
case class MultiContainsCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "at least one phrase required")
  require(phrases.forall(_.nonEmpty), s"empty phrase in $phrases")

  @transient private lazy val ac = AhoCorasick.build(phrases)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_contains_count requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "multi_contains_count"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else ac.countDistinct(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull}
          ? 0L
          : $acRef.countDistinct(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `MultiContainsMatches(text, phrases)` — WHICH distinct phrases of the
  * blocklist occur in the text, as an array in the phrase list's order:
  * the audit sibling of [[MultiContainsCount]] ("why was this document
  * flagged"), same one-pass byte-level automaton, same null-text →
  * no-matches collapse (empty array, never null).
  */
case class MultiContainsMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "at least one phrase required")
  require(phrases.forall(_.nonEmpty), s"empty phrase in $phrases")

  @transient private lazy val ac = AhoCorasick.build(phrases)
  // One UTF8String per phrase, shared across rows (never rebuilt per row).
  @transient private lazy val utf8Phrases: Array[UTF8String] =
    phrases.map(UTF8String.fromString).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_contains_matches requires string, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "multi_contains_matches"

  private def matches(v: Any): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ids =
      if (v == null) Array.emptyIntArray
      else ac.collectDistinct(v.asInstanceOf[UTF8String])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ids.map(utf8Phrases(_).asInstanceOf[Any]))
  }

  override def eval(input: InternalRow): Any = matches(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val selfRef = ctx.addReferenceObj("mcm", this, classOf[MultiContainsMatches].getName)
    val adType = classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName
    ev.copy(
      code = code"""
        ${childGen.code}
        $adType ${ev.value} = $selfRef.matchesFor(
          ${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  /** Codegen entry point (public for generated code). */
  def matchesFor(v: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    matches(v)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
