package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable Aho-Corasick automaton over Java chars: one pass over the
  * text finds every occurrence of every pattern. State transitions are
  * (sorted char array, parallel target array) pairs probed by binary
  * search — fully primitive, no per-char boxing, nothing but these arrays
  * to serialize to executors. Standard construction: goto trie + BFS
  * failure links, with each state's output set pre-merged with its
  * failure chain's so matching never walks suffix links.
  */
final class AhoCorasick private (
    chars: Array[Array[Char]],
    targets: Array[Array[Int]],
    fail: Array[Int],
    outs: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** How many DISTINCT patterns occur in `s` (each counted once no matter
    * how often it repeats) — `contains`-chain semantics in one pass, with
    * an early exit once every pattern has been seen (the chain always
    * pays all its passes).
    */
  def countDistinct(s: UTF8String): Long = {
    val str = s.toString
    val seen = new Array[Boolean](nPatterns)
    var found = 0
    var st = 0
    var i = 0
    val n = str.length
    while (i < n && found < nPatterns) {
      st = step(st, str.charAt(i))
      val out = outs(st)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        if (!seen(p)) { seen(p) = true; found += 1 }
        j += 1
      }
      i += 1
    }
    found.toLong
  }

  private def step(state0: Int, c: Char): Int = {
    var st = state0
    while (true) {
      val t = lookup(st, c)
      if (t >= 0) return t
      if (st == 0) return 0
      st = fail(st)
    }
    0 // unreachable
  }

  private def lookup(st: Int, c: Char): Int = {
    val cs = chars(st)
    var lo = 0
    var hi = cs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = cs(mid)
      if (m == c) return targets(st)(mid)
      else if (m < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "at least one pattern required")
    require(patterns.forall(_.nonEmpty), s"empty pattern in $patterns")
    import scala.collection.mutable
    val goto = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val out = mutable.ArrayBuffer(mutable.Set.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var st = 0
      p.foreach { c =>
        st = goto(st).getOrElseUpdate(c, {
          goto += mutable.TreeMap.empty[Char, Int]
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
      goto(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(s) = if (goto(f).contains(c) && goto(f)(c) != s) goto(f)(c) else 0
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
  * blocklist occur in the text (case-sensitive substring semantics), in
  * ONE Aho-Corasick pass over the text.
  *
  * Replaces the composed `contains`-chain formulation
  * (`when(contains(t, p1), 1).otherwise(0) + …`), which scans the text
  * once PER PHRASE: a thousand-phrase NSFW/boilerplate blocklist costs a
  * thousand passes per document there and exactly one here, with an
  * early exit once every phrase has matched.
  *
  * Exact-compatibility contract with the chain (verified by property
  * test in `MultiContainsSpec`): identical count for every input — each
  * phrase contributes at most 1 no matter how often it occurs, phrases
  * may overlap or nest freely — and a null text yields 0 (the chain's
  * callers coalesce null to "" first; this expression folds that in).
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
