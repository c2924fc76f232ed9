package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graft.{Exprs, Plans}

import graft.lake.LakeTable

/** SQL `MERGE INTO` for catalog-synced cdc-lake tables (r16 — with the
  * r16 `INSERT INTO` this closes the practical SQL write surface that
  * was deferred in r11 when a DSv2 reader proved unable to carry the
  * lake's exchange-bearing merge plans; commands don't have that
  * limitation).
  *
  * Spark parses and RESOLVES `MergeIntoTable` for any relation (star
  * actions expand to column-by-name assignments in ResolveReferences)
  * but only REWRITES it to an executable plan for DSv2 row-level-op
  * tables — a v1 relation fails checkAnalysis. This post-hoc resolution
  * rule (registered in [[graft.functions.GraftExtensions]]) intercepts a
  * resolved merge whose target is a [[LakeSnapshotRelation]] and
  * replaces it with a runnable command that routes through the table's
  * NATIVE operations, so a SQL merge and a DataFrame
  * `upsert`/`merge`/`delete` produce identical state (commit protocol,
  * blooms, stats, widening, MOR deltas included).
  *
  * Supported shape (anything else fails LOUDLY — never silently
  * reinterpreted):
  *
  * {{{
  * MERGE INTO t USING s ON t._key = <source key expr>
  *   [WHEN MATCHED AND <cond> THEN DELETE]
  *   [WHEN MATCHED THEN UPDATE SET ...]
  *   [WHEN NOT MATCHED THEN INSERT ...]
  * }}}
  *
  *  - UPDATE + INSERT with EQUIVALENT assignments (the `SET *` /
  *    `INSERT *` canonical CDC shape) run as ONE LWW upsert of the
  *    source (delete-condition rows split out; update+delete land in a
  *    single `merge` commit). Last-write-wins by `_ts` is the lake's
  *    merge semantic — a stale `_ts` loses, exactly like the DataFrame
  *    path (Hudi's precombine contract for its spark-sql MERGE).
  *  - UPDATE-only (no INSERT) and INSERT-only (no UPDATE) need real
  *    matched-ness: the source is split by the EXACT distributed
  *    key-membership probe ([[LakeTable.probeKeys]] — bloom-pruned,
  *    verified; plain tables only) and only the relevant half is
  *    upserted.
  *  - DELETE-only deletes the condition's keys (bloom-pruned absent keys
  *    are a no-op, so "matched" needs no probe).
  *  - Differing UPDATE vs INSERT assignments, conditional UPDATE/INSERT,
  *    `WHEN NOT MATCHED BY SOURCE`, `WITH SCHEMA EVOLUTION`, non-`_key`
  *    or non-equality ON conditions, and nested-field assignment keys
  *    are all rejected loudly.
  */
class LakeMergeIntoRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // m.resolved, not childrenResolved (code-review r16 #6): a merge
    // whose conditions/assignments still hold unresolved attributes must
    // stay a MergeIntoTable so checkAnalysis reports the proper
    // column-not-found error — wrapping it in a resolved leaf command
    // would smuggle the unresolved expressions past the analyzer.
    case m: MergeIntoTable
        if m.resolved && LakeMergeInto.targetRelation(m.targetTable).isDefined =>
      LakeMergeIntoCommand(m)
  }
}

object LakeMergeInto {
  def targetRelation(p: LogicalPlan): Option[LakeSnapshotRelation] =
    p.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[LakeSnapshotRelation] =>
        lr.relation.asInstanceOf[LakeSnapshotRelation]
    }
}

case class LakeMergeIntoCommand(m: MergeIntoTable) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(m)

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"cdc-lake MERGE INTO: $msg")

  override def run(session: SparkSession): Seq[Row] = {
    val rel = LakeMergeInto.targetRelation(m.targetTable).get
    if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION is not supported")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")

    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    def sourceOnly(e: Expression): Boolean = e.references.subsetOf(sOut)

    // ON: exactly `t._key = <source expr>` (either side order)
    val srcKeyExpr: Expression = m.mergeCondition match {
      case EqualTo(l, r) =>
        def keySide(e: Expression): Boolean = e match {
          case a: Attribute => tOut.contains(a) && a.name == LakeTable.KeyCol
          case _ => false
        }
        if (keySide(l) && sourceOnly(r)) r
        else if (keySide(r) && sourceOnly(l)) l
        else fail(
          s"the ON condition must equate the target's '${LakeTable.KeyCol}' with a " +
            s"source-side expression, got: ${m.mergeCondition.sql}")
      case other =>
        fail(s"only a single `target.${LakeTable.KeyCol} = <source expr>` equality is " +
          s"supported in ON, got: ${other.sql}")
    }

    var update: Option[Seq[Assignment]] = None
    var deleteCond: Option[Option[Expression]] = None
    m.matchedActions.foreach {
      case u: UpdateAction =>
        if (u.condition.nonEmpty)
          fail("conditional WHEN MATCHED ... UPDATE is not supported " +
            "(only a DELETE action may carry a condition)")
        if (update.nonEmpty) fail("at most one UPDATE action")
        update = Some(u.assignments)
      case d: DeleteAction =>
        if (deleteCond.nonEmpty) fail("at most one DELETE action")
        d.condition.foreach(c =>
          if (!sourceOnly(c)) fail(
            s"the DELETE condition may reference only source columns: ${c.sql}"))
        deleteCond = Some(d.condition)
      case other => fail(s"unsupported WHEN MATCHED action: $other")
    }
    if (update.isDefined && deleteCond.contains(None))
      fail("an unconditional DELETE together with an UPDATE is ambiguous — " +
        "give the DELETE a condition")
    var insert: Option[Seq[Assignment]] = None
    m.notMatchedActions.foreach {
      case i: InsertAction =>
        if (i.condition.nonEmpty) fail("conditional WHEN NOT MATCHED ... INSERT is not supported")
        if (insert.nonEmpty) fail("at most one INSERT action")
        insert = Some(i.assignments)
      case other => fail(s"unsupported WHEN NOT MATCHED action: $other")
    }
    if (update.isEmpty && insert.isEmpty && deleteCond.isEmpty)
      fail("no supported actions")

    val srcDf = Plans.ofRows(session, m.sourceTable)
    val keyCol = Exprs.column(srcKeyExpr)

    def nameOf(k: Expression): String = k match {
      case a: Attribute => a.name
      case other => fail(s"only top-level column assignment keys are supported: ${other.sql}")
    }
    def assignMap(as: Seq[Assignment]): Map[String, Expression] = {
      as.foreach(a =>
        if (!sourceOnly(a.value)) fail(
          s"assignment values may reference only source columns: ${a.value.sql}"))
      val mkv = as.map(a => nameOf(a.key) -> a.value).toMap
      if (mkv.size != as.size) fail("duplicate assignment targets")
      // an explicit `_key` assignment differing from the ON expression
      // would store rows under a DIFFERENT key than the one matched-ness
      // was decided on — silent rekeying, rejected
      mkv.get(LakeTable.KeyCol).foreach(v =>
        if (v.canonicalized != srcKeyExpr.canonicalized) fail(
          s"the '${LakeTable.KeyCol}' assignment must equal the ON expression " +
            s"(${srcKeyExpr.sql}), got: ${v.sql}"))
      mkv
    }
    // Rows for one action's assignments over `from`; `_key` derives from
    // the ON expression when not assigned explicitly.
    def frameFor(as: Seq[Assignment], from: DataFrame): DataFrame = {
      val mkv = assignMap(as)
      val cols = mkv.toSeq.sortBy(_._1).map { case (n, v) => Exprs.column(v).as(n) }
      val all =
        if (mkv.contains(LakeTable.KeyCol)) cols
        else cols :+ keyCol.as(LakeTable.KeyCol)
      from.select(all: _*)
    }
    def equivalent(a: Seq[Assignment], b: Seq[Assignment]): Boolean = {
      val (ma, mb) = (assignMap(a), assignMap(b))
      ma.keySet == mb.keySet &&
        ma.forall { case (k, v) => v.canonicalized == mb(k).canonicalized }
    }

    // SQL-faithful matched-ness (code-review r16 #1/#3): WHEN MATCHED /
    // NOT MATCHED branch membership is decided by the EXACT distributed
    // key probe ([[LakeTable.probeKeys]] — bloom-pruned, verified). The
    // only probe-free path is the canonical SET */INSERT * merge WITHOUT
    // a delete branch, where matched and unmatched rows take the same
    // assignments and LWW upsert needs no split. Everything else —
    // delete branches (a delete-condition row that is NOT matched must
    // fall through to INSERT, and an unconditional matched DELETE must
    // not swallow the same commit's inserts) and single-action merges —
    // splits the source first; partitioned tables don't expose the probe
    // and fail loudly.
    lazy val (matchedSrc, unmatchedSrc): (DataFrame, DataFrame) = {
      val table = rel.plainTableForProbe.getOrElse(fail(
        "this merge shape needs the exact key-membership probe (WHEN MATCHED " +
          "semantics), which partitioned tables do not expose — use the " +
          "canonical SET * / INSERT * shape without a DELETE branch, or the " +
          "DataFrame API"))
      // Materialize the source ONCE: the probe path evaluates it across
      // several jobs (probeKeys' documented double-eval, the semi/anti
      // splits, the delete and upsert frames) — a nondeterministic SQL
      // source (rand(), a view over mutating data) would otherwise split
      // inconsistently. Also the legitimate reuse-across-different-plan-
      // shapes case for materialization (the r6 rule).
      val stable = srcDf.localCheckpoint()
      val keyColS = Exprs.column(srcKeyExpr)
      val existing = table.probeKeys(stable.select(keyColS.as(LakeTable.KeyCol)))
      (stable.join(existing, keyColS === existing(LakeTable.KeyCol), "left_semi"),
        stable.join(existing, keyColS === existing(LakeTable.KeyCol), "left_anti"))
    }
    // matched rows routed to DELETE, and the matched remainder for UPDATE
    lazy val delRows: DataFrame = deleteCond.get match {
      case Some(c) => matchedSrc.filter(Exprs.column(c))
      case None => matchedSrc
    }
    lazy val updSrc: DataFrame = deleteCond match {
      case Some(Some(c)) => matchedSrc.filter(!Exprs.column(c))
      case Some(None) => matchedSrc.limit(0) // everything matched deletes
      case None => matchedSrc
    }
    val delKeys: Option[DataFrame] =
      deleteCond.map(_ => delRows.select(keyCol.as(LakeTable.KeyCol)))

    (update, insert) match {
      case (Some(u), Some(i)) =>
        if (!equivalent(u, i)) fail(
          "UPDATE and INSERT assignments must be equivalent (the SET * / INSERT * " +
            "shape) — per-branch differing assignments are not supported")
        if (deleteCond.isEmpty)
          rel.mergeWrite(Some(frameFor(i, srcDf)), None) // probe-free LWW fast path
        else
          rel.mergeWrite(Some(frameFor(i, updSrc.unionByName(unmatchedSrc))), delKeys)
      case (Some(u), None) =>
        rel.mergeWrite(Some(frameFor(u, updSrc)), delKeys)
      case (None, Some(i)) =>
        rel.mergeWrite(Some(frameFor(i, unmatchedSrc)), delKeys)
      case (None, None) =>
        // delete-only: no probe needed — absent keys are a bloom-pruned
        // no-op and nothing is inserted in the same commit
        rel.mergeWrite(None,
          deleteCond.map { c =>
            val rows = c.map(cc => srcDf.filter(Exprs.column(cc))).getOrElse(srcDf)
            rows.select(keyCol.as(LakeTable.KeyCol))
          })
    }
    Seq.empty
  }
}
