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
    case m: MergeIntoTable
        if m.childrenResolved && LakeMergeInto.targetRelation(m.targetTable).isDefined =>
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

    // the delete split: condition rows' keys delete; the rest upsert
    val delKeys: Option[DataFrame] = deleteCond.map { c =>
      val rows = c.map(cc => srcDf.filter(Exprs.column(cc))).getOrElse(srcDf)
      rows.select(keyCol.as(LakeTable.KeyCol))
    }
    val upsSrc: DataFrame =
      deleteCond.flatten.map(c => srcDf.filter(!Exprs.column(c))).getOrElse(srcDf)

    def probeSplit(frame: DataFrame, wantMatched: Boolean): DataFrame = {
      val table = rel.plainTableForProbe.getOrElse(fail(
        "UPDATE-only / INSERT-only merges need the exact key-membership probe, " +
          "which partitioned tables do not expose — add the other branch " +
          "(SET * / INSERT *) or use the DataFrame API"))
      val existing = table.probeKeys(frame.select(LakeTable.KeyCol))
      frame.join(existing, Seq(LakeTable.KeyCol),
        if (wantMatched) "left_semi" else "left_anti")
    }

    (update, insert) match {
      case (Some(u), Some(i)) =>
        if (!equivalent(u, i)) fail(
          "UPDATE and INSERT assignments must be equivalent (the SET * / INSERT * " +
            "shape) — per-branch differing assignments are not supported")
        rel.mergeWrite(Some(frameFor(i, upsSrc)), delKeys)
      case (Some(u), None) =>
        rel.mergeWrite(Some(probeSplit(frameFor(u, upsSrc), wantMatched = true)), delKeys)
      case (None, Some(i)) =>
        rel.mergeWrite(Some(probeSplit(frameFor(i, upsSrc), wantMatched = false)), delKeys)
      case (None, None) =>
        rel.mergeWrite(None, delKeys)
    }
    Seq.empty
  }
}
