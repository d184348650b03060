package graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId,
  Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** SQL `UPDATE` and `MERGE INTO` through [[graft.sources.GraftCatalog]] —
  * the last two DML doors after INSERT (`V1_BATCH_WRITE`) and DELETE
  * (`SupportsDelete`).
  *
  * Spark's own group-based row-level framework
  * (`SupportsRowLevelOperations`) requires a full DataSourceV2 batch
  * writer; this engine's writer is [[TableSink]]'s staged-write/manifest
  * protocol, so instead the statements are intercepted the way Delta Lake
  * does it: a session-extension RESOLUTION rule replaces the analyzer's
  * fully-resolved `UpdateTable` / `MergeIntoTable` with runnable commands
  * that compute the final row set from the analyzer's own resolved plans
  * (attribute identity preserved — critical for MERGE, where target and
  * source may share column names) and commit through
  * [[TableSink.replaceAllRows]]'s guarded crash-safe swap.
  *
  * Installed via `spark.sql.extensions=graft.GraftExtensions` (session
  * build time — analyzer rules cannot be added to a live session).
  *
  * Deliberate refusals (precise errors, same philosophy as the DELETE
  * translator's `canDeleteWhere`): subqueries inside UPDATE/MERGE
  * predicates or values (materialize them into a source relation and use
  * MERGE), nested-field assignment, `MERGE ... WITH SCHEMA EVOLUTION`.
  * Tables the catalog exposes read-only (time travel, branch/tag loads,
  * hive-partitioned directories) never reach here — Spark refuses them
  * with its standard table-operation error.
  */
object GraftDml {

  /** The graft-writable table beneath optional aliases — `(plan, table)`
    * with the ALIASED plan kept intact so commands hand the analyzer's
    * exact resolved tree (exprIds included) back to execution. */
  private[graft] def graftTarget(
      plan: LogicalPlan): Option[(LogicalPlan, GraftWritableTable)] = {
    def table(p: LogicalPlan): Option[GraftWritableTable] = p match {
      case SubqueryAlias(_, child) => table(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftWritableTable => Some(t)
        case _ => None
      }
      case _ => None
    }
    table(plan).map(t => (plan, t))
  }

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[SubqueryExpression])

  private[graft] def refuseSubqueries(where: String,
      es: Iterable[Expression]): Unit =
    require(!es.exists(hasSubquery),
      s"graft SQL $where does not support subqueries in its predicates or " +
        "values — materialize the subquery as a source relation and use " +
        "MERGE INTO")

  /** Assignment keys must be direct columns; the map is exprId-keyed so
    * MERGE's same-named source columns can never be confused for them.
    * Duplicate assignments refuse (SQL semantics; Spark's own duplicate
    * check only runs for SupportsRowLevelOperations tables, and a silent
    * last-wins would diverge from [[TableSink.update]]'s refusal). */
  private[graft] def byTargetColumn(
      what: String, assignments: Seq[Assignment]): Map[ExprId, Expression] = {
    val keyed = assignments.map { a =>
      a.key match {
        case ar: AttributeReference => ar -> a.value
        case other => throw new UnsupportedOperationException(
          s"graft SQL $what cannot assign to nested field ${other.sql} — " +
            "rewrite the whole top-level column")
      }
    }
    val dups = keyed.groupBy(_._1.exprId).filter(_._2.sizeIs > 1)
    require(dups.isEmpty,
      s"graft SQL $what assigns a column more than once: " +
        dups.values.map(_.head._1.name).mkString(", "))
    keyed.map { case (ar, v) => ar.exprId -> v }.toMap
  }

  /** NULL action/WHERE conditions are false (SQL three-valued logic). */
  private[graft] def condColumn(e: Option[Expression]): Column =
    e.map(x => coalesce(Bridge.column(x), lit(false))).getOrElse(lit(true))
}

/** Analyzer resolution rule: fires only on fully-resolved UPDATE/MERGE
  * statements whose target is a [[GraftWritableTable]]; every other plan
  * passes through untouched (zero overhead on the non-DML path). Running
  * inside the resolution fixed-point means Spark's own row-level rewrite
  * (which would refuse the table) never sees the statement. */
final class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(tbl, assignments, condition) if u.resolved =>
      graftTarget(tbl) match {
        case Some((target, t)) =>
          refuseSubqueries("UPDATE",
            condition.toSeq ++ assignments.map(_.value))
          GraftUpdateCommand(target, t.insertCfg, assignments, condition)
        case None => u
      }
    case m @ MergeIntoTable(tgt, src, cond, matched, notMatched, nmbs,
        withSchemaEvolution) if m.resolved =>
      graftTarget(tgt) match {
        case Some((target, t)) =>
          require(!withSchemaEvolution,
            "graft SQL MERGE does not support WITH SCHEMA EVOLUTION — " +
              "evolve the table first (appends with mergeSchema) and merge " +
              "against the evolved schema")
          val actions = matched ++ notMatched ++ nmbs
          refuseSubqueries("MERGE INTO", Seq(cond) ++
            actions.flatMap(_.condition) ++ actions.flatMap {
              case UpdateAction(_, as, _) => as.map(_.value)
              case InsertAction(_, as) => as.map(_.value)
              case _ => Nil
            })
          GraftMergeCommand(target, t.insertCfg, src, cond,
            matched, notMatched, nmbs)
        case None => m
      }
    case other => other
  }
}

/** `UPDATE t SET c = v, ... [WHERE p]` — every row keeps its identity, so
  * the final row set is one Project over the resolved relation: assigned
  * columns become `IF(p, CAST(v), old)`, everything else passes through.
  * The rewrite is row-count-verified (`expectRows = total`) before the
  * destructive swap. */
case class GraftUpdateCommand(
    target: LogicalPlan,
    cfg: SinkConfig,
    assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val assigned = byTargetColumn("UPDATE", assignments)
    // PARTITION-SCOPED route: on an identity-partitioned table whose SET
    // touches no partition-deriving column, [[TableSink.update]] rewrites
    // ONLY the partitions containing matched rows (dynamic overwrite) —
    // O(touched partitions), not O(table). The resolved condition / SET
    // expressions re-render as SQL text and re-resolve against the
    // library read (same physical table, same column names; subqueries
    // are already refused upstream, so the rendering is total for every
    // expressible statement — a rendering the parser still rejects falls
    // back to the full-rewrite path below rather than failing the query).
    val partitionAffecting = cfg.partitionSpec
      .flatMap(p => Seq(p.source, p.columnName)).map(_.toLowerCase).toSet
    val setPairs = target.output.flatMap { attr =>
      assigned.get(attr.exprId).map(v => attr.name -> v)
    }
    val scoped = cfg.partitionSpec.nonEmpty &&
      setPairs.forall(p => !partitionAffecting(p._1.toLowerCase))
    if (scoped) {
      // attributes render UNQUALIFIED (`cat`, not `gdml.t.cat`) so the
      // text re-resolves against the library read's bare column names
      def bare(e: Expression): String = e.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          a.withQualifier(Seq.empty)
      }.sql
      val rendered = scala.util.Try {
        val cSql = condition.map(bare).getOrElse("TRUE")
        val sSqls = setPairs.map { case (n, v) => n -> bare(v) }
        // functions.expr DEFERS parsing (Spark 4 ColumnNode) — validate
        // the renderings eagerly so an unparseable one falls back to the
        // full-rewrite path here instead of failing the statement later
        Bridge.parseExpression(spark, cSql)
        sSqls.foreach { case (_, s) => Bridge.parseExpression(spark, s) }
        (org.apache.spark.sql.functions.expr(cSql),
          sSqls.map { case (n, s) =>
            n -> org.apache.spark.sql.functions.expr(s) })
      }
      rendered.toOption.foreach { case (c, sets) =>
        new TableSink(cfg).update(spark, c, sets)
        return Seq.empty
      }
    }
    val df = Bridge.ofRows(spark, target)
    val cond = condColumn(condition)
    val totalRows = df.count()
    val finalCols = target.output.map { attr =>
      assigned.get(attr.exprId) match {
        case Some(v) => when(cond, Bridge.column(v).cast(attr.dataType))
          .otherwise(Bridge.column(attr)).as(attr.name)
        case None => Bridge.column(attr).as(attr.name)
      }
    }
    new TableSink(cfg).replaceAllRows(spark, df.select(finalCols: _*),
      Some(totalRows), "UPDATE")
    Seq.empty
  }
}

/** `MERGE INTO target USING source ON cond WHEN ...` — the standard
  * single-pass full-outer-join evaluation:
  *
  *  - target rows carry a row id + presence marker, source rows a marker;
  *  - the join classifies every output row as MATCHED / NOT MATCHED
  *    (source-only) / NOT MATCHED BY SOURCE (target-only);
  *  - within each class the FIRST action whose condition holds fires
  *    (SQL cascade semantics), deciding survival (UPDATE/INSERT keep,
  *    DELETE drops, no-fire keeps matched and target-only rows and drops
  *    source-only rows) and each column's value;
  *  - the SQL-standard cardinality guard — a target row matched by more
  *    than one source row is an error when matched actions exist — is a
  *    window count over the row id INSIDE the same pass (`raise_error`),
  *    so the whole merge is one join + one write, no second
  *    table-sized job and no cross-job nondeterminism worries.
  *
  * Scale shape: one join (Catalyst/AQE pick the physical strategy the
  * full-outer shape allows), one window shuffle over the join output
  * (the cardinality guard when matched actions exist; first-copy-wins
  * dedup of multi-matched target rows otherwise), then the guarded
  * full-rewrite commit. The full rewrite is the
  * honest cost of arbitrary-condition MERGE on an immutable-file table;
  * keyed workloads that want partition-scoped commits use
  * [[TableSink.upsert]].
  */
case class GraftMergeCommand(
    target: LogicalPlan,
    cfg: SinkConfig,
    source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val attrs = target.output
    val tMark = "__graft_merge_t__"
    val sMark = "__graft_merge_s__"
    val tid = "__graft_merge_tid__"
    val rid = "__graft_merge_rid__"
    val taken = (attrs.map(_.name) ++ source.output.map(_.name)).toSet
    val clash = Seq(tMark, sMark, tid, rid).filter(taken)
    require(clash.isEmpty,
      s"MERGE bookkeeping columns collide with ${clash.mkString(", ")} — " +
        "rename those columns first")

    val t = Bridge.ofRows(spark, target)
      .withColumn(tMark, lit(true))
      .withColumn(tid, monotonically_increasing_id())
    val s = Bridge.ofRows(spark, source).withColumn(sMark, lit(true))
    val j0 = t.join(s, Bridge.column(mergeCondition), "full_outer")
    // per-JOIN-ROW id: window keys below use coalesce(tid, -rid-1) so
    // source-only rows (tid NULL) each sit in their own window partition
    // instead of all hashing into one NULL-key task — an insert-heavy
    // merge would otherwise funnel the whole unmatched source through a
    // single straggler
    val j = j0.withColumn(rid, monotonically_increasing_id())
    val winKey = coalesce(col(tid), -col(rid) - 1)

    val isMatched = col(tMark).isNotNull && col(sMark).isNotNull
    val isSourceOnly = col(tMark).isNull

    // first-true-condition cascade: which action index fires (-1: none)
    def fireIdx(actions: Seq[MergeAction]): Column =
      actions.zipWithIndex.foldRight(lit(-1)) { case ((a, i), els) =>
        when(condColumn(a.condition), lit(i)).otherwise(els)
      }
    val fm = fireIdx(matchedActions)
    val fi = fireIdx(notMatchedActions)
    val fn = fireIdx(notMatchedBySourceActions)

    def assignedOf(a: MergeAction): Map[ExprId, Expression] = a match {
      case UpdateAction(_, as, _) => byTargetColumn("MERGE UPDATE", as)
      case InsertAction(_, as) => byTargetColumn("MERGE INSERT", as)
      case _: DeleteAction => Map.empty
      case other => throw new UnsupportedOperationException(
        s"MERGE action ${other.getClass.getSimpleName} survived analysis " +
          "unexpanded — not supported")
    }
    val matchedAssigned = matchedActions.map(assignedOf)
    val insertAssigned = notMatchedActions.map(assignedOf)
    val nmbsAssigned = notMatchedBySourceActions.map(assignedOf)

    // per-class survival: DELETE fire drops; matched / target-only rows
    // with no firing action persist unchanged; source-only rows exist only
    // if an INSERT fires
    def survives(actions: Seq[MergeAction], fire: Column,
        keepOnNoFire: Boolean): Column =
      actions.zipWithIndex.foldRight(lit(keepOnNoFire)) {
        case ((a, i), els) =>
          when(fire === i, lit(!a.isInstanceOf[DeleteAction])).otherwise(els)
      }
    val keep =
      when(isMatched, survives(matchedActions, fm, keepOnNoFire = true))
        .when(isSourceOnly,
          survives(notMatchedActions, fi, keepOnNoFire = false))
        .otherwise(
          survives(notMatchedBySourceActions, fn, keepOnNoFire = true))

    // Multi-matched target rows, evaluated inside the same pass:
    //  - with matched actions: the SQL-standard cardinality VIOLATION
    //    (an update/delete would apply ambiguously) — raise;
    //  - without matched actions (insert-only / NMBS-only merge): the
    //    matched target row passes through UNCHANGED and must survive
    //    exactly once, not once per join copy — keep only the first.
    val guardedKeep =
      if (matchedActions.isEmpty) {
        val copyNo = row_number()
          .over(Window.partitionBy(winKey).orderBy(col(rid)))
        when(isMatched, keep && copyNo === 1).otherwise(keep)
      } else {
        val matches = sum(when(col(sMark).isNotNull, 1L).otherwise(0L))
          .over(Window.partitionBy(winKey))
        when(isMatched && matches > 1L, raise_error(lit(
          "MERGE cardinality violation: a target row matched more than " +
            "one source row — deduplicate the source on the ON keys"))
          .cast("boolean"))
          .otherwise(keep)
      }

    def classValue(attr: AttributeReference, actions: Seq[MergeAction],
        assigned: Seq[Map[ExprId, Expression]], fire: Column,
        noFire: Column): Column =
      actions.indices.foldRight(noFire) { case (i, els) =>
        val v = assigned(i).get(attr.exprId) match {
          case Some(e) => Bridge.column(e).cast(attr.dataType)
          // an INSERT not mentioning the column fills NULL (SQL default);
          // UPDATE/DELETE without an assignment keeps the old value via
          // noFire's fallthrough shape below
          case None => actions(i) match {
            case _: InsertAction => lit(null).cast(attr.dataType)
            case _ => noFire
          }
        }
        when(fire === i, v).otherwise(els)
      }

    val finalCols = attrs.map { a =>
      val attr = a.asInstanceOf[AttributeReference]
      val old = Bridge.column(attr)
      when(isMatched,
        classValue(attr, matchedActions, matchedAssigned, fm, old))
        .when(isSourceOnly,
          classValue(attr, notMatchedActions, insertAssigned, fi,
            lit(null).cast(attr.dataType)))
        .otherwise(
          classValue(attr, notMatchedBySourceActions, nmbsAssigned, fn, old))
        .as(attr.name)
    }

    // PARTITION-SCOPED commit (round-11): on an identity-partitioned
    // table whose matched / not-matched-by-source actions never assign a
    // partition column (rows cannot move partitions; inserted rows may
    // SET one — that only decides where they land), the write rewrites
    // ONLY the partitions in which some action FIRED: update/delete
    // partitions (old value), surviving inserts' partitions (new value).
    // The join still computes the full final row set — the statement's
    // semantics need it — but the expensive term at scale, the
    // rewrite + swap, drops from O(table) to O(touched partitions).
    // A fired-but-dropped row (DELETE) still touches its partition, so
    // the partition flags ride BEFORE the keep filter.
    val partitionAffecting = cfg.partitionSpec
      .flatMap(p => Seq(p.source, p.columnName)).map(_.toLowerCase).toSet
    val identityPlain = cfg.partitionSpec.nonEmpty &&
      cfg.partitionSpec.forall(p =>
        p.transform == graft.Transform.Identity && p.explicitName.isEmpty)
    val assignsPartition =
      (matchedAssigned ++ nmbsAssigned).exists(_.keys.exists(id =>
        attrs.exists(a => a.exprId == id &&
          partitionAffecting(a.name.toLowerCase))))
    val keepFlag = tid // reuse the reserved bookkeeping name
    val firedFlag = rid
    if (identityPlain && !assignsPartition) {
      val fired =
        when(isMatched, fm =!= -1)
          .when(isSourceOnly, fi =!= -1)
          .otherwise(fn =!= -1)
      val pCols = cfg.partitionSpec.map(_.source)
      val full = j.select(finalCols :+ guardedKeep.as(keepFlag)
        :+ fired.as(firedFlag): _*)
      val touchedVals = full.filter(col(firedFlag))
        .select(pCols.map(col): _*).distinct()
      val finalRows = full.filter(col(keepFlag)).drop(keepFlag, firedFlag)
      new TableSink(cfg).replacePartitionsScoped(spark, finalRows,
        touchedVals, "MERGE")
      return Seq.empty
    }
    val finalRows = j.select(finalCols :+ guardedKeep.as(tid): _*)
      .filter(col(tid)).drop(tid)
    new TableSink(cfg).replaceAllRows(spark, finalRows, None, "MERGE")
    Seq.empty
  }
}
