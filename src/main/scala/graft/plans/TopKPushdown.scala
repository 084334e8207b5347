package graft.plans

import graft.prune.TopKPruning
import graft.sources.{IndexedParquetFileIndex, PruneExecution}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Descending, IntegerLiteral, NullsFirst, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Limit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Automatic top-k pruning — the optimizer face of
  * [[graft.prune.TopKPruning]]: a user writes plain
  * `df.orderBy(c.desc).limit(k)` over the index-backed relation and the
  * PROVIDER decides the catalog can bound the scan, rewriting the sort's
  * input to a [[RowGroupScan]] over only the row groups that can provably
  * contribute to the top k. The companion of [[StatsAggPushdown]] (same
  * "the provider consults the index" seam,
  * /root/reference/sqlx-sqlite/src/main.rs:256-305) for ordering queries.
  *
  * Fires only on the exact shape
  * `Limit(k, Sort(order, global, [attribute-only Project,] indexed
  * relation))` — any Filter below the sort disqualifies (a filter changes
  * which rows compete for the top k, so a whole-table threshold would be
  * unsound); any computed projection disqualifies (its expressions are
  * not what the catalog indexed). Multi-key orderings prune on the
  * LEADING key alone: a row strictly worse on the first key loses
  * lexicographically regardless of the tail keys. When the catalog cannot
  * certify a threshold (or prunes nothing) the declarative plan stands —
  * over-scan, never wrong. Kill switch: `spark.graft.topkPushdown=false`.
  *
  * The rewrite grafts a [[RowGroupScan]] leaf (one split per surviving
  * row-group run, the same physical node the explicit skip-scan uses) and
  * re-binds the relation's output attributes onto it via exprId-preserving
  * aliases, so the Sort/Limit above — and anything above them — keep
  * resolving unchanged. Column pruning is preserved: the scan reads only
  * the attribute set the (possibly pruned) child projected.
  */
final case class TopKPushdown(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.topkPushdown", "true") != "true") return plan
    plan.transform {
      case lim @ Limit(le @ IntegerLiteral(k), sort @ Sort(order, true, child, _))
          if k > 0 && order.nonEmpty =>
        rewrite(k, order, child)
          .map(pruned => Limit(le, sort.copy(child = pruned)))
          .getOrElse(lim)
    }
  }

  private def rewrite(
      k: Int, order: Seq[SortOrder], child: LogicalPlan): Option[LogicalPlan] = {
    // the sort input must be the indexed relation, optionally column-pruned
    val rel = child match {
      case l: LogicalRelation => l
      case Project(pl, l: LogicalRelation)
          if pl.forall(_.isInstanceOf[AttributeReference]) => l
      case _ => return None
    }
    val h = rel.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val fi = h.location match {
      case fi: IndexedParquetFileIndex => fi
      case _ => return None
    }
    val a = order.head.child match {
      case ar: AttributeReference if child.outputSet.contains(ar) => ar
      case _ => return None
    }
    val idx = fi.statsIndex
    if (!idx.indexedSchema.fields.exists(f =>
        f.name == a.name && f.dataType == a.dataType)) return None

    val descending = order.head.direction == Descending
    val nullsFirst = order.head.nullOrdering == NullsFirst
    val total = idx.allFiles().map(_.scanRowGroups.size).sum
    val pruned = TopKPruning.prune(idx, a.name, k.toLong, descending, nullsFirst)
    val kept = pruned.map(_.scanRowGroups.size).sum
    if (kept >= total) return None // catalog couldn't narrow — leave the plan

    fi.lastExecution = Some(PruneExecution(
      Nil, pruned, idx.allFiles().size, total, route = Seq(s"topk(${a.name})")))
    val outAttrs = child.output
    val required = StructType(
      h.dataSchema.filter(f => outAttrs.exists(_.name == f.name)))
    val scan = RowGroupScan(
      DataTypeUtils.toAttributes(required),
      fi.rootPaths.head.toString, pruned, h.dataSchema, required,
      mergeRuns = true)
    val byName = scan.output.map(o => o.name -> o).toMap
    Some(Project(
      outAttrs.map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)),
      scan))
  }
}
