package graft.plans

import graft.sources.{IndexedParquetFileIndex, PruneExecution, RowGroupSkipScan}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Physical WITHIN-FILE row-group skipping for constancy-prunable
  * predicates (r13): the scan-path refinement (prune/PartPrune) can only
  * drop whole files through `listFiles` — a row group dropped inside a
  * surviving file is observability, not IO, because the standard parquet
  * reader cannot push a computed-key predicate (`year(ts) = 1996`,
  * `dayofweek(ts) IN (1,7)`) to its own row-group filter. This rule
  * substitutes the relation with the byte-range [[RowGroupScan]] leaf
  * (the idx7/top-k machinery) when the refinement narrows STRICTLY
  * within at least one file, so skipped groups are physically never
  * read. On a range-sorted layout a one-year slice of a decade-spanning
  * file set reads ~1/10 of each file instead of all of it.
  *
  * Soundness: the Filter stays ABOVE the substituted scan (Inexact
  * contract — Spark re-applies the full predicate), the refinement is
  * over-approximate by construction, and translatable conjuncts still
  * reach the reader for page-level skipping inside kept groups. Runs
  * AFTER StatsAggPushdown in the injected rule list, so catalog folds
  * (which replace the whole Aggregate) always get first claim; a fold
  * that declines leaves its Filter to this rule. Whole-file-only drops
  * stay with the `listFiles` path (standard FileSourceScanExec).
  * Kill switches: shared `spark.graft.partPrune`, plus this rule's own
  * `spark.graft.partPruneScan`. */
final case class PartPruneScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.partPrune", "true") != "true") return plan
    if (session.conf.get("spark.graft.partPruneScan", "true") != "true") return plan
    plan.transform {
      // the render Project above the Filter fixes the column set — fold
      // it into the leaf's required schema so kept row groups read only
      // the consumed column chunks
      case p @ Project(pl, f @ Filter(cond, child)) if cond.deterministic =>
        rewrite(f, cond, child, Some(pl.flatMap(_.references.map(_.name)).toSet))
          .map(nf => p.copy(child = nf)).getOrElse(p)
      case f @ Filter(cond, child) if cond.deterministic =>
        rewrite(f, cond, child, None).getOrElse(f)
    }
  }

  private def rewrite(
      f: Filter, cond: Expression, child: LogicalPlan,
      consumed: Option[Set[String]]): Option[LogicalPlan] = {
    def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
      case l: LogicalRelation => Some(l)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case _ => None
    }
    val rel = strip(child).getOrElse(return None)
    val h = rel.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return None
    }
    val fi = h.location match {
      case fi: IndexedParquetFileIndex => fi
      case _ => return None
    }
    val idx = fi.statsIndex
    // cheap pure-expression gate BEFORE any catalog IO: ordinary
    // predicates (no determined part / unrenderable image) never pay a
    // planning-time stats fetch here
    if (!graft.prune.PartPrune.qualifies(idx, Seq(cond))) return None
    // the stats walk's plans are what listFiles would hand the reader —
    // the baseline; the refinement must narrow WITHIN a file to justify
    // the byte-range leaf (whole-file drops are already physical)
    val statsPlans = idx.getFiles(cond)
    val (refined, partRoute) =
      graft.prune.PartPrune.refine(idx, Seq(cond), statsPlans)
    if (partRoute.isEmpty) return None
    val base = statsPlans.map(p => p.fileName -> p.scanRowGroups.size).toMap
    if (!refined.exists(p => p.scanRowGroups.size < base(p.fileName)))
      return None
    // byte ranges must exist for every kept group (pre-range catalogs
    // degrade to the listFiles path)
    if (refined.exists(p =>
        p.scanRowGroups.exists(rg => !p.rowGroupRanges.contains(rg))))
      return None
    // observability totals via the O(1) counts, never an allFiles fetch
    // (a full-catalog materialization per fired rewrite at 1M+ groups)
    val (nf, ng) = idx.catalogCounts().getOrElse((-1L, -1L))
    fi.lastExecution = Some(PruneExecution(
      Seq(cond), refined, nf.toInt, ng.toInt,
      route = partRoute :+ "part-rowgroup-scan"))
    // every column any surviving node consumes must resolve against the
    // substituted scan (same contract as the top-k substitution); a
    // known render Project narrows it to the actually-consumed set
    val needed = (child.collect {
      case p: Project => p.projectList.map(_.name)
    }.flatten ++ cond.references.map(_.name).toSeq ++
      consumed.getOrElse(child.output.map(_.name).toSet)).toSet
    val required = StructType(h.dataSchema.filter(fl => needed.contains(fl.name)))
    val scan = RowGroupScan(
      DataTypeUtils.toAttributes(required),
      fi.rootPaths.head.toString, refined, h.dataSchema, required,
      mergeRuns = true,
      pushedFilters = RowGroupSkipScan.translateDataFilters(cond))
    val byName = scan.output.map(o => o.name -> o).toMap
    val remap = Project(
      rel.output.filter(o => needed.contains(o.name)).map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)),
      scan)
    Some(f.copy(child = child.transformUp {
      case l: LogicalRelation if l eq rel => remap
    }))
  }
}
