package graft.plans

import graft.sources.{IndexedParquetFileIndex, PruneExecution, RowGroupSkipScan}
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** AUTOMATIC catalog semi-join pruning (r15) — [[graft.prune.JoinPrune]]
  * at the one-scan seam: a plain `fact.join(dim, fact.k === dim.k)`
  * against the index-backed relation gets its fact row groups pruned by
  * the dim side's materialized keys, with no explicit API call. This is
  * the protocol of Spark's own dynamic partition pruning — materialize
  * the small side's join keys, prune the big side's scan — applied at
  * ROW-GROUP granularity through the external catalog instead of at
  * partition directories.
  *
  * When it fires (all must hold, else the declarative join stands):
  *  - an Inner equi-join with the indexed relation on EITHER side, or a
  *    LeftSemi with it on the LEFT (the streamed side); the fact side
  *    strips to the relation through attribute-only Projects and
  *    deterministic Filters. Outer joins never fire (an unmatched fact
  *    row must survive them), and EqualNullSafe never fires: NULL <=>
  *    NULL matches, so the all-NULL-group skip would be unsound;
  *  - some equi-key pair is (indexed fact column, dim-side attribute);
  *  - the dim side is plan-time-small by the optimizer's own size
  *    estimate (≤ spark.sql.autoBroadcastJoinThreshold — the same bound
  *    DPP's broadcast reuse applies) and not streaming;
  *  - materializing its distinct keys stays within
  *    [[graft.prune.JoinPrune.DefaultMaxKeys]] (the collect is
  *    limit-bounded, so an estimate that lied costs maxKeys+1 rows, not
  *    an unbounded driver set);
  *  - the pruning decision narrows the scan, and every kept group has a
  *    byte range.
  *
  * Exactness is untouched: only the fact LEAF is substituted (same
  * remap-Project-over-RowGroupScan pattern as [[PartPruneScan]], exprIds
  * preserved); the Join itself stays and re-applies the real condition,
  * so false positives cost IO only. The dim side is executed ONCE at
  * planning per execution (a recursive optimizer entry — guarded
  * re-entrant, and the substituted leaf cannot match again, so the
  * fixed-point batch converges).
  *
  * Cost honesty: the dim materialization is a plan-time data job — the
  * price DPP pays too (its subquery broadcast runs before the main
  * stages). The size gate keeps it to genuinely-small sides; a query
  * that cannot afford it sets the kill switch
  * `spark.graft.joinPrune=false`.
  */
final case class JoinPruneRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.joinPrune", "true") != "true") return plan
    if (JoinPruneRule.reentrant.get()) return plan
    plan.transform {
      case j @ Join(_, _, Inner | LeftSemi, Some(_), _) =>
        // decline-on-failure is sound (the declarative join stands), but
        // a throw here is a bug worth seeing, not swallowing silently
        scala.util.Try(rewrite(j)).recover { case e =>
          logWarning(s"join-prune declined on error: $e"); None
        }.toOption.flatten.getOrElse(j)
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] =
    // the fact may sit on EITHER side of an Inner join (`dim.join(fact)`
    // is as common as the reverse); LeftSemi streams its left side only
    attempt(j, factLeft = true).orElse(
      if (j.joinType == Inner) attempt(j, factLeft = false) else None)

  private def attempt(j: Join, factLeft: Boolean): Option[LogicalPlan] = {
    val factPlan = if (factLeft) j.left else j.right
    val dimPlan = if (factLeft) j.right else j.left
    if (dimPlan.isStreaming) return None
    // the fact side must BE the indexed relation, modulo column-pruning
    // Projects and deterministic Filters (the optimizer infers
    // `isnotnull(key)` onto the join's sides) — both stay in place
    // above the substituted leaf, so traversal is sound
    def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
      case l: LogicalRelation => Some(l)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.deterministic => strip(f.child)
      case _ => None
    }
    val rel = strip(factPlan).getOrElse(return None)
    // every column any surviving fact-side node consumes must resolve
    // against the substituted scan: the side's output plus every
    // Filter/Project reference below it
    val keptCols = (factPlan.output.map(_.name) ++ factPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSeq
      case p: Project => p.projectList.flatMap(_.references.map(_.name))
    }.flatten).distinct
    val h = rel.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return None
    }
    val fi = h.location match {
      case fi: IndexedParquetFileIndex => fi
      case _ => return None
    }
    val idx = fi.statsIndex

    // equi-key pairs via Catalyst's own extractor (it normalizes sides:
    // leftKeys come from j.left); keep plain attribute pairs whose fact
    // attribute is indexed — EqualTo only (the extractor models <=> as
    // Coalesce-wrapped keys, which never look like bare attributes here)
    val (leftKeys, rightKeys) = j match {
      case ExtractEquiJoinKeys(_, lk, rk, _, _, _, _, _) => (lk, rk)
      case _ => return None
    }
    // factLeft: fact attrs are leftKeys; mirrored Inner: rightKeys
    val (factSideKeys, dimSideKeys) =
      if (factLeft) (leftKeys, rightKeys) else (rightKeys, leftKeys)
    val pair = factSideKeys.zip(dimSideKeys).collectFirst {
      case (fa: AttributeReference, da: AttributeReference)
          if rel.outputSet.contains(fa) &&
            idx.indexedSchema.fieldNames.contains(fa.name) => (fa, da)
    }
    val (factKey, dimKey) = pair.getOrElse(return None)

    // dim side must be plan-time-small by the optimizer's OWN estimate —
    // the DPP posture; a missing/huge estimate declines (typed conf: the
    // raw string form is "10MB", not a number)
    val threshold = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0 || dimPlan.stats.sizeInBytes > threshold) return None

    // materialize the dim keys: a recursive optimizer entry, guarded
    val keys =
      try {
        JoinPruneRule.reentrant.set(true)
        GraftSqlShim.ofRows(session, Project(Seq(dimKey), dimPlan))
          .na.drop().distinct()
          .limit(graft.prune.JoinPrune.DefaultMaxKeys + 1)
          .collect().map(_.get(0)).toSeq
      } finally JoinPruneRule.reentrant.set(false)
    if (keys.size > graft.prune.JoinPrune.DefaultMaxKeys) return None

    val dec = graft.prune.JoinPrune.prunePlans(
      session, idx, h.dataSchema, factKey.name, keys)
    if (dec.route.startsWith("degrade")) return None
    if (dec.scannedGroups >= dec.totalGroups) return None
    // byte ranges must exist for every kept group (pre-range catalogs
    // degrade to the unpruned relation)
    if (dec.plans.exists(p =>
        p.scanRowGroups.exists(rg => !p.rowGroupRanges.contains(rg))))
      return None

    // observability totals via the O(1) counts, never an allFiles fetch
    val (nf, ng) = idx.catalogCounts().getOrElse((-1L, -1L))
    fi.lastExecution = Some(PruneExecution(
      Nil, dec.plans, nf.toInt, ng.toInt,
      route = Seq(s"join-prune:${dec.route}", s"keys:${dec.keyCount}")))

    val required = StructType(h.dataSchema.filter(f => keptCols.contains(f.name)))
    val scan = RowGroupScan(
      DataTypeUtils.toAttributes(required),
      fi.rootPaths.head.toString, dec.plans, h.dataSchema, required,
      mergeRuns = true,
      pushedFilters = Nil)
    val byName = scan.output.map(o => o.name -> o).toMap
    val remap = Project(
      rel.output.filter(o => keptCols.contains(o.name)).map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)),
      scan)
    val newFact = factPlan.transformUp {
      case l: LogicalRelation if l eq rel => remap
    }
    Some(if (factLeft) j.copy(left = newFact) else j.copy(right = newFact))
  }
}

object JoinPruneRule {
  /** Guards the recursive optimizer entry of the dim-side collect. */
  private val reentrant: ThreadLocal[Boolean] =
    ThreadLocal.withInitial(() => false)
}
