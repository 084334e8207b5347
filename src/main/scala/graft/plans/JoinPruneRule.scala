package graft.plans

import graft.index.FileScanPlan
import graft.sources.{IndexedParquetFileIndex, PruneExecution, RowGroupSkipScan}
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, LocalLimit, LogicalPlan, Project, Sample, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

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
  *  - the ENTIRE dim subtree is deterministic (r16): the pruning key set
  *    is collected at plan time while the retained Join re-executes the
  *    dim at runtime — if any dim expression is non-deterministic, or a
  *    Sample / limit-without-sort can admit different rows across
  *    executions, the runtime dim could hold keys the plan-time collect
  *    never saw and pruned-away fact groups would silently lose join
  *    rows. Spark's own DPP avoids this by reusing one materialized
  *    subquery; here the guard declines instead;
  *  - at least one equi-key pair is (indexed fact column of a
  *    key-prunable type, dim-side attribute). ALL such pairs prune
  *    (r16): per-key decisions are intersected file-by-file, row-group-
  *    by-row-group — sound because a joinable fact row matches EVERY
  *    equi-key, so its group survives every per-key superset — and the
  *    intersection is by construction never larger than any single
  *    key's decision (the r15 two-key gap);
  *  - the dim side is plan-time-small by the optimizer's own size
  *    estimate (≤ spark.sql.autoBroadcastJoinThreshold — the same bound
  *    DPP's broadcast reuse applies) and not streaming;
  *  - materializing its distinct key TUPLES stays within
  *    [[graft.prune.JoinPrune.DefaultMaxKeys]] (the collect is
  *    limit-bounded, so an estimate that lied costs maxKeys+1 rows, not
  *    an unbounded driver set). An over-limit tuple set falls back to
  *    the head key alone before declining (a single key may still be
  *    under the bound);
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
  * stages). The size gate keeps it to genuinely-small sides; every
  * pure-plan decline check runs BEFORE the collect; and a shape that
  * collected but then declined is remembered (r16) in a bounded
  * DECLINE-ONLY cache keyed by (canonicalized dim, relation root,
  * catalog cardinalities), so repeated optimizations of the same
  * never-benefiting query — explain() then execute, a re-run loop — pay
  * the dim job once, not every time. Only declines are cached (a stale
  * decline is a missed optimization, never a wrong plan; catalog growth
  * changes the key and retries). A query that cannot afford the first
  * probe sets the kill switch `spark.graft.joinPrune=false`.
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

  /** The plan-time collect and the runtime Join must see the SAME dim
    * rows: every expression deterministic, no Sample, no limit whose
    * row choice isn't pinned by a Sort below it (through Projects /
    * the local-limit pair). Ties under a non-total sort order remain —
    * the same residual Spark's sort-limit reuse accepts. */
  private def deterministicSubtree(p: LogicalPlan): Boolean = {
    def sortBelow(c: LogicalPlan): Boolean = c match {
      case _: Sort => true
      case Project(_, ch) => sortBelow(ch)
      case LocalLimit(_, ch) => sortBelow(ch)
      case _ => false
    }
    p.find {
      case _: Sample => true
      case l: LocalLimit => !sortBelow(l.child)
      case g: GlobalLimit => !sortBelow(g.child)
      case n => n.expressions.exists(e => !e.deterministic)
    }.isEmpty
  }

  /** Fact-column types [[graft.prune.JoinPrune.prunePlans]] can key-prune
    * (others would only degrade-fetch the full catalog — exclude them
    * BEFORE any catalog IO). */
  private def prunableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        DateType | TimestampType => true
    case _ => false
  }

  /** File-by-file, row-group-by-row-group intersection of two sound
    * per-key decisions — still sound (see class doc) and never larger
    * than either input. */
  private def intersect(
      a: Seq[FileScanPlan], b: Seq[FileScanPlan]): Seq[FileScanPlan] = {
    val byName = b.map(p => p.fileName -> p).toMap
    a.flatMap { p =>
      byName.get(p.fileName).flatMap { q =>
        val keep = p.scanRowGroups.intersect(q.scanRowGroups)
        if (keep.isEmpty) None else Some(p.copy(scanRowGroups = keep))
      }
    }
  }

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
    // attribute is indexed and key-prunable — EqualTo only (the
    // extractor models <=> as Coalesce-wrapped keys, which never look
    // like bare attributes here). ALL qualifying pairs participate; a
    // fact column joined twice contributes once (its dim keys union via
    // the tuple projection anyway — keep the first pairing).
    val (leftKeys, rightKeys) = j match {
      case ExtractEquiJoinKeys(_, lk, rk, _, _, _, _, _) => (lk, rk)
      case _ => return None
    }
    // factLeft: fact attrs are leftKeys; mirrored Inner: rightKeys
    val (factSideKeys, dimSideKeys) =
      if (factLeft) (leftKeys, rightKeys) else (rightKeys, leftKeys)
    val pairs = factSideKeys.zip(dimSideKeys).collect {
      case (fa: AttributeReference, da: AttributeReference)
          if rel.outputSet.contains(fa) &&
            idx.indexedSchema.fieldNames.contains(fa.name) &&
            prunableType(fa.dataType) => (fa, da)
    }.distinctBy(_._1.name)
    if (pairs.isEmpty) return None

    // PRE-COLLECT gates, all pure plan/metadata work (no data job):
    // determinism of the dim subtree, the DPP-posture size bound, and
    // the decline cache. catalogCounts is one O(1) store round trip,
    // shared by the cache key and the observability totals below.
    if (!deterministicSubtree(dimPlan)) return None
    val threshold = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0 || dimPlan.stats.sizeInBytes > threshold) return None
    val counts = idx.catalogCounts()
    val cacheKey = (dimPlan.canonicalized,
      fi.rootPaths.head.toString + "#" + pairs.map(_._1.name).mkString(","),
      counts)
    if (JoinPruneRule.declined.contains(cacheKey)) return None
    def decline(): Option[LogicalPlan] = {
      JoinPruneRule.remember(cacheKey); None
    }

    // materialize the dim keys: ONE data job collects the distinct key
    // TUPLES (bounded), from which every column's key set projects
    // driver-side — a recursive optimizer entry, guarded. NULL handling:
    // a null in one column doesn't void the tuple's other columns; each
    // column's set drops its own nulls (a NULL key equals nothing).
    val maxKeys = graft.prune.JoinPrune.DefaultMaxKeys
    def collectDistinct(attrs: Seq[AttributeReference]): Array[org.apache.spark.sql.Row] =
      try {
        JoinPruneRule.reentrant.set(true)
        GraftSqlShim.ofRows(session, Project(attrs, dimPlan))
          .distinct()
          .limit(maxKeys + 1)
          .collect()
      } finally JoinPruneRule.reentrant.set(false)
    var tuples = collectDistinct(pairs.map(_._2))
    var livePairs = pairs
    if (tuples.length > maxKeys && pairs.size > 1) {
      // tuple cardinality over the bound: the head key alone may still
      // fit (never worse than r15's single-key behavior)
      livePairs = pairs.take(1)
      tuples = collectDistinct(livePairs.map(_._2))
    }
    if (tuples.length > maxKeys) return decline()

    // per-key decisions, intersected — each is a superset of the groups
    // holding its key, so the intersection is a superset of the groups
    // holding a FULLY matching row, and ⊆ every single-key decision
    val decs = livePairs.zipWithIndex.map { case ((fa, _), i) =>
      val keys = tuples.iterator.map(_.get(i)).filter(_ != null).toSeq.distinct
      graft.prune.JoinPrune.prunePlans(
        session, idx, h.dataSchema, fa.name, keys, maxKeys)
    }
    if (decs.exists(_.route.startsWith("degrade"))) return decline()
    val plans = decs.map(_.plans).reduce(intersect)
    val scanned = plans.map(_.scanRowGroups.size).sum
    val totalGroups = counts.map(_._2.toInt).getOrElse(-1)
    if (totalGroups < 0 || scanned >= totalGroups) return decline()
    // byte ranges must exist for every kept group (pre-range catalogs
    // degrade to the unpruned relation)
    if (plans.exists(p =>
        p.scanRowGroups.exists(rg => !p.rowGroupRanges.contains(rg))))
      return decline()

    // observability totals via the O(1) counts, never an allFiles fetch
    val nf = counts.map(_._1.toInt).getOrElse(-1)
    fi.lastExecution = Some(PruneExecution(
      Nil, plans, nf, totalGroups,
      route = decs.zip(livePairs).map { case (d, (fa, _)) =>
        s"join-prune:${d.route}(${fa.name})"
      } :+ s"keys:${decs.map(_.keyCount).max}"))

    val required = StructType(h.dataSchema.filter(f => keptCols.contains(f.name)))
    val scan = RowGroupScan(
      DataTypeUtils.toAttributes(required),
      fi.rootPaths.head.toString, plans, h.dataSchema, required,
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

  /** DECLINE-ONLY memo for shapes that paid the dim collect and then
    * didn't narrow — (canonicalized dim plan, fact root+keys, catalog
    * cardinalities). Bounded; cleared wholesale at the cap (a rare,
    * harmless re-probe). Fired rewrites are NEVER cached — data moves. */
  private val declined =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(LogicalPlan, String, Option[(Long, Long)])]()
  private def remember(k: (LogicalPlan, String, Option[(Long, Long)])): Unit = {
    if (declined.size > 512) declined.clear()
    declined.add(k); ()
  }
}
