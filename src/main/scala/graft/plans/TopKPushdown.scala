package graft.plans

import graft.prune.TopKPruning
import graft.sources.{IndexedParquetFileIndex, PruneExecution, RowGroupSkipScan}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, IsNotNull, LessThan, LessThanOrEqual, Literal, NullsFirst, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DateType, DecimalType, StringType, StructType, TimestampNTZType, TimestampType}

/** Automatic top-k pruning — the optimizer face of
  * [[graft.prune.TopKPruning]]: a user writes plain
  * `df.orderBy(c.desc).limit(k)` — or the time-window-latest-k shape
  * `df.filter(c >= x).orderBy(c.desc).limit(k)` — over the index-backed
  * relation and the PROVIDER decides the catalog can bound the scan,
  * rewriting the relation into a [[RowGroupScan]] over only the row
  * groups that can provably contribute to the top k. The companion of
  * [[StatsAggPushdown]] (same "the provider consults the index" seam,
  * /root/reference/sqlx-sqlite/src/main.rs:256-305) for ordering queries.
  *
  * Fires on `Limit(k, Sort(order, global, chain))` where `chain` is the
  * indexed relation under any stack of attribute-only Projects and AT
  * MOST ONE Filter of literal-bound conjuncts. Sort-column conjuncts
  * tighten the threshold walk directly (`IsNotNull` is implied and
  * ignored). Conjuncts on OTHER columns take the COMPOSITE certificate
  * ([[TopKPruning.pruneComposite]]): the threshold is certified only
  * from row groups whose stats prove every other-column conjunct
  * ALL-PASS (zero nulls, bounds inside the interval), so rows counted
  * toward k are guaranteed to survive the filter; groups that are not
  * all-pass still compete as survivors. When no threshold can be
  * certified this way, the declarative plan stands — over-scan, never
  * wrong. Computed projections disqualify. Multi-key orderings prune on
  * the LEADING key alone (lexicographic dominance). Kill switch:
  * `spark.graft.topkPushdown=false`.
  *
  * The rewrite substitutes the [[LogicalRelation]] node IN PLACE (any
  * surrounding Filter/Project structure survives, so the filter is still
  * re-applied above the scan — the Inexact contract) with the pruned
  * [[RowGroupScan]] under exprId-preserving aliases; the filter's
  * translatable conjuncts are pushed to the reader for page-level
  * skipping inside surviving row groups.
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
    // the sort input: the indexed relation under attribute-only Projects
    // and at most one Filter
    var cond: Option[Expression] = None
    def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
      case l: LogicalRelation => Some(l)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case f: Filter if cond.isEmpty =>
        cond = Some(f.condition); strip(f.child)
      case _ => None
    }
    val rel = strip(child).getOrElse(return None)
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

    val (plans, baseline, routeTag) = cond match {
      case None =>
        val total = idx.allFiles().map(_.scanRowGroups.size).sum
        (TopKPruning.prune(idx, a.name, k.toLong, descending, nullsFirst),
          total, s"topk(${a.name})")
      case Some(c) =>
        val (lo, hi, others) = parseBounds(c, a).getOrElse(return None)
        // the filter's own stats pruning is what the declarative plan
        // would get via listFiles — the baseline the rewrite must beat
        val statsPlans = idx.getFiles(c)
        val tag = if (others.isEmpty) s"topk-filtered(${a.name})"
                  else s"topk-composite(${a.name};${others.map(_.col).mkString(",")})"
        (TopKPruning.pruneComposite(
            idx, a.name, k.toLong, descending, nullsFirst,
            lo, hi, others, statsPlans),
          statsPlans.map(_.scanRowGroups.size).sum,
          tag)
    }
    val kept = plans.map(_.scanRowGroups.size).sum
    if (kept >= baseline) return None // no narrowing beyond the stats path

    fi.lastExecution = Some(PruneExecution(
      cond.toSeq, plans, idx.allFiles().size,
      idx.allFiles().map(_.rowGroupCount).sum, route = Seq(routeTag)))

    // every column ANY node of the surviving Filter/Project chain consumes
    // (not just the top node's references — an intermediate Project or the
    // Filter condition must also resolve against the substituted scan)
    val needed = child.collect {
      case p: Project => p.projectList.map(_.name)
      case f: Filter  => f.condition.references.map(_.name).toSeq
    }.flatten.toSet ++ child.output.map(_.name)
    val required = StructType(h.dataSchema.filter(f => needed.contains(f.name)))
    val scan = RowGroupScan(
      DataTypeUtils.toAttributes(required),
      fi.rootPaths.head.toString, plans, h.dataSchema, required,
      mergeRuns = true,
      pushedFilters =
        cond.toSeq.flatMap(RowGroupSkipScan.translateDataFilters))
    val byName = scan.output.map(o => o.name -> o).toMap
    val remap = Project(
      rel.output.filter(o => needed.contains(o.name)).map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)),
      scan)
    Some(child.transformUp {
      case l: LogicalRelation if l eq rel => remap
    })
  }

  /** All of `cond`'s conjuncts as per-column bounds: the sort column `a`'s
    * interval plus one [[TopKPruning.OtherColBounds]] per OTHER referenced
    * column, or None if ANY conjunct is something else (non-comparison, a
    * computed key, attr-to-attr). At most one bound per side per column
    * (two lower bounds etc. bail — the inside-the-interval certificate
    * needs the exact interval, and Spark collapses redundant bounds
    * anyway). `IsNotNull` on the sort column is implied and ignored; on
    * another column it still constrains rows, so it is recorded as a
    * bound-less entry (all-pass then requires a certified zero null
    * count). Literal values are bridged from Catalyst internal encoding to
    * the catalog's storage encoding (identical for integrals / date days /
    * timestamp micros; UTF8String → String; Decimal → BigDecimal). */
  private def parseBounds(cond: Expression, a: AttributeReference)
      : Option[(Option[(Any, Boolean)], Option[(Any, Boolean)],
                Seq[TopKPruning.OtherColBounds])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def v(l: Literal): Option[Any] =
      if (l.value == null) None
      else Some(l.value match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case other => other
      })
    // per-column accumulated bounds, insertion-ordered for a stable route tag
    final case class B(var lo: Option[(Any, Boolean)] = None,
                       var hi: Option[(Any, Boolean)] = None)
    val byCol = scala.collection.mutable.LinkedHashMap.empty[String, B]
    def bnd(ar: AttributeReference): B = byCol.getOrElseUpdate(ar.name, B())
    def setLo(ar: AttributeReference, b: (Any, Boolean)): Boolean = {
      val e = bnd(ar)
      if (e.lo.isDefined) false else { e.lo = Some(b); true }
    }
    def setHi(ar: AttributeReference, b: (Any, Boolean)): Boolean = {
      val e = bnd(ar)
      if (e.hi.isDefined) false else { e.hi = Some(b); true }
    }
    conjuncts(cond).foreach {
      case IsNotNull(ar: AttributeReference) =>
        if (ar.exprId != a.exprId) bnd(ar) // record: rows must be non-null
      case GreaterThan(ar: AttributeReference, l: Literal) =>
        if (!v(l).exists(b => setLo(ar, (b, false)))) return None
      case GreaterThanOrEqual(ar: AttributeReference, l: Literal) =>
        if (!v(l).exists(b => setLo(ar, (b, true)))) return None
      case LessThan(ar: AttributeReference, l: Literal) =>
        if (!v(l).exists(b => setHi(ar, (b, false)))) return None
      case LessThanOrEqual(ar: AttributeReference, l: Literal) =>
        if (!v(l).exists(b => setHi(ar, (b, true)))) return None
      case GreaterThan(l: Literal, ar: AttributeReference) =>
        if (!v(l).exists(b => setHi(ar, (b, false)))) return None
      case GreaterThanOrEqual(l: Literal, ar: AttributeReference) =>
        if (!v(l).exists(b => setHi(ar, (b, true)))) return None
      case LessThan(l: Literal, ar: AttributeReference) =>
        if (!v(l).exists(b => setLo(ar, (b, false)))) return None
      case LessThanOrEqual(l: Literal, ar: AttributeReference) =>
        if (!v(l).exists(b => setLo(ar, (b, true)))) return None
      case EqualTo(ar: AttributeReference, l: Literal) =>
        if (!v(l).exists(b => setLo(ar, (b, true)) && setHi(ar, (b, true))))
          return None
      case EqualTo(l: Literal, ar: AttributeReference) =>
        if (!v(l).exists(b => setLo(ar, (b, true)) && setHi(ar, (b, true))))
          return None
      case _ => return None // a conjunct the certificate cannot absorb
    }
    val sortB = byCol.getOrElse(a.name, B())
    val others = byCol.collect {
      case (name, b) if name != a.name =>
        TopKPruning.OtherColBounds(name, b.lo, b.hi)
    }.toSeq
    if (sortB.lo.isEmpty && sortB.hi.isEmpty && others.isEmpty) None
    else Some((sortB.lo, sortB.hi, others))
  }
}
