package graft.prune

import graft.index.{DeterminedConstKey, FileScanPlan, ImageConstKey, KeyImage, RawConstKey, RgConstKey, RowGroupStat, StatsIndex}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planner-side row-group refinement from per-row-group CONSTANCY (r13):
  * the scan-path counterpart of the catalog fold's wholesale filter
  * (StatsAggPushdown's idx44/idx47 engine), for predicates the
  * stats-space interval rewrite CANNOT serve — determined calendar parts
  * (`dayofweek(ts) IN (1,7)`, `date_format(ts,'EEEE') = 'Saturday'`) and
  * Derby-unrenderable monotone images (`year(ts) = 1995`, calendar-unit
  * truncs). A conjunct that closes over recognizable keys is evaluated
  * ONCE per surviving row group at the group's certified constants:
  * `false` (or NULL — with zero nulls certified, every actual row
  * evaluates exactly like the constant, and a NULL conjunct filters the
  * row) drops the group; `true`, a straddler, partial nulls, or any
  * unknown keeps it. Pure over-approximation on top of the Derby walk,
  * so Spark's re-applied filters (Inexact semantics, reference
  * main.rs:308-316) make it impossible to change results — only to skip
  * reads. At 100 TB on a day-partitioned layout this is the difference
  * between reading 7/7 and 2/7 of the files for a weekend slice: whole
  * files whose row groups all drop never reach the reader.
  *
  * Driver cost: O(index) — one stats fetch per referenced column, one
  * in-memory pass over (conjunct × row group). No data jobs.
  */
object PartPrune {

  /** Pure-expression pre-check (no catalog IO): does ANY conjunct close
    * over the constancy keys with a novel member? Callers use this to
    * skip the stats fetch entirely on ordinary predicates. */
  def qualifies(index: StatsIndex, dataFilters: Seq[Expression]): Boolean =
    dataFilters.flatMap(split).exists(q => closeOver(index, q).isDefined)

  /** Refine `plans` against `dataFilters`; returns the narrowed plans and
    * a route tag when anything dropped (empty route = pass-through). */
  def refine(
      index: StatsIndex,
      dataFilters: Seq[Expression],
      plans: Seq[FileScanPlan]): (Seq[FileScanPlan], Seq[String]) = {
    if (dataFilters.isEmpty || plans.isEmpty) return (plans, Nil)
    val conjuncts = dataFilters.flatMap(split)
    val qualifying = conjuncts.flatMap(q => closeOver(index, q))
    if (qualifying.isEmpty) return (plans, Nil)

    // one stats fetch per referenced column, keyed (file, rowGroup)
    val colNames = qualifying.flatMap(_.keys.map(_._2.name)).distinct
    val statsBy: Map[String, Map[(String, Int), RowGroupStat]] =
      colNames.flatMap { c =>
        index.rowGroupStats(c)
          .map(s => c -> s.map(st => (st.fileName, st.rowGroup) -> st).toMap)
      }.toMap

    var dropped = 0
    val refined = plans.flatMap { p =>
      val kept = p.scanRowGroups.filter { rg =>
        val keep = !qualifying.exists(_.drops(statsBy, p.fileName, rg))
        if (!keep) dropped += 1
        keep
      }
      if (kept.isEmpty) None
      else if (kept.size == p.scanRowGroups.size) Some(p)
      else Some(p.copy(scanRowGroups = kept))
    }
    if (dropped == 0) (plans, Nil)
    else (refined, Seq(s"part-const(dropped=$dropped)"))
  }

  private def split(e: Expression): Seq[Expression] =
    graft.index.StatsBridge.conjuncts(e)

  /** A conjunct fully closed over constancy-certifiable key expressions,
    * with at least one key the interval walk cannot already serve (a
    * determined part, or an image with no Derby rendering) — raw-only or
    * renderable-image-only conjuncts stay with the stats-space rewrite. */
  private final case class Closed(
      conjunct: Expression,
      keys: IndexedSeq[(Expression, AttributeReference, RgConstKey)]) {

    /** True when the stats PROVE every row of (file, rg) fails the
      * conjunct: all keys certified constant over a zero-null group and
      * the conjunct at those constants is not true. */
    def drops(
        statsBy: Map[String, Map[(String, Int), RowGroupStat]],
        file: String, rg: Int): Boolean = {
      val consts = new Array[Any](keys.size)
      var rows = -1L
      var i = 0
      while (i < keys.size) {
        val (_, ar, ck) = keys(i)
        val st = statsBy.get(ar.name).flatMap(_.get((file, rg)))
          .getOrElse(return false)
        if (rows < 0) rows = st.rowCount
        else if (rows != st.rowCount) return false
        if (!st.nullCount.contains(0L)) return false
        val mn = st.min.getOrElse(return false)
        val mx = st.max.getOrElse(return false)
        val v = scala.util.Try(ck.constantOf(mn, mx)).toOption.flatten
          .getOrElse(return false)
        consts(i) = internal(v, keyTypeOf(ar, ck)).getOrElse(return false)
        i += 1
      }
      val sub = conjunct.transformDown {
        case s if idxOf(s) >= 0 =>
          val k = idxOf(s)
          Literal(consts(k), keyTypeOf(keys(k)._2, keys(k)._3))
      }
      scala.util.Try(sub.eval(null)).toOption match {
        case Some(v) => v != true
        case None => false // an eval error keeps the group
      }
    }

    private def idxOf(s: Expression): Int =
      keys.indexWhere(_._1.semanticEquals(s))
  }

  private def keyTypeOf(ar: AttributeReference, ck: RgConstKey): DataType =
    ck match {
      case RawConstKey(dt) => dt
      case other => other.resultType
    }

  private def closeOver(index: StatsIndex, cj: Expression): Option[Closed] = {
    // Spark only pushes deterministic data filters, but make the
    // precondition local: a non-deterministic conjunct is not a pure
    // function of its keys, so per-group substitution proves nothing
    if (!cj.deterministic) return None
    val keys = scala.collection.mutable.ArrayBuffer
      .empty[(Expression, AttributeReference, RgConstKey)]
    def idxOf(s: Expression): Int = keys.indexWhere(_._1.semanticEquals(s))
    def keyish(e: Expression): Option[(AttributeReference, RgConstKey)] =
      e match {
        case a: AttributeReference
            if indexed(index, a) && constancyExact(a.dataType) =>
          Some((a, RawConstKey(a.dataType)))
        case other => KeyImage.constKeyOf(other,
          ar => indexed(index, ar) && timeOrdered(ar.dataType))
      }
    val closed = cj.transformDown {
      case s if idxOf(s) >= 0 => Literal(null, s.dataType)
      case s if keyish(s).isDefined =>
        val (ar, ck) = keyish(s).get
        keys += ((s, ar, ck)); Literal(null, s.dataType)
    }
    if (closed.references.nonEmpty) return None
    // the value-add gate: something the interval rewrite can't serve
    val novel = keys.exists {
      case (_, _, _: DeterminedConstKey) => true
      case (_, _, _: graft.index.PiecewiseZoneConstKey) => true
      case (_, _, ImageConstKey(img)) => img.derbySql.isEmpty
      case _ => false
    }
    if (novel) Some(Closed(cj, keys.toIndexedSeq)) else None
  }

  private def indexed(index: StatsIndex, a: AttributeReference): Boolean =
    index.indexedSchema.fields.exists(f =>
      f.name == a.name && f.dataType == a.dataType)

  /** Raw columns whose catalog extremes are VERBATIM values (so min = max
    * certifies constancy) — the shared gate, see [[StatsBridge]]. */
  private def constancyExact(dt: DataType): Boolean =
    graft.index.StatsBridge.verbatimExact(dt)

  private def timeOrdered(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Catalog JDBC value (or eval-internal value from a determined key) →
    * Catalyst internal for the Literal substitution — see [[StatsBridge]]. */
  private def internal(v: Any, dt: DataType): Option[Any] =
    graft.index.StatsBridge.internal(v, dt)
}
