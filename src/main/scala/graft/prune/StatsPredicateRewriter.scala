package graft.prune

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Rewrites a data-space Catalyst predicate into a *stats-space* predicate
  * over the index's per-row-group statistics columns
  * (`{col}_min`, `{col}_max`, `{col}_null_count`, `row_count`).
  *
  * Re-expresses the role of DataFusion's `PruningPredicate`
  * (/root/reference/sqlx-sqlite/src/index.rs:107-123) with Catalyst nodes.
  *
  * Soundness invariant (the reference's `conversions.rs:32` contract):
  * pruning may only OVER-scan, never UNDER-scan. Every row group containing
  * at least one row matching the data predicate must satisfy the rewritten
  * predicate. Guarantees:
  *
  *  - unknown subtrees rewrite to `TRUE` ("might match");
  *  - every stats comparison is wrapped in `COALESCE(…, TRUE)` so NULL
  *    statistics (stats missing from the footer, or an all-null group)
  *    never prune — matching DataFusion's "unknown ⇒ keep" semantics;
  *  - NaN float/double literals rewrite to `TRUE` (parquet min/max
  *    ordering of NaN is writer-dependent);
  *  - `Or` keeps soundness because both children are themselves sound
  *    over-approximations; `Not` is NOT recursed into (only the
  *    `Not(EqualTo)` shape has a direct sound rewrite).
  */
object StatsPredicateRewriter {

  def minCol(c: String): Expression = UnresolvedAttribute(c + "_min")
  def maxCol(c: String): Expression = UnresolvedAttribute(c + "_max")
  def nullCountCol(c: String): Expression = UnresolvedAttribute(c + "_null_count")
  val rowCountCol: Expression = UnresolvedAttribute("row_count")

  private val True: Expression = Literal.TrueLiteral

  /** `keep(e)`: unknown statistics must not prune. */
  private def keep(e: Expression): Expression = Coalesce(Seq(e, True))

  /** NaN ordering is writer-dependent in parquet stats and Derby cannot
    * represent non-finite DOUBLE literals — both rewrite to TRUE. */
  private def isNaN(l: Literal): Boolean = l.value match {
    case f: java.lang.Float  => f.isNaN || f.isInfinite
    case d: java.lang.Double => d.isNaN || d.isInfinite
    case _ => false
  }

  /** @param predicate   resolved data-space predicate (conjunction of the
    *                    scan's data filters)
    * @param indexedCols columns the index holds statistics for; predicates
    *                    over any other column rewrite to TRUE
    */
  def rewrite(predicate: Expression, indexedCols: Set[String]): Expression = {
    def attr(e: Expression): Option[String] = e match {
      case a: Attribute if indexedCols.contains(a.name) => Some(a.name)
      case _ => None
    }

    def rw(e: Expression): Expression = e match {
      case And(l, r) => And(rw(l), rw(r))
      case Or(l, r)  => Or(rw(l), rw(r))

      // a = lit  ⇒  min <= lit && max >= lit
      case EqualTo(a, l: Literal) if attr(a).isDefined && !isNaN(l) =>
        val c = attr(a).get
        And(keep(LessThanOrEqual(minCol(c), l)), keep(GreaterThanOrEqual(maxCol(c), l)))
      case EqualTo(l: Literal, a) if attr(a).isDefined && !isNaN(l) =>
        rw(EqualTo(a, l))

      // a <=> lit : null-safe equality
      case EqualNullSafe(a, l: Literal) if attr(a).isDefined =>
        if (l.value == null) keep(GreaterThan(nullCountCol(attr(a).get), Literal(0L)))
        else rw(EqualTo(a, l))
      case EqualNullSafe(l: Literal, a) if attr(a).isDefined => rw(EqualNullSafe(a, l))

      case LessThan(a, l: Literal) if attr(a).isDefined && !isNaN(l) =>
        keep(LessThan(minCol(attr(a).get), l))
      case LessThan(l: Literal, a) if attr(a).isDefined && !isNaN(l) =>
        keep(GreaterThan(maxCol(attr(a).get), l))
      case LessThanOrEqual(a, l: Literal) if attr(a).isDefined && !isNaN(l) =>
        keep(LessThanOrEqual(minCol(attr(a).get), l))
      case LessThanOrEqual(l: Literal, a) if attr(a).isDefined && !isNaN(l) =>
        keep(GreaterThanOrEqual(maxCol(attr(a).get), l))
      case GreaterThan(a, l: Literal) if attr(a).isDefined && !isNaN(l) =>
        keep(GreaterThan(maxCol(attr(a).get), l))
      case GreaterThan(l: Literal, a) if attr(a).isDefined && !isNaN(l) =>
        keep(LessThan(minCol(attr(a).get), l))
      case GreaterThanOrEqual(a, l: Literal) if attr(a).isDefined && !isNaN(l) =>
        keep(GreaterThanOrEqual(maxCol(attr(a).get), l))
      case GreaterThanOrEqual(l: Literal, a) if attr(a).isDefined && !isNaN(l) =>
        keep(LessThanOrEqual(minCol(attr(a).get), l))

      case IsNull(a) if attr(a).isDefined =>
        keep(GreaterThan(nullCountCol(attr(a).get), Literal(0L)))
      case IsNotNull(a) if attr(a).isDefined =>
        keep(LessThan(nullCountCol(attr(a).get), rowCountCol))

      // a IN (l1, l2, …)  ⇒  OR of the equality rewrites
      case In(a, values) if attr(a).isDefined &&
          values.nonEmpty && values.forall(_.isInstanceOf[Literal]) =>
        values.map(v => rw(EqualTo(a, v.asInstanceOf[Literal]))).reduce(Or)
      case InSet(a, hset) if attr(a).isDefined && hset.nonEmpty && hset.size <= 256 =>
        val dt = a.dataType
        hset.toSeq.map(v => rw(EqualTo(a, Literal(v, dt)))).reduce(Or)

      // a LIKE 'p%'  ⇒  max >= 'p' && substr(min, 1, len(p)) <= 'p'
      // (lexicographic order: x <= y ⇒ prefix_k(x) <= prefix_k(y))
      case StartsWith(a, l @ Literal(_, StringType)) if attr(a).isDefined && l.value != null =>
        val c = attr(a).get
        val len = l.value.toString.length
        And(
          keep(GreaterThanOrEqual(maxCol(c), l)),
          keep(LessThanOrEqual(Substring(minCol(c), Literal(1), Literal(len)), l)))

      // a != lit  ⇒  prune only constant groups: !(min = lit && max = lit && nulls = 0)
      case Not(EqualTo(a, l: Literal)) if attr(a).isDefined && !isNaN(l) =>
        val c = attr(a).get
        keep(Not(And(And(
          EqualTo(minCol(c), l), EqualTo(maxCol(c), l)),
          EqualTo(Coalesce(Seq(nullCountCol(c), Literal(1L))), Literal(0L)))))
      case Not(EqualTo(l: Literal, a)) if attr(a).isDefined =>
        rw(Not(EqualTo(a, l)))

      case _ => True // unknown shape: conservative, never under-scan
    }

    rw(predicate)
  }
}
