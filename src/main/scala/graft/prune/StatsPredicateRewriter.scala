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

  /** Numeric widenings that are monotone non-decreasing (x <= y implies
    * cast(x) <= cast(y)), so min/max stats survive the cast soundly. */
  private def wideningCast(from: DataType, to: DataType): Boolean = {
    def rank(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(1)
      case ShortType => Some(2)
      case IntegerType => Some(3)
      case LongType => Some(4)
      case FloatType => Some(5)
      case DoubleType => Some(6)
      case _ => None
    }
    (rank(from), rank(to)) match {
      case (Some(f), Some(t)) => t >= f
      case _ => false
    }
  }

  /** Prefix bound in stats space: value starts with `prefix` ⇒
    * max >= prefix && prefix_k(min) <= prefix. */
  private def prefixBound(c: String, prefix: String): Expression = {
    val l = Literal(prefix)
    And(
      keep(GreaterThanOrEqual(maxCol(c), l)),
      keep(LessThanOrEqual(
        Substring(minCol(c), Literal(1), Literal(prefix.length)), l)))
  }

  /** Literal prefix of a LIKE pattern up to the first unescaped wildcard. */
  private def likeLiteralPrefix(pattern: String, esc: Char): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val ch = pattern.charAt(i)
      if (ch == esc && i + 1 < pattern.length) { sb.append(pattern.charAt(i + 1)); i += 2 }
      else if (ch == '%' || ch == '_') return sb.toString
      else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  private def integralLong(l: Literal): Option[Long] = l.value match {
    case b: java.lang.Byte    => Some(b.longValue)
    case s: java.lang.Short   => Some(s.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case j: java.lang.Long    => Some(j.longValue)
    case _ => None
  }

  /** Modulo point predicate `a % k = c` / `pmod(a, k) = c` (k > 0
    * literal) — the reference's Modulo operator (conversions.rs:20-31),
    * made SOUND in stats space: on a non-negative domain,
    * ∃x∈[min,max]: x ≡ c (mod k)  ⟺  ⌊(max−c)/k⌋ ≥ ⌈(min−c)/k⌉, computed
    * with truncating integer division (= floor, since every numerator is
    * non-negative there). Row groups touching negatives are conservatively
    * kept (truncation ≠ floor below zero); c outside the operator's
    * reachable range prunes outright. Prunes when the group's value range
    * is narrower than k — clustered/sorted keys. */
  private def moduloEq(c0: String, k: Long, c: Long, pmod: Boolean): Expression = {
    val minL = Cast(minCol(c0), LongType)
    val maxL = Cast(maxCol(c0), LongType)
    val negDomain = LessThan(minL, Literal(0L))
    val res: Expression =
      if (c >= k) Literal.FalseLiteral // |result| < k for both operators
      else if (c < 0) {
        // pmod is never negative; remainder is negative only for x < 0
        if (pmod) Literal.FalseLiteral else negDomain
      } else {
        val exists = And(
          GreaterThanOrEqual(maxL, Literal(c)),
          Or(LessThanOrEqual(minL, Literal(c)),
            GreaterThanOrEqual(
              IntegralDivide(Subtract(maxL, Literal(c)), Literal(k)),
              IntegralDivide(Subtract(minL, Literal(c - k + 1)), Literal(k)))))
        Or(negDomain, exists)
      }
    keep(res)
  }

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
  /** How a monotone affine image of one indexed attribute maps into stats
    * space: `lo`/`hi` are the expression's lower/upper bounds over a row
    * group, built from the attribute's `_min`/`_max` stats columns.
    * Mirrors the arithmetic rows of the reference's operator matrix
    * (conversions.rs:14-32) — Plus/Minus/Multiply/Divide of an attribute
    * and literals stay prunable; non-monotone shapes (modulo, shifts,
    * attr-attr arithmetic) fall through to TRUE. */
  private final case class Affine(col: String, lo: Expression, hi: Expression)

  def rewrite(predicate: Expression, indexedCols: Set[String]): Expression = {
    def attr(e: Expression): Option[String] = e match {
      case a: Attribute if indexedCols.contains(a.name) => Some(a.name)
      case _ => None
    }

    def litSign(l: Literal): Option[Int] = (l.value match {
      case null => None
      case b: java.lang.Byte    => Some(b.doubleValue)
      case s: java.lang.Short   => Some(s.doubleValue)
      case i: java.lang.Integer => Some(i.doubleValue)
      case j: java.lang.Long    => Some(j.doubleValue)
      case f: java.lang.Float   => Some(f.doubleValue)
      case d: java.lang.Double  => Some(d.doubleValue)
      case d: Decimal           => Some(d.toDouble)
      case _ => None
    }).filterNot(d => d.isNaN || d.isInfinite).map(math.signum(_).toInt)

    /** Decompose `e` as a monotone affine image of one indexed attribute. */
    def affine(e: Expression): Option[Affine] = e match {
      case a: Attribute if attr(a).isDefined =>
        Some(Affine(a.name, minCol(a.name), maxCol(a.name)))
      case Add(x, l: Literal, _) if !isNaN(l) && l.value != null =>
        affine(x).map(f => Affine(f.col, Add(f.lo, l), Add(f.hi, l)))
      case Add(l: Literal, x, _) if !isNaN(l) && l.value != null =>
        affine(x).map(f => Affine(f.col, Add(f.lo, l), Add(f.hi, l)))
      case Subtract(x, l: Literal, _) if !isNaN(l) && l.value != null =>
        affine(x).map(f => Affine(f.col, Subtract(f.lo, l), Subtract(f.hi, l)))
      case Subtract(l: Literal, x, _) if !isNaN(l) && l.value != null =>
        affine(x).map(f => Affine(f.col, Subtract(l, f.hi), Subtract(l, f.lo)))
      case Multiply(x, l: Literal, _) =>
        litSign(l) match {
          case Some(s) if s > 0 =>
            affine(x).map(f => Affine(f.col, Multiply(f.lo, l), Multiply(f.hi, l)))
          case Some(s) if s < 0 =>
            affine(x).map(f => Affine(f.col, Multiply(f.hi, l), Multiply(f.lo, l)))
          case _ => None
        }
      case Multiply(l: Literal, x, _) => affine(Multiply(x, l))
      case Divide(x, l: Literal, _) =>
        litSign(l) match {
          case Some(s) if s > 0 =>
            affine(x).map(f => Affine(f.col, Divide(f.lo, l), Divide(f.hi, l)))
          case Some(s) if s < 0 =>
            affine(x).map(f => Affine(f.col, Divide(f.hi, l), Divide(f.lo, l)))
          case _ => None
        }
      case UnaryMinus(x, _) =>
        affine(x).map(f => Affine(f.col, UnaryMinus(f.hi), UnaryMinus(f.lo)))
      // widening numeric casts are monotone: the analyzer wraps attributes
      // in casts for mixed-type comparisons (e.g. int column vs double lit)
      case Cast(x, dt, _, _) if wideningCast(x.dataType, dt) =>
        affine(x).map(f => Affine(f.col, Cast(f.lo, dt), Cast(f.hi, dt)))
      case _ => None
    }

    /** Negation pushed to the leaves, in shapes `rw` knows. Three-valued
      * caveat does not bite here: callers use this only for "branch i was
      * NOT taken", and a null condition also falls through (handled by the
      * separate null-possibility disjunct). */
    def pushNot(p: Expression): Expression = p match {
      case LessThan(a, b)           => GreaterThanOrEqual(a, b)
      case LessThanOrEqual(a, b)    => GreaterThan(a, b)
      case GreaterThan(a, b)        => LessThanOrEqual(a, b)
      case GreaterThanOrEqual(a, b) => LessThan(a, b)
      case And(a, b)                => Or(pushNot(a), pushNot(b))
      case Or(a, b)                 => And(pushNot(a), pushNot(b))
      case Not(x)                   => x
      case other                    => Not(other) // rw folds unknowns to TRUE
    }

    /** CASE translation — parity with the reference's CaseExpr conversion
      * (conversions.rs:73-81), done as a sound interval union of branches:
      * `CASE WHEN p_i THEN v_i ELSE v_e END  cmp  lit` can hold in a row
      * group only if some branch whose value can satisfy `cmp` is
      * reachable there. Literal branch values are tested against `lit`
      * statically; branch i's reachability over-approximates as
      * rw(p_i) ∧ ∀j<i "p_j not taken", where "not taken" is
      * rw(¬p_j) ∨ "p_j could be null here" (null conditions fall through,
      * so the null-count disjunct keeps that path sound). The ELSE branch
      * requires every p_j not taken; a missing ELSE is the null value,
      * which satisfies no comparison. */
    /** Sound over-approximation of "p could evaluate to NULL for some row
      * in this group": any referenced column has nulls (or is unindexed). */
    def nullsPossible(p: Expression): Expression = {
      val refs = p.references.toSeq
      if (refs.isEmpty) True // constant condition: stay conservative
      else if (refs.exists(a => !indexedCols.contains(a.name))) True
      else refs.map(a => keep(GreaterThan(nullCountCol(a.name), Literal(0L))))
        .reduce[Expression](Or)
    }

    def caseCmp(c: CaseWhen, test: Expression => Expression): Expression = {
      def canMatch(v: Option[Expression]): Boolean = v match {
        case Some(lv: Literal) =>
          scala.util.Try(test(lv).eval(null)).toOption
            .exists(_ == java.lang.Boolean.TRUE)
        case Some(_) => true // non-literal branch value: might match
        case None    => false // absent ELSE = NULL: never satisfies cmp
      }
      def notTaken(p: Expression): Expression =
        Or(rw(pushNot(p)), nullsPossible(p))
      val branchParts = c.branches.zipWithIndex.map { case ((p, v), i) =>
        if (!canMatch(Some(v))) Literal.FalseLiteral
        else (rw(p) +: c.branches.take(i).map(b => notTaken(b._1)))
          .reduce[Expression](And)
      }
      val elsePart =
        if (!canMatch(c.elseValue)) Literal.FalseLiteral
        else c.branches.map(b => notTaken(b._1)) match {
          case Seq() => True
          case xs    => xs.reduce[Expression](And)
        }
      (branchParts :+ elsePart).reduce[Expression](Or)
    }

    def rw(e: Expression): Expression = e match {
      case And(l, r) => And(rw(l), rw(r))
      case Or(l, r)  => Or(rw(l), rw(r))

      // CASE compared against a literal (either side), CASE != lit, and a
      // boolean CASE used directly as the predicate
      case cmp @ BinaryComparison(c: CaseWhen, l: Literal) if !isNaN(l) =>
        caseCmp(c, v => cmp.withNewChildren(Seq(v, l)))
      case cmp @ BinaryComparison(l: Literal, c: CaseWhen) if !isNaN(l) =>
        caseCmp(c, v => cmp.withNewChildren(Seq(l, v)))
      case Not(EqualTo(c: CaseWhen, l: Literal)) if !isNaN(l) =>
        caseCmp(c, v => Not(EqualTo(v, l)))
      case Not(EqualTo(l: Literal, c: CaseWhen)) if !isNaN(l) =>
        caseCmp(c, v => Not(EqualTo(v, l)))
      case c: CaseWhen if c.dataType == BooleanType =>
        caseCmp(c, identity)

      // the optimizer canonicalizes CASE comparisons into `(p) <=> true`
      // and `NOT ((p) <=> true)` (SimplifyConditionalsInPredicate):
      //   p <=> true   holds iff p is true            ⇒ rw(p)
      //   p <=> false  holds iff p is exactly false   ⇒ rw(¬p)
      //   ¬(p <=> true)  holds iff p is false OR null ⇒ rw(¬p) ∨ nulls(p)
      //   ¬(p <=> false) holds iff p is true OR null  ⇒ rw(p) ∨ nulls(p)
      case EqualNullSafe(p, Literal(true, BooleanType))
          if p.dataType == BooleanType && !p.isInstanceOf[Literal] =>
        rw(p)
      case EqualNullSafe(Literal(true, BooleanType), p)
          if p.dataType == BooleanType && !p.isInstanceOf[Literal] =>
        rw(p)
      case EqualNullSafe(p, Literal(false, BooleanType))
          if p.dataType == BooleanType && !p.isInstanceOf[Literal] =>
        rw(pushNot(p))
      case EqualNullSafe(Literal(false, BooleanType), p)
          if p.dataType == BooleanType && !p.isInstanceOf[Literal] =>
        rw(pushNot(p))
      case Not(EqualNullSafe(p, Literal(true, BooleanType)))
          if p.dataType == BooleanType && !p.isInstanceOf[Literal] =>
        Or(rw(pushNot(p)), nullsPossible(p))
      case Not(EqualNullSafe(p, Literal(false, BooleanType)))
          if p.dataType == BooleanType && !p.isInstanceOf[Literal] =>
        Or(rw(p), nullsPossible(p))

      // f(a) = lit  ⇒  lo(f) <= lit && hi(f) >= lit
      case EqualTo(x, l: Literal) if affine(x).isDefined && !isNaN(l) =>
        val f = affine(x).get
        And(keep(LessThanOrEqual(f.lo, l)), keep(GreaterThanOrEqual(f.hi, l)))
      case EqualTo(l: Literal, x) if affine(x).isDefined && !isNaN(l) =>
        rw(EqualTo(x, l))

      // a <=> lit : null-safe equality
      case EqualNullSafe(a, l: Literal) if attr(a).isDefined =>
        if (l.value == null) keep(GreaterThan(nullCountCol(attr(a).get), Literal(0L)))
        else rw(EqualTo(a, l))
      case EqualNullSafe(l: Literal, a) if attr(a).isDefined => rw(EqualNullSafe(a, l))

      case LessThan(x, l: Literal) if affine(x).isDefined && !isNaN(l) =>
        keep(LessThan(affine(x).get.lo, l))
      case LessThan(l: Literal, x) if affine(x).isDefined && !isNaN(l) =>
        keep(GreaterThan(affine(x).get.hi, l))
      case LessThanOrEqual(x, l: Literal) if affine(x).isDefined && !isNaN(l) =>
        keep(LessThanOrEqual(affine(x).get.lo, l))
      case LessThanOrEqual(l: Literal, x) if affine(x).isDefined && !isNaN(l) =>
        keep(GreaterThanOrEqual(affine(x).get.hi, l))
      case GreaterThan(x, l: Literal) if affine(x).isDefined && !isNaN(l) =>
        keep(GreaterThan(affine(x).get.hi, l))
      case GreaterThan(l: Literal, x) if affine(x).isDefined && !isNaN(l) =>
        keep(LessThan(affine(x).get.lo, l))
      case GreaterThanOrEqual(x, l: Literal) if affine(x).isDefined && !isNaN(l) =>
        keep(GreaterThanOrEqual(affine(x).get.hi, l))
      case GreaterThanOrEqual(l: Literal, x) if affine(x).isDefined && !isNaN(l) =>
        keep(LessThanOrEqual(affine(x).get.lo, l))

      // a % k = c / pmod(a, k) = c, k > 0 literal (conversions.rs:20-31)
      case EqualTo(Remainder(a: Attribute, kl: Literal, _), c: Literal)
          if attr(a).isDefined && integralLong(kl).exists(_ > 0) &&
            integralLong(c).isDefined =>
        moduloEq(attr(a).get, integralLong(kl).get, integralLong(c).get, pmod = false)
      case EqualTo(c: Literal, r @ Remainder(_, _, _)) => rw(EqualTo(r, c))
      case EqualTo(Pmod(a: Attribute, kl: Literal, _), c: Literal)
          if attr(a).isDefined && integralLong(kl).exists(_ > 0) &&
            integralLong(c).isDefined =>
        moduloEq(attr(a).get, integralLong(kl).get, integralLong(c).get, pmod = true)
      case EqualTo(c: Literal, p @ Pmod(_, _, _)) => rw(EqualTo(p, c))

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
        prefixBound(attr(a).get, l.value.toString)

      // general LIKE (reference LikeMatch, conversions.rs:28): any literal
      // prefix before the first unescaped wildcard bounds the match — e.g.
      // 'abc%def' prunes on 'abc'. (Plain 'abc%' is canonicalized to
      // StartsWith by the optimizer before it reaches us; this covers the
      // mixed patterns that are not.) Prefix-free patterns ('%x') carry no
      // min/max signal ⇒ TRUE.
      case Like(a, Literal(p, StringType), esc) if attr(a).isDefined && p != null =>
        val prefix = likeLiteralPrefix(p.toString, esc)
        if (prefix.isEmpty) True else prefixBound(attr(a).get, prefix)

      // a NOT LIKE 'p' (reference NotLikeMatch, conversions.rs:29): prune
      // only constant groups whose single value matches the pattern
      case Not(like @ Like(a, l @ Literal(p, StringType), '\\'))
          if attr(a).isDefined && p != null =>
        val c = attr(a).get
        keep(Not(And(And(
          EqualTo(minCol(c), maxCol(c)),
          Like(minCol(c), l, '\\')),
          EqualTo(Coalesce(Seq(nullCountCol(c), Literal(1L))), Literal(0L)))))

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
