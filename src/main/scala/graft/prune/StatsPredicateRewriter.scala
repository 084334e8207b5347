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
/** Stats-space marker for an in-catalog bloom probe on `colName`'s
  * per-row-group bloom filter (BloomIndex). Print-only: ExprToDerbySql
  * renders it as `({col}_bloom IS NULL OR GRAFT_BLOOM_*(…) = 1)`; it never
  * reaches Catalyst evaluation (emitted only when the caller declares
  * bloom columns, which the Catalyst-eval property specs do not). */
final case class BloomMightContain(colName: String, probe: Either[Long, String])
    extends LeafExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
}

/** Stats-space application of a monotone [[graft.index.KeyImage]] to a
  * stats column (r13): the interval image of `f(col)` over a row group is
  * `[f(col_min), f(col_max)]`, so predicates on computed time keys —
  * `CAST(ts AS DATE) = d`, `date_trunc('day', ts) >= t`,
  * `unix_timestamp(ts) < s` — prune through the same interval machinery
  * as raw columns. Constructed ONLY for images with a Derby rendering
  * (the catalog walk is the execution path); evaluable in Catalyst too so
  * the rewriter's property harness can exercise it directly. */
final case class ImageRef(image: graft.index.KeyImage, child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = image.resultType
  override def nullable: Boolean = true
  protected override def nullSafeEval(input: Any): Any = image(input)
  override protected def withNewChildInternal(newChild: Expression): ImageRef =
    copy(child = newChild)
  override def prettyName: String = s"img_${image.id}"
}

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

  /** Bit width of a shift's value operand (Spark shifts take int or
    * long); None for anything else. */
  private def shiftWidth(x: Expression): Option[Int] = x.dataType match {
    case IntegerType => Some(32)
    case LongType    => Some(64)
    case _           => None
  }

  /** floor(e / 2^k) from truncating division (Catalyst IntegralDivide and
    * Derby BIGINT '/' both round toward zero): non-negative numerators
    * truncate to the floor already; negative ones are offset by 2^k − 1
    * first. This IS `e >> k` for every sign — arithmetic right shift is
    * floor division. */
  private def floorShr(e: Expression, k: Int): Expression = {
    val d = Literal(1L << k)
    CaseWhen(
      Seq((GreaterThanOrEqual(e, Literal(0L)), IntegralDivide(e, d))),
      Some(IntegralDivide(Subtract(e, Literal((1L << k) - 1)), d)))
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
  /** Interval image of a data-space expression in stats space: `lo`/`hi`
    * bound the expression's value over a row group, built from `_min`/`_max`
    * stats columns and literals; `refs` are the indexed columns referenced.
    * Mirrors the arithmetic rows of the reference's operator matrix
    * (conversions.rs:10-32, whose BinaryExpr translation recurses BOTH
    * operands) — Plus/Minus/Multiply/Divide over attributes AND other
    * interval-shaped subtrees stay prunable via interval arithmetic
    * (`lo(a+b) = lo(a)+lo(b)`, multiplication via 4-corner min/max), and
    * bit shifts translate too (`>>` is floor division — monotone; `<<`
    * conditionally, with overflow-freedom certified from the stats
    * themselves); non-monotone leftovers (modulo inside comparisons,
    * attr/attr division) fall through to TRUE.
    *
    * Soundness of the 4-corner min/max under NULL statistics: a corner
    * with any NULL operand is NULL, and Catalyst Least/Greatest skip NULL
    * children — which is only sound because a column's `_min`/`_max` are
    * written atomically from the same footer struct (both present or both
    * NULL, DerbyStatsIndex I4), so either every corner is NULL (Least
    * yields NULL ⇒ `keep` scans) or none is. On the Derby side `keep()`
    * prints an `IS NULL` disjunct for every referenced stats column, which
    * guards the CASE-chain min/max unconditionally. */
  private final case class Ival(lo: Expression, hi: Expression, refs: Set[String])

  def rewrite(
      predicate: Expression,
      indexedCols: Set[String],
      bloomCols: Set[String] = Set.empty): Expression = {
    def attr(e: Expression): Option[String] = e match {
      case a: Attribute if indexedCols.contains(a.name) => Some(a.name)
      case _ => None
    }

    object MonotoneImage {
      def unapply(e: Expression): Option[(String, graft.index.KeyImage)] =
        graft.index.KeyImage
          .fromDataExpr(e, ar => indexedCols.contains(ar.name))
          .collect { case (ar, img) if img.derbySql.isDefined => (ar.name, img) }
    }

    /** Bloom-probeable side of an equality: the bloom column itself, or a
      * widening INTEGRAL cast of it (ingest widened values to long, so the
      * probe widens identically; float/double targets are excluded — a
      * fractional literal cannot hash-match the widened-long ingest). */
    def bloomAttr(e: Expression): Option[String] = e match {
      case a: Attribute if bloomCols.contains(a.name) && indexedCols.contains(a.name) =>
        Some(a.name)
      case Cast(a: Attribute, ByteType | ShortType | IntegerType | LongType, _, _)
          if bloomCols.contains(a.name) && indexedCols.contains(a.name) &&
            wideningCast(a.dataType, LongType) => Some(a.name)
      case _ => None
    }

    def bloomTerm(c: String, l: Literal): Option[Expression] = l.value match {
      // 1024 = GRAFT_BLOOM_STR's VARCHAR arg width (DerbyStatsIndex DDL);
      // longer literals skip the bloom term (range bounds still apply)
      case s: org.apache.spark.unsafe.types.UTF8String if s.toString.length <= 1024 =>
        Some(BloomMightContain(c, scala.util.Right(s.toString)))
      case _ => integralLong(l).map(v => BloomMightContain(c, scala.util.Left(v)))
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

    /** Decompose `e` as an interval over indexed-attribute statistics.
      * Literals are point intervals, so every attr-op-literal shape is the
      * degenerate case of the general attr-op-attr interval arithmetic. */
    def interval(e: Expression): Option[Ival] = e match {
      case a: Attribute if attr(a).isDefined =>
        Some(Ival(minCol(a.name), maxCol(a.name), Set(a.name)))
      case l: Literal if l.value != null && !isNaN(l) =>
        Some(Ival(l, l, Set.empty))
      // monotone image of an indexed time-typed column (r13): f monotone
      // ⇒ f(x) ∈ [f(min), f(max)] for every row of the group — computed
      // date/time keys prune through the ordinary interval comparisons.
      // Only Derby-renderable images decompose (the walk executes in the
      // catalog); calendar-unit truncs and year() fall through to TRUE.
      case MonotoneImage(c, img) =>
        Some(Ival(ImageRef(img, minCol(c)), ImageRef(img, maxCol(c)), Set(c)))
      case Add(x, y, _) =>
        for (a <- interval(x); b <- interval(y))
          yield Ival(Add(a.lo, b.lo), Add(a.hi, b.hi), a.refs ++ b.refs)
      case Subtract(x, y, _) =>
        for (a <- interval(x); b <- interval(y))
          yield Ival(Subtract(a.lo, b.hi), Subtract(a.hi, b.lo), a.refs ++ b.refs)
      // literal factor of known sign: lean monotone image (2 nodes) — the
      // common case; analyzer-typed, so reached before the 4-corner path
      case Multiply(x, l: Literal, _) if litSign(l).isDefined =>
        val s = litSign(l).get
        interval(x).map { f =>
          if (s >= 0) Ival(Multiply(f.lo, l), Multiply(f.hi, l), f.refs)
          else Ival(Multiply(f.hi, l), Multiply(f.lo, l), f.refs)
        }
      case Multiply(l: Literal, x, _) if litSign(l).isDefined =>
        interval(Multiply(x, l))
      // general interval product: 4-corner min/max (sound for any signs)
      case Multiply(x, y, _) =>
        for (a <- interval(x); b <- interval(y)) yield {
          val corners = Seq(Multiply(a.lo, b.lo), Multiply(a.lo, b.hi),
            Multiply(a.hi, b.lo), Multiply(a.hi, b.hi))
          Ival(Least(corners), Greatest(corners), a.refs ++ b.refs)
        }
      case Divide(x, l: Literal, _) =>
        litSign(l) match {
          case Some(s) if s > 0 =>
            interval(x).map(f => Ival(Divide(f.lo, l), Divide(f.hi, l), f.refs))
          case Some(s) if s < 0 =>
            interval(x).map(f => Ival(Divide(f.hi, l), Divide(f.lo, l), f.refs))
          case _ => None // ±0 / non-numeric: unbounded
        }
      // attr/attr division (the last row of the reference's operator
      // matrix, conversions.rs:20): a quotient interval exists ONLY when
      // the divisor's own statistics certify a sign (b_min > 0 or
      // b_max < 0 — the interval cannot straddle zero); then the 4-corner
      // quotient bounds are sound and zero-divisor-free. Uncertified
      // groups take the NULL else-branch: every comparison on a NULL
      // endpoint is NULL, keep() coalesces NULL to TRUE in Catalyst, and
      // the Derby keep() rendering CASE-guards the predicate (see
      // ExprToDerbySql) — unknown ⇒ scan, never prune.
      case Divide(x, y, _) =>
        for (a <- interval(x); b <- interval(y)) yield {
          val zero = Cast(Literal(0), y.dataType)
          val cert = Or(GreaterThan(b.lo, zero), LessThan(b.hi, zero))
          val corners = Seq(Divide(a.lo, b.lo), Divide(a.lo, b.hi),
            Divide(a.hi, b.lo), Divide(a.hi, b.hi))
          Ival(CaseWhen(Seq((cert, Least(corners))), None),
            CaseWhen(Seq((cert, Greatest(corners))), None),
            a.refs ++ b.refs)
        }
      case UnaryMinus(x, _) =>
        interval(x).map(f => Ival(UnaryMinus(f.hi), UnaryMinus(f.lo), f.refs))
      // widening numeric casts are monotone: the analyzer wraps attributes
      // in casts for mixed-type comparisons (e.g. int column vs double lit)
      case Cast(x, dt, _, _) if wideningCast(x.dataType, dt) =>
        interval(x).map(f => Ival(Cast(f.lo, dt), Cast(f.hi, dt), f.refs))

      // bit shifts (reference conversions.rs:30-31). x >> k IS floor
      // division by 2^k — monotone for every sign; floor comes from
      // truncating division via a negative-offset CASE (floorShr). x << k
      // wraps on overflow (not monotone in general), but the very stats
      // being consulted certify the domain: all of the group's values lie
      // in [lo, hi], so when [lo, hi] shifted fits the operand width the
      // shift IS x·2^k exactly; otherwise the endpoint collapses to the
      // widest bound and every comparison keeps the group. NULL stats make
      // the certificate NULL → CASE takes the widest branch (sound in
      // Catalyst eval and in Derby, where keep()'s IS NULL disjuncts also
      // fire). x >>> k: exact floor-div image once stats certify a
      // non-negative domain, else [0, 2^(width−k)−1].
      case ShiftRight(x, kl: Literal) =>
        (shiftWidth(x), integralLong(kl)) match {
          case (Some(w), Some(k)) if k >= 0 && k <= math.min(w - 1, 62) =>
            // |e >> k| <= |e|, so the cast back to the operand type (the
            // shift's own result type, keeping the stats-space tree
            // type-homogeneous with the literal on the other side) is safe
            val t = x.dataType
            interval(x).map(f =>
              Ival(Cast(floorShr(Cast(f.lo, LongType), k.toInt), t),
                Cast(floorShr(Cast(f.hi, LongType), k.toInt), t), f.refs))
          case _ => None
        }
      case ShiftLeft(x, kl: Literal) =>
        (shiftWidth(x), integralLong(kl)) match {
          case (Some(w), Some(k0)) if k0 >= 0 && k0 <= w - 2 =>
            interval(x).map { f =>
              val k = k0.toInt
              val t = x.dataType
              def tLit(v: Long) =
                if (t == IntegerType) Literal(v.toInt) else Literal(v)
              val loL = Cast(f.lo, LongType)
              val hiL = Cast(f.hi, LongType)
              val fits = And(
                GreaterThanOrEqual(loL, Literal(-(1L << (w - 1 - k)))),
                LessThanOrEqual(hiL, Literal((1L << (w - 1 - k)) - 1)))
              val d = Literal(1L << k)
              // the certified branch's product fits the operand type by
              // construction, so the narrowing cast cannot overflow
              Ival(
                CaseWhen(Seq((fits, Cast(Multiply(loL, d), t))),
                  Some(tLit(if (t == IntegerType) Int.MinValue.toLong else Long.MinValue))),
                CaseWhen(Seq((fits, Cast(Multiply(hiL, d), t))),
                  Some(tLit(if (t == IntegerType) Int.MaxValue.toLong else Long.MaxValue))),
                f.refs)
            }
          case _ => None
        }
      case ShiftRightUnsigned(x, kl: Literal) =>
        (shiftWidth(x), integralLong(kl)) match {
          case (Some(w), Some(k0)) if k0 >= 1 && k0 <= math.min(w - 1, 62) =>
            interval(x).map { f =>
              val k = k0.toInt
              val t = x.dataType
              def tLit(v: Long) =
                if (t == IntegerType) Literal(v.toInt) else Literal(v)
              val loL = Cast(f.lo, LongType)
              val hiL = Cast(f.hi, LongType)
              val nonNeg = GreaterThanOrEqual(loL, Literal(0L))
              val maxV = tLit(if (w == 32) (-1 >>> k).toLong else -1L >>> k)
              Ival(
                CaseWhen(Seq((nonNeg, Cast(floorShr(loL, k), t))), Some(tLit(0L))),
                CaseWhen(Seq((nonNeg, Cast(floorShr(hiL, k), t))), Some(maxV)),
                f.refs)
            }
          case _ => None
        }

      case _ => None // attr/attr division: unbounded (divisor may span 0)
    }

    /** Both sides as intervals, at least one consulting statistics (two
      * pure literals would be constant-folded upstream; rewriting them
      * here would add nothing). NaN literals never decompose. */
    def ivalPair(x: Expression, y: Expression): Option[(Ival, Ival)] =
      for {
        a <- interval(x)
        b <- interval(y)
        if a.refs.nonEmpty || b.refs.nonEmpty
      } yield (a, b)

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

      // a <=> lit : null-safe equality
      case EqualNullSafe(a, l: Literal) if attr(a).isDefined =>
        if (l.value == null) keep(GreaterThan(nullCountCol(attr(a).get), Literal(0L)))
        else rw(EqualTo(a, l))
      case EqualNullSafe(l: Literal, a) if attr(a).isDefined => rw(EqualNullSafe(a, l))
      // f(a) <=> lit for non-null lit is EqualTo for pruning purposes (the
      // null-vs-null case only ADDS matches when lit is null, handled
      // above for bare attrs) — delegating picks up both the interval
      // overlap AND the bloom term when f is a widening cast of a bloom
      // column (bloomAttr), closing the `CAST(k) <=> v` shape
      case EqualNullSafe(x, l: Literal) if l.value != null && !isNaN(l) &&
          ivalPair(x, l).isDefined =>
        rw(EqualTo(x, l))
      case EqualNullSafe(l: Literal, x) if l.value != null && !isNaN(l) &&
          ivalPair(x, l).isDefined =>
        rw(EqualTo(x, l))

      // interval comparisons — both sides decompose as interval images of
      // indexed statistics (a literal is the point interval [l, l], so
      // `f(a) cmp lit`, `lit cmp f(a)`, and `f(a) cmp g(b)` are all the
      // same rule):  x = y over-approximates as interval overlap;
      // x < y can hold only if lo(x) < hi(y), etc.
      // equality on a bloom-indexed column: the usual min/max overlap AND
      // the per-row-group bloom might contain the key (BloomIndex; NULL
      // bloom ⇒ might match). IN / <=> / literal-first shapes delegate here.
      case EqualTo(x, l: Literal)
          if bloomAttr(x).isDefined && !isNaN(l) && l.value != null &&
            ivalPair(x, l).isDefined =>
        val (a, b) = ivalPair(x, l).get
        val range = And(
          keep(LessThanOrEqual(a.lo, b.hi)), keep(GreaterThanOrEqual(a.hi, b.lo)))
        bloomTerm(bloomAttr(x).get, l).map(t => And(range, t)).getOrElse(range)
      case EqualTo(l: Literal, x) if bloomAttr(x).isDefined =>
        rw(EqualTo(x, l))

      case EqualTo(x, y) if ivalPair(x, y).isDefined =>
        val (a, b) = ivalPair(x, y).get
        And(keep(LessThanOrEqual(a.lo, b.hi)), keep(GreaterThanOrEqual(a.hi, b.lo)))
      case LessThan(x, y) if ivalPair(x, y).isDefined =>
        val (a, b) = ivalPair(x, y).get
        keep(LessThan(a.lo, b.hi))
      case LessThanOrEqual(x, y) if ivalPair(x, y).isDefined =>
        val (a, b) = ivalPair(x, y).get
        keep(LessThanOrEqual(a.lo, b.hi))
      case GreaterThan(x, y) if ivalPair(x, y).isDefined =>
        val (a, b) = ivalPair(x, y).get
        keep(GreaterThan(a.hi, b.lo))
      case GreaterThanOrEqual(x, y) if ivalPair(x, y).isDefined =>
        val (a, b) = ivalPair(x, y).get
        keep(GreaterThanOrEqual(a.hi, b.lo))

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

      // a IN (l1, l2, …)  ⇒  OR of the equality rewrites (also fires for a
      // widening cast of a bloom column, so `CAST(k) IN (…)` keeps its
      // per-member bloom terms, and for any interval-decomposable operand
      // — r13: `CAST(ts AS DATE) IN (…)` via the monotone image)
      case In(a, values)
          if (attr(a).isDefined || bloomAttr(a).isDefined ||
            interval(a).exists(_.refs.nonEmpty)) &&
          values.nonEmpty && values.forall(_.isInstanceOf[Literal]) =>
        values.map(v => rw(EqualTo(a, v.asInstanceOf[Literal]))).reduce(Or)
      case InSet(a, hset)
          if (attr(a).isDefined || bloomAttr(a).isDefined ||
            interval(a).exists(_.refs.nonEmpty)) &&
          hset.nonEmpty && hset.size <= 256 =>
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
