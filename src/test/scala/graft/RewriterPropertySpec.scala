package graft

import graft.prune.StatsPredicateRewriter
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the stats-space rewrite (SURVEY.md §5): for
  * randomly generated row-group statistics and predicate shapes, ANY value
  * the row group can contain that satisfies the data predicate forces the
  * rewritten stats predicate to keep the group — soundness, checked at the
  * raw Catalyst expression level (substitute + eval, no Spark jobs).
  */
class RewriterPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  private val attr = AttributeReference("k", IntegerType, nullable = true)()

  /** Substitute stats columns / the data attribute with literals, eval. */
  private def evalWith(e: Expression, bind: Map[String, Any]): Any = {
    val bound = e.transformUp {
      case u: UnresolvedAttribute =>
        Literal.create(bind(u.name), if (u.name == "row_count" || u.name.endsWith("_null_count")) LongType else IntegerType)
      case a: AttributeReference if bind.contains(a.name) =>
        Literal.create(bind(a.name), IntegerType)
    }
    bound.eval(InternalRow.empty)
  }
  private val InternalRow = org.apache.spark.sql.catalyst.InternalRow

  private val genLit: Gen[Int] = Gen.chooseNum(-50, 150)

  private val genPred: Gen[Expression] = {
    def cmp: Gen[Expression] = for {
      l <- genLit
      k <- Gen.chooseNum(2, 9)
      shape <- Gen.oneOf(0 to 12)
    } yield shape match {
      case 0 => EqualTo(attr, Literal(l))
      case 1 => LessThan(attr, Literal(l))
      case 2 => GreaterThan(attr, Literal(l))
      case 3 => LessThanOrEqual(attr, Literal(l))
      case 4 => GreaterThanOrEqual(attr, Literal(l))
      case 5 => EqualTo(Add(attr, Literal(7)), Literal(l))
      case 6 => LessThan(Multiply(attr, Literal(-3)), Literal(l))
      case 7 => In(attr, Seq(Literal(l), Literal(l + 3), Literal(l - 11)))
      case 8 => EqualTo(Remainder(attr, Literal(k)), Literal(l % 13 - 3))
      case 9 => EqualTo(Pmod(attr, Literal(k)), Literal(l % 13 - 3))
      // bit shifts: >> is floor division (every sign exercised by the
      // -40..120 stats domain); << certifies overflow-freedom; >>>
      // certifies a non-negative domain
      case 10 => LessThanOrEqual(ShiftRight(attr, Literal(k % 4)), Literal(l / 4))
      case 11 => GreaterThan(ShiftLeft(attr, Literal(k % 3)), Literal(l))
      case 12 => EqualTo(ShiftRightUnsigned(attr, Literal(1 + k % 3)), Literal(l / 2))
    }
    // CASE shapes, both as authored and as the optimizer canonicalizes
    // them (boolean CaseWhen, `p <=> true`, `NOT (p <=> true)`)
    def caseShape: Gen[Expression] = for {
      p1 <- cmp; p2 <- cmp
      kind <- Gen.oneOf(0 to 4)
    } yield kind match {
      case 0 => EqualTo(
        CaseWhen(Seq((p1, Literal("a")), (p2, Literal("b"))), Some(Literal("c"))),
        Literal("b"))
      case 1 => Not(EqualTo(
        CaseWhen(Seq((p1, Literal("a"))), Some(Literal("c"))), Literal("a")))
      case 2 => EqualNullSafe(p1, Literal.TrueLiteral)
      case 3 => Not(EqualNullSafe(p1, Literal.TrueLiteral))
      case 4 => CaseWhen(Seq((p1, Literal.TrueLiteral)), Some(Literal.FalseLiteral))
    }
    for {
      a <- cmp; b <- cmp; c <- caseShape
      combined <- Gen.oneOf(a, And(a, b), Or(a, b), c, And(a, c))
    } yield combined
  }

  private case class Group(min: Int, max: Int, nullCount: Long, rowCount: Long)

  private val genGroup: Gen[Group] = for {
    a <- Gen.chooseNum(-40, 120)
    b <- Gen.chooseNum(-40, 120)
    rows <- Gen.chooseNum(1L, 100L)
    nulls <- Gen.chooseNum(0L, rows)
  } yield Group(math.min(a, b), math.max(a, b), nulls, rows)

  test("soundness: any in-range matching value implies the group is kept") {
    check(Prop.forAll(genPred, genGroup) { (pred, g) =>
      val stats = Map[String, Any](
        "k_min" -> g.min, "k_max" -> g.max,
        "k_null_count" -> g.nullCount, "row_count" -> g.rowCount)
      val rewritten = StatsPredicateRewriter.rewrite(pred, Set("k"))
      val kept = evalWith(rewritten, stats + ("k" -> 0)) == true
      // candidate values the group could contain
      val candidates: Seq[Any] =
        Seq(g.min, g.max, (g.min + g.max) / 2,
          g.min + 1, g.max - 1).filter(v =>
            v.asInstanceOf[Int] >= g.min && v.asInstanceOf[Int] <= g.max) ++
          (if (g.nullCount > 0) Seq(null) else Nil)
      val anyMatch = candidates.exists { v =>
        evalWith(pred, stats + ("k" -> v)) == true
      }
      // soundness: anyMatch -> kept (equivalently !anyMatch || kept)
      Prop(!anyMatch || kept) :| s"pred=$pred group=$g kept=$kept"
    }, minSuccessful = 500)
  }

  private val attrJ = AttributeReference("j", IntegerType, nullable = true)()

  test("soundness over two attributes: interval arithmetic keeps matching groups") {
    // attr-attr arithmetic parity with the reference's BinaryExpr
    // translation (conversions.rs:10-32 recurses both operands): sums,
    // differences, 4-corner products, and direct attr-vs-attr comparisons
    val genPair: Gen[Expression] = for {
      l <- genLit
      shape <- Gen.oneOf(0 to 9)
    } yield shape match {
      case 0 => LessThan(Add(attr, attrJ), Literal(l))
      case 1 => GreaterThan(Subtract(attr, attrJ), Literal(l))
      case 2 => EqualTo(Add(attr, attrJ), Literal(l))
      case 3 => LessThan(attr, attrJ)
      case 4 => GreaterThanOrEqual(Multiply(attr, attrJ), Literal(l))
      case 5 => LessThanOrEqual(
        Multiply(attr, Subtract(Literal(100), attrJ)), Literal(l))
      case 6 => EqualTo(Multiply(attr, attrJ), Literal(l))
      // attr/attr division: bounded only under the divisor-sign
      // certificate; the -40..120 stats domain exercises certified
      // (all-positive / all-negative) AND zero-straddling divisors.
      // LEGACY eval mode: the data-side eval must yield NULL (not throw)
      // on a zero divisor candidate.
      case 7 => GreaterThan(
        Divide(Cast(attr, DoubleType), Cast(attrJ, DoubleType), EvalMode.LEGACY),
        Literal(l.toDouble))
      case 8 => LessThan(
        Divide(Cast(attr, DoubleType), Cast(attrJ, DoubleType), EvalMode.LEGACY),
        Literal(l.toDouble / 2))
      case 9 => EqualTo(
        Divide(Cast(attrJ, DoubleType), Cast(attr, DoubleType), EvalMode.LEGACY),
        Literal(l.toDouble))
    }
    check(Prop.forAll(genPair, genGroup, genGroup) { (pred, gk, gj) =>
      val stats = Map[String, Any](
        "k_min" -> gk.min, "k_max" -> gk.max, "k_null_count" -> gk.nullCount,
        "j_min" -> gj.min, "j_max" -> gj.max, "j_null_count" -> gj.nullCount,
        "row_count" -> math.max(gk.rowCount, gj.rowCount))
      val rewritten = StatsPredicateRewriter.rewrite(pred, Set("k", "j"))
      val kept = evalWith(rewritten, stats ++ Map[String, Any]("k" -> 0, "j" -> 0)) == true
      val ks: Seq[Any] = Seq(gk.min, gk.max, (gk.min + gk.max) / 2) ++
        (if (gk.nullCount > 0) Seq(null) else Nil)
      val js: Seq[Any] = Seq(gj.min, gj.max, (gj.min + gj.max) / 2) ++
        (if (gj.nullCount > 0) Seq(null) else Nil)
      val anyMatch = ks.exists(kv => js.exists(jv =>
        evalWith(pred, stats ++ Map[String, Any]("k" -> kv, "j" -> jv)) == true))
      Prop(!anyMatch || kept) :| s"pred=$pred gk=$gk gj=$gj kept=$kept"
    }, minSuccessful = 500)
  }

  test("precision: attr-attr intervals prune unreachable targets") {
    val stats = Map[String, Any](
      "k_min" -> 10, "k_max" -> 20, "k_null_count" -> 0L,
      "j_min" -> 10, "j_max" -> 20, "j_null_count" -> 0L, "row_count" -> 50L)
    def kept(p: Expression) = evalWith(
      StatsPredicateRewriter.rewrite(p, Set("k", "j")),
      stats ++ Map[String, Any]("k" -> 0, "j" -> 0)) == true
    // sum range is [20, 40]
    assert(!kept(EqualTo(Add(attr, attrJ), Literal(100))))
    assert(kept(EqualTo(Add(attr, attrJ), Literal(30))))
    assert(!kept(LessThan(Add(attr, attrJ), Literal(20))))
    // product range is [100, 400]
    assert(!kept(GreaterThan(Multiply(attr, attrJ), Literal(400))))
    assert(kept(GreaterThan(Multiply(attr, attrJ), Literal(399))))
    // mixed-sign 4-corner: k in [-5, 5] x j in [10, 20] -> product [-100, 100]
    val mixed = Map[String, Any](
      "k_min" -> -5, "k_max" -> 5, "k_null_count" -> 0L,
      "j_min" -> 10, "j_max" -> 20, "j_null_count" -> 0L, "row_count" -> 50L)
    def keptM(p: Expression) = evalWith(
      StatsPredicateRewriter.rewrite(p, Set("k", "j")),
      mixed ++ Map[String, Any]("k" -> 0, "j" -> 0)) == true
    assert(!keptM(GreaterThan(Multiply(attr, attrJ), Literal(100))))
    assert(keptM(LessThan(Multiply(attr, attrJ), Literal(-99))))
    assert(!keptM(LessThan(Multiply(attr, attrJ), Literal(-100))))
    // attr vs attr: k in [10,20] can never exceed j in [30,40]
    val disjoint = Map[String, Any](
      "k_min" -> 10, "k_max" -> 20, "k_null_count" -> 0L,
      "j_min" -> 30, "j_max" -> 40, "j_null_count" -> 0L, "row_count" -> 50L)
    def keptD(p: Expression) = evalWith(
      StatsPredicateRewriter.rewrite(p, Set("k", "j")),
      disjoint ++ Map[String, Any]("k" -> 0, "j" -> 0)) == true
    assert(!keptD(GreaterThan(attr, attrJ)))
    assert(keptD(LessThan(attr, attrJ)))
  }

  test("precision: disjoint point predicate prunes the group") {
    val stats = Map[String, Any](
      "k_min" -> 10, "k_max" -> 20, "k_null_count" -> 0L, "row_count" -> 50L)
    val r1 = StatsPredicateRewriter.rewrite(EqualTo(attr, Literal(999)), Set("k"))
    assert(evalWith(r1, stats + ("k" -> 0)) != true)
    val r2 = StatsPredicateRewriter.rewrite(
      EqualTo(Add(attr, Literal(100)), Literal(115)), Set("k"))
    assert(evalWith(r2, stats + ("k" -> 0)) == true) // 15+100=115 in range
    val r3 = StatsPredicateRewriter.rewrite(
      EqualTo(Add(attr, Literal(100)), Literal(999)), Set("k"))
    assert(evalWith(r3, stats + ("k" -> 0)) != true)
  }

  test("precision: shifts prune; uncertifiable shifts keep") {
    val stats = Map[String, Any](
      "k_min" -> 16, "k_max" -> 31, "k_null_count" -> 0L, "row_count" -> 50L)
    def kept(p: Expression) = evalWith(
      StatsPredicateRewriter.rewrite(p, Set("k")),
      stats + ("k" -> 0)) == true
    // [16, 31] >> 3 = [2, 3]
    assert(!kept(EqualTo(ShiftRight(attr, Literal(3)), Literal(5))))
    assert(kept(EqualTo(ShiftRight(attr, Literal(3)), Literal(2))))
    assert(!kept(GreaterThan(ShiftRight(attr, Literal(3)), Literal(3))))
    // negative domain: [-40, -33] >> 3 = [-5, -5] (floor, not truncation)
    val neg = Map[String, Any](
      "k_min" -> -40, "k_max" -> -33, "k_null_count" -> 0L, "row_count" -> 50L)
    def keptN(p: Expression) = evalWith(
      StatsPredicateRewriter.rewrite(p, Set("k")),
      neg + ("k" -> 0)) == true
    assert(keptN(EqualTo(ShiftRight(attr, Literal(3)), Literal(-5))))
    assert(!keptN(EqualTo(ShiftRight(attr, Literal(3)), Literal(-4))))
    // [16, 31] << 2 = [64, 124], overflow-free by the stats certificate
    assert(!kept(LessThan(ShiftLeft(attr, Literal(2)), Literal(64))))
    assert(kept(LessThan(ShiftLeft(attr, Literal(2)), Literal(65))))
    // a group touching the int-overflow region cannot certify, and its
    // wrapped values really can go negative ((Int.MaxValue)<<4 = -16): the
    // uncertified image must widen to the full int range and keep
    val wide = Map[String, Any](
      "k_min" -> (Int.MaxValue - 10), "k_max" -> Int.MaxValue,
      "k_null_count" -> 0L, "row_count" -> 50L)
    assert(evalWith(
      StatsPredicateRewriter.rewrite(
        LessThan(ShiftLeft(attr, Literal(4)), Literal(0)), Set("k")),
      wide + ("k" -> 0)) == true)
    // while a certified group prunes the same comparison
    assert(!kept(LessThan(ShiftLeft(attr, Literal(4)), Literal(0))))
    // >>> on a certified non-negative domain = >>; on a possibly-negative
    // domain the image widens to [0, 2^(32-k)-1] and keeps
    assert(!kept(GreaterThan(ShiftRightUnsigned(attr, Literal(3)), Literal(3))))
    assert(keptN(EqualTo(ShiftRightUnsigned(attr, Literal(3)), Literal(1000))))
  }

  test("precision: modulo prunes groups narrower than the modulus") {
    val stats = Map[String, Any](
      "k_min" -> 10, "k_max" -> 12, "k_null_count" -> 0L, "row_count" -> 50L)
    def modEq(k: Int, c: Int) = StatsPredicateRewriter.rewrite(
      EqualTo(Remainder(attr, Literal(k)), Literal(c)), Set("k"))
    // [10,12] contains nothing ≡ 6 (mod 7): 6 < 10 < 13
    assert(evalWith(modEq(7, 6), stats + ("k" -> 0)) != true)
    // 11 ≡ 4 (mod 7) → keep
    assert(evalWith(modEq(7, 4), stats + ("k" -> 0)) == true)
    // c >= k is unreachable → prune even wide groups
    assert(evalWith(modEq(7, 9), stats + ("k" -> 0)) != true)
    // groups touching negatives are conservatively kept
    val negStats = Map[String, Any](
      "k_min" -> -5, "k_max" -> -2, "k_null_count" -> 0L, "row_count" -> 50L)
    assert(evalWith(modEq(7, 6), negStats + ("k" -> 0)) == true)
    // pmod with negative target is globally unreachable
    val p = StatsPredicateRewriter.rewrite(
      EqualTo(Pmod(attr, Literal(7)), Literal(-2)), Set("k"))
    assert(evalWith(p, negStats + ("k" -> 0)) != true)
  }
}
