package graft.prune

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Prints a *stats-space* predicate (the output shapes of
  * [[StatsPredicateRewriter]]) as a Derby SQL boolean expression.
  *
  * Re-expresses the reference's PhysicalExpr→sea-query translation
  * (/root/reference/sqlx-sqlite/src/conversions.rs:10-85) against Derby's
  * dialect. Same conservative contract: anything unprintable becomes the
  * constant TRUE (never under-scan, `conversions.rs:32`).
  *
  * Derby quirk: comparison predicates are not value expressions, so
  * `COALESCE(pred, TRUE)` is illegal. The `keep()` wrapper from the
  * rewriter is printed as `(attr IS NULL OR … OR pred)` over every stats
  * attribute referenced — a sound over-approximation of "NULL stats must
  * not prune".
  */
object ExprToDerbySql {

  def print(e: Expression): String = e match {
    // keep(pred): NULL stats ⇒ scan
    case Coalesce(Seq(inner, Literal(true, BooleanType))) =>
      val attrs = inner.collect { case a: UnresolvedAttribute => a.name }.distinct
      val nulls = attrs.map(a => s"rg.$a IS NULL")
      // a NULL-else CASE endpoint (the division sign certificate) can make
      // the comparison UNKNOWN even with non-NULL stats; Derby's WHERE
      // drops UNKNOWN rows, so the plain rendering would under-scan. Guard
      // with a value-level CASE that maps UNKNOWN to keep: only TRUE/FALSE
      // verdicts of the predicate itself can prune.
      val body =
        if (inner.exists { case c: CaseWhen => c.elseValue.isEmpty; case _ => false }) {
          val p = print(inner)
          s"CASE WHEN $p THEN 1 WHEN NOT ($p) THEN 0 ELSE 1 END = 1"
        } else print(inner)
      "(" + (nulls :+ body).mkString(" OR ") + ")"

    // in-catalog bloom probe (BloomIndex): NULL bloom (not yet attached,
    // or row group predates the bloom build) must keep the row group
    case BloomMightContain(c, probe) =>
      val call = probe match {
        case scala.util.Left(v)  => s"GRAFT_BLOOM_LONG(rg.${c}_bloom, $v)"
        case scala.util.Right(s) => s"GRAFT_BLOOM_STR(rg.${c}_bloom, ${sqlString(s)})"
      }
      s"(rg.${c}_bloom IS NULL OR $call = 1)"

    case And(l, r) => s"(${print(l)} AND ${print(r)})"
    case Or(l, r)  => s"(${print(l)} OR ${print(r)})"
    case Not(c)    => s"(NOT ${print(c)})"

    case EqualTo(l, r)            => s"(${print(l)} = ${print(r)})"
    case LessThan(l, r)           => s"(${print(l)} < ${print(r)})"
    case LessThanOrEqual(l, r)    => s"(${print(l)} <= ${print(r)})"
    case GreaterThan(l, r)        => s"(${print(l)} > ${print(r)})"
    case GreaterThanOrEqual(l, r) => s"(${print(l)} >= ${print(r)})"

    // affine stats-space arithmetic (from the rewriter's interval images)
    case Add(l, r, _)      => s"(${print(l)} + ${print(r)})"
    case Subtract(l, r, _) => s"(${print(l)} - ${print(r)})"
    case Multiply(l, r, _) => s"(${print(l)} * ${print(r)})"
    case Divide(l, r, _)   => s"(${print(l)} / ${print(r)})"
    // BIGINT '/' in Derby truncates toward zero, matching IntegralDivide;
    // the rewriter emits it either with non-negative numerators (modulo)
    // or inside floorShr's negative-offset CASE, where truncation-toward-
    // zero is exactly the intended floor
    case d: IntegralDivide => s"(${print(d.left)} / ${print(d.right)})"
    case UnaryMinus(c, _)  => s"(- ${print(c)})"

    // 4-corner interval products from the rewriter: Derby has no
    // LEAST/GREATEST, so fold as nested CASE. NULL corners take the ELSE
    // branch (wrong value), which is safe only because `keep()` above ORs
    // an IS NULL disjunct for every referenced stats column — the CASE
    // chain's value is never consulted when any input is NULL.
    // value-level CASE from the shift translation (floorShr, the <<
    // overflow certificate, the >>> sign certificate). A NULL condition
    // falls through to the ELSE branch in both Derby and Catalyst — the
    // ELSE is always the conservative (widest) bound there.
    case CaseWhen(branches, elseValue) =>
      val whens = branches
        .map { case (c, v) => s"WHEN ${print(c)} THEN ${print(v)}" }
      s"CASE ${whens.mkString(" ")} ELSE ${elseValue.map(print).getOrElse("NULL")} END"

    case Least(children) =>
      children.map(print).reduce((a, b) =>
        s"CASE WHEN $a <= $b THEN $a ELSE $b END")
    case Greatest(children) =>
      children.map(print).reduce((a, b) =>
        s"CASE WHEN $a >= $b THEN $a ELSE $b END")

    case Cast(c, dt, _, _) =>
      val t = dt match {
        case ShortType   => "SMALLINT"
        case IntegerType => "INTEGER"
        case LongType    => "BIGINT"
        case FloatType   => "REAL"
        case DoubleType  => "DOUBLE"
        case _           => return "TRUE" // unprintable target: conservative
      }
      s"CAST(${print(c)} AS $t)"

    // monotone-image application over a stats column (r13): the image
    // carries its own Derby rendering; construction is gated on it, so a
    // missing rendering here is a rewriter bug — degrade to TRUE anyway
    case ImageRef(img, c) =>
      img.derbySql.map(f => f(print(c))).getOrElse(return "TRUE")

    case Substring(s, p, l) => s"SUBSTR(${print(s)}, ${print(p)}, ${print(l)})"
    // LIKE appears in the NOT-LIKE constant-group rewrite; only the
    // default backslash escape is ever emitted
    case Like(l, r @ Literal(_, StringType), '\\') =>
      s"(${print(l)} LIKE ${print(r)} ESCAPE '\\')"
    // value-level coalesce (e.g. COALESCE(null_count, 1)) is legal in Derby
    case Coalesce(children) => children.map(print).mkString("COALESCE(", ", ", ")")

    // every stats-space attribute lives in row_group_statistics; qualify so
    // the join with file_statistics (which also has row_count) is unambiguous
    case a: UnresolvedAttribute => "rg." + a.name

    case Literal(null, _)             => "NULL"
    case Literal(true, BooleanType)   => "TRUE"
    case Literal(false, BooleanType)  => "FALSE"
    // Long.MinValue would print as -(9223372036854775808) — one past
    // Derby's positive BIGINT literal range — so print it as arithmetic
    case Literal(v: Long, LongType) if v == Long.MinValue =>
      "(-9223372036854775807 - 1)"
    case Literal(v, ByteType | ShortType | IntegerType | LongType) => v.toString
    case Literal(v: Float, FloatType) => floatLit(v.toDouble)
    case Literal(v: Double, DoubleType) => floatLit(v)
    case Literal(v: Decimal, _: DecimalType) => v.toString
    case Literal(s: UTF8String, StringType) => sqlString(s.toString)
    // timestamps/dates are stored as BIGINT micros / INTEGER days
    case Literal(v: Long, TimestampType | TimestampNTZType) => v.toString
    case Literal(v: Integer, DateType) => v.toString
    case Literal(b: Array[Byte], BinaryType) =>
      "X'" + b.map(x => f"$x%02x").mkString + "'"

    case _ => "TRUE" // unprintable ⇒ conservative
  }

  private def floatLit(d: Double): String =
    if (d.isNaN || d.isInfinite) "TRUE" // callers guard; belt-and-braces
    else {
      val s = d.toString
      if (s.contains("E") || s.contains("e") || s.contains(".")) s else s + ".0"
    }

  private def sqlString(s: String): String =
    "'" + s.replace("'", "''") + "'"
}
