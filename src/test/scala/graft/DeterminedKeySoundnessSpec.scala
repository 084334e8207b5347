package graft

import graft.index.KeyImage
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Property pin for the r13 determined-part certificate
  * ([[graft.index.DeterminedConstKey]]): for ANY interval [mn, mx] of
  * raw timestamp micros, if `constantOf(mn, mx)` certifies a constant
  * `c`, then EVERY value in the interval evaluates the original
  * expression to exactly `c` — the certificate may fail closed (None)
  * as often as it likes, but it must never lie. Sweeps fixed-offset
  * zones (incl. the half-hour offset that mis-aligns hour grids),
  * NTZ and LTZ legs, and pre-1970 negative micros with sub-second
  * components — the classic floor-vs-truncate hazards. 500 random
  * intervals per (part, zone), log-uniform spans from ~100 µs to ~4
  * months so every grid granularity gets both certifying and
  * straddling samples. */
class DeterminedKeySoundnessSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260815L)

  test("a determined-part certificate never lies (500 intervals x parts x zones)") {
    val micros50y = 50L * 365 * 86400 * 1000000L
    for (zone <- Seq("UTC", "+05:30", "-08:00")) {
      val tzs = Option(zone)
      val ltz = AttributeReference("ts", TimestampType)()
      val ntz = AttributeReference("tn", TimestampNTZType)()
      def castD(a: AttributeReference) = Cast(a, DateType, tzs)
      def fmt(a: AttributeReference, p: String) =
        DateFormatClass(a, Literal(UTF8String.fromString(p), StringType), tzs)
      val parts: Seq[(String, AttributeReference, Expression)] = Seq(
        ("month", ltz, Month(castD(ltz))),
        ("quarter", ltz, Quarter(castD(ltz))),
        ("dayofweek", ltz, DayOfWeek(castD(ltz))),
        ("dayofmonth", ltz, DayOfMonth(castD(ltz))),
        ("dayofyear", ltz, DayOfYear(castD(ltz))),
        ("weekofyear", ltz, WeekOfYear(castD(ltz))),
        ("hour", ltz, Hour(ltz, tzs)),
        ("minute", ltz, Minute(ltz, tzs)),
        ("second", ltz, Second(ltz, tzs)),
        ("monthname", ltz, MonthName(castD(ltz))),
        ("dayname", ltz, DayName(castD(ltz))),
        ("last_day", ltz, LastDay(castD(ltz))),
        ("fmt-month", ltz, fmt(ltz, "yyyy-MM")),
        ("fmt-day", ltz, fmt(ltz, "yyyy-MM-dd (EEEE)")),
        ("fmt-hour", ltz, fmt(ltz, "yyyy-MM-dd HH")),
        ("fmt-ampm", ltz, fmt(ltz, "a")),
        ("month-ntz", ntz, Month(Cast(ntz, DateType, tzs))),
        ("hour-ntz", ntz, Hour(ntz, tzs)),
        // the analyzer serves date_format(ntz) via cast-to-instant at
        // the SAME zone — the recognizer's zone-equal NTZ shift branch
        ("fmt-day-ntz", ntz,
          DateFormatClass(Cast(ntz, TimestampType, tzs),
            Literal(UTF8String.fromString("yyyy-MM-dd")), tzs)),
        ("fmt-hour-ntz", ntz,
          DateFormatClass(Cast(ntz, TimestampType, tzs),
            Literal(UTF8String.fromString("yyyy-MM-dd HH")), tzs)))
      for ((tag, ar, e) <- parts) {
        val ck = KeyImage.constKeyOf(e, _ => true)
        assert(ck.isDefined, s"$tag @$zone: recognizer declined a fixed offset")
        val (kar, key) = ck.get
        assert(kar.exprId == ar.exprId, s"$tag @$zone: wrong leg")
        def evalAt(v: Long): Any = e.transformUp {
          case x: AttributeReference if x.exprId == ar.exprId =>
            Literal(java.lang.Long.valueOf(v), ar.dataType)
        }.eval(null)
        var certified = 0
        (1 to 500).foreach { _ =>
          val a = ((rnd.nextDouble() * 2 - 1) * micros50y).toLong
          val span = math.pow(10, 2 + rnd.nextDouble() * 11).toLong
          val mn = a
          val mx = a + span
          key.constantOf(java.lang.Long.valueOf(mn), java.lang.Long.valueOf(mx)) match {
            case Some(c) =>
              certified += 1
              (1 to 10).foreach { _ =>
                val v = mn + (rnd.nextDouble() * span).toLong
                val got = evalAt(v)
                assert(got == c,
                  s"$tag @$zone: [$mn,$mx] certified $c but micros $v evals $got")
              }
            case None => () // fail-closed is always sound
          }
        }
        assert(certified > 0, s"$tag @$zone never certified — vacuous sweep")
      }
    }
    // a GEOGRAPHIC zone must never reach the monotone/determined
    // machinery — since r14 it routes to the DST-piecewise certificate
    // (transition-checked per row group) instead of declining outright
    val ltz = AttributeReference("ts", TimestampType)()
    assert(KeyImage.fromDataExpr(
      Cast(ltz, DateType, Some("America/New_York")), _ => true).isEmpty,
      "geographic zones must stay out of the MONOTONE recognizer")
    Seq(
      Hour(ltz, Some("America/New_York")),
      Month(Cast(ltz, DateType, Some("America/New_York")))).foreach { e =>
      KeyImage.constKeyOf(e, _ => true) match {
        case Some((_, _: graft.index.PiecewiseZoneConstKey)) => ()
        case other => fail(s"geo zone should yield a piecewise key, got $other")
      }
    }
  }

  test("week-based date_format letters stay fail-closed (eval-throw pinned)") {
    // formatGranularity maps 'w'/'W'/'Y' to the DAY grid (a calendar day
    // always determines them — the grid is sound), but Spark 3+ rejects
    // week-based pattern letters at datetime-formatter construction, so
    // the rendered VALUE (always Spark's own eval) THROWS and every
    // Try-wrapped consumer (PartPrune.drops, the catalog fold) declines
    // the group — fail-closed, never a wrong fold. Pin the throw: a Spark
    // upgrade that silently starts evaluating week letters must surface
    // here, because the day grid's soundness for ISO week anchors would
    // then need review (week-year boundaries are locale/zone business).
    val tzs = Option("UTC")
    val ltz = AttributeReference("ts", TimestampType)()
    for (p <- Seq("w", "W", "YYYY-'X'ww")) {
      val e = DateFormatClass(
        ltz, Literal(UTF8String.fromString(p), StringType), tzs)
      val ck = KeyImage.constKeyOf(e, _ => true)
      assert(ck.isDefined, s"pattern $p: day-grid recognition regressed")
      val thrown = intercept[Throwable] {
        // one hour into 1970-01-01 — a within-day interval, so the grid
        // certifies and the value render is reached
        ck.get._2.constantOf(
          java.lang.Long.valueOf(3600000000L),
          java.lang.Long.valueOf(3600000001L))
      }
      // Spark 4 raises SparkUpgradeException (DATETIME_PATTERN_RECOGNITION,
      // "Fail to recognize 'w' pattern"); 3.x said "week-based patterns
      // are unsupported" — accept either phrasing, require the rejection
      val msg = Option(thrown.getMessage).getOrElse("").toLowerCase
      assert(msg.contains("week-based") ||
        (msg.contains("pattern") && msg.contains("fail to recognize")),
        s"pattern $p: expected Spark's week-letter rejection, got $thrown")
    }
  }
}
