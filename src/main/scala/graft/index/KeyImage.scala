package graft.index

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A MONOTONE image of an indexed column, used as a COMPUTED sort key in
  * top-k pruning (r11, SURVEY §8.8 limit (b)): `ORDER BY date_trunc('day',
  * ts) DESC, id DESC LIMIT k` — the time-bucketed latest-k shape — sorts
  * on an expression the catalog has no stats for. But for a monotone
  * non-decreasing image f, the image's per-row-group stats are DERIVED
  * from the underlying column's at plan time: min f = f(min), max f =
  * f(max), null count unchanged — no extra ingest, no shadow storage, and
  * exactly as fresh as the footer stats themselves. The planner maps
  * stats through [[apply]]; the catalog fast path wraps the stored stat
  * columns in [[derbySql]] (or falls back to the planner when it cannot
  * render the image).
  *
  * Soundness needs only monotonicity: every row r of a group satisfies
  * min ≤ r ≤ max, so f(min) ≤ f(r) ≤ f(max) — the derived bounds are
  * true bounds, and a frequency of rows AT the raw extreme is a lower
  * bound of rows at the image extreme (rows at max all map to f(max)),
  * so the dominant-slice certificate carries over unchanged.
  *
  * The reference's index answers only raw-column predicate pruning
  * (/root/reference/sqlx-sqlite/src/index.rs:102-176); computed sort
  * keys are an extension in the spirit of its "other indexes can be
  * added" note (index.rs:30-35).
  */
sealed trait KeyImage extends Serializable {
  /** Display id for route tags, e.g. `day`. */
  def id: String
  /** Indexed column types this image soundly consumes (the catalog's
    * storage encoding of each must be what [[apply]] expects). */
  def acceptsInput(dt: DataType): Boolean
  def resultType: DataType

  /** Catalog-encoding value of the underlying column → image value (in
    * the image's own catalog encoding). MUST be monotone non-decreasing
    * over the input's certified ordering. */
  def apply(v: Any): Any

  /** Derby SQL rendering of the image over a stats-column expression;
    * None = the catalog cannot render it and the caller must fall back
    * to planner-side pruning (still exact, one O(index) fetch). */
  def derbySql: Option[String => String]
}

object TruncTimestampImage {
  private val MicrosPerDay = 86400000000L

  /** Fixed width in microseconds for the modulus-renderable units, plus
    * the anchor offset added before the modulus (week truncates to
    * MONDAY; the epoch is a Thursday, so shifting by 3 days aligns the
    * week grid). Calendar units (month/quarter/year) have no fixed
    * width — planner-side only. */
  private val fixedWidth: Map[String, (Long, Long)] = Map(
    "microsecond" -> (1L, 0L),
    "millisecond" -> (1000L, 0L),
    "second" -> (1000000L, 0L),
    "minute" -> (60000000L, 0L),
    "hour" -> (3600000000L, 0L),
    "day" -> (MicrosPerDay, 0L),
    "dd" -> (MicrosPerDay, 0L),
    "week" -> (7L * MicrosPerDay, 3L * MicrosPerDay))

  /** The image for `date_trunc(unit, <timestamp col>)` under a UTC
    * session, or None when Spark itself rejects the unit. Monotonicity
    * holds because UTC is a fixed-offset zone (no DST fold where local
    * wall time runs backward); callers must verify the session timezone
    * before constructing one. */
  def forUnit(unit: String): Option[TruncTimestampImage] = {
    val level = DateTimeUtils.parseTruncLevel(UTF8String.fromString(unit))
    // Spark signals an unusable unit with a sentinel below the smallest
    // timestamp level; probe by truncating a known value — an invalid
    // level makes truncTimestamp throw or TruncTimestamp return null,
    // so mirror its validity via a defensive try
    try {
      DateTimeUtils.truncTimestamp(0L, level, java.time.ZoneOffset.UTC)
      Some(TruncTimestampImage(unit.toLowerCase(java.util.Locale.ROOT), level))
    } catch { case _: Throwable => None }
  }
}

/** `CAST(ts AS DATE)` as a sort key (r11): epoch micros → epoch days.
  * For TIMESTAMP_NTZ the micros ARE wall-clock micros, so the floor
  * division is the cast's own arithmetic regardless of zone; for
  * TIMESTAMP (LTZ) callers must verify the zero-offset session zone
  * first (the cast reads wall time in the session zone). Renders into
  * the catalog walk as a floor division over the stored BIGINT micros. */
case object CastDateImage extends KeyImage {
  private val DayMicros = 86400000000L
  def id: String = "date"
  def acceptsInput(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
  def resultType: DataType = DateType
  def apply(v: Any): Any =
    java.lang.Integer.valueOf(
      Math.floorDiv(v.asInstanceOf[java.lang.Number].longValue, DayMicros).toInt)
  def derbySql: Option[String => String] = Some { e =>
    // floor division for either sign: subtract the non-negative remainder
    // first, then the quotient is exact
    s"((($e) - MOD(MOD($e, $DayMicros) + $DayMicros, $DayMicros)) / $DayMicros)"
  }
}

/** See [[TruncTimestampImage.forUnit]]; `level` is Spark's parsed trunc
  * level so [[apply]] is literally the same `DateTimeUtils.truncTimestamp`
  * call the data-space `TruncTimestamp` expression evaluates. */
final case class TruncTimestampImage private (unit: String, level: Int)
    extends KeyImage {
  def id: String = unit
  /** Both timestamp flavors: the catalog stores each as BIGINT micros,
    * and an NTZ value's micros ARE its UTC wall-clock micros — under the
    * UTC session precondition, `date_trunc(cast(ntz AS timestamp))`
    * truncates exactly those micros, so the image is the same
    * arithmetic either way. */
  def acceptsInput(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
  def resultType: DataType = TimestampType

  def apply(v: Any): Any =
    java.lang.Long.valueOf(DateTimeUtils.truncTimestamp(
      v.asInstanceOf[java.lang.Number].longValue, level,
      java.time.ZoneOffset.UTC))

  def derbySql: Option[String => String] =
    TruncTimestampImage.fixedWidth.get(unit).map { case (w, anchor) =>
      (e: String) => {
        // floor-to-grid on BIGINT micros: x - ((x mod w) + w) mod w is the
        // non-negative remainder for either sign of x (Derby MOD follows
        // the dividend's sign), with the anchor shifting the grid origin
        val shifted = if (anchor == 0L) s"($e)" else s"($e + $anchor)"
        s"($shifted - MOD(MOD($shifted, $w) + $w, $w)${
          if (anchor == 0L) "" else s" - $anchor"})"
      }
    }
}
