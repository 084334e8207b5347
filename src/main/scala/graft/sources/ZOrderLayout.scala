package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the lakehouse data-layout
  * optimization (Delta OPTIMIZE ZORDER BY / Iceberg rewrite strategy
  * shape): interleave the bits of two dimension keys so that rows close
  * in BOTH dimensions land close on the curve, then range-partition and
  * sort the table by the curve position. Row groups then cover compact
  * rectangles of the 2-d key space, and the external stats index prunes
  * multi-column box predicates the way a single-column sort layout only
  * prunes its leading column — no reference analog (the reference never
  * rewrites layout); this composes with `IndexedParquet` pruning.
  *
  * Everything is pure codegen'd Catalyst expressions (shift/and/or — the
  * standard magic-number bit spreading), so the layout pass is a map +
  * one range-partitioning shuffle + a per-partition sort: exactly the
  * cost of any clustered write at 100 TB, and embarrassingly parallel.
  *
  * Production note: raw key values are interleaved (clamped to the low
  * 32 bits, negatives to 0). Skewed or floating-point dimensions should
  * be rank-binned to dense non-negative ints first; the curve math is
  * unchanged.
  */
object ZOrderLayout {

  private val SpreadSteps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of a non-negative long into the even bit
    * positions of a 64-bit value (Morton spreading, magic-number form). */
  def spreadBits(x: Column): Column =
    SpreadSteps.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  private def clamp32(c: Column): Column =
    greatest(c.cast("long"), lit(0L)) // negatives sort first as 0; 32-bit mask in spreadBits

  /** The Morton code of (a, b): a's bits in even positions, b's in odd. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(clamp32(a)).bitwiseOR(shiftleft(spreadBits(clamp32(b)), 1))

  /** Rewrite `df` as `numFiles` parquet files clustered on the z-curve of
    * (colA, colB), with bounded row groups so footer stats address
    * compact key-space rectangles. One shuffle (range partition by z) +
    * per-partition sort; the helper z column is dropped before write. */
  def write(df: DataFrame, colA: String, colB: String, dir: String,
      numFiles: Int, rowGroupRows: Int): Unit = {
    val z = zValue(col(colA), col(colB))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.row.count.limit", rowGroupRows.toString)
      .option("parquet.block.size", (4L * 1024 * 1024).toString)
      .parquet(dir)
  }
}
