package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the lakehouse data-layout
  * optimization (Delta OPTIMIZE ZORDER BY / Iceberg rewrite strategy
  * shape): interleave the bits of N dimension keys so that rows close in
  * ALL dimensions land close on the curve, then range-partition and sort
  * the table by the curve position. Row groups then cover compact
  * hyper-rectangles of the N-d key space, and the external stats index
  * prunes multi-column box predicates the way a single-column sort layout
  * only prunes its leading column — no reference analog (the reference
  * never rewrites layout); this composes with `IndexedParquet` pruning.
  *
  * Everything is pure codegen'd Catalyst expressions (shift/and/or bit
  * spreading), so the layout pass is a map + one range-partitioning
  * shuffle + a per-partition sort: exactly the cost of any clustered
  * write at 100 TB, and embarrassingly parallel.
  *
  * Each of N dimensions gets a 64/N-bit budget; raw values saturate into
  * it (negatives to 0, overflow to the budget max — order-preserving,
  * never wrap-around). Skewed or floating-point dimensions are rank-binned
  * to dense non-negative ints first ([[rankBoundaries]] + [[rankBin]]:
  * one approx-quantile pass, then a map-only bucket assignment), which
  * both fits any domain into the bit budget and equalizes occupancy along
  * the curve; the curve math is unchanged.
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

  /** Spread the low `bits` bits of a non-negative long with stride `n`:
    * bit i lands at position i*n. Stride 2 takes the 5-step magic-number
    * path; general strides are a fold of `bits` single-bit moves — a
    * larger but still branch-free, pure-codegen expression (≤ 21 terms
    * for n=3, fewer as n grows). */
  def spreadBitsN(x: Column, n: Int, bits: Int): Column =
    if (n == 1) x
    else if (n == 2) spreadBits(x)
    else (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * n)
    }.reduce(_ bitwiseOR _)

  /** Saturate into [0, 2^bits): negatives sort first as 0, oversized
    * values as the budget max — clamping preserves order where masking
    * would wrap and scramble it. */
  private def clampBits(c: Column, bits: Int): Column =
    least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1L))

  /** The N-d Morton code: dimension i's bits occupy positions ≡ i (mod N),
    * each dimension budgeted 64/N bits. */
  def zValueN(dims: Seq[Column]): Column = {
    val n = dims.size
    require(n >= 1 && n <= 8, s"z-order supports 1..8 dimensions, got $n")
    val bits = 64 / n
    dims.zipWithIndex.map { case (c, i) =>
      shiftleft(spreadBitsN(clampBits(c, bits), n, bits), i)
    }.reduce(_ bitwiseOR _)
  }

  /** The Morton code of (a, b): a's bits in even positions, b's in odd. */
  def zValue(a: Column, b: Column): Column = zValueN(Seq(a, b))

  /** Rank-bin cut points for a skewed or floating-point dimension:
    * `bins - 1` approximate quantiles — ONE aggregation pass over the
    * column (Greenwald–Khanna sketch under `approxQuantile`, mergeable
    * per-partition state), O(bins) driver result. Duplicate cut points
    * (heavy hitters) collapse, so bins stay dense. */
  def rankBoundaries(df: DataFrame, colName: String, bins: Int): Seq[Double] = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    df.stat.approxQuantile(colName,
      (1 until bins).map(_.toDouble / bins).toArray, 0.001)
      .toSeq.distinct.sorted
  }

  /** Dense rank bin of a value: the count of cut points ≤ it — a codegen'd
    * fold over the inlined boundary array, map-only, no shuffle. Monotone
    * in the raw value, so footer min/max stats of the RAW column still
    * serve box predicates over the bin-clustered layout. NULLs sort first
    * (bin 0 alongside the smallest values). */
  def rankBin(c: Column, boundaries: Seq[Double]): Column =
    aggregate(
      typedlit(boundaries),
      lit(0L),
      (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L))

  /** Rewrite `df` as `numFiles` parquet files clustered on the z-curve of
    * `cols`, with bounded row groups so footer stats address compact
    * key-space boxes. Columns listed in `rankBins` are rank-binned to that
    * many dense buckets first (use for floats and skewed ints). One
    * quantile pass per rank-binned column, then one shuffle (range
    * partition by z) + per-partition sort; helper columns never hit disk. */
  def writeN(df: DataFrame, cols: Seq[String], dir: String,
      numFiles: Int, rowGroupRows: Int,
      rankBins: Map[String, Int] = Map.empty): Unit = {
    val dims = cols.map { name =>
      rankBins.get(name) match {
        case Some(b) => rankBin(col(name), rankBoundaries(df, name, b))
        case None    => col(name)
      }
    }
    df.withColumn("__z", zValueN(dims))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.row.count.limit", rowGroupRows.toString)
      .option("parquet.block.size", (4L * 1024 * 1024).toString)
      .parquet(dir)
  }

  /** 2-column convenience wrapper (the original surface). */
  def write(df: DataFrame, colA: String, colB: String, dir: String,
      numFiles: Int, rowGroupRows: Int): Unit =
    writeN(df, Seq(colA, colB), dir, numFiles, rowGroupRows)
}
