package graft.index

import org.apache.spark.sql.types._

/** Catalog-served CLUSTERING HEALTH (r15) — the metric behind a
  * lakehouse OPTIMIZE/ZORDER advisor, computed from the stats catalog
  * alone (O(index) fetch + O(G log G) sweep, zero data jobs).
  *
  * For a column, the OVERLAP DEGREE of a row group is the number of row
  * groups (itself included) whose [min, max] range intersects its own —
  * exactly the number of groups a point lookup landing in that group's
  * range must also read, i.e. the column's READ AMPLIFICATION under
  * stats pruning. The table-level metric is the mean over groups:
  *  - ≈ 1: perfectly clustered (disjoint ranges — a point predicate
  *    reads one group);
  *  - ≈ G: unclustered (every group spans the domain — stats pruning is
  *    blind and every lookup reads everything);
  * and `1 / degree(col)` is a planning-grade estimate of the fraction
  * of the table a point predicate on `col` will scan.
  *
  * This is what decides a re-clustering pass: compaction/ZORDER on a
  * column pays off exactly when its degree is high AND the workload
  * filters on it. At 100 TB the advisor must not scan data to say so —
  * the catalog already knows.
  *
  * Sweep: with starts and ends sorted, group i intersects
  * |{j : start_j ≤ end_i}| − |{j : end_j < start_i}| groups — two
  * binary searches per group, O(G log G) total.
  *
  * Certification: every row group must carry BOTH bounds for the
  * column (an unknown range could overlap anything — fail closed with
  * None rather than understate amplification). All-NULL groups carry no
  * values a predicate can hit and are excluded from the metric. String
  * columns decline: a truncated minimum is a lower BOUND, and measuring
  * overlap on bounds would overstate health exactly on the wide groups
  * that matter. Supported: the numeric/temporal encodings whose stored
  * extremes are verbatim.
  */
object ClusterHealth {

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType => true
    case _ => false
  }

  /** Mean overlap degree of `colName`'s row-group ranges, with the
    * group count G for scale (degree ∈ [1, G]). None = cannot certify
    * (unsupported type, missing stats, empty table). */
  def overlapDegree(index: StatsIndex, colName: String)
      : Option[(Double, Int)] = {
    val dt = index.indexedSchema.fields
      .find(_.name == colName).map(_.dataType).getOrElse(return None)
    if (!supported(dt)) return None
    val stats = index.rowGroupStats(colName).getOrElse(return None)
    // all-NULL groups hold nothing a predicate can hit; any OTHER group
    // missing a bound fails closed
    val ranged = stats.filterNot(s => s.nullCount.contains(s.rowCount))
    if (ranged.isEmpty) return None
    // endpoints compare in STORAGE space (r16): squeezing long-encoded
    // min/max (bigint, timestamp micros) through Double loses ULPs past
    // 2^53, which can collapse or reorder interval endpoints — exactly
    // the timestamp-clustered columns this advisor targets. Integrals /
    // temporals compare as longs; float/double (already doubles in the
    // catalog) via the total IEEE order.
    val cmp: java.util.Comparator[Any] = dt match {
      case FloatType | DoubleType =>
        (a: Any, b: Any) => java.lang.Double.compare(
          a.asInstanceOf[Number].doubleValue, b.asInstanceOf[Number].doubleValue)
      case _ =>
        (a: Any, b: Any) => java.lang.Long.compare(
          a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
    }
    val ivsOpt = ranged.map { s =>
      for (lo <- s.min.collect { case n: java.lang.Number => n: Any };
           hi <- s.max.collect { case n: java.lang.Number => n: Any })
        yield (lo, hi)
    }
    if (ivsOpt.exists(_.isEmpty)) return None
    val ivs = ivsOpt.map(_.get)
    val starts = ivs.map(_._1).sortWith(cmp.compare(_, _) < 0).toArray
    val ends = ivs.map(_._2).sortWith(cmp.compare(_, _) < 0).toArray
    def countLeq(arr: Array[Any], v: Any): Int = {
      // first index with arr(i) > v
      var lo = 0; var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp.compare(arr(mid), v) <= 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    def countLt(arr: Array[Any], v: Any): Int = {
      var lo = 0; var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp.compare(arr(mid), v) < 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    val total = ivs.iterator.map { case (lo, hi) =>
      (countLeq(starts, hi) - countLt(ends, lo)).toLong
    }.sum
    Some((total.toDouble / ivs.size, ivs.size))
  }

  /** The advisor verdict: does a point-predicate workload on `colName`
    * want a re-clustering pass? True when the mean overlap degree
    * exceeds `threshold` (default: lookups read > 4 groups' worth). */
  def wantsRecluster(
      index: StatsIndex, colName: String, threshold: Double = 4.0)
      : Option[Boolean] =
    overlapDegree(index, colName).map(_._1 > threshold)
}
