package graft.prune

import graft.index.{FileScanPlan, StatsIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Catalog SEMI-JOIN pruning (r15) — dynamic partition pruning at row-group
  * granularity, the star-schema shape the reference's index design exists
  * for: `fact ⋈ dim ON fact.k = dim.k WHERE dim.selective` scans only the
  * fact row groups that might hold a surviving dim key.
  *
  * Spark's own DPP stops at the PARTITION directory: it materializes the
  * filtered dim side's join keys at planning time and prunes the fact
  * scan's partitions. This is the same protocol one level finer — the key
  * set is pruned against the external catalog's per-row-group statistics
  * (min/max containment, point probes, blooms), so an UNPARTITIONED but
  * clustered fact table gets the same skip. At 100 TB a fact table is
  * exactly that: range- or ingest-clustered on its key, millions of row
  * groups, no Hive partitioning on the join column.
  *
  * Exactness contract is the reference's Inexact pushdown (index.rs:102-
  * 176): pruning may over-scan, never under-scan — the caller re-applies
  * the REAL join on top, so false positives cost IO only. The dim side is
  * collected to the driver exactly like Spark's DPP subquery broadcast;
  * a key set past `maxKeys` degrades to the unpruned scan (route
  * "degrade-cardinality") rather than shipping an unbounded set through
  * the planner.
  *
  * Routes, in order:
  *  - "empty": zero keys ⇒ zero row groups (an inner/semi join with an
  *    empty build side is empty — this is exact, not a prune);
  *  - "in-probe" (≤ [[MaxProbeKeys]]): the key set rides the EXISTING
  *    pruning walk as `k IN (…)` — OR-of-points in stats space plus the
  *    in-catalog per-row-group bloom probes where built. One catalog
  *    round trip, O(survivors) transfer;
  *  - "envelope-refine" (≤ `maxKeys`): one `k BETWEEN min(keys) AND
  *    max(keys)` catalog walk bounds the candidates, then a planner-side
  *    binary search of each candidate group's [min, max] against the
  *    SORTED key set keeps only groups whose range contains ≥ 1 key —
  *    O(envelope survivors) catalog transfer ([[StatsIndex.rowGroupStatsFor]]
  *    is pushed into the store), O(groups × log keys) planner CPU;
  *  - "degrade-cardinality" / "degrade-type": unpruned plans (sound).
  *
  * Soundness seams mirror the interval engine's: a group with unknown
  * stats keeps; a truncated string minimum is a lower bound, which only
  * WIDENS the containment interval (keeps a superset); over-long string
  * maxima are stored NULL ⇒ the max side degrades to "∃ key ≥ min";
  * float/double keys are never pruned (NaN/signed-zero footer-stats
  * hazards, same exclusion as TopKPruning); an ALL-NULL group is skipped
  * outright — a NULL key equals nothing under `=`, so no semi-join row
  * can come from it (NULL dim keys are dropped from the probe set for
  * the same reason).
  */
object JoinPrune {

  /** Past this, the key set routes through one IN-probe catalog walk
    * (point stats + blooms); below it stays cheap to render. */
  val MaxProbeKeys = 128

  /** Default degrade threshold: a "dim side" bigger than this is not a
    * pruning opportunity, it is a real join — scan unpruned. Spark's own
    * DPP applies the same kind of bound through its broadcast threshold. */
  val DefaultMaxKeys = 65536

  /** One pruning decision, with observability the specs pin. */
  final case class Decision(
      plans: Seq[FileScanPlan],
      route: String,
      keyCount: Int,
      scannedGroups: Int,
      totalGroups: Int)

  /** Storage-space encoding of an EXTERNAL (collected) key value — the
    * seam documented on [[StatsIndex.minIndexedValue]]: integrals as
    * boxed numbers (compared via longValue), strings identity, dates as
    * epoch days, timestamps as epoch micros. None = this type cannot be
    * key-pruned (caller degrades). */
  private def encodeKey(dt: DataType, v: Any): Option[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(java.lang.Long.valueOf(v.asInstanceOf[Number].longValue))
    case StringType => Some(v.asInstanceOf[String])
    case DateType => v match {
      case d: java.sql.Date => Some(Int.box(DateTimeUtils.fromJavaDate(d)))
      case d: java.time.LocalDate => Some(Int.box(DateTimeUtils.localDateToDays(d)))
      case _ => None
    }
    case TimestampType => v match {
      case t: java.sql.Timestamp => Some(Long.box(DateTimeUtils.fromJavaTimestamp(t)))
      case i: java.time.Instant => Some(Long.box(DateTimeUtils.instantToMicros(i)))
      case _ => None
    }
    case _ => None
  }

  /** Prune `index`'s plans to the row groups that might contain a key of
    * `keys` in `colName`. `keys` are EXTERNAL (collected) values; nulls
    * must already be dropped. Always sound: every returned decision's
    * plan set is a superset of the row groups holding matching rows. */
  def prunePlans(
      spark: SparkSession,
      index: StatsIndex,
      dataSchema: StructType,
      colName: String,
      keys: Seq[Any],
      maxKeys: Int = DefaultMaxKeys): Decision = {
    // observability total via the O(1) count — fetching allFiles' plan
    // rows here would itself be the O(catalog) walk this prune avoids;
    // the degrade routes fetch them because the SCAN then needs them
    val totalGroups = index.catalogCounts().map(_._2.toInt).getOrElse(-1)
    def decision(plans: Seq[FileScanPlan], route: String) =
      Decision(plans, route, keys.size,
        plans.map(_.scanRowGroups.size).sum, totalGroups)

    if (keys.isEmpty) return decision(Nil, "empty")
    if (keys.size > maxKeys)
      return decision(index.allFiles(), "degrade-cardinality")

    val dt = dataSchema(colName).dataType
    val ord = TopKPruning.ordering(dt)
    val encoded = keys.map(encodeKey(dt, _))
    if (ord.isEmpty || encoded.exists(_.isEmpty))
      return decision(index.allFiles(), "degrade-type")

    if (keys.size <= MaxProbeKeys) {
      // the existing pruning walk already does point-interval union AND
      // in-catalog bloom probes for IN-lists — reuse it wholesale. Its
      // NULL-stats-keep semantics are those of a general predicate; a
      // semi-join on `=` additionally knows an all-NULL group matches
      // nothing — the conjoined IsNotNull rewrites to exactly that
      // (`null_count < row_count`, keep-on-unknown), so ONE catalog round
      // trip answers what r15/r16 paid a walk PLUS an O(survivors) stats
      // fetch for (the driver-observed serial cost of this family).
      // Keys are SORTED (storage-space order): the key set reaches this
      // point via `.distinct().collect()`, whose row order varies run to
      // run — identical key sets would otherwise render different catalog
      // SQL texts and defeat the store's statement/plan cache on every
      // repeated probe.
      implicit val o: Ordering[Any] = ord.get
      val sortedKeys = keys.distinct.sortBy(encodeKey(dt, _).get)
      val pred = graft.sources.RowGroupSkipScan.resolvePredicate(
        spark, dataSchema,
        col(colName).isin(sortedKeys: _*) && col(colName).isNotNull)
      return decision(index.getFiles(pred), "in-probe")
    }

    implicit val o: Ordering[Any] = ord.get
    val sorted: Array[AnyRef] =
      encoded.map(_.get).distinct.sorted.map(_.asInstanceOf[AnyRef]).toArray
    val cmp = o.asInstanceOf[java.util.Comparator[AnyRef]]
    // envelope walk: one catalog round trip narrows to groups whose range
    // intersects [min(keys), max(keys)] (external values render fine as
    // Column literals — they ARE the external type)
    val extKeys = keys.sortBy(encodeKey(dt, _).get)
    val envelope = col(colName) >= extKeys.head && col(colName) <= extKeys.last
    val pred = graft.sources.RowGroupSkipScan.resolvePredicate(
      spark, dataSchema, envelope)
    val candidates = index.getFiles(pred)

    index.rowGroupStatsFor(colName, candidates.map(_.fileName).toSet) match {
      case None =>
        // catalog cannot serve per-group stats — the envelope walk alone
        // already pruned soundly; keep its result
        decision(candidates, "envelope-only")
      case Some(stats) =>
        val byGroup = stats.map(s => (s.fileName, s.rowGroup) -> s).toMap
        def containsAKey(lo: Option[Any], hi: Option[Any]): Boolean = {
          // first key ≥ lo (all keys when lo unknown)
          val from = lo match {
            case None => 0
            case Some(l) =>
              val i = java.util.Arrays.binarySearch(
                sorted, l.asInstanceOf[AnyRef], cmp)
              if (i >= 0) i else -(i + 1)
          }
          if (from >= sorted.length) return false
          hi match {
            case None => true
            case Some(h) => o.lteq(sorted(from), h)
          }
        }
        val refined = candidates.flatMap { p =>
          val keep = p.scanRowGroups.filter { rg =>
            byGroup.get((p.fileName, rg)) match {
              case None => true // group unknown to the stats fetch — keep
              case Some(st) =>
                if (st.nullCount.contains(st.rowCount)) false // all-NULL: no key matches
                else containsAKey(st.min, st.max)
            }
          }
          if (keep.isEmpty) None else Some(p.copy(scanRowGroups = keep))
        }
        decision(refined, "envelope-refine")
    }
  }

  /** Full semi-join-pruned scan: collect the dim side's join keys (first
    * column of `dimKeys`, distinct, nulls dropped, bounded by
    * `maxKeys + 1` so an over-limit set degrades without an unbounded
    * collect), prune the fact's row groups, scan exactly those through
    * the byte-range leaf. The caller applies the EXACT join on top —
    * this returns (scan, decision), the Inexact contract. */
  def semiJoinScan(
      spark: SparkSession,
      dir: String,
      index: StatsIndex,
      dataSchema: StructType,
      colName: String,
      dimKeys: DataFrame,
      maxKeys: Int = DefaultMaxKeys,
      requiredCols: Seq[String] = Nil): (DataFrame, Decision) = {
    val keyCol = dimKeys.columns.head
    val collected = dimKeys
      .select(col(keyCol))
      .na.drop()
      .distinct()
      .limit(maxKeys + 1)
      .collect()
      .map(_.get(0))
      .toSeq
    val dec =
      if (collected.size > maxKeys)
        prunePlans(spark, index, dataSchema, colName, collected, maxKeys = 0)
          .copy(route = "degrade-cardinality")
      else prunePlans(spark, index, dataSchema, colName, collected, maxKeys)
    val df = graft.sources.RowGroupSkipScan.scan(
      spark, dir, dec.plans, dataSchema, requiredCols = requiredCols)
    (df, dec)
  }
}
