package graft.index

import graft.sources.RowGroupSkipScan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.collection.immutable.SortedSet

/** Row-level key index — the reference's "more advanced" named extension
  * (/root/reference/sqlx-sqlite/src/index.rs:30-35: a precise key ->
  * (file, row_group) index instead of min/max ranges): for a chosen key
  * column, the exact posting list of row groups containing each distinct
  * key, stored as a lake-native parquet table sorted by key.
  *
  * Min/max pruning keeps a row group whenever the key falls inside its
  * range; the row-level index keeps it only if the key actually OCCURS —
  * for sparse keys inside wide ranges this is the difference between
  * scanning many row groups and scanning one.
  *
  * Scale notes: the index is built in one distributed pass (each row-group
  * split scans its own keys), is O(distinct keys x row groups containing
  * them), and lookups are a pushdown-filtered read of the (small, sorted)
  * index table — O(index), never O(data).
  */
object RowLevelIndex {

  /** Build the index for `keyCol` over the files in `plans` (one entry per
    * row group, from the stats index), writing to `indexDir`.
    *
    * ONE distributed job whose plan is O(1) in row-group count: a single
    * scan with one partition per row group (`mergeRuns=false`, pruned to
    * the key column), per-partition-distinct (key, partition-id) pairs, a
    * broadcast join against the tiny partition-id → (file, row_group)
    * mapping, and a range-partitioned sorted write (so point lookups
    * pushdown-prune index files by key min/max). A 100 TB table's ~10⁶ row
    * groups are just 10⁶ partitions of the one scan — no per-row-group
    * plan nodes, no single-task write.
    */
  def build(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      indexDir: String,
      withRowNumbers: Boolean = false): Unit = {
    buildPlan(spark, dir, plans, dataSchema, keyCol, withRowNumbers)
      .write.mode("overwrite").parquet(indexDir)
    writeCoverage(spark, indexDir, plans.map(_.fileName))
  }

  /** Coverage manifest: the DATA files this posting index was built over,
    * one name per line in `<indexDir>/_covered` (underscore-prefixed ⇒
    * invisible to parquet readers). Routing consults it so a STALE index
    * — built before an append or compaction changed the file set — can
    * only degrade to over-scan, never silently prune files it has no
    * postings for. Deriving coverage from the posting table itself would
    * be wrong: a file absent from the postings is indistinguishable from
    * a covered file whose keys are all null. */
  private def writeCoverage(
      spark: SparkSession, indexDir: String, fileNames: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "_covered")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fileNames.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Incremental build: postings for `newPlans` (files NOT yet covered)
    * appended to an existing posting table, manifest updated to the
    * union — O(new files) work, the streaming-sink maintenance path.
    * Appending doesn't preserve the table's global key sort, but lookups
    * are pushdown-filtered reads (sortedness only sharpens file pruning
    * within the index itself); a periodic [[build]] re-sorts. Replay-safe:
    * duplicate postings collapse in the lookup's per-file set union, and
    * postings for since-deleted files are never consulted (intersection
    * is keyed by the LIVE stats-plan file names). */
  def append(
      spark: SparkSession,
      dir: String,
      newPlans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      indexDir: String,
      withRowNumbers: Boolean = false): Unit = {
    if (newPlans.isEmpty) return
    buildPlan(spark, dir, newPlans, dataSchema, keyCol, withRowNumbers)
      .write.mode("append").parquet(indexDir)
    val prev = coveredFiles(spark, indexDir).getOrElse(Set.empty)
    writeCoverage(spark, indexDir,
      (prev ++ newPlans.map(_.fileName)).toSeq)
  }

  /** The coverage manifest's file-name set; None when the index predates
    * manifests (or it is unreadable) — callers must then treat coverage
    * as unknown and degrade. Read fresh each call: it is one tiny driver
    * read per planning pass (same order as the posting lookup itself) and
    * caching would miss a same-path rebuild. */
  def coveredFiles(spark: SparkSession, indexDir: String): Option[Set[String]] =
    try {
      val p = new org.apache.hadoop.fs.Path(indexDir, "_covered")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Some(new String(bytes, "UTF-8").split("\n").filter(_.nonEmpty).toSet)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The build dataflow, exposed for plan-shape assertions.
    *
    * `withRowNumbers=false` (default): one posting per DISTINCT
    * (key, row group) pair — compact (O(distinct keys × row groups
    * containing them)), the right shape for "which row groups hold this
    * key" routing.
    *
    * `withRowNumbers=true` (r14): the reference sketch's FULL shape — "a
    * key/value map from `id` to (file_name, row_group, row_number)"
    * (/root/reference/sqlx-sqlite/src/index.rs:30-35) — one posting per
    * ROW, `row_number` the row's ordinal WITHIN ITS FILE (the same
    * numbering Spark's `_metadata.row_index` exposes). O(rows) storage,
    * the standard cost of a precise secondary index; lookups via
    * [[pointQueryRows]] then select exact rows, not whole row groups.
    * The ordinal is reconstructed distributively: `mergeRuns=false`
    * makes partition-id ↔ row-group identity, the parquet reader yields
    * a split's rows in file order, and `monotonically_increasing_id`'s
    * documented layout (record number in the low 33 bits, reset per
    * partition) gives the position inside the group — added to the
    * group's first-row offset (cumulated from the catalog's per-group
    * row counts; no footer read). The scan pushes NO filters, so no
    * page is skipped and the ordinal is exact. */
  def buildPlan(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      withRowNumbers: Boolean = false): DataFrame = {
    import spark.implicits._
    val rgMeta = graft.plans.RowGroupScan.perRowGroupMeta(plans)
    val indexFiles = math.max(1, rgMeta.size / 64)
    val scan = RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
      mergeRuns = false, requiredCols = Seq(keyCol))
    if (withRowNumbers) {
      val firstRow = firstRowOffsets(plans).getOrElse(
        throw new IllegalArgumentException(
          "row-number build needs complete per-row-group row counts " +
            "(catalog rows missing for some groups)"))
      val meta = rgMeta.zipWithIndex
        .map { case ((f, rg), pid) => (pid, f, rg, firstRow((f, rg))) }
        .toDF("pid", "file_name", "row_group", "first_row")
      scan
        .select(col(keyCol).as("key"), spark_partition_id().as("pid"),
          monotonically_increasing_id()
            .bitwiseAND(lit((1L << 33) - 1)).as("pos"))
        .join(broadcast(meta), "pid")
        .select(col("key"), col("file_name"), col("row_group"),
          (col("first_row") + col("pos")).as("row_number"))
        .repartitionByRange(indexFiles, col("key"))
        .sortWithinPartitions("key")
    } else {
      val meta = rgMeta.zipWithIndex
        .map { case ((f, rg), pid) => (pid, f, rg) }
        .toDF("pid", "file_name", "row_group")
      scan
        .select(col(keyCol).as("key"), spark_partition_id().as("pid"))
        .distinct() // partial agg first: only distinct (key, rg) pairs shuffle
        .join(broadcast(meta), "pid")
        .select("key", "file_name", "row_group")
        .repartitionByRange(indexFiles, col("key"))
        .sortWithinPartitions("key")
    }
  }

  /** Within-file FIRST-ROW offset of every selected row group, cumulated
    * from the catalog's per-group row counts — None when any group of a
    * file (selected or not: the ordinal is a file-level position) is
    * missing its row count. */
  private def firstRowOffsets(
      plans: Seq[FileScanPlan]): Option[Map[(String, Int), Long]] = {
    val out = Map.newBuilder[(String, Int), Long]
    plans.foreach { p =>
      var acc = 0L
      (0 until p.rowGroupCount).foreach { rg =>
        if (p.scanRowGroups.contains(rg)) out += ((p.fileName, rg) -> acc)
        acc += (p.rowGroupRows.get(rg) match {
          case Some(n) => n
          case None if rg >= p.scanRowGroups.lastOption.getOrElse(-1) => 0L
          case None => return None // a gap below a selected group
        })
      }
    }
    Some(out.result())
  }

  /** Driver-side posting cap for [[lookup]]: past this many postings the
    * lookup degrades to the caller's full plan set instead of
    * materializing every posting on the driver. The index exists for
    * SELECTIVE keys — a key occurring in 100k+ row groups gains ~nothing
    * from precise postings (min/max pruning already bounds the scan), but
    * an uncapped collect on such a key would melt the driver at 100 TB.
    * 100k postings ≈ a few MB of (file, row_group) rows — safe. */
  val MaxPostings = 100000

  /** Raw posting sets for `keys` (OR-semantics: a row group survives if it
    * contains ANY of the keys — the IN-list shape). Pushdown-filtered read
    * of the index table; the driver collect is bounded by `maxPostings`.
    * None = overflow (some key is too hot for precise postings to pay off)
    * — callers must degrade to their stats-pruned plans. */
  def postings(
      spark: SparkSession,
      indexDir: String,
      keys: Seq[Any],
      maxPostings: Int = MaxPostings): Option[Map[String, SortedSet[Int]]] = {
    val rows = spark.read.parquet(indexDir)
      .filter(col("key").isin(keys: _*))
      .select("file_name", "row_group")
      .limit(maxPostings + 1) // +1: detect overflow without counting all
      .collect()
    if (rows.length > maxPostings) None
    else Some(rows
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getInt(1)).to(SortedSet)).toMap)
  }

  /** Posting sets for a BOUNDED key range [lower, upper] (inclusiveness
    * per flag) — the `k BETWEEN a AND b` routing shape. The posting table
    * is key-sorted parquet, so the range predicate pushes down to its
    * scan (only index files whose key min/max overlap the range are
    * read); (file, row_group) pairs are deduplicated BEFORE the cap so
    * `maxPostings` bounds distinct row groups, not per-key postings.
    * None = overflow (the range covers too much for precise postings to
    * pay off) — callers degrade to their stats-pruned plans. */
  def postingsRange(
      spark: SparkSession,
      indexDir: String,
      lower: Any, lowerInclusive: Boolean,
      upper: Any, upperInclusive: Boolean,
      maxPostings: Int = MaxPostings): Option[Map[String, SortedSet[Int]]] = {
    val lo = if (lowerInclusive) col("key") >= lit(lower) else col("key") > lit(lower)
    val hi = if (upperInclusive) col("key") <= lit(upper) else col("key") < lit(upper)
    val rows = spark.read.parquet(indexDir)
      .filter(lo && hi)
      .select("file_name", "row_group")
      .distinct() // many range keys share a row group — cap counts row groups
      .limit(maxPostings + 1) // +1: detect overflow without counting all
      .collect()
    if (rows.length > maxPostings) None
    else Some(rows
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getInt(1)).to(SortedSet)).toMap)
  }

  /** Posting lookup: which row groups contain `key`. The driver collect is
    * bounded by `maxPostings` with a full-plan fallback (over-scan, never
    * wrong). */
  def lookup(
      spark: SparkSession,
      indexDir: String,
      key: Any,
      statsPlans: Seq[FileScanPlan],
      maxPostings: Int = MaxPostings): Seq[FileScanPlan] =
    postings(spark, indexDir, Seq(key), maxPostings) match {
      case None => statsPlans
      case Some(hits) =>
        val byFile = statsPlans.map(p => p.fileName -> p).toMap
        hits.toSeq.sortBy(_._1).flatMap { case (f, rgs) =>
          byFile.get(f).map(p => p.copy(scanRowGroups = rgs))
        }
    }

  /** Point query through the row-level index: scan exactly the posting
    * row groups, re-apply the predicate. */
  /** Project `dataSchema` to `requiredCols` (+ `keyCol`, which the
    * re-applied predicate needs) in schema order; Nil = all columns. */
  private def requiredSchema(
      dataSchema: StructType, keyCol: String,
      requiredCols: Seq[String]): StructType =
    if (requiredCols.isEmpty) dataSchema
    else StructType(dataSchema.filter(f =>
      requiredCols.contains(f.name) || f.name == keyCol))

  def pointQuery(
      spark: SparkSession,
      dir: String,
      indexDir: String,
      statsPlans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      key: Any,
      requiredCols: Seq[String] = Nil): DataFrame = {
    val required = requiredSchema(dataSchema, keyCol, requiredCols)
    val plans = lookup(spark, indexDir, key, statsPlans)
    if (plans.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), required)
    else
      RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
          requiredCols = required.fieldNames.toSeq)
        .filter(col(keyCol) === lit(key))
  }

  /** Raw ROW-precision postings for `keys` (OR-semantics) from a
    * `withRowNumbers=true` index: per file, the (row_group, within-file
    * row_number) pairs where ANY of the keys occurs. None = the index
    * has no row_number column (built compact), or the key set is too hot
    * for the driver-side cap — callers degrade to [[pointQuery]]/rg-level
    * routing. */
  def postingsRows(
      spark: SparkSession,
      indexDir: String,
      keys: Seq[Any],
      maxPostings: Int = MaxPostings): Option[Map[String, Seq[(Int, Long)]]] = {
    val pq = spark.read.parquet(indexDir)
    if (!pq.schema.fieldNames.contains("row_number")) return None
    val rows = pq.filter(col("key").isin(keys: _*))
      .select("file_name", "row_group", "row_number")
      .limit(maxPostings + 1)
      .collect()
    if (rows.length > maxPostings) None
    else Some(rows
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSeq).toMap)
  }

  /** Point query at the reference sketch's ROW-NUMBER precision
    * (/root/reference/sqlx-sqlite/src/index.rs:30-35): the posting rows
    * name the exact (file, row_group, row_number) locations, the scan
    * reads ONLY the posting row groups (byte-range splits), and a
    * broadcast semi-join on the reconstructed within-file ordinal keeps
    * exactly the posting rows — selection precision is the ROW, not the
    * row group. The decode unit remains the row group (Spark's parquet
    * reader has no public sub-group seam; pushing the key predicate
    * would enable page skipping but breaks ordinal reconstruction, so
    * this path pushes nothing and [[pointQuery]] stays the page-skip
    * route when the predicate itself is pushable). The key predicate is
    * re-applied above as stale-index defense — same degrade contract as
    * [[lookup]]. Falls back to [[pointQuery]] when the index carries no
    * row numbers, the key overflows the posting cap, or the catalog
    * lacks the row counts the ordinal needs. */
  def pointQueryRows(
      spark: SparkSession,
      dir: String,
      indexDir: String,
      statsPlans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      key: Any,
      maxPostings: Int = MaxPostings,
      requiredCols: Seq[String] = Nil): DataFrame =
    fetchRows(spark, dir, indexDir, statsPlans, dataSchema, keyCol,
      Seq(key), maxPostings, requiredCols)

  /** Multi-key row fetch — the "gather training examples by id" shape:
    * `keyCol IN (keys...)` served at ROW precision through a
    * `withRowNumbers=true` index. Same machinery as the single-key
    * [[pointQueryRows]]: byte-range scan of only the posting row groups,
    * broadcast semi-join on the reconstructed within-file ordinal, key
    * predicate re-applied above as stale-index defense (a replayed
    * streaming batch can leave stale postings for a SAME-NAME rewritten
    * file: those only ADD candidate positions — the fresh postings are
    * complete, so true matches are never missed, and the key filter
    * drops any stale position whose current row doesn't match).
    * Degrades: no row_number column or a too-hot key set falls to
    * rg-level postings (over-scan + filter); posting overflow there
    * falls to the caller's full plans. */
  def fetchRows(
      spark: SparkSession,
      dir: String,
      indexDir: String,
      statsPlans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      keys: Seq[Any],
      maxPostings: Int = MaxPostings,
      requiredCols: Seq[String] = Nil): DataFrame = {
    val required = requiredSchema(dataSchema, keyCol, requiredCols)
    def empty() = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), required)
    val byFile = statsPlans.map(p => p.fileName -> p).toMap
    def fallback(): DataFrame = {
      val plans = postings(spark, indexDir, keys, maxPostings) match {
        case None => statsPlans // over-scan, never wrong
        case Some(hits) => hits.toSeq.sortBy(_._1).flatMap { case (f, rgs) =>
          byFile.get(f).map(p => p.copy(scanRowGroups = rgs))
        }
      }
      if (plans.isEmpty) empty()
      else RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
          requiredCols = required.fieldNames.toSeq)
        .filter(col(keyCol).isin(keys: _*))
    }
    postingsRows(spark, indexDir, keys, maxPostings) match {
      case None => fallback()
      case Some(hits) if hits.isEmpty => empty()
      case Some(hits) =>
        val plans = hits.toSeq.sortBy(_._1).flatMap { case (f, prs) =>
          byFile.get(f).flatMap { p =>
            // stale-index defense, planning side: a same-name rewritten
            // file can leave postings for row groups the current file no
            // longer has. firstRowOffsets enumerates 0 until rowGroupCount,
            // so such a group would miss its offset and throw at planning —
            // drop it instead (fresh postings are complete, so no true
            // match is lost; the key filter below handles stale POSITIONS
            // inside live groups).
            val live = prs.map(_._1).filter(_ < p.rowGroupCount)
            if (live.isEmpty) None
            else Some(p.copy(scanRowGroups = SortedSet.from(live)))
          }
        }
        if (plans.isEmpty) return empty()
        val firstRow = firstRowOffsets(plans).getOrElse(return fallback())
        import spark.implicits._
        val rgMeta = graft.plans.RowGroupScan.perRowGroupMeta(plans)
        val meta = rgMeta.zipWithIndex
          .map { case ((f, rg), pid) => (pid, f, firstRow((f, rg))) }
          .toDF("__pid", "__file", "__first_row")
        val posting = hits.toSeq
          .flatMap { case (f, prs) => prs.map { case (_, rn) => (f, rn) } }
          .toDF("__pfile", "__prn")
        // ordinal reconstruction: same contract as the build — one
        // partition per row group, rows in file order, NO pushed filters
        RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
            mergeRuns = false, requiredCols = required.fieldNames.toSeq)
          .withColumn("__pid", spark_partition_id())
          .withColumn("__pos", monotonically_increasing_id()
            .bitwiseAND(lit((1L << 33) - 1)))
          .join(broadcast(meta), "__pid")
          .withColumn("__rn", col("__first_row") + col("__pos"))
          .join(broadcast(posting),
            col("__file") === col("__pfile") && col("__rn") === col("__prn"),
            "leftsemi")
          .filter(col(keyCol).isin(keys: _*)) // stale-index defense
          .select(required.fieldNames.map(col).toIndexedSeq: _*)
    }
  }
}
