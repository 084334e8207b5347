package graft.index

import graft.sources.RowGroupSkipScan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, spark_partition_id, when, xxhash64}
import org.apache.spark.sql.types._

import java.sql.DriverManager

/** Per-row-group HYPERLOGLOG ledger (r15) — the distinct-count member of
  * the optional shadow family ([[BloomIndex]] answers "is THIS value
  * here?", [[FreqShadow]] "how many rows at the extreme?", [[SumShadow]]
  * "what do the values add to?"; this one answers "how many DISTINCT
  * values?"). One dense HLL register array per (row group, column),
  * attached as a `{col}_hll` binary catalog column by a build pass shaped
  * exactly like the other shadows: one distributed job, one task per row
  * group, O(m) state per task, executor-side JDBC attach.
  *
  * Why per ROW GROUP and not one table sketch: registers merge by
  * byte-wise max (union semantics, associative/commutative/idempotent),
  * so the per-group grain composes with everything the catalog already
  * does — the NDV of ANY row-group subset (a pruned time slice, one
  * file, the whole table) is one merge over the selected rows' sketches,
  * O(selection × m) bytes through the planner and ZERO data jobs.
  * Idempotent re-index is free: re-ingesting a file deletes its catalog
  * rows, so stale sketches cannot survive a data change (rebuild after
  * re-index, like blooms); a replayed streaming batch re-attaches over
  * its own re-ingested rows.
  *
  * Estimator: classic HLL (Flajolet et al. 2007) over Spark's own
  * 64-bit `xxhash64` — m = 2^11 = 2048 registers (one byte each; 2 KB
  * per group), standard error 1.04/√m ≈ 2.3%. Small-range bias is
  * handled by linear counting below 2.5·m; the 64-bit hash makes the
  * large-range collision correction unnecessary at any real cardinality.
  * The hash is computed INSIDE the scan projection (codegen'd, null-safe
  * via a guard — xxhash64 of a NULL input would return the seed, which
  * must not count: COUNT(DISTINCT col) skips nulls and so does this).
  *
  * NOT an answer substitute: the estimate never replaces an exact
  * aggregate in a plan rewrite (fold == scan equality is the certificate
  * family's invariant, and an approximation can't hold it). It is an
  * explicit index-API capability — `StatsIndex.approxDistinct` — the
  * same opt-in posture as the row-level index's point lookups.
  */
object HllShadow {

  /** log2(register count): m = 2048 ⇒ rse ≈ 2.3%, 2 KB per sketch. */
  val P = 11
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  /** Hashable-and-meaningful set: the same family the freq shadow
    * certifies (integrals + date/timestamp encodings + strings);
    * float/double stay out (NaN/-0.0 equality semantics diverge from
    * COUNT DISTINCT's) and binary/decimal can be added when a query
    * needs them. */
  def supported(dt: DataType): Boolean = FreqShadow.supported(dt)

  /** Fold one 64-bit hash into a register array. */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val bucket = (hash >>> (64 - P)).toInt
    val w = hash << P
    // rho = leading-zero run of the remaining 53 bits, +1; w == 0 gives
    // nlz 64, capped by the same formula (64 - P + 1)
    val rho = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - P + 1)
    if (regs(bucket) < rho) regs(bucket) = rho.toByte
  }

  /** Union: byte-wise max, in place on `into`. */
  def merge(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == M && from.length == M,
      s"register width mismatch: ${into.length} vs ${from.length} vs $M")
    var i = 0
    while (i < M) {
      if (into(i) < from(i)) into(i) = from(i)
      i += 1
    }
  }

  /** Cardinality estimate with the small-range linear-counting switch. */
  def estimate(regs: Array[Byte]): Long = {
    require(regs.length == M, s"register width ${regs.length} != $M")
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  /** One pass over the given plans' row groups for `hllCol`: per task,
    * fold the column's xxhash64 values into a register array, then attach
    * the bytes to the catalog row. An all-null (or empty) group stores
    * the ZERO sketch — the merge identity, estimating 0 — so coverage
    * certification ("every selected group has a sketch") stays a simple
    * non-NULL test. */
  def build(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType,
      hllCol: String,
      dbPath: String): Unit = {
    require(supported(dataSchema(hllCol).dataType),
      s"hll column $hllCol has unsupported type ${dataSchema(hllCol).dataType}")
    val rgMeta = spark.sparkContext.broadcast(
      graft.plans.RowGroupScan.perRowGroupMeta(plans).toArray)
    val url = s"jdbc:derby:$dbPath"
    RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
        mergeRuns = false, requiredCols = Seq(hllCol))
      .select(
        // null guard BEFORE the hash: xxhash64(NULL) yields the seed,
        // which would register a phantom distinct value
        when(col(hllCol).isNotNull, xxhash64(col(hllCol))).as("h"),
        spark_partition_id().as("pid"))
      .rdd.foreachPartition { it =>
        var pid = -1
        val regs = new Array[Byte](M)
        var any = false
        it.foreach { r =>
          pid = r.getInt(1)
          any = true
          if (!r.isNullAt(0)) add(regs, r.getLong(0))
        }
        if (any && pid >= 0) {
          val (fileName, rowGroup) = rgMeta.value(pid)
          DerbyStatsIndex.ensureDriver()
          val conn = DriverManager.getConnection(url)
          try {
            val up = conn.prepareStatement(
              s"""UPDATE row_group_statistics
                 |SET ${hllCol}_hll = ?
                 |WHERE row_group = ? AND file_id =
                 |  (SELECT file_id FROM file_statistics WHERE file_name = ?)"""
                .stripMargin)
            up.setBytes(1, regs)
            up.setInt(2, rowGroup)
            up.setString(3, fileName)
            up.executeUpdate()
            up.close()
          } finally conn.close()
        }
      }
  }
}
