package graft.index

import graft.sources.RowGroupSkipScan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, spark_partition_id}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructType}
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.sql.DriverManager

/** Per-row-group bloom filters in the external catalog — the reference's
  * third named index extension (/root/reference/sqlx-sqlite/src/main.rs:34-37,
  * index.rs:30-35: "other indexes, e.g. bloom filters, can be added").
  *
  * Min/max statistics cannot prune equality probes on high-cardinality
  * UNSORTED keys (every row group's range spans the whole domain). A small
  * bloom filter per (file, row_group, column), stored next to the min/max
  * row in `row_group_statistics` and probed by the catalog itself during
  * the pruning query, prunes exactly those: a `=`/`IN` conjunct keeps only
  * row groups whose bloom might contain the key (plus the usual NULL-stats
  * "might match" fallback).
  *
  * Scale notes (100 TB):
  *  - build is ONE distributed job, one task per row group (the same
  *    partition-per-row-group scan the row-level index build uses); each
  *    task streams its own column chunk, builds a bloom sized from the
  *    DISTINCT count it saw (capped at `maxBloomBytes`), and writes it
  *    over its own JDBC connection — the driver never sees a bloom;
  *  - the catalog grows by ≤ `maxBloomBytes` (default 4 KB) per row group —
  *    ~4 GB for a 100 TB table at 128 MB row groups, fine for a catalog DB;
  *  - probing happens INSIDE the catalog's SQL (a registered Java function
  *    over the bloom bytes), so the pruning query stays one round trip and
  *    bloom bytes never ship to the planner.
  */
object BloomIndex {

  /** Types a bloom column may have: exact-equality-probe-able types whose
    * values hash identically at ingest and probe time (integrals widen to
    * long; strings hash their UTF-8 bytes). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Build + attach blooms for `bloomCol` over the row groups in `plans`.
    * Idempotent: re-running overwrites each row group's bloom. Must run
    * AFTER the footer-stats ingest (it updates existing catalog rows). */
  def build(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType,
      bloomCol: String,
      dbPath: String,
      fpp: Double = 0.01,
      maxBloomBytes: Int = 4096): Unit = {
    require(supported(dataSchema(bloomCol).dataType),
      s"bloom column $bloomCol has unsupported type ${dataSchema(bloomCol).dataType}")
    // (file, row group, catalog row count) per scan partition: the row
    // count pre-sizes each bloom so values STREAM into it — per-task
    // memory is the bloom's byte cap, independent of row-group size
    // (a distinct-set would be O(row group) heap at 1M-row groups)
    val rowsByFile = plans.map(p => p.fileName -> p.rowGroupRows).toMap
    val rgMeta = spark.sparkContext.broadcast(
      graft.plans.RowGroupScan.perRowGroupMeta(plans).toArray.map { case (f, rg) =>
        (f, rg, rowsByFile.getOrElse(f, Map.empty).getOrElse(rg, 65536L))
      })
    val url = s"jdbc:derby:$dbPath"
    // one partition per selected row group; pid ↔ row-group identity is the
    // same contract RowLevelIndex.buildPlan relies on
    RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
        mergeRuns = false, requiredCols = Seq(bloomCol))
      .select(col(bloomCol).as("v"), spark_partition_id().as("pid"))
      .rdd.foreachPartition { it =>
        if (it.hasNext) {
          val first = it.next()
          val pid = first.getInt(1)
          val (fileName, rowGroup, rowCount) = rgMeta.value(pid)
          val bloom = BloomProbe.create(rowCount, fpp, maxBloomBytes)
          def add(r: org.apache.spark.sql.Row): Unit =
            if (!r.isNullAt(0)) BloomProbe.put(bloom, r.get(0))
          add(first); it.foreach(add)
          BloomProbe.attachViaJdbc(url, fileName, rowGroup, bloomCol,
            BloomProbe.serialize(bloom))
        }
      }
  }
}

/** Bloom build/serialize helpers plus the Derby-callable probe functions.
  * The probe statics are registered as Derby SQL functions
  * (`GRAFT_BLOOM_LONG`/`GRAFT_BLOOM_STR`, DerbyStatsIndex DDL) — embedded
  * Derby shares this JVM, so the catalog evaluates probes in-process and
  * the pruning query never ships bloom bytes out of the store. */
object BloomProbe {

  /** Empty bloom sized for `expectedItems` (an upper bound — the catalog's
    * row count stands in for the distinct count) at `fpp`, bit-capped so
    * the catalog row stays small; at the cap the filter degrades
    * gracefully to a higher fpp (over-scan, never under-scan). */
  def create(expectedItems: Long, fpp: Double, maxBloomBytes: Int): BloomFilter = {
    val n = math.max(1L, expectedItems)
    val optimalBits =
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bits = math.max(64L, math.min(optimalBits, maxBloomBytes.toLong * 8L))
    BloomFilter.create(n, bits)
  }

  /** Ingest one value: integrals widen to long (the probe widens
    * identically), strings hash their UTF-8 bytes. */
  def put(bloom: BloomFilter, value: Any): Unit = value match {
    case s: String => bloom.putString(s); ()
    case x: java.lang.Number => bloom.putLong(x.longValue); ()
    case other => throw new IllegalArgumentException(s"unbloomable value $other")
  }

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Executor-side attach over the caller's own catalog connection —
    * same per-task JDBC shape as DerbyStatsIndex.ingestAll. */
  def attachViaJdbc(
      url: String, fileName: String, rowGroup: Int,
      colName: String, bytes: Array[Byte]): Unit = {
    DerbyStatsIndex.ensureDriver()
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"""UPDATE row_group_statistics SET ${colName}_bloom = ?
           |WHERE row_group = ?
           |  AND file_id = (SELECT file_id FROM file_statistics WHERE file_name = ?)"""
          .stripMargin)
      ps.setBytes(1, bytes)
      ps.setInt(2, rowGroup)
      ps.setString(3, fileName)
      ps.executeUpdate()
      ps.close()
    } finally conn.close()
  }

  // ---- Derby-callable probes ----------------------------------------------
  // Deserializing a bloom costs more than probing it, and Derby calls the
  // function once per candidate row — cache deserialized filters keyed by
  // their bytes. Bounded: cleared wholesale past 4096 entries (a catalog
  // query touches each row group's bloom once; the cache only needs to
  // carry hot blooms across queries).

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.nio.ByteBuffer, BloomFilter]()

  private def filterFor(bytes: Array[Byte]): BloomFilter = {
    if (cache.size > 4096) cache.clear()
    cache.computeIfAbsent(java.nio.ByteBuffer.wrap(bytes),
      _ => BloomFilter.readFrom(new ByteArrayInputStream(bytes)))
  }

  /** Derby function GRAFT_BLOOM_LONG: 1 = might contain, 0 = definitely
    * absent. Integral column values are widened to long at ingest, so the
    * probe widens identically. */
  def mightContainLong(bloom: Array[Byte], v: Long): Int =
    if (filterFor(bloom).mightContainLong(v)) 1 else 0

  /** Derby function GRAFT_BLOOM_STR. */
  def mightContainString(bloom: Array[Byte], v: String): Int =
    if (filterFor(bloom).mightContainString(v)) 1 else 0
}
