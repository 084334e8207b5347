package graft.index

import graft.sources.RowGroupSkipScan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, spark_partition_id}
import org.apache.spark.sql.types._

import java.sql.DriverManager

/** Per-row-group SUM shadow build (r11) — the data-scan ingest step that
  * lets catalog-answered GROUP BY ([[graft.plans.StatsAggPushdown]])
  * serve `SUM(x)` aggregates: per row group, the EXACT sum of `sumCol`'s
  * non-null values, attached as a `{col}_sum` catalog column. On a
  * value-aligned layout the per-group answer is then the sum of its row
  * groups' sums — one O(index) fetch, zero data scanned.
  *
  * Footer stats carry no sums, so this is a separate build step exactly
  * like [[BloomIndex.build]] and [[FreqShadow.build]]: one distributed
  * job, one task per row group (the `spark_partition_id` ↔ row-group
  * contract of RowGroupSkipScan's unmerged scan), O(1) state per task,
  * executor-side JDBC attach. Re-indexing a file deletes its row-group
  * rows, so stale sums cannot survive a data change; rebuild after
  * re-index like blooms.
  *
  * Supported types are the integrals whose exact sum fits the catalog's
  * BIGINT ledger; a row group whose sum overflows Long stores NULL
  * (unknown ⇒ the rewrite declines — fail closed, never a wrapped
  * value). All-null groups store 0 — the additive identity; SUM's
  * NULL-on-empty-group semantics are decided from the null counts the
  * catalog already holds. Float/double are excluded: their sum is
  * order-dependent, so a stored sum could differ from what a scan
  * computes.
  */
object SumShadow {

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** One pass over the given plans' row groups for `sumCol`: per task,
    * stream the column accumulating an exact Long sum (overflow ⇒ the
    * stored sum is NULL), then attach it to the catalog row. */
  def build(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType,
      sumCol: String,
      dbPath: String): Unit = {
    require(supported(dataSchema(sumCol).dataType),
      s"sum column $sumCol has unsupported type ${dataSchema(sumCol).dataType}")
    val rgMeta = spark.sparkContext.broadcast(
      graft.plans.RowGroupScan.perRowGroupMeta(plans).toArray)
    val url = s"jdbc:derby:$dbPath"
    RowGroupSkipScan.scan(spark, dir, plans, dataSchema,
        mergeRuns = false, requiredCols = Seq(sumCol))
      .select(col(sumCol).cast(LongType).as("v"), spark_partition_id().as("pid"))
      .rdd.foreachPartition { it =>
        var pid = -1
        var sum = 0L
        var sawRow = false
        var overflow = false
        it.foreach { r =>
          pid = r.getInt(1)
          sawRow = true
          if (!r.isNullAt(0) && !overflow) {
            try sum = Math.addExact(sum, r.getLong(0))
            catch { case _: ArithmeticException => overflow = true }
          }
        }
        if (pid >= 0 && sawRow) {
          val (fileName, rowGroup) = rgMeta.value(pid)
          DerbyStatsIndex.ensureDriver()
          val conn = DriverManager.getConnection(url)
          try {
            val up = conn.prepareStatement(
              s"""UPDATE row_group_statistics
                 |SET ${sumCol}_sum = ?
                 |WHERE row_group = ? AND file_id =
                 |  (SELECT file_id FROM file_statistics WHERE file_name = ?)"""
                .stripMargin)
            if (overflow) up.setNull(1, java.sql.Types.BIGINT)
            else up.setLong(1, sum)
            up.setInt(2, rowGroup)
            up.setString(3, fileName)
            up.executeUpdate()
            up.close()
          } finally conn.close()
        }
      }
  }
}
