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
    * row group, from the stats index), writing to `indexDir`. */
  def build(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      indexDir: String): Unit = {
    val perRg = plans.flatMap { p =>
      p.scanRowGroups.toSeq.map { rg =>
        val single = p.copy(scanRowGroups = SortedSet(rg))
        RowGroupSkipScan.scan(spark, dir, Seq(single), dataSchema)
          .select(col(keyCol).as("key"))
          .distinct()
          .withColumn("file_name", lit(p.fileName))
          .withColumn("row_group", lit(rg))
      }
    }
    perRg.reduce(_ unionAll _)
      .repartition(1).sortWithinPartitions("key")
      .write.mode("overwrite").parquet(indexDir)
  }

  /** Posting lookup: which row groups contain `key`. Pushdown-filtered
    * read of the index table. */
  def lookup(
      spark: SparkSession,
      indexDir: String,
      key: Any,
      statsPlans: Seq[FileScanPlan]): Seq[FileScanPlan] = {
    val byFile = statsPlans.map(p => p.fileName -> p).toMap
    val hits = spark.read.parquet(indexDir)
      .filter(col("key") === lit(key))
      .select("file_name", "row_group")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getInt(1)).to(SortedSet)).toMap
    hits.toSeq.sortBy(_._1).flatMap { case (f, rgs) =>
      byFile.get(f).map(p => p.copy(scanRowGroups = rgs))
    }
  }

  /** Point query through the row-level index: scan exactly the posting
    * row groups, re-apply the predicate. */
  def pointQuery(
      spark: SparkSession,
      dir: String,
      indexDir: String,
      statsPlans: Seq[FileScanPlan],
      dataSchema: StructType,
      keyCol: String,
      key: Any): DataFrame = {
    val plans = lookup(spark, indexDir, key, statsPlans)
    if (plans.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), dataSchema)
    else
      RowGroupSkipScan.scan(spark, dir, plans, dataSchema)
        .filter(col(keyCol) === lit(key))
  }
}
