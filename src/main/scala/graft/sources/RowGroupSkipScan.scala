package graft.sources

import graft.index.{FileScanPlan, StatsIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FilePartition, FileScanRDD, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Explicit external row-group skip — the stretch goal of SURVEY.md §7.4:
  * the reference attaches a `ParquetAccessPlan` (per-row-group Scan/Skip)
  * to each file so the scan physically never touches skipped row groups
  * (/root/reference/sqlx-sqlite/src/index.rs:163-175, main.rs:292-297).
  *
  * Spark has no public per-row-group seam, but its parquet reader honors
  * byte-range splits: a reader for `[start, start+length)` reads exactly
  * the row groups whose midpoint falls inside the range. The external
  * index stores each row group's byte range, so we emit one split per
  * selected row group — skipped row groups are physically never read, and
  * the decision comes entirely from the remote catalog (no footer
  * consulted at planning time; planning stays O(index)).
  *
  * Scale note: one task per selected row group is the natural parallelism
  * for a pruned scan (a 100 TB table pruned to k row groups costs k tasks,
  * independent of total file count); adjacent selected groups in the same
  * file are merged into one split to avoid task storms on unpruned files.
  */
object RowGroupSkipScan {

  /** DataFrame over EXACTLY the row groups selected in `plans`. */
  def scan(
      spark: SparkSession,
      dir: String,
      plans: Seq[FileScanPlan],
      dataSchema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // row-based reader: the captured-at-build-time vectorized path yields
    // ColumnarBatch, which internalCreateDataFrame cannot consume
    val prevVec = spark.conf.get("spark.sql.parquet.enableVectorizedReader", "true")
    val reader =
      try {
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
        new ParquetFileFormat().buildReaderWithPartitionValues(
          sparkSession = cs,
          dataSchema = dataSchema,
          partitionSchema = new StructType(),
          requiredSchema = dataSchema,
          filters = Nil,
          options = Map.empty,
          hadoopConf = new org.apache.hadoop.conf.Configuration(
            spark.sparkContext.hadoopConfiguration))
      } finally spark.conf.set("spark.sql.parquet.enableVectorizedReader", prevVec)

    val splits = plans.flatMap { p =>
      val path = SparkPath.fromPathString(new Path(dir, p.fileName).toString)
      // merge adjacent selected row groups into one byte range
      val runs = p.scanRowGroups.toSeq.foldLeft(List.empty[List[Int]]) {
        case (acc @ (run @ (last :: _)) :: rest, rg) if rg == last + 1 =>
          (rg :: run) :: rest
        case (acc, rg) => List(rg) :: acc
      }.map(_.reverse).reverse
      runs.map { run =>
        val (start, _) = p.rowGroupRanges(run.head)
        val (lastStart, lastLen) = p.rowGroupRanges(run.last)
        PartitionedFile(InternalRow.empty, path,
          start, lastStart + lastLen - start,
          Array.empty, 0L, p.fileSizeBytes, Map.empty)
      }
    }
    val partitions = splits.zipWithIndex.map { case (pf, i) =>
      FilePartition(i, Array(pf))
    }
    val rdd = new FileScanRDD(cs, reader, partitions, dataSchema)
    GraftSqlShim.internalCreateDataFrame(spark, rdd, dataSchema)
  }

  /** Resolve a public `Column` predicate against `dataSchema` into a
    * Catalyst expression (via analysis over an empty relation), folding
    * constant subtrees (e.g. `CAST(100 AS BIGINT)`) so the stats-space
    * rewriter sees plain typed literals. */
  def resolvePredicate(
      spark: SparkSession,
      dataSchema: StructType,
      predicate: Column): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), dataSchema)
    val analyzed = empty.filter(predicate).queryExecution.analyzed
    val cond = analyzed.collectFirst { case f: Filter => f.condition }
      .getOrElse(Literal.TrueLiteral)
    cond.transformUp {
      case e if e.foldable && !e.isInstanceOf[Literal] =>
        Literal.create(e.eval(), e.dataType)
    }
  }

  /** Full path: consult the index with `predicate`, scan only surviving
    * row groups, re-apply the predicate (the reference's Inexact pushdown
    * contract — pruning may over-scan, results never change). Returns the
    * pruning decision for observability. */
  def scanWithPredicate(
      spark: SparkSession,
      dir: String,
      index: StatsIndex,
      dataSchema: StructType,
      predicate: Column): (DataFrame, Seq[FileScanPlan]) = {
    val plans = index.getFiles(resolvePredicate(spark, dataSchema, predicate))
    (scan(spark, dir, plans, dataSchema).filter(predicate), plans)
  }
}
