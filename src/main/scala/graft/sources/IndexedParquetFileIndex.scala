package graft.sources

import graft.index.{FileScanPlan, StatsIndex}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** What the last planning pass decided to scan — the observability hook
  * mirroring the reference's `SimpleExecutionLog`/`last_execution()`
  * (/root/reference/sqlx-sqlite/src/main.rs:202-204, 319-323, 426-445).
  * Golden pruning tests assert on this, exactly like the reference's
  * "Files scanned:" console assertions (sqlx-sqlite/README.md:38-70).
  */
final case class PruneExecution(
    dataFilters: Seq[Expression],
    plans: Seq[FileScanPlan],
    totalFiles: Int,
    totalRowGroups: Int) {
  def scannedFiles: Seq[String] = plans.map(_.fileName)
  def scannedRowGroups: Int = plans.map(_.scanRowGroups.size).sum
  def render: String =
    plans.map(p => s"${p.fileName} ${p.render}").mkString("Files scanned: [", "; ", "]")
}

/** Custom [[FileIndex]] that consults the external stats index at planning
  * time: Spark pushes the scan's data filters into `listFiles`, we fold them
  * into one conjunction (reference's `conjunction`, main.rs:265-272), ask
  * the index which files still matter, and return only those. Spark
  * re-applies every data filter above the scan, giving the reference's
  * `Inexact` pushdown semantics for free (main.rs:308-316) — pruning here
  * can only over-scan, never change results.
  *
  * Row-group granularity: the index's per-row-group decision is recorded in
  * [[lastExecution]]; the physical skip of non-matching row groups happens
  * in the vectorized parquet reader via footer-stats filter pushdown
  * (`spark.sql.parquet.filterPushdown`), which reproduces the reference's
  * ParquetAccessPlan outcome from the same min/max values (SURVEY.md §7.4).
  */
final class IndexedParquetFileIndex(
    dir: Path,
    index: StatsIndex,
    fileSystemBlockSize: Long = 128L * 1024 * 1024)
    extends FileIndex {

  /** The backing stats index (for scans that consult it directly). */
  def statsIndex: StatsIndex = index

  @volatile var lastExecution: Option[PruneExecution] = None

  override def rootPaths: Seq[Path] = Seq(dir)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val everything = index.allFiles()
    val plans =
      if (dataFilters.isEmpty) everything
      else index.getFiles(dataFilters.reduce(And))
    lastExecution = Some(PruneExecution(
      dataFilters, plans, everything.size, everything.map(_.rowGroupCount).sum))
    val statuses = plans.map { p =>
      new FileStatus(p.fileSizeBytes, false, 1, fileSystemBlockSize, 0L,
        new Path(dir, p.fileName))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

  override def inputFiles: Array[String] =
    index.allFiles().map(p => new Path(dir, p.fileName).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = index.allFiles().map(_.fileSizeBytes).sum

  override def partitionSchema: StructType = new StructType()
}
