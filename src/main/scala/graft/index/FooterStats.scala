package graft.index

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, DateLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Min/max/null-count statistics for one column chunk of one row group.
  *
  * `min`/`max` are None when the footer carries no usable statistics
  * (unknown ⇒ the pruning rewrite must treat the row group as "might
  * match"). `nullCount` is None when unknown. Values are plain JVM values
  * in the column's Spark external type (Int, Long, Float, Double, String,
  * Array[Byte]); timestamps are normalized to Long microseconds and dates
  * to Int days so they compare directly against Catalyst literal values.
  *
  * PRECONDITION (verbatim footer stats): string/binary footer min/max are
  * assumed to be VERBATIM data values, not writer-side truncations. The
  * catalog uses footer extremes as bounds (always sound), but several
  * certificates additionally pair a stored extreme with a row frequency
  * AT that extreme (dominant-slice top-k) or return it as an exact answer
  * (min/max pushdown) — and a writer that truncated its binary statistics
  * (parquet-mr `parquet.statistics.truncate.length`) would make a short
  * stats value look verbatim when no row holds it. Spark's parquet writer
  * (the only writer this engine's ingest path sees) does not set a
  * truncate length, and parquet-mr 1.16 does not surface the format's
  * `is_min_value_exact`/`is_max_value_exact` flags through
  * `ColumnChunkMetaData.getStatistics`, so this is a documented ingest
  * precondition rather than a runtime check: do NOT index files from
  * stats-truncating writers, or if such files may appear, rebuild their
  * stats through [[FreqShadow]]-style data scans instead of footers.
  * Graft's OWN `MaxStringLen` truncation is tracked separately and
  * exactly (the catalog's `min_exact` marker).
  *
  * Mirrors the role of the reference's per-row-group statistics extraction
  * (/root/reference/sqlx-sqlite/src/index.rs:178-240) re-expressed over
  * parquet-hadoop instead of arrow-rs StatisticsConverter.
  */
final case class ColumnStats(nullCount: Option[Long], min: Option[Any], max: Option[Any])

/** @param startBytes      byte offset of the row group in the file
  * @param compressedBytes compressed size — together these let a scan
  *                        address the row group physically (split ranges)
  *                        without re-reading the footer */
final case class RowGroupStats(
    rowGroup: Int, rowCount: Long,
    startBytes: Long, compressedBytes: Long,
    columns: Map[String, ColumnStats])

final case class FileStats(
    fileName: String,
    fileSizeBytes: Long,
    rowCount: Long,
    rowGroups: Vector[RowGroupStats])

object FooterStats {

  /** Spark types the index can store statistics for. Everything else is
    * silently skipped, like the reference's graceful degradation for
    * unsupported types (/root/reference/sqlx-sqlite/src/index.rs:213-217).
    * Timestamp/Date are an extension over the reference's 15-type list.
    */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BinaryType | TimestampType |
         TimestampNTZType | DateType => true
    // r13: DECIMAL stats — bridged to java.math.BigDecimal at the
    // declared scale. Capped at Derby's DECIMAL precision (31): a wider
    // value could not be stored losslessly, so wider columns stay
    // unindexed (the usual "unknown ⇒ might match" degradation).
    case d: DecimalType => d.precision <= 31
    case _ => false
  }

  /** Read one parquet footer and extract per-row-group stats for the
    * indexed columns. Driver- or executor-side (pure parquet-hadoop, no
    * Spark session needed) — the distributed index build parallelizes
    * exactly this call across executors.
    */
  def read(path: Path, conf: Configuration, indexedCols: Seq[String]): FileStats = {
    val fs = path.getFileSystem(conf)
    val status = fs.getFileStatus(path)
    val reader = ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf),
      org.apache.parquet.ParquetReadOptions.builder()
        .withMetadataFilter(ParquetMetadataConverter.NO_FILTER).build())
    val footer = try reader.getFooter finally reader.close()
    val schema = footer.getFileMetaData.getSchema
    val wanted = indexedCols.toSet

    val rgs = footer.getBlocks.asScala.toVector.zipWithIndex.map { case (block, i) =>
      val cols = block.getColumns.asScala.flatMap { chunk =>
        val colPath = chunk.getPath.toDotString
        if (!wanted.contains(colPath)) None
        else {
          val field = schema.getType(chunk.getPath.toArray: _*).asPrimitiveType()
          toColumnStats(chunk.getStatistics, field.getPrimitiveTypeName,
            Option(field.getLogicalTypeAnnotation)).map(colPath -> _)
        }
      }.toMap
      RowGroupStats(i, block.getRowCount,
        block.getStartingPos, block.getCompressedSize, cols)
    }
    FileStats(path.getName, status.getLen, rgs.map(_.rowCount).sum, rgs)
  }

  /** Convert a parquet column-chunk Statistics into typed JVM min/max.
    * Returns None when the physical/logical type is one we don't index —
    * the column is then absent from the row group's stats map and the
    * pruning rewrite falls back to "might match".
    */
  private def toColumnStats(
      stats: org.apache.parquet.column.statistics.Statistics[_],
      primitive: PrimitiveTypeName,
      logical: Option[LogicalTypeAnnotation]): Option[ColumnStats] = {

    val nullCount =
      if (stats != null && stats.isNumNullsSet) Some(stats.getNumNulls) else None
    val hasMinMax = stats != null && stats.hasNonNullValue

    def mk(min: => Any, max: => Any): Option[ColumnStats] =
      if (!hasMinMax) Some(ColumnStats(nullCount, None, None))
      else Some(ColumnStats(nullCount, Some(min), Some(max)))

    // DECIMAL (r13): parquet stores the unscaled integer; rescale to a
    // BigDecimal at the annotation's scale. All three physical layouts
    // Spark's writer emits (INT32 p≤9, INT64 p≤18, BINARY/FLBA above)
    // bridge — unsigned comparators don't apply (DECIMAL stats use
    // signed comparators in parquet-mr), so min/max are usable directly.
    def dec(unscaled: java.math.BigInteger, scale: Int): java.math.BigDecimal =
      new java.math.BigDecimal(unscaled, scale)

    (primitive, logical) match {
      case (PrimitiveTypeName.INT32,
          Some(d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation)) =>
        mk(java.math.BigDecimal.valueOf(
             stats.genericGetMin.asInstanceOf[Integer].longValue(), d.getScale),
           java.math.BigDecimal.valueOf(
             stats.genericGetMax.asInstanceOf[Integer].longValue(), d.getScale))
      case (PrimitiveTypeName.INT64,
          Some(d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation)) =>
        mk(java.math.BigDecimal.valueOf(
             stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(), d.getScale),
           java.math.BigDecimal.valueOf(
             stats.genericGetMax.asInstanceOf[java.lang.Long].longValue(), d.getScale))
      case (PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY,
          Some(d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation)) =>
        mk(dec(new java.math.BigInteger(stats.genericGetMin
             .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale),
           dec(new java.math.BigInteger(stats.genericGetMax
             .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale))
      case (PrimitiveTypeName.INT32, Some(_: DateLogicalTypeAnnotation)) =>
        mk(stats.genericGetMin.asInstanceOf[Integer].intValue(),
           stats.genericGetMax.asInstanceOf[Integer].intValue())
      case (PrimitiveTypeName.INT32, _) =>
        mk(stats.genericGetMin.asInstanceOf[Integer].intValue(),
           stats.genericGetMax.asInstanceOf[Integer].intValue())
      case (PrimitiveTypeName.INT64, Some(t: TimestampLogicalTypeAnnotation)) =>
        // normalize to microseconds (Catalyst TimestampType internal unit)
        val scale: Long => Long = t.getUnit match {
          case TimeUnit.MILLIS => _ * 1000L
          case TimeUnit.MICROS => identity
          case TimeUnit.NANOS  => _ / 1000L
        }
        mk(scale(stats.genericGetMin.asInstanceOf[java.lang.Long].longValue()),
           scale(stats.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
      case (PrimitiveTypeName.INT64, _) =>
        mk(stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
           stats.genericGetMax.asInstanceOf[java.lang.Long].longValue())
      case (PrimitiveTypeName.FLOAT, _) =>
        mk(stats.genericGetMin.asInstanceOf[java.lang.Float].floatValue(),
           stats.genericGetMax.asInstanceOf[java.lang.Float].floatValue())
      case (PrimitiveTypeName.DOUBLE, _) =>
        mk(stats.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
           stats.genericGetMax.asInstanceOf[java.lang.Double].doubleValue())
      case (PrimitiveTypeName.BINARY, Some(_: StringLogicalTypeAnnotation)) =>
        mk(stats.minAsString, stats.maxAsString)
      case (PrimitiveTypeName.BINARY, _) =>
        mk(stats.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
           stats.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
      case _ => None // INT96, FIXED_LEN_BYTE_ARRAY decimal, BOOLEAN, … → unindexed
    }
  }
}
