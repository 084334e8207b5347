package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * A "table" here follows the reference's data model — a parquet path with
  * schema inferred from the footer (/root/reference/sqlx-sqlite/src/main.rs:228-236
  * infers from the first file of a directory; `spark.read.parquet` does the
  * same natively, merging across files when present).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as two physical layouts: TIMESTAMP(NANOS)
    * (which Spark 4 refuses by default — read nanos as long, truncate to
    * microseconds, matching how ns-capable engines narrow to µs) and
    * plain µs TIMESTAMP (isAdjustedToUTC=false → TIMESTAMP_NTZ). Both
    * normalize to the same session-UTC TimestampType so every downstream
    * query and plan pin sees one schema regardless of generator vintage.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TimestampType cast below interprets wall-clock values in the
    // session timezone; only UTC makes it agree with the epoch-micros path
    // and the DuckDB oracle, so pin it here rather than relying on the
    // launcher's javaOptions.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other; expected nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** Register the given tables as temp views so `spark.sql` queries work. */
  def register(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register every table as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, all: _*)
}
