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

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
    * default. Read nanos as long and narrow to microseconds (truncating,
    * matching how ns-capable engines narrow to µs-precision timestamps).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register the given tables as temp views so `spark.sql` queries work. */
  def register(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register every table as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, all: _*)
}
