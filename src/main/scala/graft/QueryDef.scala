package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name    stable key, becomes `SparkEntry.queries` entry
  * @param fn      Spark-first implementation `(session, sfDir) => result`
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables (None for non-SQL-expressible ops → the driver
  *                records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
