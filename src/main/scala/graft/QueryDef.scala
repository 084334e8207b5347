package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name      stable key, becomes `SparkEntry.queries` entry
  * @param fn        Spark-first implementation `(session, sfDir) => result`
  * @param oracle    equivalent ANSI SQL for DuckDB over the same parquet
  *                  tables (None for non-SQL-expressible ops → the driver
  *                  records a weaker rows-only check)
  * @param oracleDyn data-dependent oracle, evaluated AFTER `fn` has run
  *                  (Verify writes oracle_sql.json after executing every
  *                  query, so `fn` may fit parameters — e.g. IVF centroids —
  *                  and the oracle can inline them as literals). A thrown
  *                  exception degrades to the rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleDyn: Option[() => String] = None)
