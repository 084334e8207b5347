package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full operator registry (SURVEY.md §2 inventory + north-star L3 ops). */
  def registry: Seq[QueryDef] =
    operators.Relational.defs ++ operators.Relational2.defs ++
      operators.Indexed.defs ++
      operators.TextAnalysis.defs ++ operators.Dedup.defs ++
      operators.AnnSearch.defs ++ operators.Multimodal.defs ++
      operators.Sketches.defs ++ operators.Sampling.defs ++
      operators.AsOf.defs ++
      operators.Skew.defs ++ operators.Graph.defs ++
      sources.Compaction.defs ++ sources.MergeUpsert.defs ++
      streaming.EventStreams.defs ++ streaming.DocumentStreams.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's flagship scenario (point predicate through the
    * index-backed provider — /root/reference/sqlx-sqlite/src/main.rs:146).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    operators.Indexed.lineitemIndexed(spark, "/root/testdata/sf0.001")
      .filter(col("l_quantity") === 30.0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Dynamic
    * oracles (fitted-parameter literals) are resolved here — i.e. after
    * the queries ran — and degrade to omission if unavailable. */
  def oracleSql: Map[String, String] =
    registry.flatMap { q =>
      q.oracleDyn.flatMap(f => scala.util.Try(f()).toOption)
        .orElse(q.oracle).map(q.name -> _)
    }.toMap
}
