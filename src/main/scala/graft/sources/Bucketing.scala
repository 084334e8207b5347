package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the "reuse a partitioning across stages"
  * scale lever: write both join sides bucketed (and sorted) by the join
  * key into the session catalog, and every subsequent equi-join on that
  * key runs with NO shuffle exchange on either side (Spark matches the
  * bucket spec to the join's required distribution). At 100 TB this turns
  * the nightly fact-to-fact join from the dominant shuffle into a local
  * zipper merge per bucket.
  *
  * Complements the external stats index: bucketing fixes the JOIN
  * layout, the index prunes the SCAN — both are metadata-driven and
  * neither touches query code.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table. Bucket count is
    * the co-location contract: both sides of a co-located join must use
    * the same count. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. The caller
    * asserts plan shape (no Exchange) in tests; at runtime this is just a
    * table join — the point is what Catalyst does NOT add. */
  def cojoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
