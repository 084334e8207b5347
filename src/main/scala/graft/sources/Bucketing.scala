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
    * the same count (a join avoids the bucketed side's shuffle only when
    * its equi-keys cover the bucket columns). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      moreKeys: String*): Unit = {
    val spark = df.sparkSession
    // In-memory catalogs don't survive the JVM, but managed-table
    // LOCATIONS do: a table dir left by a previous run fails CTAS with
    // LOCATION_ALREADY_EXISTS even in Overwrite mode. Drop + clear first.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File(warehouse, table.toLowerCase)
    if (loc.exists()) rm(loc)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
  }

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
