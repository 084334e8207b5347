package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the lake
  * maintenance a 100 TB table needs (many small files destroy scan
  * throughput: per-file open/footer costs dominate, and the driver's file
  * listing grows unboundedly).
  *
  * Bin-packs files below `smallThresholdBytes` into target-sized groups
  * (first-fit decreasing) and rewrites each group as one file; files
  * already at target size are left untouched. After compaction the caller
  * re-runs the index build — `DerbyStatsIndex.addFile`'s upsert plus
  * `retainOnly` make that incremental and idempotent.
  */
object Compaction {

  final case class Plan(bins: Seq[Seq[String]], untouched: Seq[String])

  /** First-fit-decreasing bin packing of small files. */
  def plan(
      files: Seq[(String, Long)],
      targetBytes: Long,
      smallThresholdBytes: Long): Plan = {
    val (small, big) = files.partition(_._2 < smallThresholdBytes)
    val bins = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    small.sortBy(-_._2).foreach { case (f, sz) =>
      bins.indexWhere(_._2 + sz <= targetBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(f), sz))
        case i  => val (fs, tot) = bins(i); fs += f; bins(i) = (fs, tot + sz)
      }
    }
    // a singleton bin is a rewrite for nothing — leave those files alone
    val (real, single) = bins.map(_._1.toSeq).partition(_.size > 1)
    Plan(real.toSeq, big.map(_._1) ++ single.flatten)
  }

  /** Execute compaction in place: rewrite each bin as one file, delete the
    * originals. Returns the number of bins rewritten. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      smallThresholdBytes: Long = 32L * 1024 * 1024): Int = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dirPath).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    val p = plan(files, targetBytes, smallThresholdBytes)
    p.bins.zipWithIndex.foreach { case (bin, i) =>
      val staging = new Path(dirPath, s".compact-$i")
      spark.read.parquet(bin: _*).coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging).toSeq
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dest = new Path(dirPath, f"compacted-$i%05d.parquet")
      fs.rename(part, dest)
      fs.delete(staging, true)
      bin.foreach(f => fs.delete(new Path(f), false))
    }
    p.bins.size
  }

  private val fixtureCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Once per sfDir: a deliberately fragmented copy of `orders` (16 small
    * files), then compacted in place — the maintenance pass under the
    * correctness gate. */
  private def compactedOrders(s: SparkSession, sfDir: String): String =
    fixtureCache.getOrElseUpdate(sfDir + "@" + s.hashCode(), {
      val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val dataDir = new java.io.File(s"target/tmp/compact/$safe/orders-v1").getAbsolutePath
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dataDir, "_SUCCESS"))) {
        graft.Tables.load(s, sfDir, "orders")
          .repartition(16).write.mode("overwrite").parquet(dataDir)
        compact(s, dataDir) // every part is far below the 32 MB threshold
      }
      dataDir
    })

  /** Compaction as a driver-checked row: the fragmented-then-compacted
    * copy must answer exactly like the original table — the maintenance
    * pass moves bytes, never rows. The oracle runs on the original
    * `orders`; the double sum is rendered through the fixed-scale decimal
    * cast so the check is order-insensitive. */
  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "cp1_compacted",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        s.read.parquet(compactedOrders(s, dir))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,4)"))
              .cast("decimal(38,4)").cast("string").as("total"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS total
             |FROM orders GROUP BY 1""".stripMargin)))
}
