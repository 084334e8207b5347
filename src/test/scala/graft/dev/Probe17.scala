package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 diagnosis probe for the idx73–75 semi-join prune family
  * (VERDICT item 1: a sporadic ~2 s per-run serial cost in the driver
  * environment that three builder runs did not reproduce). Times each
  * phase of idx75 (and idx73) separately, repeatedly, at the canonical
  * bench config — dim-side collect, the prunePlans catalog walk, and the
  * pruned scan + exact join — so a serial catalog cost self-identifies
  * instead of hiding inside the end-to-end number.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.dev.Probe17"
  */
object Probe17 {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe17] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusRaw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpus = scala.util.Try(cpusRaw.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cpusRaw]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.operators.Indexed.lineitemIndexed(spark, sfDir).count()
    catch { case _: Throwable => () }

    val (index, dataSchema, dataDir) =
      graft.operators.Indexed.fixture(spark, sfDir)

    (1 to 4).foreach { round =>
      println(s"[probe17] ===== round $round (idx75 phases) =====")
      val dim = graft.operators.Indexed.lineitemIndexed(spark, sfDir)
        .filter(col("l_orderkey") < 3L)
        .select(col("l_ukey").as("probe"))
      val keys = t("idx75 dim collect") {
        dim.na.drop().distinct().limit(65537).collect().map(_.get(0)).toSeq
      }
      println(s"[probe17] keys: ${keys.size}")
      val dec = t("idx75 prunePlans (catalog walk)") {
        graft.prune.JoinPrune.prunePlans(
          spark, index, dataSchema, "l_ukey", keys)
      }
      println(s"[probe17] route=${dec.route} scanned=${dec.scannedGroups}/${dec.totalGroups}")
      t("idx75 pruned scan + join + count") {
        val scan = graft.sources.RowGroupSkipScan.scan(
          spark, dataDir, dec.plans, dataSchema,
          requiredCols = Seq("l_ukey", "l_orderkey", "l_linenumber", "l_quantity"))
        val keysDf = dim.distinct()
        scan.join(broadcast(keysDf), scan("l_ukey") === keysDf("probe"), "left_semi")
          .select("l_orderkey", "l_linenumber", "l_quantity").count()
      }
      t("idx75 end-to-end (bench shape)") {
        graft.SparkEntry.queries("idx75_semijoin_bloom")(spark, sfDir).count()
      }
      t("idx73 end-to-end (bench shape)") {
        graft.SparkEntry.queries("idx73_semijoin_inprobe")(spark, sfDir).count()
      }
      t("idx74 end-to-end (bench shape)") {
        graft.SparkEntry.queries("idx74_semijoin_envelope")(spark, sfDir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
