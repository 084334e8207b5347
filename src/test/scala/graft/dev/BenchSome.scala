package graft.dev

import graft._
import org.apache.spark.sql.SparkSession

/** Targeted re-measure of a named query subset with graft.Bench's exact
  * methodology (warmup + median-of-3 for batch queries; min-of-2, no
  * warmup for st* gates) at the canonical config — the per-change
  * measurement loop of the r16 optimization round.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.dev.BenchSome tx20_bpe_pair_counts st9_stream_dayparts"
  */
object BenchSome {
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
    try operators.Indexed.lineitemIndexed(spark, sfDir).count()
    catch { case _: Throwable => () }
    args.toSeq.foreach { name =>
      val fn = SparkEntry.queries(name)
      val isStream = name.startsWith("st")
      val nRuns = if (isStream) 2 else 3
      if (!isStream) {
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val timing =
        if (isStream) runs.min else runs.sorted.apply(runs.size / 2)
      println(f"[benchsome] $name%-28s $timing%.3f s  (runs: ${
        runs.map(r => f"$r%.3f").mkString(" ")})")
    }
    spark.stop()
  }
}
