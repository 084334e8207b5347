package graft.dev

import graft._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-17 optimization evidence capture (same protocol as PlanDump16):
  * `.explain("formatted")` for the queries this round touches, written to
  * plans/r17/<name>_<tag>.txt, plus a JOB COUNT probe — the streaming
  * gates' cost is per-micro-batch commit overhead, so "N Spark jobs per
  * gate" is the plan-shape evidence the formatted explain of the final
  * frame cannot show.
  * Usage: SCRATCH_DIR=/root/testdata/sf0.001 SCRATCH_TAG=before \
  *   sbt "Test/runMain graft.dev.PlanDump17 idx75_semijoin_bloom ..."
  */
object PlanDump17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.001")
    val tag = sys.env.getOrElse("SCRATCH_TAG", "before")
    val outDir = new java.io.File("plans/r17")
    outDir.mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    args.toSeq.foreach { name =>
      val before = jobs.get()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.write.format("noop").mode("overwrite").save()
      val after = jobs.get()
      val txt = s"===== $name ($tag, $sfDir) =====\n" +
        s"spark jobs (build + noop-sink run): ${after - before}\n\n" + plan
      val f = new java.io.File(outDir, s"${name}_$tag.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      println(s"wrote ${f.getPath} (${after - before} jobs)")
    }
    spark.stop()
  }
}
