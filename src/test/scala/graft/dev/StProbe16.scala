package graft.dev

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** r16 profiling probe: run one streaming gate at sf0.1 and print every
  * Spark job's wall time + phase timestamps, to see where the per-gate
  * seconds go (jobs vs non-job driver time: Derby boot, checkpoint
  * fsyncs, trigger planning).
  * Usage: sbt "Test/runMain graft.dev.StProbe16 st9_stream_dayparts"
  */
object StProbe16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.operators.Indexed.lineitemIndexed(spark, sfDir).count()
    catch { case _: Throwable => () }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(_.name)).getOrElse("?")
        jobs.put(js.jobId, (js.time, desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, d) =>
          done.add((je.jobId, t0, je.time, d)) }
        ()
      }
    })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm run (fixture + JIT), then the measured run
      fn(spark, sfDir).count()
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val rows = done.toArray(Array.empty[(Int, Long, Long, String)]).sortBy(_._1)
      val base = rows.headOption.map(_._2).getOrElse(0L)
      var jobSum = 0L
      rows.foreach { case (id, s, e, d) =>
        jobSum += e - s
        println(f"[stprobe] job $id%3d +${s - base}%6dms ${e - s}%5dms  ${d.take(90)}")
      }
      println(f"[stprobe] $name: wall $wall%.2fs, ${rows.length} jobs, " +
        f"job-time sum ${jobSum / 1000.0}%.2fs (driver gaps ${wall - jobSum / 1000.0}%.2fs)")
    }
    spark.stop()
  }
}
