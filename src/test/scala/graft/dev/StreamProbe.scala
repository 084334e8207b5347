package graft.dev

import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: micro-batch timing breakdown of the st3 stream-stream join. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    EventStreams.streamJoinQuery(spark, dir).count() // warm fixture + JIT
    val fixture = EventStreams.streamFixtureDir(spark, dir)
    (1 to 2).foreach { i =>
      val src = EventStreams.readEventStream(spark, fixture)
      val t0 = System.nanoTime()
      val q = EventStreams.clickToPurchaseJoin(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"),
        watermarkDelay = "3650 days")
        .writeStream.format("memory").queryName(s"probe$i").outputMode("append")
        .start()
      q.processAllAvailable()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"attempt $i total ${total}%.2f s, batches: ${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"triggerMs=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} commit=${d.get("commitOffsets")} " +
          s"state=${p.stateOperators.map(s => s"commit=${s.commitTimeMs}ms mem=${s.memoryUsedBytes}").mkString("|")}")
      }
      q.stop()
    }
    spark.stop()
  }
}
