package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** How many Spark jobs does one connectedComponents round cost? (r17:
  * the lazy-checkpoint + count probe fold claims 1/round where r16 paid
  * an eager checkpoint + isEmpty = 2/round.) */
object CcProbe17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    // a chain 0-1-2-...-9 plus a separate component; diameter forces rounds
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++ Seq((100L, 101L))).toDF("a", "b")
    pairs.count() // materialize input outside the measured window
    Thread.sleep(200)
    val before = jobs.get()
    val (labels, rounds) = graft.operators.Dedup.connectedComponentsWithRounds(pairs)
    val mid = jobs.get()
    val n = labels.count()
    Thread.sleep(200)
    println(s"[ccprobe] rounds=$rounds jobsDuringCC=${mid - before} " +
      s"(per round ~${(mid - before).toDouble / rounds}) labelRows=$n")
    spark.stop()
  }
}
