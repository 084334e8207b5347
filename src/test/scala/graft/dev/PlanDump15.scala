package graft.dev

import graft._
import org.apache.spark.sql.SparkSession

/** Round-15 plan captures for PLANS.md: the semi-join pruning family
  * (idx73–75, idx79 automatic), the quantile ledger (idx76–77), the
  * rollup fold (idx78), and the sampling plan shapes (sm1, sm4).
  * Usage: SCRATCH_DIR=/root/testdata/sf0.001 sbt "Test/runMain graft.dev.PlanDump15"
  */
object PlanDump15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("idx73_semijoin_inprobe", "idx74_semijoin_envelope",
      "idx75_semijoin_bloom", "idx79_semijoin_routed",
      "idx83_starjoin_inner", "idx78_rollup_fold", "idx81_cube_fold",
      "sm1_bernoulli_sample", "sm4_uniform_k")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(s"\n===== $name =====")
        println(df.queryExecution.executedPlan.toString.take(2200))
        println(s"rows=${df.count()}")
        // only the AUTOMATIC rule records through the FileIndex; the
        // explicit semiJoinScan's Decision is internal to the query
        if (name == "idx79_semijoin_routed")
          graft.operators.Indexed.lastExecution(spark, sfDir)
            .foreach(ex => println(s"execution: route=${ex.route} " +
              s"groups=${ex.scannedRowGroups}/${ex.totalRowGroups} ${ex.render}"))
      }
    spark.stop()
  }
}
