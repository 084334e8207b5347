package graft.dev

import graft._
import org.apache.spark.sql.SparkSession

/** Round-14 plan captures for PLANS.md: the row-number point lookup
  * (idx61) and the DST-piecewise family (idx62–64).
  * Usage: SCRATCH_DIR=/root/testdata/sf0.001 sbt "Test/runMain graft.dev.PlanDump14"
  */
object PlanDump14 {
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
    Seq("idx61_rowfetch", "idx65_rowfetch_in", "idx62_groupby_nyday",
      "idx63_groupby_nydow", "idx64_filter_nyweekend",
      "idx66_filter_nyday_eq", "idx67_ny_weekend_report").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(2000))
      println(s"rows=${df.count()}")
      if (name == "idx64_filter_nyweekend")
        graft.operators.Indexed.lastNyDayPartsExecution(spark, sfDir)
          .foreach(ex => println(s"execution: $ex"))
    }
    spark.stop()
  }
}
