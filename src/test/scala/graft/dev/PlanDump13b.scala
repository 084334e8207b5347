package graft.dev

import org.apache.spark.sql.SparkSession

/** Dump the round-13 determined-part exemplar plans for PLANS.md. */
object PlanDump13b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def dump(name: String): Unit = {
      val q = graft.SparkEntry.registry.find(_.name == name).get
      val df = q.fn(spark, dir)
      df.collect()
      println(s"@@## $name")
      println("@@```")
      df.queryExecution.executedPlan.toString.linesIterator.take(10)
        .foreach(l => println("@@" + l))
      println("@@```")
      graft.operators.Indexed.lastDayPartsExecution(spark, dir).foreach { ex =>
        if (name == "idx56_filter_part_rows")
          println(s"@@(kept ${ex.scannedFiles.size} of ${ex.totalFiles} files, " +
            s"${ex.scannedRowGroups} of ${ex.totalRowGroups} row groups; " +
            s"route ${ex.route.mkString(",")})")
      }
      println("@@")
    }
    Seq("idx48_groupby_dow", "idx51_groupby_daylabel", "idx55_agg_part_extremes",
      "idx56_filter_part_rows", "idx57_distinct_labels").foreach(dump)
  }
}
