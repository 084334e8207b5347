package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump round-13 exemplar plans for PLANS.md. */
object PlanDump13 {
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
      df.queryExecution.executedPlan.toString.linesIterator.take(14)
        .foreach(l => println("@@" + l))
      println("@@```")
      graft.operators.Indexed.lastTimeExecution(spark, dir).foreach { ex =>
        if (name.startsWith("idx3"))
          println(s"@@(kept ${ex.scannedRowGroups} of ${ex.totalRowGroups} row groups; route ${ex.route.mkString(",")})")
      }
      println("@@")
    }
    Seq("idx32_topk_year_run", "idx33_topk_unixsec", "idx38_filter_castdate",
      "idx39_filter_imgkeys", "idx40_agg_imgbounds", "idx41_groupby_year")
      .foreach(dump)
  }
}
