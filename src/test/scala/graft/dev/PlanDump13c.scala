package graft.dev

import org.apache.spark.sql.SparkSession

/** Dump idx59's within-file byte-range plan for PLANS.md — at sf0.01,
  * where lineitemTime files hold ~4 row groups each (sf0.001 has one
  * row group per file, so the narrowing there is whole-file and the
  * listFiles path stands). */
object PlanDump13c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val q = graft.SparkEntry.registry.find(_.name == "idx59_filter_year_rows").get
    val df = q.fn(spark, dir)
    println("@@rows=" + df.count())
    println("@@## idx59_filter_year_rows (sf0.01)")
    println("@@```")
    df.queryExecution.executedPlan.toString.linesIterator.take(6)
      .foreach(l => println("@@" + l.take(400)))
    println("@@```")
    graft.operators.Indexed.lastTimeExecution(spark, dir).foreach { ex =>
      println(s"@@(kept ${ex.scannedRowGroups} of ${ex.totalRowGroups} row groups " +
        s"across ${ex.scannedFiles.size} files; route ${ex.route.mkString(",")})")
    }
  }
}
