package graft.dev
import graft._
import org.apache.spark.sql.SparkSession

/** Print the executed physical plan of the named queries (PLANS.md source).
  * Usage: runMain graft.dev.PlanDump q2_filter tx9_sample ... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"## $name\n")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString)
      println()
    }
    spark.stop()
  }
}
