package graft.dev
import graft._
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = SparkEntry.queries("ann1_topk_brute")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println("HAS_BNLJ=" + p.contains("BroadcastNestedLoopJoin"))
    println("HAS_BHJ=" + p.contains("BroadcastHashJoin"))
    println("HAS_WSC=" + p.contains("WholeStageCodegen"))
    println("HAS_DOT=" + p.contains("graft_dot"))
    println(p.split("\n").take(25).mkString("\n"))
    spark.stop()
  }
}
