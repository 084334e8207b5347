package graft.dev
import graft._
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SCRATCH_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SCRATCH_CPUS", "8"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    // SCRATCH_AB="k=v,k=v2": run each query under each conf value, interleaved
    val ab = sys.env.get("SCRATCH_AB").map { s =>
      val Array(k, vs) = s.split("=", 2); (k, vs.split(",").toSeq)
    }
    args.foreach { name =>
      (1 to 3).foreach { i =>
        ab match {
          case Some((k, vals)) => vals.foreach { v =>
            spark.conf.set(k, v)
            val t0 = System.nanoTime()
            val n = SparkEntry.queries(name)(spark, dir).count()
            println(f"$name run$i [$k=$v]: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
            spark.catalog.clearCache()
          }
          case None =>
            val t0 = System.nanoTime()
            val n = SparkEntry.queries(name)(spark, dir).count()
            println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
            spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
