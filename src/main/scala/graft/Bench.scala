package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one-time ingest (materialize + index build) happens outside query
    // timing — it's the reference's entry point B (index build), not a query
    try operators.Indexed.lineitemIndexed(spark, sfDir).count()
    catch { case _: Throwable => () }
    // steady-state timing: one untimed warmup run per query (JIT + codegen
    // compilation of each query's generated classes), then the MEDIAN of 3
    // measured runs — a single GC/contention burst in this shared sandbox
    // can otherwise inflate one run 10x and fabricate a phantom regression.
    // A query that throws reports -1 and is listed in "failures" instead of
    // silently contributing a near-zero timing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // per-query caches must not leak across timings
        (dt, ok)
      }
      val med = runs.map(_._1).sorted.apply(runs.size / 2)
      name -> (if (runs.forall(_._2)) med else -1.0)
    }
    val failures = results.collect { case (n, v) if v < 0 => "\"" + n + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failures":${failures.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
