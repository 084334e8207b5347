package graft.dev

import graft._
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-loop slice of [[graft.Verify]]: dump ONLY the named queries (args)
  * plus their oracle entries, so `scripts/check.py` can hash-compare one
  * new operator in seconds instead of re-running the whole inventory.
  * Usage: SCRATCH_DIR=/root/testdata/sf0.001 SCRATCH_OUT=/tmp/v1 \
  *   sbt "runMain graft.dev.VerifyOne dd10_incremental"
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.getOrElse("SCRATCH_OUT", "/tmp/verify_one")
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = SparkEntry.oracleSql.filter(kv => args.contains(kv._1))
    val json = oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
