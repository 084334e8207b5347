package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r12 image-key family: parity + route tags. */
object ScratchImg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val df = graft.operators.Indexed.lineitemTime(spark, dir)
    val plain = spark.read.parquet(
      graft.operators.Indexed.fixtureTimeDir(spark, dir))

    def check(tag: String, mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val got = mk(df).collect().map(_.toString).toSeq
      val want = mk(plain).collect().map(_.toString).toSeq
      val ex = graft.operators.Indexed.lastTimeExecution(spark, dir)
      val route = ex.map(_.route.mkString(",")).getOrElse("<none>")
      val kept = ex.map(e =>
        s"${e.plans.map(_.scanRowGroups.size).sum}/${e.totalRowGroups}")
        .getOrElse("?")
      println(s"$tag: ${if (got == want) "OK" else "MISMATCH"} route=$route kept=$kept")
      if (got != want) {
        println("  got:  " + got.take(3).mkString(" | "))
        println("  want: " + want.take(3).mkString(" | "))
      }
    }

    check("year+unixsec", d => d
      .orderBy(year(col("l_shipdate")).desc, unix_timestamp(col("l_shipdate")).desc,
        col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc)
      .limit(10).select("l_shipdate", "l_orderkey", "l_linenumber"))

    check("ymd-run", d => d
      .orderBy(year(col("l_shipdate")).desc, month(col("l_shipdate")).desc,
        dayofmonth(col("l_shipdate")).desc, col("l_orderkey").desc,
        col("l_linenumber").desc)
      .limit(10).select("l_shipdate", "l_orderkey", "l_linenumber"))

    check("ym-run-asc", d => d
      .orderBy(year(col("l_shipdate")).asc, month(col("l_shipdate")).asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10).select("l_shipdate", "l_orderkey", "l_linenumber"))

    // non-UTC fixed offset: date_trunc must still prune
    spark.conf.set("spark.sql.session.timeZone", "+05:30")
    try {
      check("trunc-offset", d => d
        .orderBy(date_trunc("day", col("l_shipdate")).desc,
          col("l_orderkey").desc, col("l_linenumber").desc)
        .limit(10).select("l_shipdate", "l_orderkey", "l_linenumber"))
      check("castdate-offset", d => d
        .orderBy(col("l_shipdate").cast("date").desc,
          col("l_orderkey").desc, col("l_linenumber").desc)
        .limit(10).select("l_shipdate", "l_orderkey", "l_linenumber"))
      // geographic zone must DEGRADE (no topk route), not mis-prune
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      check("trunc-geozone", d => d
        .orderBy(date_trunc("day", col("l_shipdate")).desc,
          col("l_orderkey").desc).limit(10)
        .select("l_shipdate", "l_orderkey"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")

    spark.stop()
  }
}
