package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: same-bucketed tables join with NO shuffle
  * exchange on either side, and results match the plain join exactly.
  */
class BucketingSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("same-bucket-count tables join without any Exchange") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_linenumber")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previously crashed run can leave the managed location behind
      val loc = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
    }
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)

    // disable broadcast so the co-location (not a tiny-table broadcast)
    // is what eliminates the exchanges — at scale neither side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cojoin(spark, "li_b", "o_b", "l_orderkey")
      joined.collect() // AQE final plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(1500))
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${p.take(2000)}")
      // AQE prints Final + Initial plans; both sides bucketed in each
      assert("Bucketed: true".r.findAllIn(p).size >= 2, p.take(2000))

      // identical results to the unbucketed join
      val want = li.join(o, "l_orderkey").count()
      assert(joined.count() == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
  }
}
