package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch operators (no SQL oracle possible —
  * estimates are engine-specific): HLL distinct counts within the
  * configured relative error, approximate median within the exact
  * inter-quartile neighborhood.
  */
class SketchAccuracySpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("approx_count_distinct within 3x configured 2% rsd of exact") {
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("sk1_sketches")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.06,
        s"$k: approx $ap vs exact $ex off by more than 6%")
    }
  }

  test("approx median between exact p25 and p75") {
    val li = Tables.load(spark, dir, "lineitem")
    val bounds = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("lo"),
        expr("percentile(l_extendedprice, 0.75)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("sk1_sketches")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    bounds.foreach { case (k, (lo, hi)) =>
      val m = approx(k)
      assert(m >= lo && m <= hi, s"$k: approx median $m outside [$lo, $hi]")
    }
  }

  test("bloom pre-filter result is exactly the semi-join result") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("bf1_bloom_semijoin")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.load(spark, dir, "orders").filter(col("o_totalprice") > 300000.0)
    val li = Tables.load(spark, dir, "lineitem")
    val want = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_semi")
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
