package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch operators (no SQL oracle possible —
  * estimates are engine-specific): HLL distinct counts within the
  * configured relative error, approximate median within the exact
  * inter-quartile neighborhood.
  */
class SketchAccuracySpec extends SparkSpec {

  private val dir = sf("sf0.01")

  private def sketch(sfDir: String) = Tables.load(spark, sfDir, "lineitem")
    .groupBy("l_returnflag")
    .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))

  test("approx_count_distinct within 3x configured 2% rsd of exact") {
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = sketch(dir)
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
    val approx = sketch(dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    bounds.foreach { case (k, (lo, hi)) =>
      val m = approx(k)
      assert(m >= lo && m <= hi, s"$k: approx median $m outside [$lo, $hi]")
    }
  }

  test("sk1 driver-visible accuracy booleans are all TRUE at two SFs") {
    Seq(sf("sf0.001"), dir).foreach { d =>
      val rows = SparkEntry.queries("sk1_sketches")(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getBoolean(1), s"${r.getString(0)} parts_within_6pct false in $d")
        assert(r.getBoolean(2), s"${r.getString(0)} median_within_iqr false in $d")
      }
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
