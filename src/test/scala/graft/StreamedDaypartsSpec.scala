package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** st9: the r13 determined-part certificates composed with STREAMING
  * ingest — IndexedSink maintains footer stats and the user_id sum
  * ledger per daily micro-batch, and the seasonality rollup folds from
  * exactly those catalog rows (nothing re-indexed after the stream
  * stops). Pins (1) the fold really happens — a LocalRelation plan, zero
  * data jobs — on the sink-built catalog, (2) kill-switch equality, and
  * (3) the scan-path refinement (PartPrune) fires on the streamed layout
  * too. Incremental-ingest-equals-batch for the certificate family,
  * through the streaming seam. */
class StreamedDaypartsSpec extends SparkSpec {

  private def folded(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case l: LocalRelation => l }.isDefined &&
      p.collectFirst { case r: LogicalRelation => r }.isEmpty
  }

  test("the sink-maintained catalog serves the day-of-week rollup with zero data jobs") {
    // sum + HLL together: this spec is where the multi-ledger-through-
    // one-sink composition stays pinned now that each driver gate
    // maintains only the ledger its query consumes (r16)
    graft.streaming.EventStreams.withStreamedDayparts(spark, sf("sf0.001"),
      sumCols = Seq("user_id"), hllCols = Seq("user_id")) { (df, index) =>
      def roll = df.groupBy(dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("su"),
          min(col("ts")).as("mnts"), max(col("ts")).as("mxts"))
      assert(folded(roll), roll.queryExecution.optimizedPlan.toString)
      val got = roll.collect().sortBy(_.toString)
      assert(got.length >= 2, "fixture produced fewer than 2 weekday groups")
      spark.conf.set("spark.graft.statsAggPushdown", "false")
      val want = try roll.collect().sortBy(_.toString)
        finally spark.conf.unset("spark.graft.statsAggPushdown")
      assert(got === want)

      // the scan path prunes the streamed day files by part constancy too
      val sel = df.filter(dayofweek(col("ts")) === lit(got.head.getInt(0)))
        .select("event_id")
      val rows = sel.collect()
      spark.conf.set("spark.graft.partPrune", "false")
      val wantRows = try sel.collect()
        finally spark.conf.unset("spark.graft.partPrune")
      assert(rows.map(_.getLong(0)).sorted === wantRows.map(_.getLong(0)).sorted)

      // the sink also maintained the HLL ledger per batch (r15): the
      // distinct-user estimate serves from the catalog it built, within
      // 4 sigma of the exact count over the streamed table
      val est = index.approxDistinct("user_id")
        .getOrElse(fail("sink-maintained HLL ledger missing"))
      val exact = df.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
      assert(math.abs(est - exact) <= math.max(4L, (exact * 0.092).toLong),
        s"est=$est exact=$exact")

      // the AUTOMATIC semi-join rule (r15) fires on the sink-built
      // catalog too: three point keys prune the four day files, the
      // exact join stays above, the kill switch restores equality
      val lo = index.minIndexedValue("event_id").get
        .asInstanceOf[Number].longValue
      val hi = index.maxIndexedValue("event_id").get
        .asInstanceOf[Number].longValue
      import spark.implicits._
      val dim = Seq(lo, hi).toDF("k")
      def semi = df.join(dim, df("event_id") === dim("k"), "left_semi")
        .select("event_id")
      val semiRows = semi.collect().map(_.getLong(0)).sorted
      assert(semiRows.toSeq == Seq(lo, hi))
      val p = semi.queryExecution.optimizedPlan
      assert(p.collectFirst { case s: graft.plans.RowGroupScan => s }.isDefined,
        s"join-prune did not fire on the streamed catalog:\n$p")
    }
  }
}
