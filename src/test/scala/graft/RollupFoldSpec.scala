package graft

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** idx78: the ROLLUP report decomposed into per-grouping-set catalog
  * folds — pins that the WHOLE union is LocalRelations (zero data jobs)
  * and that it equals the kill-switched scan computation. */
class RollupFoldSpec extends SparkSpec {

  test("the rollup union folds every leg and equals the scan answer") {
    val dir = sf("sf0.001")
    def q = SparkEntry.queries("idx78_rollup_fold")(spark, dir)
    val p = q.queryExecution.optimizedPlan
    assert(p.collect { case l: LocalRelation => l }.size == 3,
      s"expected 3 folded legs:\n$p")
    assert(p.collectFirst { case r: LogicalRelation => r }.isEmpty,
      s"a leg fell back to the scan:\n$p")
    val got = q.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.statsAggPushdown", "false")
    val want = try q.collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.statsAggPushdown")
    assert(got === want)
    // ROLLUP shape: exactly one grand-total row, n legs consistent
    assert(got.length >= 3)
  }

  test("the cube union folds all four legs and equals the scan answer") {
    val dir = sf("sf0.001")
    def q = SparkEntry.queries("idx81_cube_fold")(spark, dir)
    val p = q.queryExecution.optimizedPlan
    assert(p.collect { case l: LocalRelation => l }.size == 4,
      s"expected 4 folded legs:\n$p")
    assert(p.collectFirst { case r: LogicalRelation => r }.isEmpty,
      s"a leg fell back to the scan:\n$p")
    val got = q.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.statsAggPushdown", "false")
    val want = try q.collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.statsAggPushdown")
    assert(got === want)
  }
}
