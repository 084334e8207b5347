package graft

import graft.functions.DotLong
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point (enable with
  * `spark.sql.extensions=graft.GraftExtensions`): registers the engine's
  * native functions (callable from SQL and `call_function`) and the
  * planner strategy for the external row-group skip scan's columnar
  * physical node.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotLong].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotLong(children(0), children(1))))
    ext.injectPlannerStrategy(session => graft.plans.RowGroupScanStrategy(session))
    // global MIN/MAX/COUNT over the index-backed relation → answered from
    // the stats catalog (O(index), zero data scanned) when certified exact
    ext.injectOptimizerRule(session => graft.plans.StatsAggPushdown(session))
    // ORDER BY c LIMIT k over the index-backed relation → scan only row
    // groups the catalog proves can contribute to the top k
    ext.injectOptimizerRule(session => graft.plans.TopKPushdown(session))
    // WHERE over determined parts / unrenderable images that narrows
    // WITHIN files → byte-range RowGroupScan (runs after the folds, so a
    // successful catalog fold always wins)
    ext.injectOptimizerRule(session => graft.plans.PartPruneScan(session))
    // equi-join against the indexed relation with a plan-time-small dim
    // side → fact row groups pruned by the dim's materialized keys (the
    // DPP protocol at row-group granularity)
    ext.injectOptimizerRule(session => graft.plans.JoinPruneRule(session))
  }
}
