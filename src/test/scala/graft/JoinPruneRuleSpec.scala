package graft

import graft.prune.JoinPrune
import org.apache.spark.sql.functions._

/** Automatic semi-join pruning (plans/JoinPruneRule, r15): the rule
  * fires on a plain equi-join against the indexed relation, records its
  * route, and equals the kill-switched declarative join; outer joins,
  * huge dim sides, and over-limit key sets decline to the declarative
  * plan.
  */
class JoinPruneRuleSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private lazy val fact = operators.Indexed.lineitemIndexed(spark, dir)
  // 499000 keeps the key set point-sparse on the 8-group sf0.001 fixture
  // (a scattered-everywhere set cannot narrow, and the rule then declines
  // by design)
  private lazy val dim = Tables.load(spark, dir, "orders")
    .filter(col("o_totalprice") > 499000.0).select("o_orderkey")

  private def joined =
    fact.join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))

  test("the rule fires on a plain join, prunes, and stays exact") {
    val got = joined.collect().map(_.toString).sorted
    val exec = operators.Indexed.lastExecution(spark, dir)
      .getOrElse(fail("no pruning execution recorded"))
    assert(exec.route.exists(_.startsWith("join-prune:")),
      s"route was ${exec.route}")
    assert(exec.scannedRowGroups < exec.totalRowGroups,
      "the join pruned nothing on the range-clustered fixture")
    spark.conf.set("spark.graft.joinPrune", "false")
    val want = try joined.collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.joinPrune")
    assert(got === want)
  }

  test("scan leaf: the optimized plan carries RowGroupScan, not the relation") {
    val p = joined.queryExecution.optimizedPlan
    assert(p.collectFirst { case s: plans.RowGroupScan => s }.isDefined,
      s"no RowGroupScan leaf:\n$p")
  }

  test("an OUTER join never fires (unmatched fact rows must survive)") {
    val q = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_outer")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val p = q.queryExecution.optimizedPlan
    assert(p.collectFirst { case s: plans.RowGroupScan => s }.isEmpty,
      s"rule fired on an outer join:\n$p")
    // and the answer is the full fact tally (outer semantics intact)
    assert(q.agg(sum("n")).collect()(0).getLong(0) ==
      Tables.load(spark, dir, "lineitem").count())
  }

  test("a dim past the size estimate declines to the declarative join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val p = joined.queryExecution.optimizedPlan
      assert(p.collectFirst { case s: plans.RowGroupScan => s }.isEmpty,
        s"rule fired past the size gate:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("a fact-side Filter is traversed and stays above the substituted leaf") {
    val q = fact.filter(col("l_quantity") > 10.0)
      .join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val p = q.queryExecution.optimizedPlan
    assert(p.collectFirst { case s: plans.RowGroupScan => s }.isDefined,
      s"rule did not traverse the fact-side Filter:\n$p")
    val got = q.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.joinPrune", "false")
    val want = try q.collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.joinPrune")
    assert(got === want)
  }

  test("an INNER join with the fact on the RIGHT fires via the mirror") {
    val q = dim.join(fact, fact("l_orderkey") === dim("o_orderkey"), "inner")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sk"))
    val p = q.queryExecution.optimizedPlan
    assert(p.collectFirst { case s: plans.RowGroupScan => s }.isDefined,
      s"mirror did not fire:\n$p")
    val got = q.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.joinPrune", "false")
    val want = try q.collect().map(_.toString).sorted
      finally spark.conf.unset("spark.graft.joinPrune")
    assert(got === want)
  }

  test("an over-limit key set declines (bounded collect, unpruned plan)") {
    // every orderkey qualifies -> key count > DefaultMaxKeys only if the
    // fixture were big enough; emulate by dropping the limit to the conf?
    // The rule's bound is a constant, so instead verify the bounded
    // collect contract at the JoinPrune API level:
    val (index, schema, _) = operators.Indexed.fixture(spark, dir)
    val dec = JoinPrune.prunePlans(spark, index, schema, "l_orderkey",
      (0L until 100L), maxKeys = 50)
    assert(dec.route == "degrade-cardinality")
    assert(dec.scannedGroups == dec.totalGroups)
  }
}
