package graft

import org.apache.spark.sql.functions._

/** Deterministic sampling operators (operators/Sampling.scala, r15):
  * rate accuracy, reprocessing stability (the leakage guarantee), plan
  * shapes (map-only Bernoulli, TakeOrdered uniform-k), and per-stratum
  * counts. Values are oracle-checked by the driver; these pin what the
  * oracle can't see.
  */
class SamplingSpec extends SparkSpec {

  private val dir = sf("sf0.01")
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("bernoulli sample rate lands near 0x1999/0x10000 and is map-only") {
    val total = Tables.load(spark, dir, "lineitem").count()
    val kept = q("sm1_bernoulli_sample").count()
    val rate = kept.toDouble / total
    // binomial 4-sigma band around 9.98 % at n = 60 000
    assert(math.abs(rate - 0.0998) < 0.005, s"rate=$rate")
    val plan = q("sm1_bernoulli_sample").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"Bernoulli sample shuffled:\n$plan")
  }

  test("split assignment is a pure function of the row: subsets agree") {
    // reprocessing HALF the corpus must assign every document the same
    // split as the full run — the no-train/test-hop guarantee
    val full = q("sm3_hash_split")
    val h = substring(md5(concat_ws("-", col("doc_id"))), 1, 4)
    val split = when(h < "cccc", "train").when(h < "e666", "val")
      .otherwise("test")
    val subset = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .withColumn("split", split).select("doc_id", "split")
    val fullAssign = Tables.load(spark, dir, "documents")
      .withColumn("split", split).select("doc_id", "split")
    assert(subset.except(fullAssign).isEmpty,
      "a reprocessed subset hopped splits")
    // and the census covers every document exactly once
    val n = full.agg(sum("n")).collect()(0).getLong(0)
    assert(n == Tables.load(spark, dir, "documents").count())
  }

  test("stratified sample takes min(5, stratum) per stratum") {
    val got = q("sm2_stratified_sample").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Tables.load(spark, dir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.min(5L, n), s"$lang: ${got.get(lang)}")
    }
  }

  test("uniform-k plans as TakeOrdered, never a global sort") {
    val plan = q("sm4_uniform_k").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
