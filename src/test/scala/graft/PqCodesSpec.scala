package graft

import graft.operators.AnnSearch
import org.apache.spark.sql.functions._

/** r16 fused PQ encoder (functions/PqCodes.scala): code-for-code equality
  * with the least(dist·K + c) % K expression form it replaced, on the real
  * fitted codebooks over the real corpus, plus the null/short-vector
  * propagation semantics. */
class PqCodesSpec extends SparkSpec {

  test("fused encode equals the expression form on the real corpus") {
    val dir = sf("sf0.01")
    val cbs = AnnSearch.fitPqCodebooks(spark, dir)
    val q = AnnSearch.quantized(spark, dir)
    val fused = q.select(col("vec_id") +: AnnSearch.pqCodeCols(cbs): _*)
    val expr = (0 until 8).foldLeft(q.select(col("vec_id"), col("v"))) {
      (df, m) => df.withColumn(s"c$m", AnnSearch.pqCode(m, cbs(m)))
    }.drop("v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 to 8).map(r.get).mkString(",")).sorted.toSeq
    val a = rows(fused)
    assert(a.nonEmpty)
    assert(a == rows(expr))
  }

  test("null element and short vector yield NULL codes like the old form") {
    import spark.implicits._
    val cbs = AnnSearch.fitPqCodebooks(spark, sf("sf0.01"))
    val vs = Seq(
      Seq.tabulate(64)(i => if (i == 10) null else java.lang.Long.valueOf(i)),
      Seq.tabulate(20)(i => java.lang.Long.valueOf(i))) // short: subspaces 2.. incomplete
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "v")
    val got = df.select(col("vec_id") +: AnnSearch.pqCodeCols(cbs): _*)
      .orderBy("vec_id").collect()
    // vec 0: subspace 1 (elements 8..15) holds the null -> c1 NULL, others set
    assert(got(0).isNullAt(2) && !got(0).isNullAt(1) && !got(0).isNullAt(3))
    // vec 1: 20 elements -> subspaces 0,1 complete; 2 incomplete (16..23);
    // 3+ entirely out of range
    assert(!got(1).isNullAt(1) && !got(1).isNullAt(2))
    (3 to 8).foreach(i => assert(got(1).isNullAt(i), s"col $i"))
  }
}
