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

  test("overflow in the distance accumulation fails loudly (r17)") {
    import spark.implicits._
    // diff ≈ 3.1e9 −(−3.1e9) = 6.2e9, diff² ≈ 3.8e19 > Long.MaxValue: the
    // r16 kernel wrapped this silently where the replaced ANSI-mode
    // zip_with/aggregate chain threw; r17's checked multiply restores the
    // fail-closed posture (subtract/multiply/add all *Exact)
    val books = Seq(Seq(Seq(-3100000000L, 0L))) // m=1, k=1, subDim=2
    val enc = org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftSqlShim.expression(col("v")), books))
    val df = Seq(Seq(3100000000L, 0L)).toDF("v")
    val e = intercept[Exception] { df.select(enc).collect() }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in the cause chain, got $e")
    // the same shape below the edge still encodes (code 0 of 1): a small
    // codebook so diff² stays representable
    val encOk = org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftSqlShim.expression(col("v")),
        Seq(Seq(Seq(-100L, 0L)))))
    val ok = Seq(Seq(100L, 0L)).toDF("v")
    assert(ok.select(encOk).collect()(0).getSeq[Long](0) == Seq(0L))
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
