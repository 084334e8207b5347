package graft

import graft.functions.GramSum
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.functions._

/** r16 gram aggregate (functions/GramSum.scala): cell-exact equality with
  * the exploded outer-product shape it replaced, including null factors
  * and multi-partition merges; overflow fails loudly (ANSI posture). */
class GramSumSpec extends SparkSpec {

  private def gramOf(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val gram = GraftSqlShim.column(
      GramSum(GraftSqlShim.expression(col("v")), d).toAggregateExpression())
    df.agg(gram).collect()(0).getSeq[Long](0)
  }

  private def explodedOf(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val v = col("v")
    df.select(explode(flatten(transform(sequence(lit(1), lit(d)), i =>
        transform(sequence(i, lit(d)), j =>
          struct(i.cast("int").as("i"), j.cast("int").as("j"),
            (element_at(v, i) * element_at(v, j)).as("p")))))).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p")).as("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
  }

  private def cellIndex(i: Int, j: Int, d: Int): Int =
    (i - 1) * (2 * d - i + 2) / 2 + (j - i)

  test("aggregate equals the exploded shape across partitions") {
    import spark.implicits._
    val d = 8
    val rnd = new scala.util.Random(20260818L)
    val rows = (1 to 500).map(_ => Seq.fill(d)(rnd.nextInt(2001).toLong - 1000))
    val df = rows.toDF("v").repartition(7) // force partial/merge path
    val flat = gramOf(df, d)
    val want = explodedOf(df, d)
    assert(flat.length == d * (d + 1) / 2)
    for (i <- 1 to d; j <- i to d)
      assert(flat(cellIndex(i, j, d)) == want((i, j)), s"cell ($i,$j)")
  }

  test("overflow fails loudly at adversarial magnitudes (r17: product AND sum)") {
    import spark.implicits._
    // product overflow: 3.1e9 · 3.1e9 ≈ 9.6e18 > Long.MaxValue — the r16
    // kernel wrapped this silently (only the ADD was checked); r17 checks
    // the multiply too (Math.multiplyExact), matching the fail-closed
    // posture of the replaced ANSI-mode multiply+SUM pipeline
    val big = 3100000000L
    val prodDf = Seq(Seq(big, 0L)).toDF("v")
    val e1 = intercept[Exception] { gramOf(prodDf, 2) }
    assert(exceptionChain(e1).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in the cause chain, got $e1")
    // sum overflow: each product ≈ 8.8e18 fits a long, two of them do not
    val nearMax = 2970000000L // nearMax² ≈ 8.82e18 < Long.MaxValue
    val sumDf = Seq(Seq(nearMax, 0L), Seq(nearMax, 0L)).toDF("v")
    val e2 = intercept[Exception] { gramOf(sumDf, 2) }
    assert(exceptionChain(e2).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in the cause chain, got $e2")
    // the same magnitudes BELOW the edge still compute exactly
    val okDf = Seq(Seq(nearMax, 0L)).toDF("v")
    assert(gramOf(okDf, 2)(0) == nearMax * nearMax)
  }

  private def exceptionChain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("emb3_gram serves the identical result through the new plan") {
    val got = SparkEntry.queries("emb3_gram")(spark, sf("sf0.001"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val d = graft.operators.AnnSearch.EmbeddingDim
    val want = explodedOf(
      Tables.load(spark, sf("sf0.001"), "embeddings")
        .select(graft.functions.VectorMath.quant(col("embedding")).as("v")), d)
    assert(got == want)
  }
}
