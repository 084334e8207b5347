package graft

import graft.operators.AnnSearch
import org.apache.spark.sql.functions._

/** r17 fused cell ranking (functions/CellTop.scala): row identity with the
  * `array_max` / `array_sort` pipeline over [[AnnSearch.cellScoreArr]] it
  * replaced — argmax cell and top-n probe list — on the real fitted
  * centroids over the real corpus, plus adversarial inputs (null vector,
  * null elements, zero vector/NaN scores, short vector) and overflow
  * parity (both forms fail loudly at ANSI-overflow magnitudes). */
class CellTopSpec extends SparkSpec {

  private def oldCols(cents: Array[Array[Long]], n: Int) = {
    val scoreArr = AnnSearch.cellScoreArr(spark, cents)
    ((-array_max(scoreArr).getField("i")).as("cell"),
      transform(slice(reverse(array_sort(scoreArr)), 1, n),
        p => p.getField("i") * -1).as("probes"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).mkString(",")))
      .sortBy(_._1).toSeq

  test("fused cell top-n equals the expression pipeline on the real corpus") {
    val dir = sf("sf0.01")
    val cents = AnnSearch.fitQuantizedCentroids(spark, dir)
    val q = AnnSearch.quantized(spark, dir)
    val (oldCell, oldProbes) = oldCols(cents, 2)
    val got = rows(q.select(col("vec_id"),
      element_at(AnnSearch.cellTopIds(cents, 1), 1).as("cell"),
      AnnSearch.cellTopIds(cents, 2).as("probes")))
    val want = rows(q.select(col("vec_id"), oldCell, oldProbes))
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("adversarial inputs match: null elements, negatives, short vector, ties") {
    import spark.implicits._
    val cents = Array(Array(1L, 0L, 0L, 0L), Array(0L, 1L, 0L, 0L),
      Array(1L, 1L, 1L, 1L))
    val vs: Seq[Seq[java.lang.Long]] = Seq(
      Seq[java.lang.Long](5L, 3L, -2L, 7L),           // plain
      Seq[java.lang.Long](5L, null, -2L, 7L),         // null element (contributes 0)
      Seq[java.lang.Long](-5L, -3L, 2L, -7L),         // negative dots (sign-preserving cos²)
      Seq[java.lang.Long](4L, 4L),                    // short vector (prefix dots)
      Seq[java.lang.Long](3L, 3L, 3L, 3L))            // ties across cells 0 and 1
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
      .withColumn("nn", graft.functions.VectorMath.dot(spark, col("v"), col("v")))
    val (oldCell, oldProbes) = oldCols(cents, 2)
    val got = rows(df.select(col("vec_id"),
      element_at(AnnSearch.cellTopIds(cents, 1), 1).as("cell"),
      AnnSearch.cellTopIds(cents, 2).as("probes")))
    val want = rows(df.select(col("vec_id"), oldCell, oldProbes))
    assert(got == want)
  }

  test("a ZERO vector throws on both forms (ANSI divide-by-zero parity)") {
    import spark.implicits._
    val cents = Array(Array(1L, 0L), Array(0L, 1L))
    val df = Seq((0L, Seq(0L, 0L))).toDF("vec_id", "v")
      .withColumn("nn", graft.functions.VectorMath.dot(spark, col("v"), col("v")))
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    def isDivOrArith(t: Throwable) = t.isInstanceOf[ArithmeticException] ||
      t.getClass.getName.contains("Arithmetic")
    val (oldCell, _) = oldCols(cents, 1)
    val eOld = intercept[Exception] { df.select(oldCell).collect() }
    val eNew = intercept[Exception] {
      df.select(element_at(AnnSearch.cellTopIds(cents, 1), 1)).collect()
    }
    assert(chain(eOld).exists(isDivOrArith), s"old form: $eOld")
    assert(chain(eNew).exists(isDivOrArith), s"new form: $eNew")
  }

  test("a NULL vector yields the old pipeline's cells-ascending order") {
    import spark.implicits._
    val cents = Array(Array(1L, 0L), Array(0L, 1L), Array(1L, 1L))
    val df = Seq((0L, Option.empty[Seq[Long]])).toDF("vec_id", "v")
      .withColumn("nn", graft.functions.VectorMath.dot(spark, col("v"), col("v")))
    val (oldCell, oldProbes) = oldCols(cents, 2)
    val got = rows(df.select(col("vec_id"),
      element_at(AnnSearch.cellTopIds(cents, 1), 1).as("cell"),
      AnnSearch.cellTopIds(cents, 2).as("probes")))
    assert(got == rows(df.select(col("vec_id"), oldCell, oldProbes)))
    assert(got == Seq((0L, 0, "0,1")))
  }

  test("overflow parity: both forms fail loudly at ANSI-overflow magnitudes") {
    import spark.implicits._
    // d ≈ 3.1e9 · 3.1e9 ≈ 9.6e18 fits the (wrapping) dot? No — the DOT
    // wraps by DotLong semantics on both paths; the d·|d| MULTIPLY is the
    // ANSI-checked edge. Use d ≈ 3.1e9 (one element) so d·|d| ≈ 9.6e18
    // overflows on both the Catalyst multiply and the kernel's
    // multiplyExact.
    val cents = Array(Array(3100000000L))
    val df = Seq((0L, Seq(1L))).toDF("vec_id", "v")
      .withColumn("nn", graft.functions.VectorMath.dot(spark, col("v"), col("v")))
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val (oldCell, _) = oldCols(cents, 1)
    val eOld = intercept[Exception] { df.select(oldCell).collect() }
    val eNew = intercept[Exception] {
      df.select(element_at(AnnSearch.cellTopIds(cents, 1), 1)).collect()
    }
    assert(chain(eOld).exists(t => t.isInstanceOf[ArithmeticException] ||
      t.getClass.getName.contains("Arithmetic")), s"old form: $eOld")
    assert(chain(eNew).exists(t => t.isInstanceOf[ArithmeticException] ||
      t.getClass.getName.contains("Arithmetic")), s"new form: $eNew")
  }
}
