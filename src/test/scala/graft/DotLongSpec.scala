package graft

import graft.functions.{DotLong, VectorMath}
import org.apache.spark.sql.functions._

/** The native codegen dot-product expression: SQL registration via
  * GraftExtensions, interpreted/codegen agreement, null handling, and
  * equivalence with the zip_with fallback. */
class DotLongSpec extends SparkSpec {

  test("graft_dot is callable from SQL (SparkSessionExtensions registration)") {
    val r = spark.sql("SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(r == 4 + 10 + 18)
  }

  test("null elements contribute zero; shorter prefix wins; null array -> null") {
    val rows = spark.sql(
      """SELECT graft_dot(array(1L, NULL, 3L), array(2L, 2L, 2L)) AS a,
        |       graft_dot(array(1L, 2L), array(3L)) AS b,
        |       graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c""".stripMargin)
      .collect().head
    assert(rows.getLong(0) == 2 + 6)
    assert(rows.getLong(1) == 3)
    assert(rows.isNullAt(2))
  }

  test("native expression equals the zip_with fallback on real embeddings") {
    import spark.implicits._
    val q = Tables.load(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), VectorMath.quant(col("embedding")).as("v"))
    val native = q.select(col("vec_id"), call_function("graft_dot", col("v"), col("v")).as("d"))
    val fallback = q.select(col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0L), (a, x) => a + x).as("d"))
    assert(native.except(fallback).isEmpty && fallback.except(native).isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(2L, 3L, 5L))
    val b = ArrayData.toArrayData(Array(7L, 11L, 13L))
    val e = DotLong(
      Literal.create(a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      Literal.create(b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 14L + 33L + 65L)
  }
}
