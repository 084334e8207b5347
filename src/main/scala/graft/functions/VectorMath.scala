package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared quantized-vector math for dedup/ANN operators. */
object VectorMath {

  /** floor(x*1000) quantization — floor of an exact double product is
    * bit-identical across engines, unlike round() (half-up vs half-even)
    * or float casts. */
  def quant(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1000).cast("long"))

  /** Integer dot product. Uses the native codegen [[DotLong]] when the
    * session has graft extensions registered; falls back to the built-in
    * zip_with/aggregate pipeline otherwise (identical results). */
  def dot(s: SparkSession, a: Column, b: Column): Column =
    if (s.catalog.functionExists("graft_dot")) call_function("graft_dot", a, b)
    else aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
}
