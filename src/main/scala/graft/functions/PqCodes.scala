package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused product-quantization encoder (r16 optimization): ALL M subspace
  * codes of a quantized vector in one loop — replaces ann4/ann5's
  * per-(subspace, code) `aggregate(zip_with(slice(v…), lit, sq))` chains
  * (M·K = 128 slice + zip_with array materializations PER ROW) with one
  * M·K·subdim multiply-add pass over the ArrayData (guide §1.2 step 2).
  *
  * Result-identical to the expression form (PqFitSpec/ann oracles pin it
  * end-to-end; PqCodesSpec pins it directly): per subspace the code is
  * `least_c(dist(m,c)·K + c) % K` — exact integer L2 with ties to the
  * LOWER code — and the expression pipeline's null semantics are kept:
  * a subspace whose slice is incomplete or contains a null element
  * yields a NULL code (null propagates through the old zip_with sum into
  * every candidate's `least`).
  */
object PqCodes {

  /** Static core, called from generated code. `books` is the flattened
    * codebook tensor `[m][k][subdim]` (m-major, then k, then dim). */
  def encode(v: ArrayData, books: Array[Long], m: Int, k: Int,
      subDim: Int): ArrayData = {
    val out = new Array[Any](m)
    val n = v.numElements()
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var nullSub = base + subDim > n
      if (!nullSub) {
        var d = 0
        while (d < subDim && !nullSub) {
          if (v.isNullAt(base + d)) nullSub = true
          d += 1
        }
      }
      if (nullSub) out(mi) = null
      else {
        var best = Long.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0L
          var d = 0
          val cb = (mi * k + c) * subDim
          while (d < subDim) {
            // checked arithmetic end to end: the replaced zip_with/aggregate
            // expressions ran under the session's ANSI mode (Spark 4
            // default: throw on Long overflow) — a silent wrap here would
            // diverge from them exactly at the magnitudes where it matters
            val diff = Math.subtractExact(v.getLong(base + d), books(cb + d))
            dist = Math.addExact(dist, Math.multiplyExact(diff, diff))
            d += 1
          }
          val keyed = Math.addExact(Math.multiplyExact(dist, k.toLong), c.toLong)
          if (keyed < best) best = keyed
          c += 1
        }
        out(mi) = best % k
      }
      mi += 1
    }
    new GenericArrayData(out)
  }
}

/** Expression face of [[PqCodes.encode]] — one `array<bigint>` of the M
  * codes, inside whole-stage codegen ([[DotLong]]'s static-call form).
  * `books(m)(c)(d)` must be rectangular. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  private val m = books.size
  private val k = books.head.size
  private val subDim = books.head.head.size

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val flat: Array[Long] =
    books.flatten.flatten.toArray

  override protected def nullSafeEval(v: Any): Any =
    PqCodes.encode(v.asInstanceOf[ArrayData], flat, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqCodes.encode($v, $booksRef, $m, $k, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
