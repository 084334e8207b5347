package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused centroid-cell ranking (r17 optimization): the top-`n` cells of a
  * quantized vector against K integer centroids in one K·dim multiply-add
  * pass — replaces ann3/ann5/emb5/dd7's
  * `-array_max(cellScoreArr).getField("i")` (argmax) and
  * `slice(reverse(array_sort(cellScoreArr)), 1, n)` (probes), which
  * materialize an array of K score structs per row and sort it
  * (guide §1.2 step 2: per-task work).
  *
  * Result-identical to the expression form ([[graft.operators.AnnSearch.cellScoreArr]]
  * stays as the reference; CellTopSpec pins equality on the real fixture
  * and adversarial inputs):
  *  - per-cell score = (d·|d|) / (nn·‖c‖²) as ONE IEEE double division of
  *    exactly-representable integers — the dot `d` uses [[DotLong]]'s
  *    semantics verbatim (null elements contribute 0, length mismatch
  *    uses the shorter prefix, UNCHECKED multiply-add), while the two
  *    products are CHECKED (`multiplyExact`/`absExact`) exactly like the
  *    ANSI-mode Catalyst multiplies they replace;
  *  - ordering is (score DESC, cell ASC) via `Double.compare` — Spark's
  *    struct ordering on (s, -c) with NaN greatest, matching the
  *    array_max/array_sort pipeline (ties break to the LOWER cell).
  *    −0.0 cannot arise (the numerator is an integer cast), and a ZERO
  *    divisor (zero vector or zero centroid norm) throws exactly like
  *    the ANSI Divide it replaces;
  *  - a NULL vector (or norm) yields cells [0, 1, …) — exactly what the
  *    old pipeline produced there (every score struct carries a NULL
  *    score, struct order falls to the −c field), so the kernel is
  *    non-nullable like the array_max chain it replaces.
  */
object CellTop {

  /** Static core, called from generated code. `cents` is the flattened
    * K×dim centroid tensor (cell-major); `normsSq` the K centroid norm²
    * values (computed driver-side like the `lit(ncSq)` they replace). */
  def top(v: ArrayData, nn: Long, cents: Array[Long], normsSq: Array[Long],
      dim: Int, n: Int): ArrayData = {
    val k = normsSq.length
    val take = math.min(n, k)
    val scores = new Array[Double](k)
    val m = math.min(dim, v.numElements())
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0L
      var i = 0
      while (i < m) {
        if (!v.isNullAt(i)) d += v.getLong(i) * cents(base + i)
        i += 1
      }
      val num = Math.multiplyExact(d, Math.absExact(d))
      val den = Math.multiplyExact(nn, normsSq(c))
      // ANSI parity: the replaced Divide throws on a zero divisor even for
      // doubles (a zero vector or zero centroid norm) — mirror it rather
      // than silently ranking by NaN
      if (den == 0L) throw new ArithmeticException(
        "Division by zero (cell score with zero vector/centroid norm)")
      scores(c) = num.toDouble / den.toDouble
      c += 1
    }
    val out = new Array[Any](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var best = -1
      var i = 0
      while (i < k) {
        // strict '>' keeps the earlier (lower) cell on ties; Double.compare
        // ranks NaN above every value — Spark's double ordering
        if (!used(i) &&
            (best < 0 || java.lang.Double.compare(scores(i), scores(best)) > 0))
          best = i
        i += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** The old pipeline's output on a NULL input row: all score structs
    * carry NULL scores, ordering falls to the −c field → cells ascending. */
  def nullOrder(k: Int, n: Int): ArrayData =
    new GenericArrayData(Array.tabulate[Any](math.min(n, k))(identity))
}

/** Expression face of [[CellTop.top]] — `array<int>` of the top-`n` cell
  * ids, inside whole-stage codegen ([[DotLong]]'s static-call form).
  * `cents` must be rectangular (K rows × dim). */
case class CellTopIds(vec: Expression, norm: Expression,
    cents: Seq[Seq[Long]], n: Int) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = norm

  private val k = cents.size
  private val dim = cents.head.size

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, norm.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cell_top"

  @transient private lazy val flat: Array[Long] = cents.flatten.toArray
  @transient private lazy val normsSq: Array[Long] =
    cents.map(cv => cv.map(x => x * x).sum).toArray

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val nn = norm.eval(input)
    if (v == null || nn == null) CellTop.nullOrder(k, n)
    else CellTop.top(v.asInstanceOf[ArrayData], nn.asInstanceOf[Long],
      flat, normsSq, dim, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellCents", flat, "long[]")
    val normsRef = ctx.addReferenceObj("cellNormsSq", normsSq, "long[]")
    val vE = vec.genCode(ctx)
    val nE = norm.genCode(ctx)
    val resultCode =
      code"""
        ${vE.code}
        ${nE.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          (${vE.isNull} || ${nE.isNull})
          ? graft.functions.CellTop.nullOrder($k, $n)
          : graft.functions.CellTop.top(${vE.value}, ${nE.value},
              $centsRef, $normsRef, $dim, $n);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellTopIds =
    copy(vec = newLeft, norm = newRight)
}
