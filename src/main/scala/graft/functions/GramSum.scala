package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Gram-matrix aggregate (r16 optimization): SUM over rows of the upper
  * triangle of v·vᵀ for an `array<long>` column, as ONE flat
  * `array<long>` of d(d+1)/2 cells in row-major upper-triangle order
  * ((i,j), 1-based, j ≥ i, cell index (i−1)·(2d−i+2)/2 + (j−i)).
  *
  * Replaces emb3's explode-then-aggregate shape: the pipeline fanned
  * every row into d(d+1)/2 struct rows and pushed ~N·d²/2 rows through a
  * hash aggregate — hashing an (i,j) key per product. Outer-product
  * additivity means no row ever needs another row, so the right plan is
  * one aggregation buffer per task holding the d² triangle and a tight
  * multiply-add loop per row (guide §1.2: first fix the algorithm — the
  * shuffle already carried only O(d²·tasks) cells, but the per-task work
  * was dominated by generating and hashing the exploded structs). The
  * partial/merge contract is element-wise addition, so the exchange
  * still carries one O(d²) buffer per task.
  *
  * Overflow posture: fail-closed — every product and cell sum uses the
  * checked `Math.multiplyExact` / `Math.addExact` and throws on Long
  * overflow. Under the session's ANSI mode (the Spark 4 default this
  * suite runs with) that matches the replaced multiply+SUM pipeline
  * exactly; in a non-ANSI session the replaced SUM would wrap silently,
  * so this kernel is strictly STRICTER there — an overflow that would
  * have produced a silently wrong gram cell becomes an error (the
  * suite's quantized grid keeps real values far below the edge).
  */
case class GramSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val cells = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_sum"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      // null elements contribute nothing (the pipeline's product rows
      // with a null factor summed as NULL-skipped); the fixture's quant()
      // never produces them
      var idx = 0
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) idx += dim - i
        else {
          val xi = arr.getLong(i)
          var j = i
          while (j < n) {
            if (!arr.isNullAt(j))
              buf(idx + (j - i)) = Math.addExact(
                buf(idx + (j - i)), Math.multiplyExact(xi, arr.getLong(j)))
            j += 1
          }
          idx += dim - i
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) {
      a(i) = Math.addExact(a(i), b(i))
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cells * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): GramSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSum =
    copy(child = newChildren.head)
}
