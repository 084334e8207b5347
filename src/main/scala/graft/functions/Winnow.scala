package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints (r16 optimization): the distinct
  * window-minimum md5 hex values of a document's rolling char k-grams —
  * the whole tx5 per-row pipeline (k-gram md5 array → log₂(w) zip_with
  * minima passes → slice → array_distinct) as ONE expression evaluated in
  * a single pass over the UTF-8 bytes.
  *
  * Result-identical to the expression pipeline it replaces (WinnowSpec
  * pins row-set equality on real documents):
  *  - grams are code-point substrings, exactly Spark `substr` semantics
  *    (offsets walked over the UTF-8 bytes, like UTF8String.substringSQL);
  *  - md5 is computed over the gram's UTF-8 bytes, exactly Spark `md5`;
  *  - window minima compare raw 16-byte digests unsigned-lexicographically,
  *    which equals comparing their lowercase-hex renderings (hex is a
  *    monotone byte-wise encoding), so the kept values are identical;
  *  - distinct preserves first occurrence (LinkedHashSet), matching
  *    array_distinct.
  *
  * Why: the pipeline formulation materialized THREE n-length arrays of
  * 32-char hex strings per row and paid one `MessageDigest.getInstance`
  * + hex encode per gram; this loop reuses one digest instance per row,
  * hex-encodes only window winners, and allocates one flat digest buffer
  * (guide §1.2 step 2 — per-task work, after the job shape is right).
  * Codegen calls the static core directly, so the expression stays
  * inside whole-stage codegen like [[DotLong]].
  */
object Winnow {

  private val HexChars = "0123456789abcdef".getBytes

  /** The static core — called from generated code. `text` non-null;
    * returns the array of distinct window-min fingerprints (possibly
    * empty when the text is shorter than one full window, though tx5
    * filters those rows out before the call). */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nb = bytes.length
    // code-point byte offsets — Spark's substr counts code points
    var n = 0
    var off = 0
    while (off < nb) {
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    val g = n - k + 1 // full-length k-grams
    val nw = g - w + 1 // windows
    if (nw <= 0) return new GenericArrayData(Array.empty[Any])
    val cpOff = new Array[Int](n + 1)
    var cp = 0
    off = 0
    while (off < nb) {
      cpOff(cp) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      cp += 1
    }
    cpOff(n) = nb
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](g * 16)
    var i = 0
    while (i < g) {
      md.reset()
      md.update(bytes, cpOff(i), cpOff(i + k) - cpOff(i))
      md.digest(dig, i * 16, 16)
      i += 1
    }
    // unsigned-lex compare of digests a and b (indices into dig)
    def cmp(a: Int, b: Int): Int = {
      var p = 0
      while (p < 16) {
        val x = dig(a * 16 + p) & 0xff
        val y = dig(b * 16 + p) & 0xff
        if (x != y) return x - y
        p += 1
      }
      0
    }
    val out = new java.util.LinkedHashSet[UTF8String]
    var last = -1 // same winner index as the previous window ⇒ same value
    var j = 0
    while (j < nw) {
      var m = j
      var t = j + 1
      while (t < j + w) {
        if (cmp(t, m) < 0) m = t
        t += 1
      }
      if (m != last) {
        val hex = new Array[Byte](32)
        var p = 0
        while (p < 16) {
          val b = dig(m * 16 + p) & 0xff
          hex(2 * p) = HexChars(b >>> 4)
          hex(2 * p + 1) = HexChars(b & 0xf)
          p += 1
        }
        out.add(UTF8String.fromBytes(hex))
        last = m
      }
      j += 1
    }
    new GenericArrayData(out.toArray(Array.empty[Object]))
  }
}

/** Expression face of [[Winnow.fingerprints]] — stays inside whole-stage
  * codegen (generated code calls the static core, [[DotLong]]'s form). */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(t: Any): Any =
    Winnow.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Winnow.fingerprints($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}
