package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-3-shingle hasher (r17 optimization): the distinct 3-token
  * shingles of a token array, each hashed to the first `nibbles` hex
  * digits of its md5 as a BIGINT — one UTF-8 pass and ONE MessageDigest
  * instance per ROW, replacing the per-shingle
  * `conv(substring(md5(concat_ws(" ", …)), 1, nibbles), 16, 10)` chains
  * in the dedup family (guide §1.2 step 2; the tx5 WinnowFps precedent):
  * each of those paid a digest instance, a 32-char hex string, a
  * substring and a base-16 string parse PER SHINGLE.
  *
  * Result-identical to the expression form (ShingleHashesSpec pins it on
  * the real corpus and adversarial inputs):
  *  - shingle text = `concat_ws(" ", w[i], w[i+1], w[i+2])` — null tokens
  *    are SKIPPED with no separator left behind, exactly concat_ws;
  *  - hash = the first `nibbles` hex digits of md5 interpreted base-16 —
  *    computed directly from the digest bytes (identical value, no
  *    string); positive for nibbles ≤ 15;
  *  - `distinctOnHash = true` mirrors `array_distinct(transform(…, hash))`
  *    (dedup AFTER hashing — the shinglesOf(hashed = true) shape);
  *    `false` mirrors `transform(array_distinct(shingles), hash)` (dedup
  *    on the shingle STRING — the bandKeysMapOnly shape, where an
  *    md5-prefix collision between distinct shingles legitimately emits
  *    duplicate hashes); both keep first-occurrence order.
  */
object ShingleHashes {

  private val Space = UTF8String.fromString(" ")

  def hashes(w: ArrayData, nibbles: Int, distinctOnHash: Boolean): ArrayData = {
    val n = w.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    // duplicate STRINGS are skipped in both modes (a repeated shingle maps
    // to the same hash, which hash-mode dedup would drop anyway — skipping
    // the digest is output-identical and saves one md5 per repeat); hash
    // mode additionally dedups md5-prefix collisions BETWEEN distinct
    // shingles, mirroring array_distinct-after-transform
    val seenStr = new java.util.HashSet[UTF8String]()
    val seenHash = if (distinctOnHash) new java.util.HashSet[java.lang.Long]() else null
    val out = new java.util.ArrayList[Any](n - 2)
    var i = 0
    while (i <= n - 3) {
      // concat_ws(" ", a, b, c): null operands skipped, one separator
      // between surviving neighbors
      val parts = new java.util.ArrayList[UTF8String](3)
      var j = 0
      while (j < 3) {
        if (!w.isNullAt(i + j)) parts.add(w.getUTF8String(i + j))
        j += 1
      }
      val shingle = UTF8String.concatWs(Space, parts.toArray(Array.empty[UTF8String]): _*)
      if (seenStr.add(shingle)) {
        val digest = md.digest(shingle.getBytes)
        var h = 0L
        var k = 0
        while (k < nibbles) {
          val b = digest(k >> 1)
          val nib = if ((k & 1) == 0) (b >> 4) & 0xF else b & 0xF
          h = (h << 4) | nib
          k += 1
        }
        if (!distinctOnHash || seenHash.add(h)) out.add(h)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Expression face of [[ShingleHashes.hashes]] — `array<bigint>` of the
  * hashed distinct shingles, inside whole-stage codegen ([[DotLong]]'s
  * static-call form). Input: the token array (`split(text, " ")`). */
case class ShingleHashesExpr(child: Expression, nibbles: Int,
    distinctOnHash: Boolean) extends UnaryExpression {

  require(nibbles >= 1 && nibbles <= 15, "nibbles must be in [1, 15]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(w: Any): Any =
    ShingleHashes.hashes(w.asInstanceOf[ArrayData], nibbles, distinctOnHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.ShingleHashes.hashes($w, $nibbles, $distinctOnHash);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}
