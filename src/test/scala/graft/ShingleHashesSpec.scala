package graft

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.functions._

/** r17 fused shingle hasher (functions/ShingleHashes.scala): row identity
  * with the per-shingle conv(substring(md5(concat_ws(…)))) expression
  * chains it replaced, in BOTH distinct modes (hash-after-transform =
  * shinglesOf(hashed); string-distinct-then-hash = bandKeysMapOnly), on
  * the real corpus and adversarial texts. */
class ShingleHashesSpec extends SparkSpec {

  private def kernel(w: Column, nibbles: Int, onHash: Boolean): Column =
    GraftSqlShim.column(graft.functions.ShingleHashesExpr(
      GraftSqlShim.expression(w), nibbles, onHash))

  // the replaced expression chains, verbatim from the r16 call sites
  private def oldHashedDistinct(w: Column, nibbles: Int): Column = {
    def shingle(i: Column): Column =
      concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))
    array_distinct(transform(sequence(lit(0), size(w) - 3),
      i => conv(substring(md5(shingle(i)), 1, nibbles), 16, 10).cast("long")))
  }
  private def oldStringDistinct(w: Column, nibbles: Int): Column = {
    def shingle(i: Column): Column =
      concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))
    transform(array_distinct(transform(sequence(lit(0), size(w) - 3), shingle _)),
      sv => conv(substring(md5(sv), 1, nibbles), 16, 10).cast("long"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getSeq[Long](1).mkString(",")))
      .sortBy(_._1).toSeq

  test("both modes equal the expression chains on the real corpus") {
    val docs = Tables.load(spark, sf("sf0.01"), "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    for ((nibbles, onHash) <- Seq((15, true), (10, false))) {
      val got = rows(docs.select(col("doc_id"), kernel(col("w"), nibbles, onHash)))
      val want = rows(docs.select(col("doc_id"),
        if (onHash) oldHashedDistinct(col("w"), nibbles)
        else oldStringDistinct(col("w"), nibbles)))
      assert(got.nonEmpty && got == want, s"mode (nibbles=$nibbles, onHash=$onHash)")
    }
  }

  test("adversarial texts: multi-byte, repeats, empty tokens, exactly 3 tokens") {
    import spark.implicits._
    val texts = Seq(
      "a b c",                                  // exactly one shingle
      "a b c a b c a b c",                      // repeated shingles collapse
      "  a  b ", // empty tokens from double spaces (split keeps "")
      "héllo wörld ünïcode κόσμος 你好 世界 🚀 end",  // multi-byte UTF-8
      "x y z w v u t s r q p o n m l k")         // long distinct run
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    for ((nibbles, onHash) <- Seq((15, true), (10, false), (1, true), (15, false))) {
      val got = rows(docs.select(col("doc_id"), kernel(col("w"), nibbles, onHash)))
      val want = rows(docs.select(col("doc_id"),
        if (onHash) oldHashedDistinct(col("w"), nibbles)
        else oldStringDistinct(col("w"), nibbles)))
      assert(got == want, s"mode (nibbles=$nibbles, onHash=$onHash)")
    }
  }

  test("pinned value: hash equals the oracle's CAST('0x'||substr(md5(s),1,15) AS BIGINT)") {
    import spark.implicits._
    // md5("a b c") =
    // the oracle derivation, computed with java's MessageDigest here
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("a b c".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val want = java.lang.Long.parseLong(hex.take(15), 16)
    val got = Seq((0L, "a b c")).toDF("doc_id", "text")
      .select(col("doc_id"), kernel(split(col("text"), " "), 15, true))
      .collect()(0).getSeq[Long](1)
    assert(got == Seq(want))
  }
}
