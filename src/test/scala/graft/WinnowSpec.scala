package graft

import graft.functions.WinnowFps
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.functions._

/** r16 fused winnow expression (functions/Winnow.scala): row-set equality
  * with the zip_with expression pipeline it replaced — on the real
  * documents fixture and on adversarial synthetic texts (non-ASCII
  * code points, repeated grams, minimum window length).
  */
class WinnowSpec extends SparkSpec {

  private val K = 8
  private val W = 4

  /** The pre-r16 expression pipeline, verbatim — the reference
    * implementation the fused expression must equal. */
  private def pipelineFps(docs: DataFrame): DataFrame = {
    def pairMin(a: Column, shift: Int): Column =
      zip_with(a, slice(a, lit(shift + 1), size(a)),
        (x, y) => when(y.isNull, x).otherwise(least(x, y)))
    docs
      .where(length(col("text")) >= K + W - 1)
      .select(col("doc_id"),
        transform(sequence(lit(0), length(col("text")) - K),
          i => md5(col("text").substr(i + 1, lit(K)))).as("h1"),
        (length(col("text")) - (K + W - 2)).as("nw"))
      .select(col("doc_id"), col("nw"), pairMin(col("h1"), 1).as("h2"))
      .select(col("doc_id"), col("nw"), pairMin(col("h2"), 2).as("h4"))
      .select(col("doc_id"),
        explode(array_distinct(slice(col("h4"), lit(1), col("nw")))).as("fp"))
  }

  private def fusedFps(docs: DataFrame): DataFrame = {
    val fps = GraftSqlShim.column(
      WinnowFps(GraftSqlShim.expression(col("text")), K, W))
    docs
      .where(length(col("text")) >= K + W - 1)
      .select(col("doc_id"), explode(fps).as("fp"))
  }

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("fused expression equals the pipeline on the documents fixture") {
    val docs = Tables.load(spark, sf("sf0.01"), "documents")
      .select(col("doc_id"), col("text"))
    val a = rows(pipelineFps(docs))
    val b = rows(fusedFps(docs))
    assert(a.nonEmpty, "fixture produced no fingerprints — vacuous test")
    assert(a == b)
  }

  test("fused expression equals the pipeline on adversarial texts") {
    import spark.implicits._
    val docs = Seq(
      1L -> "aaaaaaaaaaa",              // all-identical grams (dedup path)
      2L -> "abcdefghijk",              // exactly K + W - 1 chars: one window
      3L -> "abcdefghij",               // below one window: filtered out
      4L -> ("x" * 7 + "y" + "x" * 7),  // palindromic repeats
      5L -> "héllo wörld — ünïcode ¿texto?", // multi-byte code points
      6L -> "日本語のテキストで確認する十分な長さ",  // 3-byte code points
      7L -> ("the quick brown fox " * 5)
    ).toDF("doc_id", "text")
    assert(rows(pipelineFps(docs)) == rows(fusedFps(docs)))
    // doc 3 filtered in both
    assert(!rows(fusedFps(docs)).exists(_._1 == 3L))
  }
}
