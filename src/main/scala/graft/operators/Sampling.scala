package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators (r15) — the selection layer of a
  * training-data pipeline. Every sample here is keyed on a content hash
  * of the row identity, NOT on an RNG: the same row lands in the same
  * sample/split on every run, every engine, every cluster size — which
  * is what makes samples REPRODUCIBLE (paper-grade), splits LEAKAGE-
  * STABLE under reprocessing (a re-ingested document cannot hop from
  * train to test), and results oracle-checkable (DuckDB computes the
  * identical md5; hex strings compare identically in both engines
  * because md5 output is lowercase hex, where lexicographic order IS
  * numeric order).
  *
  * Scale notes:
  *  - sm1 (Bernoulli) is MAP-ONLY — zero shuffles, no state; the 100 TB
  *    sample costs one codegen'd pass and prunes to the projected
  *    columns at the scan;
  *  - sm2 (stratified top-k) shuffles once on the stratum key; the
  *    per-stratum rank is a window sort WITHIN each stratum, and k rows
  *    per stratum leave the exchange — a skewed stratum costs its sort,
  *    never a cross product (for the pathological one-giant-stratum
  *    case, Skew.saltedEquiJoin's salting pattern applies upstream);
  *  - sm3 (hash split) is map-only assignment + one map-side-combined
  *    count agg — the split LABELS never materialize a shuffle of data
  *    rows;
  *  - sm4 (uniform-k) is ORDER BY hash LIMIT k = TakeOrderedAndProject:
  *    each partition keeps its local top-k candidates and k rows total
  *    reach the driver — the distributed equivalent of reservoir
  *    sampling, without reservoir state or a global sort.
  */
object Sampling {

  /** Deterministic per-row sampling key: lowercase-hex md5 of the row's
    * identity — identical text in Spark and DuckDB. */
  private def hashKey(cols: org.apache.spark.sql.Column*) =
    md5(concat_ws("-", cols: _*))

  val defs: Seq[QueryDef] = Seq(

    // ----- Bernoulli sample at a fixed rate, map-only -----------------------
    // keep iff the first 4 hex nibbles of the identity hash fall below
    // 0x1999 / 0x10000 ≈ 9.98 % — a fixed-rate sample whose membership is
    // a pure function of the row identity
    QueryDef(
      "sm1_bernoulli_sample",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(substring(
          hashKey(col("l_orderkey"), col("l_linenumber")), 1, 4) < "1999")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
             |             CAST(l_linenumber AS VARCHAR)), 1, 4) < '1999'"""
        .stripMargin)),

    // ----- stratified sample: k per stratum, hash-ordered -------------------
    // "5 documents per language, reproducibly" — the balanced-evaluation-
    // set shape. Rank within each stratum by the identity hash (a
    // deterministic uniform order), keep the first k.
    QueryDef(
      "sm2_stratified_sample",
      (s, dir) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(hashKey(col("doc_id")), col("doc_id"))
        Tables.load(s, dir, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select("lang", "doc_id", "rk")
      },
      Some("""SELECT lang, doc_id, rk FROM (
             |  SELECT lang, doc_id, row_number() OVER (
             |    PARTITION BY lang
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 5""".stripMargin)),

    // ----- deterministic train/val/test split -------------------------------
    // 80/10/10 by hash range — the leakage-stable DOCUMENT-level split
    // (cluster-level leakage-safe splitting is dd11's job; this is the
    // baseline every pipeline needs first). Output is the per-(split,
    // lang) census — the check a dataset card reports.
    QueryDef(
      "sm3_hash_split",
      (s, dir) => {
        val h = substring(hashKey(col("doc_id")), 1, 4)
        Tables.load(s, dir, "documents")
          .withColumn("split",
            when(h < "cccc", "train").when(h < "e666", "val").otherwise("test"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CASE
             |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
             |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
             |    ELSE 'test' END AS split,
             |  lang, count(*) AS n
             |FROM documents GROUP BY 1, 2""".stripMargin)),

    // ----- uniform k-sample without replacement (reservoir-equivalent) ------
    // ORDER BY hash LIMIT k: every row gets a deterministic uniform rank;
    // the global k-smallest ARE a uniform k-subset. Plans as
    // TakeOrderedAndProject — per-partition top-k, k rows to the driver,
    // no global sort, no reservoir state.
    QueryDef(
      "sm4_uniform_k",
      (s, dir) => Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(hashKey(col("event_id")), col("event_id"))
        .limit(100),
      Some("""SELECT event_id, user_id, event_type FROM events
             |ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             |LIMIT 100""".stripMargin))
  )
}
