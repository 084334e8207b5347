package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Sketch/accelerator operators — the reference names bloom filters and
  * inverted indexes as its designed-but-unimplemented extensions
  * (/root/reference/sqlx-sqlite/src/index.rs:30-35, main.rs:34-37); these
  * are their Spark-native realizations, plus cardinality/quantile sketches.
  *
  * Scale notes:
  *  - the bloom pre-filter ships a few MB of bits to every task instead of
  *    shuffling the big side for the join — the classic "small side as a
  *    filter, not a join" pattern; the exact join afterwards removes the
  *    false positives, so results stay exact;
  *  - the inverted text index turns content search into an index lookup +
  *    semi-join — O(posting lists), never a full-corpus regex scan;
  *  - HLL / quantile sketches are one-pass, mergeable partial aggregates
  *    (constant memory per partition) — the only way distinct counts and
  *    quantiles work at 100 TB.
  */
object Sketches {

  val defs: Seq[QueryDef] = Seq(

    // ----- bloom-filter-accelerated semi-join (exact result) ----------------
    QueryDef(
      "bf1_bloom_semijoin",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        val li = Tables.load(s, dir, "lineitem")
        // build a ~1% FP bloom over the small side's keys, embed it as a
        // binary literal probed by Spark's own codegen BloomFilterMightContain
        // (the expression runtime row-level filtering uses — stays inside
        // whole-stage codegen, unlike a UDF), pre-filtering the big side
        // before the exact semi-join
        val keys = o.select("o_orderkey")
        val bloom = keys.stat.bloomFilter("o_orderkey", 10000L, 0.01)
        val baos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(baos)
        import org.apache.spark.sql.GraftSqlShim
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        val might = GraftSqlShim.column(BloomFilterMightContain(
          Literal(baos.toByteArray),
          GraftSqlShim.expression(col("l_orderkey"))))
        li.filter(might)
          .join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
             |                     WHERE o_totalprice > 300000.0)
             |GROUP BY l_returnflag""".stripMargin)),

    // ----- inverted text index: AND-of-terms search -------------------------
    QueryDef(
      "ts1_search",
      (s, dir) => {
        val terms = Seq("spark", "join", "window")
        val inverted = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
        inverted.filter(col("w").isin(terms: _*))
          .groupBy("doc_id").agg(count(lit(1)).as("hits"))
          .filter(col("hits") === terms.size)
          .select("doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE list_contains(string_split(text, ' '), 'spark')
             |  AND list_contains(string_split(text, ' '), 'join')
             |  AND list_contains(string_split(text, ' '), 'window')""".stripMargin)),

    // ----- positional index: phrase search ----------------------------------
    // The search-engine extension of ts1: a POSITIONAL inverted index
    // answers phrase queries by adjacency-joining the two terms' posting
    // lists on (doc, pos+1). Token adjacency over space-split text is
    // exactly substring containment of ' a b ' in the space-padded text,
    // which is what the oracle checks. Scale: the term filter reaches the
    // scan (only the queried terms' postings materialize), then ONE join
    // keyed (doc_id, pos) between two bounded posting lists — never a
    // full positional index for all terms.
    QueryDef(
      "ts2_phrase",
      (s, dir) => {
        val (w1, w2) = ("table", "scan")
        val positions = Tables.load(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "w")))
        val a = positions.filter(col("w") === w1)
          .select(col("doc_id"), (col("p") + 1).as("np"))
        val b = positions.filter(col("w") === w2)
          .select(col("doc_id"), col("p").as("np"))
        a.join(b, Seq("doc_id", "np")).select("doc_id").distinct()
      },
      Some("""SELECT DISTINCT doc_id FROM documents
             |WHERE contains(' ' || text || ' ', ' table scan ')""".stripMargin)),

    // ----- ranked retrieval: rarity-weighted term frequency (ts3) -----------
    // ts1 answers boolean search; real retrieval RANKS. The scorer is the
    // tf–idf family with the idf replaced by its integer surrogate
    // (N − df) — rarer terms weigh more, exactly idf's monotone shape —
    // so the score Σ_t tf_t · (N − df_t) is BIGINT-exact and the oracle
    // hash-matches (a float BM25's log/division would differ in ULPs
    // between engines; the ranking structure — per-term posting scan,
    // tf × weight join, doc-keyed sum, global top-k — is identical).
    // Scale: the term filter reaches the scan so only the queried terms'
    // postings materialize; df is an agg over those postings (O(terms)
    // rows, broadcast back); the per-doc score is one map-side-combined
    // agg; the final top-k is a TakeOrderedAndProject, never a global
    // sort.
    QueryDef(
      "ts3_ranked_search",
      (s, dir) => {
        val terms = Seq("spark", "vector", "merge")
        val docs = Tables.load(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w").isin(terms: _*))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val n = docs.agg(count(lit(1)).as("n"))
        // the ONE scorer, shared with st8's maintained-store query
        graft.streaming.SearchMaintenance.rankedScore(tf, n, 15)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, t.w FROM documents,
             |    UNNEST(string_split(text, ' ')) AS t(w)
             |  WHERE t.w IN ('spark', 'vector', 'merge')),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT tf.doc_id, CAST(sum(tf.tf * (n.n - df.df)) AS BIGINT) AS score
             |FROM tf JOIN df USING (w) CROSS JOIN n
             |GROUP BY tf.doc_id
             |HAVING sum(tf.tf * (n.n - df.df)) > 0
             |ORDER BY score DESC, doc_id
             |LIMIT 15""".stripMargin)),

    // ----- mergeable sketches: HLL distinct + approximate quantiles ---------
    // A sketch's raw estimate is engine-specific by construction (Spark
    // HLL++ vs DuckDB's HLL use different hash functions and register
    // layouts; GK quantile summaries differ likewise), so the raw estimates
    // can never hash-match a cross-engine oracle. The estimates ARE
    // deterministic on fixed data, though — so the driver-visible output is
    // per-group accuracy booleans: Spark computes both the sketch and the
    // exact answer in one aggregate and emits `|approx − exact| ≤ bound`;
    // the oracle emits the same booleans from exact computation alone
    // (TRUE — the bounds are pre-verified constants, pinned by
    // SketchAccuracySpec at two scale factors: HLL rsd=0.02 holds within
    // 6% = 3σ, GK median with accuracy=1000 sits inside the exact IQR).
    QueryDef(
      "sk1_sketches",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
            countDistinct(col("l_partkey")).as("ex"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
            expr("percentile(l_extendedprice, 0.25)").as("lo"),
            expr("percentile(l_extendedprice, 0.75)").as("hi"))
          .select(col("l_returnflag"),
            (abs(col("ap") - col("ex")).cast("double") <= col("ex") * 0.06)
              .as("parts_within_6pct"),
            (col("am") >= col("lo") && col("am") <= col("hi"))
              .as("median_within_iqr"))
      },
      Some("""SELECT l_returnflag,
             |  TRUE AS parts_within_6pct,
             |  TRUE AS median_within_iqr
             |FROM lineitem GROUP BY l_returnflag""".stripMargin))
  )
}
