package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (north star per BASELINE.json; SURVEY.md §7.6):
  * token statistics, quality scoring, language-ID heuristic, document
  * fingerprinting. All are pure Catalyst expression pipelines (codegen'd,
  * no UDFs) and therefore shuffle only at the final aggregate, scan only
  * the columns they read, and scale linearly with document count.
  *
  * Oracle-parity: outputs avoid floating point entirely — ratios are
  * expressed as integer cross-multiplications, fingerprints as md5 hex
  * (identical lowercase hex in Spark and DuckDB).
  */
object TextAnalysis {

  private[graft] def tokens(c: Column): Column = split(c, " ")

  /** Vocabulary size for tx14's commonness score: bounded so the fitted
    * vocab always broadcasts (V entries, not corpus-scale). MUST be
    * declared before `defs` — the oracle SQL strings interpolate it
    * EAGERLY at object init (a forward reference would bake in 0). */
  val CommonVocab = 256

  private[graft] def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  private[graft] def sqlCountIn(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Tiny per-language function-word lexicons (public-knowledge stopword
    * lists); the language with the highest hit count wins, ties broken by
    * a fixed priority order. A real deployment would swap in char-n-gram
    * profiles — the pipeline shape (token filter + argmax) is identical.
    */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "y", "los", "es"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  val stopwords: Seq[String] = Seq("a", "the", "of", "and", "to", "in", "is")

  val defs: Seq[QueryDef] = Seq(

    // ----- token counting --------------------------------------------------
    QueryDef(
      "tx1_tokens",
      (s, dir) => {
        val toks = tokens(col("text"))
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          length(regexp_replace(col("text"), " ", "")).as("n_word_chars"))
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
             |  length(replace(text, ' ', '')) AS n_word_chars
             |FROM documents""".stripMargin)),

    // ----- quality scoring (integer-exact ratio flags) ---------------------
    QueryDef(
      "tx2_quality",
      (s, dir) => {
        val toks = tokens(col("text"))
        val nTok = size(toks)
        val nStop = countIn(toks, stopwords)
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"),
          nStop.as("n_stopwords"),
          // quality gates: enough text, stopword ratio in [2%, 40%],
          // mean token length < 12 chars — all as integer cross-products
          (col("n_chars") >= 100).as("long_enough"),
          (nStop * 100 >= nTok * 2 && nStop * 100 <= nTok * 40).as("stop_ratio_ok"),
          (length(regexp_replace(col("text"), " ", "")) < nTok * 12).as("tok_len_ok"))
      },
      Some {
        val nTok = "len(string_split(text, ' '))"
        val nStop = sqlCountIn(stopwords)
        s"""SELECT doc_id, $nTok AS n_tokens, $nStop AS n_stopwords,
           |  n_chars >= 100 AS long_enough,
           |  $nStop * 100 >= $nTok * 2 AND $nStop * 100 <= $nTok * 40 AS stop_ratio_ok,
           |  length(replace(text, ' ', '')) < $nTok * 12 AS tok_len_ok
           |FROM documents""".stripMargin
      }),

    // ----- language identification (lexicon-hit argmax) ---------------------
    QueryDef(
      "tx3_langid",
      (s, dir) => {
        val toks = tokens(col("text"))
        val scored = Tables.load(s, dir, "documents")
          .select(Seq(col("doc_id"), col("lang")) ++
            lexicons.map { case (l, ws) => countIn(toks, ws).as(s"c_$l") }: _*)
        // argmax with fixed priority order en > de > fr > es > zh on ties
        val pred = lexicons.map(_._1).foldRight(lit("und")) { case (l, rest) =>
          val c = col(s"c_$l")
          val beatsAll = lexicons.map(_._1).filter(_ != l)
            .map(o => c >= col(s"c_$o")).reduce(_ && _)
          when(c > 0 && beatsAll, lit(l)).otherwise(rest)
        }
        scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
      },
      Some {
        val cs = lexicons.map { case (l, ws) => s"${sqlCountIn(ws)} AS c_$l" }
        val pred = lexicons.map(_._1).foldRight("'und'") { case (l, rest) =>
          val beatsAll = lexicons.map(_._1).filter(_ != l)
            .map(o => s"c_$l >= c_$o").mkString(" AND ")
          s"CASE WHEN c_$l > 0 AND $beatsAll THEN '$l' ELSE $rest END"
        }
        s"""SELECT doc_id, lang, $pred AS pred_lang FROM (
           |  SELECT doc_id, lang, ${cs.mkString(", ")} FROM documents) t""".stripMargin
      }),

    // ----- document fingerprinting -----------------------------------------
    QueryDef(
      "tx4_fingerprint",
      (s, dir) => {
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).as("fp"))
      },
      Some("""SELECT doc_id,
             |  md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS fp
             |FROM documents""".stripMargin)),

    // ----- winnowing: rolling k-gram fingerprints ---------------------------
    // Classic winnowing (local-min selection over rolling k-gram hashes,
    // public algorithm: Schleimer/Wilkerson/Aiken '03): char 8-grams,
    // hash = md5 (identical hex stream both engines), window of 4, keep
    // each window's minimum -> the distinct fingerprint set per document.
    // Near-dup docs share most fingerprints; the set is robust to local
    // edits, unlike tx4's whole-document digest.
    QueryDef(
      "tx5_winnow",
      (s, dir) => {
        val K = 8; val W = 4
        // still entirely narrow (zero exchanges — one map-only pass at
        // 100 TB; doc_ids are disjoint so per-doc distinct is globally
        // distinct), and since r16 the whole per-row pipeline (k-gram
        // md5 array → log₂(W) zip_with minima → slice → array_distinct,
        // which materialized THREE n-length hex-string arrays per row)
        // is the single fused codegen expression
        // [[graft.functions.WinnowFps]] — one pass over the UTF-8 bytes,
        // one digest instance per row, hex built only for window
        // winners. Result-identical by construction (WinnowSpec pins
        // equality against the expression pipeline on real documents).
        val fps = org.apache.spark.sql.GraftSqlShim.column(
          graft.functions.WinnowFps(
            org.apache.spark.sql.GraftSqlShim.expression(col("text")), K, W))
        Tables.load(s, dir, "documents")
          .where(length(col("text")) >= K + W - 1) // need >= 1 full window
          .select(col("doc_id"), explode(fps).as("fp"))
      },
      Some("""WITH g AS (SELECT doc_id, length(text) - 7 AS ng, i AS pos,
             |    md5(substr(text, CAST(i + 1 AS INT), 8)) AS h
             |  FROM documents, UNNEST(range(0, length(text) - 7)) t(i)
             |  WHERE length(text) >= 8),
             |w AS (SELECT doc_id, ng, pos,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
             |  FROM g)
             |SELECT DISTINCT doc_id, m AS fp FROM w WHERE pos <= ng - 4""".stripMargin)),

    // ----- the composed curation pipeline -----------------------------------
    // What the engine is FOR at 100 TB: quality-gate -> exact-dedup ->
    // deterministic sample, in one declarative plan (filters fold into the
    // scan, dedup shuffles digests, sampling is a pure expression — the
    // only wide op is the dedup group-by). Sampling uses an md5-prefix
    // threshold instead of rand()/hash() so it is reproducible AND
    // engine-exact ('0'-'7' first hex digit = 50% of the keyspace).
    QueryDef(
      "tx6_curate",
      (s, dir) => {
        val toks2 = split(col("text"), " ")
        val nTok = size(toks2)
        val nStop = countIn(toks2, stopwords)
        Tables.load(s, dir, "documents")
          .where(col("n_chars") >= 100 &&
            nStop * 100 >= nTok * 2 && nStop * 100 <= nTok * 40)
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id"))
          .where(substring(col("fp"), 1, 1) < "8")
          .select("doc_id")
      },
      Some {
        val nTok = "len(string_split(text, ' '))"
        val nStop = sqlCountIn(stopwords)
        s"""SELECT min(doc_id) AS doc_id FROM documents
           |WHERE n_chars >= 100
           |  AND $nStop * 100 >= $nTok * 2 AND $nStop * 100 <= $nTok * 40
           |GROUP BY md5(text)
           |HAVING substr(md5(text), 1, 1) < '8'""".stripMargin
      }),

    // ----- deterministic sequence packing -----------------------------------
    // The step between a curated corpus and a training run: assign each
    // document to a fixed-token-budget training sequence. Greedy packing is
    // inherently sequential, so it is SHARDED: documents are hashed into 256
    // md5 shards (the md5-prefix length is the parallelism knob — widen it
    // as the corpus grows), ordered within the shard (deterministic), and a
    // windowed running token count places each doc at sequence
    // floor(offset/budget). One shuffle (by shard), O(1) window state, no
    // global sort ever happens.
    QueryDef(
      "tx7_pack",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 512L
        val t = Tables.load(s, dir, "documents").select(
          col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 2).as("shard"),
          size(tokens(col("text"))).cast("long").as("nt"))
        val w = Window.partitionBy("shard").orderBy(col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.withColumn("cum", sum(col("nt")).over(w))
          .select(col("doc_id"), col("shard"),
            // start-offset division: exact for doc counts < 2^53
            ((col("cum") - col("nt")) / lit(budget)).cast("long").as("seq"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) shard,
             |    len(string_split(text, ' ')) nt
             |  FROM documents),
             |c AS (SELECT doc_id, shard, nt,
             |    sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
             |                  ROWS UNBOUNDED PRECEDING) cum
             |  FROM t)
             |SELECT doc_id, shard, CAST((cum - nt) // 512 AS BIGINT) AS seq
             |FROM c""".stripMargin)),

    // ----- per-source rate capping ------------------------------------------
    // Corpus-curation staple (domain capping): keep at most N documents per
    // source, chosen deterministically by md5(text) order so the sample is
    // reproducible and not biased toward low doc_ids. The rank<=N filter is
    // planned as WindowGroupLimit (Spark 3.5+): each partition keeps a
    // bounded top-N heap per source — a hot source never materializes its
    // full membership in one task's sort.
    QueryDef(
      "tx8_source_cap",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cap = 50
        val w = Window.partitionBy("source")
          .orderBy(md5(col("text")).asc, col("doc_id").asc)
        Tables.load(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= cap)
          .select("doc_id", "source", "rn")
      },
      Some("""SELECT doc_id, source, rn FROM (
             |  SELECT doc_id, source, row_number() OVER (
             |      PARTITION BY source ORDER BY md5(text), doc_id) rn
             |  FROM documents) t
             |WHERE rn <= 50""".stripMargin)),

    // ----- TF-IDF vocabulary statistics -------------------------------------
    // Corpus-level document frequency + per-document top-k TF-IDF terms —
    // the vocabulary/quality stage of a training pipeline (distinctive
    // terms per document; df doubles as the stopword signal). Ranking is
    // tf/df as ONE exact-integer-to-double division (bit-identical across
    // engines — the established ann/ivf ranking pattern), ties to the
    // lexicographically first term; only integers and terms are emitted.
    // Scale: three hash aggregates, each map-side partial (token counts
    // shuffle (doc, term); df shuffles term; top-k shuffles doc); no pair
    // expansion anywhere, so it is linear in corpus token count. The
    // tf–df join shuffles by term rather than broadcasting because a real
    // corpus vocabulary (10⁸+ terms at 100 TB) is not broadcastable.
    QueryDef(
      "tx10_tfidf",
      (s, dir) => {
        val tf = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy((col("tf").cast("double") / col("df")).desc, col("w").asc)
        tf.join(df, "w")
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("w").as("term"),
            col("tf"), col("df"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) w
             |              FROM documents),
             |tf AS (SELECT doc_id, w, count(*) tf FROM toks GROUP BY doc_id, w),
             |df AS (SELECT w, count(*) df FROM tf GROUP BY w)
             |SELECT doc_id, rank, w AS term, tf, df FROM (
             |  SELECT tf.doc_id, tf.w, tf.tf, df.df, row_number() OVER (
             |      PARTITION BY tf.doc_id
             |      ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.w ASC) rank
             |  FROM tf JOIN df USING (w)) t
             |WHERE rank <= 3""".stripMargin)),

    // ----- deterministic stratified sampling --------------------------------
    // Hash-based Bernoulli sampling with a per-stratum rate: the keep
    // decision is a pure function of (doc_id, source), so the sample is
    // reproducible across runs, engines, and cluster sizes — the property
    // a training-data pipeline needs for resumable / auditable sampling
    // (Spark's df.sample is partition-order-dependent and would neither
    // reproduce nor oracle-match). The production shape: rates come from
    // a RATE TABLE keyed by source (here one row per distinct source,
    // md5-derived values so the oracle reproduces them; a real pipeline
    // curates this table), broadcast-joined onto the corpus — the fact
    // side stays shuffle-free (scan → broadcast hash join → filter, all
    // codegen; PlanShapeSpec pins no shuffle Exchange and the pruned
    // ReadSchema). At 100 TB the rate table is a few KB broadcast to
    // every executor; the per-row decision never leaves the scan task.
    QueryDef(
      "tx9_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // the rate table: tiny, one row per source (driver-built here the
        // way ann3 fits its centroid table — bounded by #sources, not rows)
        val sources = docs.select("source").distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        import s.implicits._
        val rates = sources.toDF("source").withColumn("rate",
          conv(substring(md5(col("source")), 1, 4), 16, 10).cast("int") % 80 + 10)
        val bucket = conv(substring(md5(concat_ws(":",
          col("doc_id").cast("string"), col("source"))), 1, 4), 16, 10)
          .cast("int") % 100
        docs.join(broadcast(rates), "source")
          .where(bucket < col("rate"))
          .select("doc_id", "source", "rate")
      },
      Some("""WITH rates AS (
             |  SELECT source,
             |    CAST('0x' || substr(md5(source), 1, 4) AS INT) % 80 + 10 AS rate
             |  FROM (SELECT DISTINCT source FROM documents))
             |SELECT d.doc_id, d.source, r.rate
             |FROM documents d JOIN rates r USING (source)
             |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source), 1, 4) AS INT) % 100
             |    < r.rate""".stripMargin)),

    // ----- benchmark n-gram decontamination ---------------------------------
    // The eval-set leak scrub every training pipeline runs before a model
    // sees the data: any training document sharing a word 5-gram with the
    // benchmark set is flagged. Benchmark membership is deterministic here
    // (doc_id % 50 = 0 stands in for the curated eval suite). Scale shape:
    // eval suites are BOUNDED (a few GB of grams even when the corpus is
    // 100 TB), so a compact bloom over xxhash64(gram) broadcasts to every
    // scan task and pre-filters the corpus's exploded grams inside codegen
    // — only near-hits reach the exact gram-keyed semi-join, so the
    // shuffle is O(actual contamination), not O(corpus grams). The bloom
    // is a pre-filter only (false positives removed by the exact join), so
    // the result is exact and the oracle needs no bloom.
    QueryDef(
      "tx11_decontam",
      (s, dir) => {
        val n = 5
        val docs = Tables.load(s, dir, "documents")
        val grams = docs
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) >= n)
          .select(col("doc_id"), explode(array_distinct(ngrams(n))).as("g"))
        val bench = grams.filter(col("doc_id") % 50 === 0).select("g").distinct()
        val train = grams.filter(col("doc_id") % 50 =!= 0)
        val bloom = bench.select(xxhash64(col("g")).as("gh"))
          .stat.bloomFilter("gh", 100000L, 0.01)
        val baos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(baos)
        import org.apache.spark.sql.GraftSqlShim
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        val might = GraftSqlShim.column(BloomFilterMightContain(
          Literal(baos.toByteArray),
          GraftSqlShim.expression(xxhash64(col("g")))))
        val hits = train.filter(might)
          .join(bench, "g")
          .groupBy("doc_id").agg(count(lit(1)).as("h"))
        docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("h"), lit(0L)).as("n_hit_grams"),
            (coalesce(col("h"), lit(0L)) > 0).as("contaminated"))
      },
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
             |bench AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') g
             |          FROM words, UNNEST(range(1, len(w)-3)) t(i)
             |          WHERE doc_id % 50 = 0 AND len(w) >= 5),
             |tg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') g
             |       FROM words, UNNEST(range(1, len(w)-3)) t(i)
             |       WHERE doc_id % 50 <> 0 AND len(w) >= 5),
             |hits AS (SELECT doc_id, count(*) h FROM tg JOIN bench USING (g)
             |         GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(h.h, 0) AS n_hit_grams,
             |       coalesce(h.h, 0) > 0 AS contaminated
             |FROM documents d LEFT JOIN hits h USING (doc_id)
             |WHERE d.doc_id % 50 <> 0""".stripMargin)),

    // ----- repeated-n-gram quality signal -----------------------------------
    // The repetition filter of a quality pipeline (the Gopher-rule shape):
    // a document whose 3-grams repeat heavily is boilerplate/spam. Emits
    // per-document total vs distinct 3-gram counts, the hottest single
    // 3-gram's count, and the integer-exact >5%-duplicate flag. Scale:
    // two hash aggregates keyed (doc, gram) then (doc) — map-side
    // combined, linear in token count, per-task memory bounded by
    // document size (no cross-document state).
    QueryDef(
      "tx12_repetition",
      (s, dir) => {
        val perGram = Tables.load(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), explode(ngrams(3)).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        perGram.groupBy("doc_id")
          .agg(sum("c").as("n3"), count(lit(1)).as("d3"), max("c").as("top3"))
          .select(col("doc_id"), col("n3"), col("d3"), col("top3"),
            ((col("n3") - col("d3")) * 100 > col("n3") * 5).as("repetitive"))
      },
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents
             |               WHERE len(string_split(text, ' ')) >= 3),
             |g AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') g
             |      FROM words, UNNEST(range(1, len(w)-1)) t(i)),
             |pg AS (SELECT doc_id, g, count(*) c FROM g GROUP BY doc_id, g)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3,
             |       max(c) AS top3,
             |       (sum(c) - count(*)) * 100 > sum(c) * 5 AS repetitive
             |FROM pg GROUP BY doc_id""".stripMargin)),

    // PII redaction (the scrub pass every training-data pipeline runs
    // before release): email + IPv4 patterns found and replaced with
    // typed placeholder tokens, emitting per-document match counts and
    // the fingerprint of the redacted text. PII is INJECTED
    // deterministically from doc_id on both engines (the synthetic corpus
    // has none), so real matches are exercised and the redacted output is
    // cross-engine checkable. Patterns avoid backtracking-only features
    // (no lookaround/backrefs), so Java regex and RE2 match identically;
    // a terminal sentinel keeps the count independent of trailing-empty
    // split semantics. Scale: map-only expression pipeline — zero
    // shuffles, zero UDFs, text never leaves its partition.
    QueryDef(
      "tx13_pii_redact",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
        val aug = concat(
          col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example dial 10.0."), pmod(col("doc_id"), lit(256L)),
          lit(".7 now"),
          when(pmod(col("doc_id"), lit(4L)) === 0,
            concat(lit(" cc admin-"), col("doc_id"), lit("@corp.example")))
            .otherwise(lit("")),
          lit(" ."))
        val red = regexp_replace(
          regexp_replace(col("aug"), email, "<EMAIL>"), ip, "<IP>")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), aug.as("aug"))
          .select(
            col("doc_id"),
            (size(split(col("aug"), email)) - 1).cast("long").as("n_email"),
            (size(split(col("aug"), ip)) - 1).cast("long").as("n_ip"),
            md5(red).as("h"),
            length(red).cast("long").as("len"))
      },
      Some("""WITH aug AS (
             |  SELECT doc_id,
             |    text || ' contact user' || doc_id || '@mail.example dial 10.0.' ||
             |    (doc_id % 256) || '.7 now' ||
             |    (CASE WHEN doc_id % 4 = 0
             |          THEN ' cc admin-' || doc_id || '@corp.example' ELSE '' END) ||
             |    ' .' AS aug
             |  FROM documents),
             |red AS (
             |  SELECT doc_id, aug,
             |    regexp_replace(regexp_replace(aug,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS r
             |  FROM aug)
             |SELECT doc_id,
             |  CAST(len(regexp_split_to_array(aug,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS BIGINT) AS n_email,
             |  CAST(len(regexp_split_to_array(aug,
             |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) - 1 AS BIGINT) AS n_ip,
             |  md5(r) AS h, CAST(length(r) AS BIGINT) AS len
             |FROM red""".stripMargin)),

    // ----- corpus-frequency commonness score (perplexity-proxy filter) ------
    // The CCNet-style quality gate without a language model: fit a top-V
    // vocabulary (corpus token frequencies, one map-side-combined agg +
    // bounded global top-V with a total (cnt desc, tok asc) tie order),
    // then score each document by the sum of its tokens' corpus counts —
    // rare-token-heavy docs (boilerplate, mangled encodings, gibberish)
    // score low. Integers end to end (callers divide common_sum/n_tokens
    // for the mean), so the cross-engine check is hash-exact where a
    // log-prob would drift. Scale: the vocab agg shuffles (token, count)
    // partials; scoring is a BROADCAST join (V is bounded) + one doc-keyed
    // map-side-combined agg — the corpus text never shuffles.
    QueryDef(
      "tx14_commonness",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc).limit(CommonVocab)
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("cnt"), lit(0L))).as("common_sum"),
            count(lit(1)).as("n_tokens"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM t
             |  GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT $CommonVocab)
             |SELECT doc_id,
             |  CAST(sum(coalesce(v.cnt, 0)) AS BIGINT) AS common_sum,
             |  count(*) AS n_tokens
             |FROM t LEFT JOIN v USING (tok)
             |GROUP BY doc_id""".stripMargin)),

    // ----- overlapping token chunking (tx15) --------------------------------
    // The RAG / embedding-ingestion step: split each document into
    // fixed-width token windows with stride overlap (width 32, stride 24 —
    // 8-token overlap carries context across boundaries). Map-only: chunk
    // count, slices, and joins all happen inside the row; nothing
    // shuffles, output is one row per (doc, chunk). The chunk-count
    // division runs in IEEE double over small exact integers (quotients
    // are ≥ 1/stride away from integers unless exact), so both engines
    // floor identically.
    QueryDef(
      "tx15_chunk",
      (s, dir) => {
        val W = 32
        val S = 24
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .withColumn("n", size(col("w")))
          .withColumn("nc",
            when(col("n") <= W, 1L)
              .otherwise(floor((col("n") - W + (S - 1)) / lit(S.toDouble)) + 1L))
          .select(col("doc_id"), col("w"),
            posexplode(sequence(lit(0L), col("nc") - 1L)).as(Seq("p", "i")))
          .withColumn("start", (col("i") * S).cast("int"))
          .select(col("doc_id"), col("i").as("chunk_id"),
            size(expr(s"slice(w, start + 1, $W)")).as("n_tok"),
            array_join(expr(s"slice(w, start + 1, $W)"), " ").as("chunk"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |  c AS (SELECT doc_id, w, len(w) AS n,
             |    CASE WHEN len(w) <= 32 THEN 1
             |         ELSE CAST(floor((len(w) - 32 + 23) / 24.0) AS BIGINT) + 1
             |    END AS nc FROM d)
             |SELECT doc_id, i AS chunk_id,
             |  CAST(len(w[i*24 + 1 : i*24 + 32]) AS INTEGER) AS n_tok,
             |  array_to_string(w[i*24 + 1 : i*24 + 32], ' ') AS chunk
             |FROM c, UNNEST(range(0, nc)) t(i)""".stripMargin)),

    // ----- deterministic global shuffle + sharding (tx16) -------------------
    // The step between curation and training: break source/time order by
    // a seeded hash, split into shards, and give every document a stable
    // position within its shard. NOT a global sort — one hash-partition
    // shuffle on the shard key plus a within-shard window sort, the only
    // shape that scales (a total order over 100 TB serializes on a range
    // exchange; training jobs only need per-shard order). Reshuffling is
    // changing the seed; identical inputs always yield identical shards,
    // so a resumed pipeline re-reads the same data in the same order.
    QueryDef(
      "tx16_shuffle_shard",
      (s, dir) => {
        val mkey = md5(concat(col("doc_id").cast("string"), lit(":42")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("mkey"), col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), mkey.as("mkey"))
          .withColumn("shard",
            pmod(conv(substring(col("mkey"), 1, 2), 16, 10).cast("long"), lit(8L))
              .cast("int"))
          .withColumn("pos", row_number().over(w))
          .select("doc_id", "shard", "pos")
      },
      Some("""WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') mkey
             |  FROM documents),
             |s AS (SELECT doc_id, mkey,
             |  CAST(CAST('0x' || substr(mkey, 1, 2) AS BIGINT) % 8 AS INTEGER) shard
             |  FROM k)
             |SELECT doc_id, shard,
             |  CAST(row_number() OVER (PARTITION BY shard ORDER BY mkey, doc_id)
             |       AS INTEGER) AS pos
             |FROM s""".stripMargin)),

    // ----- temperature-flattened source mixing (tx17) -----------------------
    // Data mixing, the step tx9's fixed-rate sampler stands in front of:
    // per-source KEEP RATES are computed FROM the source counts so the
    // sampled mixture follows temperature-flattened proportions — here
    // weight w_s = isqrt(n_s) (temperature 2: big sources flattened
    // toward small ones), expected picks per source = N·w_s/(2·Σw). The
    // whole rate computation is INTEGER arithmetic end to end (floor of
    // the correctly-rounded sqrt, then BIGINT div) so both engines derive
    // bit-identical rates — no FP normalization sum whose order could
    // drift. Membership is the md5-bucket trick: deterministic,
    // reshuffle = change the salt. Scale: one map-side-combined count
    // agg (|sources| rows), a two-long global sum, one broadcast of the
    // rate table, one map-only filter — the corpus itself never shuffles.
    QueryDef(
      "tx17_temperature_mix",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("w", floor(sqrt(col("n"))).cast("long"))
        val totals = counts.agg(sum("n").as("nn"), sum("w").as("ww"))
        val rates = counts.crossJoin(broadcast(totals))
          .withColumn("rate",
            least(lit(1000L), expr("(1000 * w * nn) div (ww * n * 2)")))
          .select("source", "rate")
        val bucket = conv(substring(md5(concat_ws(":",
          col("doc_id").cast("string"), col("source"))), 1, 4), 16, 10)
          .cast("int") % 1000
        docs.join(broadcast(rates), "source")
          .where(bucket < col("rate"))
          .select("doc_id", "source", "rate")
      },
      Some("""WITH c AS (
             |  SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |w AS (SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS w FROM c),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |             CAST(sum(w) AS BIGINT) AS ww FROM w),
             |r AS (SELECT source,
             |        LEAST(1000, (1000 * w * nn) // (ww * n * 2)) AS rate
             |      FROM w, t)
             |SELECT d.doc_id, d.source, r.rate
             |FROM documents d JOIN r USING (source)
             |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source), 1, 4) AS INT) % 1000
             |    < r.rate""".stripMargin)),

    // ----- hashed linear quality classifier (tx18) --------------------------
    // The fastText-shape doc-quality scorer every curation pipeline runs:
    // token bigrams hash into a BOUNDED feature space (F buckets), a
    // fixed integer weight per bucket, document score = bias + Σ weights
    // over bigram OCCURRENCES, pass = score ≥ 0. The weight table here is
    // derived deterministically from the bucket id (md5 → [-8, 8]) so
    // both engines materialize the identical table; a trained model would
    // load the table from storage — the pipeline shape (hash → broadcast
    // weight join → map-side-combined per-doc sum) is exactly the same.
    // Feature hashing uses the repo's cross-engine md5 bridge (bandKeys
    // pattern); a Spark-only deployment would swap in xxhash64 (codegen'd,
    // no hex detour) without touching the shape. Scale: the weight table
    // is F rows (broadcast, corpus-independent); the per-doc sum is one
    // map-side-combined hash aggregate keyed on doc_id; the corpus text
    // never shuffles — same broadcast-bounded pattern as tx14/tx17.
    QueryDef(
      "tx18_quality_score",
      (s, dir) => {
        val F = 1024
        val Bias = 3L
        val docs = Tables.load(s, dir, "documents")
        val w = col("w")
        def bigram(i: Column): Column =
          concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))
        val feats = docs
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(w) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(w) - 2), bigram _)).as("bg"))
          .select(col("doc_id"),
            (conv(substring(md5(col("bg")), 1, 10), 16, 10).cast("long") % F)
              .as("fid"))
        val weights = s.range(F).select(col("id").as("fid"),
          ((conv(substring(md5(concat(lit("tx18-w:"), col("id").cast("string"))),
            1, 4), 16, 10).cast("long") % 17) - 8).as("wt"))
        val sums = feats.join(broadcast(weights), Seq("fid"))
          .groupBy("doc_id").agg(sum(col("wt")).as("sw"))
        docs.select(col("doc_id"))
          .join(sums, Seq("doc_id"), "left")
          .select(col("doc_id"),
            (coalesce(col("sw"), lit(0L)) + Bias).as("margin"))
          .withColumn("quality_pass", col("margin") >= 0)
      },
      Some("""WITH wds AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
             |f AS (SELECT doc_id,
             |    CAST('0x' || substr(md5(array_to_string(w[i:i+1], ' ')), 1, 10)
             |         AS BIGINT) % 1024 AS fid
             |  FROM wds, UNNEST(range(1, len(w))) t(i)
             |  WHERE len(w) >= 2),
             |wt AS (SELECT f AS fid,
             |    CAST('0x' || substr(md5('tx18-w:' || CAST(f AS VARCHAR)), 1, 4)
             |         AS BIGINT) % 17 - 8 AS wt
             |  FROM range(0, 1024) r(f)),
             |s AS (SELECT doc_id, CAST(sum(wt.wt) AS BIGINT) AS sw
             |  FROM f JOIN wt USING (fid) GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(s.sw, 0) + 3 AS margin,
             |  COALESCE(s.sw, 0) + 3 >= 0 AS quality_pass
             |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin)),

    // ----- BPE-shape regex token counting -----------------------------------
    // Budgeting a training corpus needs token counts under the TRAINING
    // tokenizer's segmentation, not whitespace: a GPT-2-style regex
    // PRE-tokenizer (contraction suffixes | space?+letter run |
    // space?+digit run | space?+punct run) is the standard first stage,
    // and its match count is the budget estimate. The fixture text is
    // bare lowercase words, so each document is first salted with a
    // deterministic doc_id-derived tail carrying digits, punctuation and
    // a contraction (tx13's injection pattern) — the regex classes are
    // all exercised and the count provably differs from whitespace
    // counting. regexp_count is codegen'd (no UDF); Java regex and
    // DuckDB's RE2 both use leftmost-first alternation, so ordering
    // contraction-first keeps the engines identical. Map-only, zero
    // shuffles — the per-document budget column a packer (tx7) consumes.
    QueryDef(
      "tx19_bpe_count",
      (s, dir) => {
        val salted = concat(col("text"),
          lit(" it's doc-"), col("doc_id").cast("string"),
          lit(" rev "), (col("doc_id") * 7).cast("string"), lit("!"))
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          (size(tokens(col("text"))) + 4).as("n_ws"),
          regexp_count(salted, lit(pat)).as("n_bpe"))
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) + 4 AS n_ws,
             |  CAST(len(regexp_extract_all(
             |    text || ' it''s doc-' || CAST(doc_id AS VARCHAR) ||
             |      ' rev ' || CAST(doc_id * 7 AS VARCHAR) || '!',
             |    '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))
             |    AS INTEGER) AS n_bpe
             |FROM documents""".stripMargin)),

    // ----- tokenizer fitting: merge-pair statistics (tx20) ------------------
    // The statistic a BPE/WordPiece trainer computes each round: corpus-
    // wide counts of ADJACENT symbol pairs, whose argmax is the next
    // merge. One round over word-level symbols (the fixture text has no
    // subword state to thread); the output is the top-20 merge
    // candidates, integer-exact with a (count, pair) total order so the
    // cut is deterministic. Scale: pair construction is map-only
    // expression work over each document's own token array (pairs never
    // cross documents); ONE map-side-combined agg keyed by the pair —
    // state is O(vocab²-bounded distinct pairs), not corpus size — and
    // the top-20 is a TakeOrderedAndProject. This is the exact shape a
    // real tokenizer-fitting job runs per merge round at 100 TB.
    QueryDef(
      "tx20_bpe_pair_counts",
      (s, dir) => {
        // r16: the token array is materialized ONCE per row before the
        // pair lambda — the original `element_at(split(text,' '), i)`
        // inside the lambda re-split the whole text per pair element,
        // O(n²) splits per document (the exact per-element-recompute trap
        // Dedup.shinglesOf documents as measured 6x; guide §1.2 step 2).
        // The filter between the two projections keeps CollapseProject
        // from inlining the split back into the lambda.
        val w = col("w")
        val pairs = transform(sequence(lit(1), size(w) - 1), i =>
          struct(element_at(w, i).as("l"), element_at(w, i + 1).as("r")))
        Tables.load(s, dir, "documents")
          .select(split(col("text"), " ").as("w"))
          .where(size(w) >= 2)
          .select(explode(pairs).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(20)
      },
      Some("""WITH d AS (SELECT string_split(text, ' ') AS w FROM documents
             |           WHERE len(string_split(text, ' ')) >= 2),
             |p AS (SELECT w[i] AS l, w[i + 1] AS r
             |      FROM d, UNNEST(range(1, len(w))) t(i))
             |SELECT l, r, count(*) AS cnt FROM p GROUP BY 1, 2
             |ORDER BY cnt DESC, l, r
             |LIMIT 20""".stripMargin)),

    // ----- token-budget selection (tx21, r11) ------------------------------
    // GLOBAL quality-ranked token-budget cut: keep documents in
    // (quality DESC, doc_id) order while the running token total stays
    // within the budget (here 50% of the corpus's tokens) — the final
    // "trim the corpus to N tokens" step of every pretraining recipe.
    // Scale: a global PREFIX SUM without a single-partition global sort —
    // rows are range-partitioned on the selection order (sampling-based
    // boundaries, skew-balanced), the running sum is a PARTITION-LOCAL
    // window, and the cross-partition offsets come from a per-partition
    // total table BOUNDED BY THE PARTITION COUNT (cluster config, not
    // data) that is windowed whole and broadcast back. One range
    // exchange over (doc_id, q, nt) scalars — text never shuffles — plus
    // one partition-count-sized agg; the budget scalar is a broadcast
    // 1-row cross join like every other derived threshold here.
    QueryDef(
      "tx21_token_budget",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = tokens(col("text"))
        val nTok = size(toks)
        val nStop = countIn(toks, stopwords)
        val q = (col("n_chars") >= 100).cast("int") +
          (nStop * 100 >= nTok * 2 && nStop * 100 <= nTok * 40).cast("int") +
          (length(regexp_replace(col("text"), " ", "")) < nTok * 12).cast("int")
        val scored = Tables.load(s, dir, "documents")
          .select(col("doc_id"), q.as("q"), nTok.cast("long").as("nt"))
        // the scalar projection is materialized ONCE (localCheckpoint):
        // every downstream branch — running sum, per-partition totals,
        // budget — reads the checkpointed (doc_id, q, nt, pid) rows
        // instead of re-scanning text, and the sampled range layout is
        // FROZEN so the offsets join can never pair a row against a
        // resampled partition assignment
        val parted = scored
          .repartitionByRange(col("q").desc, col("doc_id").asc)
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        val budget = parted.agg((sum(col("nt")) / 2).cast("long").as("b"))
        val local = sum(col("nt")).over(
          Window.partitionBy("pid").orderBy(col("q").desc, col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        val offsets = parted.groupBy("pid").agg(sum(col("nt")).as("tot"))
          .withColumn("off", coalesce(sum(col("tot")).over(
            Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select("pid", "off")
        parted.withColumn("cuml", local)
          .join(broadcast(offsets), Seq("pid"))
          .crossJoin(broadcast(budget))
          .where(col("off") + col("cuml") <= col("b"))
          .select(col("doc_id"), col("q"), col("nt"),
            (col("off") + col("cuml")).as("cum_tokens"))
      },
      Some {
        val nTok = "len(string_split(text, ' '))"
        val nStop = sqlCountIn(stopwords)
        s"""WITH scored AS (
           |  SELECT doc_id,
           |    (CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) +
           |    (CASE WHEN $nStop * 100 >= $nTok * 2
           |               AND $nStop * 100 <= $nTok * 40 THEN 1 ELSE 0 END) +
           |    (CASE WHEN length(replace(text, ' ', '')) < $nTok * 12
           |          THEN 1 ELSE 0 END) AS q,
           |    CAST($nTok AS BIGINT) AS nt
           |  FROM documents),
           |c AS (SELECT doc_id, q, nt,
           |        CAST(sum(nt) OVER (ORDER BY q DESC, doc_id ASC
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |          AS BIGINT) AS cum_tokens
           |      FROM scored)
           |SELECT doc_id, q, nt, cum_tokens FROM c
           |WHERE cum_tokens <=
           |  (SELECT CAST(sum(nt) / 2 AS BIGINT) FROM scored)""".stripMargin
      }),

    // ----- denylist scrubbing (tx22, r15) ------------------------------------
    // The redaction face of decontamination: whole-word occurrences of a
    // denied term list replaced in place, per-document hit counts and a
    // content digest of the SCRUBBED text emitted (the digest is what a
    // downstream exact-dedup pass would key on, so scrub-then-dedup
    // composes). Map-only, zero shuffles; the regex is RE2-safe (plain
    // alternation + \b word boundaries — identical semantics in Java and
    // DuckDB's RE2 for ASCII tokens), so the oracle hash-matches the
    // scrubbed digests exactly. The same shape serves PII patterns
    // (emails/phones) — the term list is the only thing that changes.
    QueryDef(
      "tx22_denylist_scrub",
      (s, dir) => {
        val pat = "\\b(customer|merge)\\b"
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(col("text"), lit(pat)).cast("long").as("n_hits"),
            md5(regexp_replace(col("text"), pat, "<X>")).as("scrubbed_md5"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '\b(customer|merge)\b')) AS BIGINT) AS n_hits,
             |  md5(regexp_replace(text, '\b(customer|merge)\b', '<X>', 'g')) AS scrubbed_md5
             |FROM documents""".stripMargin))
  )

  /** Word n-grams of the materialized token array `w` as joined strings
    * (length-n windows; callers filter `size(w) >= n` first — a shorter
    * sequence() bound would descend and explode). */
  private def ngrams(n: Int): Column = {
    val w = col("w")
    transform(sequence(lit(0), size(w) - n), i =>
      concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))
  }
}
