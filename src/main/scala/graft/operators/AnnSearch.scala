package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north star per BASELINE.json): brute-force cosine top-k as the
  * exactness baseline, and random-hyperplane LSH bucketing as the scale
  * path (candidate retrieval cost is O(bucket) instead of O(N) per query).
  *
  * Engine-exactness: embeddings are floor-quantized to integers; ranking
  * uses score = (d·|d|)/(n_q·n_v) computed as one IEEE double division of
  * two exactly-representable integers (< 2^53), which is bit-identical in
  * any IEEE-754 engine — no float accumulation, no ordering ambiguity
  * (neighbor id is the tiebreaker).
  *
  * Scale notes (100 TB / billions of vectors):
  *  - ann1 broadcast-joins the (tiny) query set against the vector corpus:
  *    one pass over the data, no shuffle of the corpus itself; top-k via
  *    per-query window on the (small) scored pairs;
  *  - ann2's bucket join shuffles by (table, bucket-key) — bounded-size
  *    buckets replace the all-pairs product; more tables/bits trade recall
  *    for cost, the standard LSH knob. An IVF variant would swap the
  *    hash-bucket for a learned-centroid assignment; the join shape (buckets
  *    then rerank) is identical.
  */
object AnnSearch {

  val NumQueries = 8 // query set: vec_id < 8
  val TopK = 5
  val LshTables = 4
  val LshBits = 6
  val LshTopK = 3

  import graft.functions.VectorMath.quant

  /** Session-aware dot (native codegen DotLong when extensions are on). */
  private[operators] def dot(s: SparkSession)(a: Column, b: Column): Column =
    graft.functions.VectorMath.dot(s, a, b)

  /** Deterministic ±1 hyperplane component for (table, plane, dim):
    * high bit of md5("t:p:d"). Computed once at plan time and inlined as a
    * literal array into both the Spark plan and the oracle SQL. */
  def planeSign(t: Int, p: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$t:$p:$d".getBytes("UTF-8"))
    if ((h(0) & 0xFF) >= 128) 1L else -1L
  }

  val EmbeddingDim = 64

  private def signs(t: Int, p: Int): Seq[Long] =
    (0 until EmbeddingDim).map(d => planeSign(t, p, d))

  /** LSH bucket key for table `t` over a quantized vector column. Shared
    * with dd7's hot-cluster subdivision (Dedup.semanticBlocks). */
  private[operators] def bucketKey(s: SparkSession, t: Int, v: Column): Column =
    (0 until LshBits).map { p =>
      val proj = dot(s)(v, typedlit(signs(t, p)))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private[operators] def sqlBucketKey(t: Int, v: String): String =
    (0 until LshBits).map { p =>
      val arr = signs(t, p).mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip($v, $arr::BIGINT[]), s -> s[1]*s[2])) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Exactly-representable ranking score: (d·|d|)/(n_q·n_v) as a single
    * IEEE double division. */
  private def score(d: Column, nq: Column, nn: Column): Column =
    (d * abs(d)).cast("double") / (nq * nn).cast("double")

  /** Array of (score, -cell) structs over the quantized vector column `v`
    * (norm² column `nn`) against integer centroids: per-cell
    * sign-preserving cos² as a single exact-integer double division;
    * lexicographic struct ordering gives argmax with ties to the LOWER
    * cell index — pure codegen, no UDF, O(k) per row, no shuffle for the
    * assignment. `-array_max(...).getField("i")` is the assigned cell.
    * Shared by ann3 (probing) and dd7 (semantic-dedup blocking). */
  private[graft] def cellScoreArr(
      s: SparkSession, cents: Array[Array[Long]]): Column = {
    def cellScore(cv: Array[Long]): Column = {
      val d = dot(s)(col("v"), typedlit(cv.toSeq))
      val ncSq = cv.map(x => x * x).sum
      (d * abs(d)).cast("double") / (col("nn") * lit(ncSq)).cast("double")
    }
    array(cents.zipWithIndex.map { case (cv, c) =>
      struct(cellScore(cv).as("s"), lit(-c).as("i"))
    }.toIndexedSeq: _*)
  }

  /** Top-`n` cell ids over the quantized `v`/`nn` columns — the fused
    * codegen face (r17, [[graft.functions.CellTopIds]]) of
    * [[cellScoreArr]]'s two consumers: `element_at(_, 1)` is the argmax
    * cell (was `-array_max(scoreArr).getField("i")`), the full array is
    * the probe list (was `slice(reverse(array_sort(scoreArr)), 1, n)`).
    * One K·dim pass per row, no K-struct array materialization, no sort;
    * cellScoreArr stays as the reference implementation (CellTopSpec
    * pins row identity on the real fixture and adversarial inputs). */
  private[graft] def cellTopIds(cents: Array[Array[Long]], n: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.CellTopIds(
        org.apache.spark.sql.GraftSqlShim.expression(col("v")),
        org.apache.spark.sql.GraftSqlShim.expression(col("nn")),
        cents.map(_.toSeq).toSeq, n))

  // persisted: the quantized corpus feeds several plan branches (bucket
  // keys per table, query side, rerank side) — materialize once
  private[graft] def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), quant(col("embedding")).as("v"))
      .withColumn("nn", dot(s)(col("v"), col("v")))
      .persist()

  val defs: Seq[QueryDef] = Seq(

    // ----- brute-force cosine top-k (exactness baseline) --------------------
    QueryDef(
      "ann1_topk_brute",
      (s, dir) => {
        val q = quantized(s, dir)
        val queries = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("nq"))
        val scored = q.join(broadcast(queries), col("vec_id") =!= col("q_id"))
          .withColumn("d", dot(s)(col("qv"), col("v")))
          .withColumn("sc", score(col("d"), col("nq"), col("nn")))
        val w = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= TopK)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      },
      Some(s"""WITH q AS (SELECT vec_id,
              |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
              |  FROM embeddings),
              |n AS (SELECT vec_id, v,
              |    list_sum(list_transform(list_zip(v, v), s -> s[1] * s[2])) nn FROM q),
              |c AS (SELECT a.vec_id q_id, b.vec_id neighbor_id,
              |    list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])) d,
              |    a.nn nq, b.nn nv
              |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
              |  WHERE a.vec_id < $NumQueries)
              |SELECT q_id, rank, neighbor_id FROM (
              |  SELECT q_id, neighbor_id, row_number() OVER (
              |      PARTITION BY q_id
              |      ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nq * nv AS DOUBLE) DESC,
              |               neighbor_id ASC) rank
              |  FROM c) t
              |WHERE rank <= $TopK""".stripMargin)),

    // ----- LSH-bucketed candidate retrieval + rerank (scale path) -----------
    QueryDef(
      "ann2_topk_lsh",
      (s, dir) => {
        val q = quantized(s, dir)
        // r17: all LshTables bucket keys in ONE pass over the cached
        // corpus (explode of a per-row struct array) — the r16 shape
        // unioned 4 separate scans of the same blocks; row multiset
        // identical (order is irrelevant below: candidates are
        // distinct-ed, ranking is per q_id)
        val keyed = q.select(col("vec_id"), explode(array((0 until LshTables).map { t =>
            struct(lit(t).as("tbl"), bucketKey(s, t, col("v")).as("bkey"))
          }: _*)).as("tb"))
          .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bkey").as("bkey"))
        val qKeys = keyed.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("tbl"), col("bkey"))
        val cands = keyed.join(broadcast(qKeys), Seq("tbl", "bkey"))
          .where(col("vec_id") =!= col("q_id"))
          .select("q_id", "vec_id").distinct()
        val queries = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("nq"))
        val scored = cands
          .join(broadcast(queries), "q_id")
          .join(q, "vec_id")
          .withColumn("d", dot(s)(col("qv"), col("v")))
          .withColumn("sc", score(col("d"), col("nq"), col("nn")))
        val w = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= LshTopK)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      },
      Some {
        val keyedUnion = (0 until LshTables).map { t =>
          s"SELECT vec_id, $t AS tbl, ${sqlBucketKey(t, "v")} AS bkey FROM n"
        }.mkString("\nUNION ALL\n")
        s"""WITH q AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
           |  FROM embeddings),
           |n AS (SELECT vec_id, v,
           |    list_sum(list_transform(list_zip(v, v), s -> s[1] * s[2])) nn FROM q),
           |keyed AS (
           |$keyedUnion),
           |cand AS (SELECT DISTINCT y.q_id, k.vec_id
           |  FROM keyed k JOIN (SELECT vec_id q_id, tbl, bkey FROM keyed
           |                     WHERE vec_id < $NumQueries) y
           |    ON k.tbl = y.tbl AND k.bkey = y.bkey
           |  WHERE k.vec_id <> y.q_id),
           |scored AS (SELECT c.q_id, c.vec_id neighbor_id,
           |    list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])) d,
           |    a.nn nq, b.nn nv
           |  FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.vec_id)
           |SELECT q_id, rank, neighbor_id FROM (
           |  SELECT q_id, neighbor_id, row_number() OVER (
           |      PARTITION BY q_id
           |      ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nq * nv AS DOUBLE) DESC,
           |               neighbor_id ASC) rank
           |  FROM scored) t
           |WHERE rank <= $LshTopK""".stripMargin
      }),

    // ----- IVF (inverted-file) candidate retrieval + rerank ------------------
    // Deterministic k-means: centroids seeded from the first K vectors by id,
    // 3 Lloyd iterations (driver-side doubles on a 512-vector sample — at
    // scale the fit runs on a sample, which is exactly what this is), then
    // QUANTIZED to integer literals inlined into both the Spark plan and the
    // oracle SQL. Assignment + probing use the exact-integer cross-multiplied
    // cosine score (one IEEE division of <2^53 integers) so the oracle is
    // bit-identical; the oracle itself is dynamic — generated after the fit.
    QueryDef(
      "ann3_topk_ivf",
      (s, dir) => {
        val q = quantized(s, dir)
        val cents = fitQuantizedCentroids(s, dir)
        ann3Oracle = Some(ann3Sql(cents))
        // r17: fused assignment/probing kernel (see cellTopIds)
        val corpus = q.withColumn("cell", element_at(cellTopIds(cents, 1), 1))
        // queries probe the IvfProbes nearest cells
        val probed = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"),
            explode(cellTopIds(cents, IvfProbes)).as("cell"))
        val cands = corpus.join(broadcast(probed), "cell")
          .where(col("vec_id") =!= col("q_id"))
          .select("q_id", "vec_id").distinct()
        val queries = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("nq"))
        val scored = cands
          .join(broadcast(queries), "q_id")
          .join(q, "vec_id")
          .withColumn("d", dot(s)(col("qv"), col("v")))
          .withColumn("sc", score(col("d"), col("nq"), col("nn")))
        val w = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= LshTopK)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      },
      None,
      oracleDyn = Some(() => ann3Oracle.get)),

    // ----- product quantization (PQ) + asymmetric rerank ---------------------
    // The third classic ANN index family (after LSH=ann2, IVF=ann3): each
    // vector is ENCODED as M=8 sub-codes (4 bits each — 8 codes of k=16
    // per 8-dim subspace), fit per-subspace by the same bounded
    // deterministic Lloyd shape ann3 uses, codebooks floor-quantized to
    // integer literals inlined into plan AND oracle. Candidate scoring is
    // TRUE ADC (ann5's pattern): each broadcast query carries an M×K
    // partial-dot lookup table, each candidate's dot is M lookups on its
    // codes, and the decoded norm is M lookups into a plan-time literal
    // table — numerically identical to the decoded-centroid dot (disjoint
    // subspaces), integer-exact so ranking is deterministic; the
    // top-PqCandidates then rerank against the TRUE vectors. At scale
    // the point is compression: the candidate pass reads 8-byte codes
    // (64x smaller than the raw vectors — encode once at ingest), and
    // only the rerank's bounded candidate set touches full vectors.
    QueryDef(
      "ann4_topk_pq",
      (s, dir) => {
        val q = quantized(s, dir)
        val cbs = fitPqCodebooks(s, dir)
        ann4Oracle = Some(ann4Sql(cbs))
        val enc = q.select(col("*") +: pqCodeCols(cbs): _*)
        val normTab: Int => Seq[Long] =
          m => cbs(m).map(cv => cv.map(x => x * x).sum).toSeq
        val nd = (0 until PqM).map { m =>
          element_at(typedlit(normTab(m)), (col(s"c$m") + 1).cast("int"))
        }.reduce(_ + _)
        val dec = enc.withColumn("nd", nd)
          .select(("vec_id" +: "nd" +: (0 until PqM).map(m => s"c$m")).map(col): _*)
        val tab = array((0 until PqM).map { m =>
          array((0 until PqK).map { c =>
            dot(s)(slice(col("qv"), m * PqSubDim + 1, PqSubDim),
              typedlit(cbs(m)(c).toSeq))
          }: _*)
        }: _*)
        val queries = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("nq"))
        val qtab = queries.select(col("q_id"), col("nq"), tab.as("tab"))
        val dh = (0 until PqM).map { m =>
          element_at(element_at(col("tab"), m + 1), (col(s"c$m") + 1).cast("int"))
        }.reduce(_ + _)
        val adc = dec.join(broadcast(qtab), col("vec_id") =!= col("q_id"))
          .withColumn("dh", dh)
          .withColumn("sc", score(col("dh"), col("nq"), col("nd")))
        val w = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        val cands = adc.withColumn("r", row_number().over(w))
          .where(col("r") <= PqCandidates).select("q_id", "vec_id")
        val scored = cands
          .join(broadcast(queries), "q_id")
          .join(q, "vec_id")
          .withColumn("d", dot(s)(col("qv"), col("v")))
          .withColumn("sc", score(col("d"), col("nq"), col("nn")))
        val w2 = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w2))
          .where(col("rank") <= LshTopK)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      },
      None,
      oracleDyn = Some(() => ann4Oracle.get)),

    // ----- IVF + PQ composition (IVFADC — the production shape) -------------
    // What a billion-vector deployment actually runs (the FAISS IVFADC
    // layout): the coarse quantizer (ann3's cells) bounds WHICH vectors
    // are candidates, and product quantization (ann4's codes) bounds WHAT
    // the candidate pass reads — 8-byte codes inside the probed cells
    // only, so per query the work is O(cells_probed × cell_size) over
    // compressed codes, with full vectors touched only by the bounded
    // exact rerank. Both fits are shared (cached) with ann3/ann4 and
    // honor spark.graft.ann.fitMode; the dynamic oracle composes the two
    // fitted literal sets the same way the plan does.
    //
    // TRUE ADC scoring: the candidate pass never reconstructs a
    // dim-length decoded vector. Each query broadcasts a per-(subspace,
    // code) distance table `tab` (M×K partial dots of the query subvector
    // against the codebook entries — M·K·subdim work per QUERY, once),
    // and each candidate's dot is M table lookups on its codes; the
    // code-dependent decoded norm is likewise M lookups into a PLAN-TIME
    // literal table (subspaces are disjoint, so ‖decoded‖² decomposes
    // per-subspace). That keeps the candidate pass reading 8 bytes of
    // codes per row — the 64× bandwidth win PQ exists for — while staying
    // integer-exact: lookup sums are the same longs the decoded dot
    // produced, so the dynamic oracle is unchanged.
    QueryDef(
      "ann5_topk_ivfpq",
      (s, dir) => {
        val q = quantized(s, dir)
        val cents = fitQuantizedCentroids(s, dir)
        val cbs = fitPqCodebooks(s, dir)
        ann5Oracle = Some(ann5Sql(cents, cbs))
        // corpus: one coarse cell + M codes per row; nd (decoded norm²)
        // from the plan-time per-code norm table — no decoded vector
        // (r17: fused assignment kernel, see cellTopIds)
        val enc = q.withColumn("cell", element_at(cellTopIds(cents, 1), 1))
          .select(col("*") +: pqCodeCols(cbs): _*)
        val normTab: Int => Seq[Long] =
          m => cbs(m).map(cv => cv.map(x => x * x).sum).toSeq
        val nd = (0 until PqM).map { m =>
          element_at(typedlit(normTab(m)), (col(s"c$m") + 1).cast("int"))
        }.reduce(_ + _)
        val dec = enc.withColumn("nd", nd)
          .select(("vec_id" +: "cell" +: "nd" +: (0 until PqM).map(m => s"c$m"))
            .map(col): _*)
        val probed = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"),
            explode(cellTopIds(cents, IvfProbes)).as("cell"))
        // per-query ADC table: tab[m][c] = <query subvector m, codebook[m][c]>
        val tab = array((0 until PqM).map { m =>
          array((0 until PqK).map { c =>
            dot(s)(slice(col("qv"), m * PqSubDim + 1, PqSubDim),
              typedlit(cbs(m)(c).toSeq))
          }: _*)
        }: _*)
        val queries = q.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("nq"))
        val qtab = queries.select(col("q_id"), col("nq"), tab.as("tab"))
        // ADC scoring only inside the probed cells (each corpus vector has
        // exactly one cell, so the cell join cannot duplicate a candidate)
        val dh = (0 until PqM).map { m =>
          element_at(element_at(col("tab"), m + 1), (col(s"c$m") + 1).cast("int"))
        }.reduce(_ + _)
        val adc = dec.join(broadcast(probed), "cell")
          .where(col("vec_id") =!= col("q_id"))
          .join(broadcast(qtab), "q_id")
          .withColumn("dh", dh)
          .withColumn("sc", score(col("dh"), col("nq"), col("nd")))
        val w = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        val cands = adc.withColumn("r", row_number().over(w))
          .where(col("r") <= PqCandidates).select("q_id", "vec_id")
        val scored = cands
          .join(broadcast(queries), "q_id")
          .join(q, "vec_id")
          .withColumn("d", dot(s)(col("qv"), col("v")))
          .withColumn("sc", score(col("d"), col("nq"), col("nn")))
        val w2 = Window.partitionBy("q_id").orderBy(col("sc").desc, col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w2))
          .where(col("rank") <= LshTopK)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      },
      None,
      oracleDyn = Some(() => ann5Oracle.get)),

    // ----- per-label embedding centroids ------------------------------------
    // The class-centroid computation curation pipelines run constantly
    // (label prototypes, cluster summaries, SemDeDup seeds): elementwise
    // per-label sums + counts over the quantized vectors — emitted as
    // exact integers (callers divide for the mean) so the check is
    // hash-exact. Scale: posexplode fans each row to dim rows, then ONE
    // map-side-combined hash aggregate keyed (label, pos) — linear in
    // corpus size, state bounded by |labels|×dim regardless of rows.
    QueryDef(
      "emb1_label_centroid",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(col("label"), posexplode(quant(col("embedding"))).as(Seq("p", "x")))
        .groupBy(col("label"), (col("p") + 1).cast("int").as("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n")),
      Some(s"""WITH q AS (SELECT label,
             |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
             |  FROM embeddings)
             |SELECT label, CAST(i AS INTEGER) AS pos,
             |  CAST(sum(v[i]) AS BIGINT) AS sx, count(*) AS n
             |FROM q, UNNEST(range(1, ${EmbeddingDim + 1})) t(i)
             |GROUP BY 1, 2""".stripMargin)),

    // ----- int8 affine quantization export (emb2) ---------------------------
    // The vector-store export step: per-DIMENSION affine int8 quantization
    // q = floor((x - min_d) * 255 / (max_d - min_d)). Dimension stats are
    // one map-side-combined agg over exploded (pos, value) pairs — |dim|
    // result rows — broadcast back onto the corpus; the quantize pass is
    // map-only. Arithmetic stays on the suite's floor(x*1000) integer grid;
    // the one division runs in IEEE double over exactly-representable
    // integers (< 2^53) so Spark and DuckDB floor identically. 100 TB
    // shape: per-task agg state is |dim| cells, the broadcast is |dim|
    // rows, nothing else shuffles.
    QueryDef(
      "emb2_int8_quant",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(quant(col("embedding"))).as(Seq("p", "x")))
        val stats = e.groupBy("p").agg(min("x").as("mn"), max("x").as("mx"))
        e.join(broadcast(stats), "p")
          .select(col("vec_id"), (col("p") + 1).cast("int").as("pos"),
            when(col("mx") === col("mn"), 0L)
              .otherwise(floor((col("x") - col("mn")) * lit(255) / (col("mx") - col("mn"))))
              .as("q8"))
      },
      Some(s"""WITH v AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
             |  FROM embeddings),
             |  e AS (SELECT vec_id, CAST(i AS INTEGER) AS pos, v[i] AS x
             |    FROM v, UNNEST(range(1, ${EmbeddingDim + 1})) t(i)),
             |  st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1)
             |SELECT e.vec_id, e.pos,
             |  CAST(CASE WHEN mx = mn THEN 0
             |       ELSE floor((x - mn) * 255 / (mx - mn)) END AS BIGINT) AS q8
             |FROM e JOIN st USING (pos)""".stripMargin)),

    // ----- gram matrix X^T X (emb3) -----------------------------------------
    // The PCA/whitening prep every embedding pipeline runs before choosing
    // a projection: the d x d gram matrix of the quantized corpus, upper
    // triangle as (i, j, g) rows. Each input row explodes to d(d+1)/2
    // products that are partially aggregated MAP-SIDE before the one
    // shuffle, so the exchange carries O(d^2 x tasks) cells — independent
    // of corpus size; no row ever sees another row (outer-product
    // additivity). The quantized array is materialized ONCE per row
    // before the pair lambda (the per-element recompute trap measured 6x
    // on shingles). Integer-exact: floor(x*1000) grid, BIGINT sums.
    QueryDef(
      "emb3_gram",
      (s, dir) => {
        // r16: the explode-then-hash-aggregate shape (every row fanned
        // into d(d+1)/2 struct rows, ~N·d²/2 (i,j)-keyed rows hashed)
        // is replaced by ONE [[graft.functions.GramSum]] aggregate: a
        // per-task d²/2-cell buffer with a tight multiply-add loop per
        // row (outer-product additivity — no row needs another row),
        // exchanged as one O(d²) array per task, then unpacked to the
        // identical (i, j, g) rows by a literal index mapping. Same
        // results (GramSumSpec pins equality with the exploded shape)
        // ON A NON-EMPTY CORPUS: a global aggregate emits one row even
        // over zero input, so an EMPTY embeddings table would yield
        // d(d+1)/2 zero cells where the exploded shape yields zero rows
        // (and all-null products sum to 0, not NULL) — acceptable here
        // because the fixture tables are non-empty by construction and
        // the oracle gate pins the real corpus, not the degenerate one.
        val d = EmbeddingDim
        val iArr: Seq[Int] = for (i <- 1 to d; j <- i to d) yield i
        val jArr: Seq[Int] = for (i <- 1 to d; j <- i to d) yield j
        val gram = org.apache.spark.sql.GraftSqlShim.column(
          graft.functions.GramSum(
            org.apache.spark.sql.GraftSqlShim.expression(
              quant(col("embedding"))), d).toAggregateExpression())
        Tables.load(s, dir, "embeddings")
          .agg(gram.as("gm"))
          .select(posexplode(col("gm")).as(Seq("p", "g")))
          .select(
            element_at(typedlit(iArr), (col("p") + 1).cast("int")).as("i"),
            element_at(typedlit(jArr), (col("p") + 1).cast("int")).as("j"),
            col("g"))
      },
      Some(s"""WITH q AS (SELECT
             |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
             |  FROM embeddings)
             |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
             |  CAST(sum(v[i] * v[j]) AS BIGINT) AS g
             |FROM q, UNNEST(range(1, ${EmbeddingDim + 1})) a(i),
             |     UNNEST(range(1, ${EmbeddingDim + 1})) b(j)
             |WHERE j >= i
             |GROUP BY 1, 2""".stripMargin)),

    // ----- centroid-distance outliers (emb4) --------------------------------
    // Embedding-space quality filtering: the 5 vectors FURTHEST from their
    // own label's centroid, per label — the mislabeled/noise-flagging pass
    // (the curation shape CLIP-score filtering instantiates). Exactness
    // trick: comparing ||v − s/n||² within a label only needs the
    // n²-scaled form Σ(n·v_p − s_p)² — pure BIGINT, no division, no FP
    // (sound while n·1000·dim fits a Long — ~10¹⁴ rows/label; per-label
    // cardinality never approaches that). Shape: centroid agg is
    // |labels|×dim state broadcast back; the distance agg is partial
    // map-side (a vector's posexplode never crosses tasks), so the
    // vec-keyed exchange carries ONE row per vector; the final top-k
    // window shuffles only (label, vec_id, d2) scalars.
    QueryDef(
      "emb4_centroid_outlier",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(quant(col("embedding"))).as(Seq("p", "x")))
        val cent = e.groupBy("label", "p")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        val d2 = e.join(broadcast(cent), Seq("label", "p"))
          .select(col("vec_id"), col("label"),
            ((col("n") * col("x") - col("sx")) *
             (col("n") * col("x") - col("sx"))).as("sq"))
          .groupBy("vec_id", "label").agg(sum("sq").as("d2"))
        val w = Window.partitionBy("label")
          .orderBy(col("d2").desc, col("vec_id").asc)
        d2.withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 5)
          .select("label", "vec_id", "d2", "rk")
      },
      Some(s"""WITH v AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
             |  FROM embeddings),
             |e AS (SELECT vec_id, label, CAST(i AS INTEGER) AS p, v[i] AS x
             |      FROM v, UNNEST(range(1, ${EmbeddingDim + 1})) t(i)),
             |c AS (SELECT label, p, CAST(sum(x) AS BIGINT) AS sx, count(*) AS n
             |      FROM e GROUP BY 1, 2),
             |d AS (SELECT e.vec_id, e.label,
             |        CAST(sum((n * x - sx) * (n * x - sx)) AS BIGINT) AS d2
             |      FROM e JOIN c USING (label, p) GROUP BY 1, 2),
             |r AS (SELECT label, vec_id, d2,
             |        CAST(row_number() OVER (PARTITION BY label
             |               ORDER BY d2 DESC, vec_id) AS INTEGER) AS rk
             |      FROM d)
             |SELECT label, vec_id, d2, rk FROM r WHERE rk <= 5""".stripMargin)),

    // ----- k-NN graph construction (emb5) -----------------------------------
    // The neighborhood graph SemDeDup-style pruning and graph-based
    // curation build as a preprocessing artifact: for EVERY vector, its
    // top-KnnK cosine neighbors among candidates in its top-KnnProbes
    // learned cells (dd7's cell assignment with hot-cell LSH subdivision
    // and the deterministic cap — bounded O(block²) tasks, never
    // all-pairs). MULTI-PROBE on the SOURCE side (ann3's probing shape):
    // each vector searches its top-2 cells, so a near-boundary vector
    // still sees its true neighbors across the cell seam — candidates
    // 2×, still block-bounded; the CORPUS side stays the single-
    // assignment capped block table, so the join fan-out per source is
    // ≤ KnnProbes × LshTables × MaxBlock. Directed: ranking is per
    // SOURCE vector, so the pair join keeps both orientations (x ≠ y,
    // not x < y). Scoring is the suite's integer-exact sign-preserving
    // cos² as one double division — rankable cross-engine; ties break
    // to the lower neighbor id. Scale: candidate generation is the same
    // bounded block join dd7 runs; the ranking is one source-keyed
    // window over O(probes·block²·blocks) scored edges.
    QueryDef(
      "emb5_knn_graph",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val q = quantized(s, dir)
        val cents = fitQuantizedCentroids(s, dir)
        Dedup.emb5Oracle = Some(Dedup.emb5Sql(cents))
        // r17: fused assignment/probing kernel (see cellTopIds)
        val assigned = q.withColumn("cell",
          element_at(cellTopIds(cents, 1), 1))
        val blocks = Dedup.semanticBlocks(s, assigned)
        // source side: probe the top-KnnProbes cells; label assignment
        // mirrors semanticBlocks per probed cell (cold cell → its one
        // block; hot cell → the prober's own band buckets). Sources are
        // never capped — the cap bounds the CORPUS block size, which is
        // what bounds the join task.
        val probed = q.select(col("vec_id"), col("v"), col("nn"),
          explode(cellTopIds(cents, KnnProbes)).as("cell"))
        val cellCnt = assigned.groupBy("cell").agg(count(lit(1)).as("cnt"))
        val hotBands = array((0 until LshTables).map(t =>
          struct(lit(t).as("band"), bucketKey(s, t, col("v")).as("sub"))): _*)
        val coldBand = array(struct(lit(-1).as("band"), lit(0L).as("sub")))
        val src = probed.join(cellCnt, Seq("cell"))
          .select(col("vec_id").as("src"), col("v").as("va"),
            col("nn").as("na"), col("cell"),
            explode(when(col("cnt") <= Dedup.MaxBlock, coldBand)
              .otherwise(hotBands)).as("bk"))
          .withColumn("label",
            concat_ws("|", col("cell"), col("bk.band"), col("bk.sub")))
          .select("label", "src", "va", "na")
        val b = blocks.select(col("label"), col("vec_id").as("dst"),
          col("v").as("vb"), col("nn").as("nb"))
        val scored = src.join(b, Seq("label")).where(col("src") =!= col("dst"))
          .withColumn("d", dot(s)(col("va"), col("vb")))
          .withColumn("sc", score(col("d"), col("na"), col("nb")))
          .select("src", "dst", "sc").distinct() // multi-probe/band dups
        val w = Window.partitionBy("src").orderBy(col("sc").desc, col("dst").asc)
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= KnnK)
          .select(col("src").as("vec_id"), col("rank"),
            col("dst").as("neighbor_id"))
      },
      None,
      oracleDyn = Some(() => Dedup.emb5Oracle.get))
  )

  val KnnK = 3

  /** Cells each SOURCE vector probes when building the k-NN graph
    * (emb5); the corpus side stays single-assignment. */
  val KnnProbes = 2

  val IvfCells = 16
  val IvfProbes = 2
  val IvfFitSample = 512

  // ---- product quantization -------------------------------------------------

  val PqM = 8          // subspaces
  val PqSubDim = EmbeddingDim / PqM
  val PqK = 16         // codes per subspace (4 bits)
  val PqCandidates = 16

  private val pqFitCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Array[Long]]]]
  @volatile private var ann4Oracle: Option[String] = None
  @volatile private var ann5Oracle: Option[String] = None

  /** Per-subspace codebooks `[m][k][subdim]`, dispatched on the same
    * [[FitModeConf]] session conf as the IVF fit: `driver` (default —
    * bounded [[IvfFitSample]]-vector Lloyd on the driver) or `minibatch`
    * ([[fitPqMinibatch]] — distributed, sees the whole corpus). Either
    * way codebooks are floor-quantized integers inlined into plan AND
    * dynamic oracle, so downstream is mode-agnostic. */
  private[graft] def fitPqCodebooks(s: SparkSession, dir: String): Array[Array[Array[Long]]] = {
    val mode = s.conf.get(FitModeConf, "driver")
    pqFitCache.getOrElseUpdate(s"$dir@$mode", mode match {
      case "minibatch" => fitPqMinibatch(s, dir)
      case _           => fitPqDriver(s, dir)
    })
  }

  /** Driver-side PQ fit: the same bounded deterministic shape as
    * [[fitDriver]] — first [[IvfFitSample]] vectors by id, per-subspace
    * Lloyd (L2) for 3 rounds seeded from the first [[PqK]] subvectors. */
  private def fitPqDriver(s: SparkSession, dir: String): Array[Array[Array[Long]]] = {
    import s.implicits._
    val sample = quantized(s, dir).orderBy("vec_id").limit(IvfFitSample)
      .select("v").as[Array[Long]].collect()
    Array.tabulate(PqM) { m =>
      val sub = sample.map(_.slice(m * PqSubDim, (m + 1) * PqSubDim))
      var cents: Array[Array[Double]] = sub.take(PqK).map(_.map(_.toDouble))
      (1 to 3).foreach { _ =>
        val assigned = sub.map(v => (nearestL2(v, cents), v))
        cents = Array.tabulate(PqK) { c =>
          val members = assigned.filter(_._1 == c).map(_._2)
          if (members.isEmpty) cents(c)
          else Array.tabulate(PqSubDim)(d =>
            members.map(_(d).toDouble).sum / members.size)
        }
      }
      cents.map(_.map(x => math.floor(x).toLong))
    }
  }

  /** Distributed minibatch PQ fit — the PQ analog of [[fitMinibatch]]:
    * each round is ONE job over a deterministic hash-sampled minibatch.
    * Every row fans out to its M (subspace, nearest-code, subvector)
    * structs via a single explode, then ONE map-side-combined aggregate
    * keyed (m, cell) carries only M×k×(subdim+1) partial sums through the
    * shuffle regardless of corpus size; codebooks update on the driver
    * (O(M·k·subdim) state). Assignment is the same L2-argmin the encode
    * path uses, against the round's un-quantized double codebooks. Scales
    * to any corpus the scan scales to — the fix for underfit 8×16
    * codebooks from a 512-vector sample on a skewed corpus. */
  private def fitPqMinibatch(s: SparkSession, dir: String): Array[Array[Array[Long]]] = {
    import s.implicits._
    val q = quantized(s, dir)
    val seed = q.orderBy("vec_id").limit(PqK).select("v").as[Array[Long]].collect()
    var books: Array[Array[Array[Double]]] = Array.tabulate(PqM) { m =>
      seed.map(_.slice(m * PqSubDim, (m + 1) * PqSubDim).map(_.toDouble))
    }
    (1 to MinibatchRounds).foreach { r =>
      // distinct hash salt from the IVF fit so the two fits draw
      // independent minibatch sequences
      val batch = q.filter(
        pmod(xxhash64(col("vec_id"), lit(1000 + r)), lit(MinibatchMod)) === 0)
      val pieces = (0 until PqM).map { m =>
        struct(lit(m).as("m"), pqCodeD(m, books(m)).as("cell"),
          slice(col("v"), m * PqSubDim + 1, PqSubDim).as("sv"))
      }
      val sums = (0 until PqSubDim).map(d => sum(element_at(col("sv"), d + 1)).as(s"s$d"))
      val rows = batch.select(explode(array(pieces: _*)).as("e"))
        .select(col("e.m"), col("e.cell"), col("e.sv"))
        .groupBy("m", "cell")
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect() // ≤ M×k rows of (m, cell, cnt, subdim sums) — bounded by the codebook size, not data
      val next = books.map(_.map(_.clone()))
      rows.foreach { row =>
        val m = row.getInt(0); val c = row.getInt(1); val cnt = row.getLong(2)
        if (cnt > 0)
          next(m)(c) = Array.tabulate(PqSubDim)(d => row.getLong(3 + d).toDouble / cnt)
      }
      books = next
    }
    books.map(_.map(_.map(x => math.floor(x).toLong)))
  }

  /** Fit-time L2 distance of the m-th subvector to a DOUBLE centroid
    * (mirror of [[pqDist]]; exactness mid-fit is irrelevant — the fitted,
    * quantized result is what gets inlined). */
  private def pqDistD(m: Int, cb: Array[Double]): Column =
    aggregate(
      zip_with(slice(col("v"), m * PqSubDim + 1, PqSubDim), typedlit(cb.toSeq),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Argmin code for subspace m against double centroids: lexicographic
    * struct-min, ties to the LOWER code — same discipline as [[pqCode]]
    * and [[nearestL2]]. */
  private def pqCodeD(m: Int, cbm: Array[Array[Double]]): Column =
    array_min(array(cbm.zipWithIndex.map { case (cv, c) =>
      struct(pqDistD(m, cv).as("d"), lit(c).as("i"))
    }: _*)).getField("i")

  private def nearestL2(v: Array[Long], cents: Array[Array[Double]]): Int =
    cents.zipWithIndex.minBy { case (c, i) =>
      (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i)
    }._2

  /** Exact-integer L2 distance from the m-th subvector of `v` to an
    * integer centroid (values < 2^30 — no overflow). */
  private def pqDist(m: Int, cb: Array[Long]): Column =
    aggregate(
      zip_with(slice(col("v"), m * PqSubDim + 1, PqSubDim), typedlit(cb.toSeq),
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Argmin code for subspace m via the (dist·K + idx) integer-min trick —
    * deterministic ties to the LOWER code, pure codegen. (Reference
    * implementation; the encode PATH uses the fused [[pqCodeCols]] —
    * PqCodesSpec pins their equality.) */
  private[graft] def pqCode(m: Int, cbm: Array[Array[Long]]): Column =
    least(cbm.zipWithIndex.map { case (cv, c) =>
      pqDist(m, cv) * PqK + c
    }: _*) % PqK

  /** All M code columns `c0..c7` from ONE fused codegen encode
    * ([[graft.functions.PqEncode]] — r16): one M·K·subdim multiply-add
    * loop per row instead of M·K slice+zip_with+aggregate chains. The
    * element_at projections over the single `cs` array are eliminated as
    * common subexpressions inside the one collapsed Project. */
  private[graft] def pqCodeCols(cbs: Array[Array[Array[Long]]]): Seq[Column] = {
    val all = org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftSqlShim.expression(col("v")),
        cbs.map(_.map(_.toSeq).toSeq).toSeq))
    (0 until PqM).map(m => element_at(all, m + 1).as(s"c$m"))
  }

  /** Mean squared quantization error of a codebook set over the WHOLE
    * corpus — the fit-quality scalar (lower = the 8-byte codes lose less
    * of each vector). One job: encode with the query path's exact-integer
    * argmin, decode, integer squared error per row, one avg. Spec-only
    * (PqFitSpec compares driver vs minibatch fits). */
  private[graft] def pqQuantMse(s: SparkSession, dir: String,
      cbs: Array[Array[Array[Long]]]): Double = {
    val q = quantized(s, dir)
    val enc = (0 until PqM).foldLeft(q) { (df, m) =>
      df.withColumn(s"c$m", pqCode(m, cbs(m)))
    }
    val decoded = flatten(array((0 until PqM).map { m =>
      element_at(typedlit(cbs(m).map(_.toSeq).toSeq), (col(s"c$m") + 1).cast("int"))
    }: _*))
    enc.withColumn("err",
        aggregate(zip_with(col("v"), decoded, (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x))
      .agg(avg(col("err"))).collect().head.getDouble(0)
  }

  // ---- shared SQL fragments for the PQ oracles (ann4, ann5) ----------------

  private def pqDistSql(m: Int, cv: Array[Long]): String = {
    val lo = m * PqSubDim + 1
    val hi = (m + 1) * PqSubDim
    val arr = cv.mkString("[", ",", "]")
    s"list_sum(list_transform(list_zip(v[$lo:$hi], $arr::BIGINT[]), s -> (s[1]-s[2])*(s[1]-s[2])))"
  }

  // list_sum yields HUGEINT — cast the code back down so list_extract binds
  private def pqCodeSql(cbs: Array[Array[Array[Long]]], m: Int): String =
    cbs(m).zipWithIndex
      .map { case (cv, c) => s"(${pqDistSql(m, cv)}) * $PqK + $c" }
      .mkString("CAST(least(", ", ", s") % $PqK AS BIGINT)")

  private def pqCodeColsSql(cbs: Array[Array[Array[Long]]]): String =
    (0 until PqM).map(m => s"${pqCodeSql(cbs, m)} AS c$m").mkString(",\n    ")

  private def pqBookSql(cbs: Array[Array[Array[Long]]], m: Int): String =
    cbs(m).map(_.mkString("[", ",", "]")).mkString("[", ", ", "]")

  private def pqDecodeSql(cbs: Array[Array[Array[Long]]]): String =
    (0 until PqM)
      .map(m => s"list_extract(${pqBookSql(cbs, m)}, c$m + 1)").mkString(", ")

  /** Dynamic oracle for ann4: the full encode → decode → ADC-rank →
    * exact-rerank pipeline with the fitted codebooks inlined. */
  private def ann4Sql(cbs: Array[Array[Array[Long]]]): String = {
    val codeCols = pqCodeColsSql(cbs)
    val decodePieces = pqDecodeSql(cbs)
    s"""WITH q AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v,
       |    list_sum(list_transform(list_zip(v, v), s -> s[1] * s[2])) nn FROM q),
       |enc AS (SELECT vec_id, v, nn,
       |    $codeCols
       |  FROM n),
       |dec AS (SELECT vec_id,
       |    flatten([$decodePieces]) dv
       |  FROM enc),
       |d2 AS (SELECT vec_id, dv,
       |    list_sum(list_transform(list_zip(dv, dv), s -> s[1] * s[2])) nd FROM dec),
       |adc AS (SELECT a.vec_id q_id, b.vec_id,
       |    list_sum(list_transform(list_zip(a.v, b.dv), s -> s[1] * s[2])) dh,
       |    a.nn nq, b.nd
       |  FROM n a JOIN d2 b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < $NumQueries),
       |cand AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (
       |        PARTITION BY q_id
       |        ORDER BY CAST(dh * abs(dh) AS DOUBLE) / CAST(nq * nd AS DOUBLE) DESC,
       |                 vec_id ASC) r
       |    FROM adc) t
       |  WHERE r <= $PqCandidates),
       |scored AS (SELECT c.q_id, c.vec_id neighbor_id,
       |    list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])) d,
       |    a.nn nq, b.nn nv
       |  FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.vec_id)
       |SELECT q_id, rank, neighbor_id FROM (
       |  SELECT q_id, neighbor_id, row_number() OVER (
       |      PARTITION BY q_id
       |      ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nq * nv AS DOUBLE) DESC,
       |               neighbor_id ASC) rank
       |  FROM scored) t
       |WHERE rank <= $LshTopK""".stripMargin
  }

  /** Dynamic oracle for ann5 (IVFADC): ann3's coarse-cell CTEs bound the
    * candidate set, ann4's encode/decode CTEs provide the ADC scores —
    * composed exactly like the Spark plan, both fitted literal sets
    * inlined. */
  private def ann5Sql(
      cents: Array[Array[Long]], cbs: Array[Array[Array[Long]]]): String = {
    val values = cents.zipWithIndex.map { case (cv, c) =>
      val ncSq = cv.map(x => x * x).sum
      s"($c, ${cv.mkString("[", ",", "]")}::BIGINT[], ${ncSq})"
    }.mkString(",\n    ")
    s"""WITH q AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v,
       |    list_sum(list_transform(list_zip(v, v), s -> s[1] * s[2])) nn FROM q),
       |cents(cell, cv, nc) AS (VALUES
       |    $values),
       |sc AS (SELECT a.vec_id, c.cell,
       |    list_sum(list_transform(list_zip(a.v, c.cv), s -> s[1] * s[2])) d,
       |    a.nn, c.nc
       |  FROM n a CROSS JOIN cents c),
       |rk AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nn * nc AS DOUBLE) DESC,
       |             cell ASC) r
       |  FROM sc),
       |corpus AS (SELECT vec_id, cell FROM rk WHERE r = 1),
       |probe AS (SELECT vec_id q_id, cell FROM rk
       |  WHERE vec_id < $NumQueries AND r <= $IvfProbes),
       |enc AS (SELECT vec_id, v, nn,
       |    ${pqCodeColsSql(cbs)}
       |  FROM n),
       |dec AS (SELECT vec_id,
       |    flatten([${pqDecodeSql(cbs)}]) dv
       |  FROM enc),
       |d2 AS (SELECT vec_id, dv,
       |    list_sum(list_transform(list_zip(dv, dv), s -> s[1] * s[2])) nd FROM dec),
       |adc AS (SELECT p.q_id, k.vec_id,
       |    list_sum(list_transform(list_zip(a.v, b.dv), s -> s[1] * s[2])) dh,
       |    a.nn nq, b.nd
       |  FROM corpus k JOIN probe p ON k.cell = p.cell
       |  JOIN d2 b ON b.vec_id = k.vec_id
       |  JOIN n a ON a.vec_id = p.q_id
       |  WHERE k.vec_id <> p.q_id),
       |cand AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (
       |        PARTITION BY q_id
       |        ORDER BY CAST(dh * abs(dh) AS DOUBLE) / CAST(nq * nd AS DOUBLE) DESC,
       |                 vec_id ASC) r
       |    FROM adc) t
       |  WHERE r <= $PqCandidates),
       |scored AS (SELECT c.q_id, c.vec_id neighbor_id,
       |    list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])) d,
       |    a.nn nq, b.nn nv
       |  FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.vec_id)
       |SELECT q_id, rank, neighbor_id FROM (
       |  SELECT q_id, neighbor_id, row_number() OVER (
       |      PARTITION BY q_id
       |      ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nq * nv AS DOUBLE) DESC,
       |               neighbor_id ASC) rank
       |  FROM scored) t
       |WHERE rank <= $LshTopK""".stripMargin
  }

  /** Fit-mode session conf: `driver` (default — bounded 512-vector Lloyd
    * fit on the driver) or `minibatch` (distributed DataFrame-aggregate
    * Lloyd rounds over hash-sampled minibatches — better coverage on
    * skewed corpora, one Spark job per round). Either way centroids are
    * floor-quantized integers inlined into the dynamic oracle, so the
    * downstream ann3/dd7 plans and oracles are mode-agnostic. */
  val FitModeConf = "spark.graft.ann.fitMode"
  val MinibatchRounds = 3
  val MinibatchMod = 4L // each round visits ~1/MinibatchMod of the corpus

  private val ivfFitCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Long]]]
  @volatile private var ann3Oracle: Option[String] = None

  private[graft] def fitQuantizedCentroids(s: SparkSession, dir: String): Array[Array[Long]] = {
    val mode = s.conf.get(FitModeConf, "driver")
    ivfFitCache.getOrElseUpdate(s"$dir@$mode", mode match {
      case "minibatch" => fitMinibatch(s, dir)
      case _           => fitDriver(s, dir)
    })
  }

  /** Driver-side Lloyd fit on the first [[IvfFitSample]] vectors by id,
    * floor-quantized to integer centroids (so downstream assignment is
    * exact-integer and oracle-reproducible). */
  private def fitDriver(s: SparkSession, dir: String): Array[Array[Long]] = {
    import s.implicits._
    val k = IvfCells
    val sample = quantized(s, dir).orderBy("vec_id").limit(IvfFitSample)
      .select("vec_id", "v").as[(Long, Array[Long])].collect()
    var centroids: Array[Array[Double]] =
      sample.take(k).map(_._2.map(_.toDouble))
    (1 to 3).foreach { _ =>
      val assigned = sample.map { case (_, v) => (nearestCentroid(v, centroids), v) }
      centroids = (0 until k).map { c =>
        val members = assigned.filter(_._1 == c).map(_._2)
        if (members.isEmpty) centroids(c)
        else {
          val dim = members.head.length
          (0 until dim).map(d => members.map(_(d).toDouble).sum / members.size).toArray
        }
      }.toArray
    }
    centroids.map(_.map(x => math.floor(x).toLong))
  }

  /** Distributed minibatch Lloyd fit: each round is ONE job — assign a
    * deterministic hash-sampled minibatch to the current centroids with
    * the same codegen argmax shape the query path uses, then aggregate
    * per-cell elementwise sums + counts (map-side combined; the shuffle
    * carries only k×(dim+1) numbers regardless of corpus size) and update
    * centroids on the driver (O(k·dim) state). Scales to any corpus the
    * scan scales to, unlike the fixed 512-vector driver sample. */
  private def fitMinibatch(s: SparkSession, dir: String): Array[Array[Long]] = {
    import s.implicits._
    val k = IvfCells
    val q = quantized(s, dir)
    var centroids: Array[Array[Double]] =
      q.orderBy("vec_id").limit(k).select("v").as[Array[Long]].collect()
        .map(_.map(_.toDouble))
    (1 to MinibatchRounds).foreach { r =>
      val batch = q.filter(
        pmod(xxhash64(col("vec_id"), lit(r)), lit(MinibatchMod)) === 0)
      val sums = (0 until EmbeddingDim)
        .map(d => sum(element_at(col("v"), d + 1)).as(s"s$d"))
      val rows = batch
        .withColumn("cell", -array_max(cellScoreArrD(centroids)).getField("i"))
        .groupBy("cell")
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect() // ≤ k rows of (cell, cnt, dim sums) — bounded by k, not data
      val next = centroids.map(_.clone())
      rows.foreach { row =>
        val c = row.getInt(0)
        val cnt = row.getLong(1)
        if (cnt > 0)
          next(c) = Array.tabulate(EmbeddingDim)(d => row.getLong(2 + d).toDouble / cnt)
      }
      centroids = next
    }
    centroids.map(_.map(x => math.floor(x).toLong))
  }

  /** Fit-time variant of [[cellScoreArr]] over un-quantized (double)
    * centroids: double zip_with/aggregate dot — exactness is not needed
    * mid-fit (the FITTED result is what gets quantized + inlined). */
  private def cellScoreArrD(cents: Array[Array[Double]]): Column = {
    def cellScore(cv: Array[Double]): Column = {
      val d = aggregate(
        zip_with(col("v"), typedlit(cv.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      val ncSq = cv.map(x => x * x).sum
      (d * abs(d)) / (col("nn").cast("double") * lit(ncSq))
    }
    array(cents.zipWithIndex.map { case (cv, c) =>
      struct(cellScore(cv).as("s"), lit(-c).as("i"))
    }.toIndexedSeq: _*)
  }

  /** DuckDB oracle for ann3 with the fitted integer centroids inlined:
    * same exact-integer score, same rank/tie discipline as the Spark plan. */
  private def ann3Sql(cents: Array[Array[Long]]): String = {
    val values = cents.zipWithIndex.map { case (cv, c) =>
      val ncSq = cv.map(x => x * x).sum
      s"($c, ${cv.mkString("[", ",", "]")}::BIGINT[], ${ncSq})"
    }.mkString(",\n    ")
    s"""WITH q AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v,
       |    list_sum(list_transform(list_zip(v, v), s -> s[1] * s[2])) nn FROM q),
       |cents(cell, cv, nc) AS (VALUES
       |    $values),
       |sc AS (SELECT a.vec_id, c.cell,
       |    list_sum(list_transform(list_zip(a.v, c.cv), s -> s[1] * s[2])) d,
       |    a.nn, c.nc
       |  FROM n a CROSS JOIN cents c),
       |rk AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nn * nc AS DOUBLE) DESC,
       |             cell ASC) r
       |  FROM sc),
       |corpus AS (SELECT vec_id, cell FROM rk WHERE r = 1),
       |probe AS (SELECT vec_id q_id, cell FROM rk
       |  WHERE vec_id < $NumQueries AND r <= $IvfProbes),
       |cand AS (SELECT DISTINCT p.q_id, k.vec_id
       |  FROM corpus k JOIN probe p ON k.cell = p.cell
       |  WHERE k.vec_id <> p.q_id),
       |scored AS (SELECT c.q_id, c.vec_id neighbor_id,
       |    list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])) d,
       |    a.nn nq, b.nn nv
       |  FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.vec_id)
       |SELECT q_id, rank, neighbor_id FROM (
       |  SELECT q_id, neighbor_id, row_number() OVER (
       |      PARTITION BY q_id
       |      ORDER BY CAST(d * abs(d) AS DOUBLE) / CAST(nq * nv AS DOUBLE) DESC,
       |               neighbor_id ASC) rank
       |  FROM scored) t
       |WHERE rank <= $LshTopK""".stripMargin
  }

  /** Index of the nearest centroid by cosine (quantized ints vs double
    * centroids; deterministic: ties break to the lower index). Used only in
    * the driver-side Lloyd fit. */
  def nearestCentroid(v: Array[Long], cents: Array[Array[Double]]): Int = {
    val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
    cents.zipWithIndex.map { case (c, i) =>
      val nc = math.sqrt(c.map(x => x * x).sum)
      val d = v.indices.map(j => v(j) * c(j)).sum
      val cos = if (nv == 0 || nc == 0) -2.0 else d / (nv * nc)
      (-cos, i)
    }.min._2
  }
}
