package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analysis over the corpus — the web-graph quality signal
  * (link-based centrality) pretraining pipelines attach to crawled
  * documents. The reference has no graph surface; this extends the same
  * document tables the dedup/text operators run on.
  *
  * `gr1_linkrank` is PageRank with INTEGER-exact arithmetic: ranks are
  * BIGINT micro-units, every per-edge contribution is `floor(rank /
  * out_degree)` and every damping step `150000 + floor(sum * 85 / 100)`
  * — floor of an IEEE-double quotient of exactly-representable integers,
  * which floors identically in Spark and DuckDB (quotients sit at least
  * 1/denominator away from integers unless exact), so three unrolled
  * iterations hash-match the oracle bit for bit.
  *
  * Scale shape (the canonical Spark PageRank loop): per iteration one
  * node-keyed shuffle join (edges ⋈ ranks — deliberately NOT broadcast:
  * a 100 TB crawl's rank vector is corpus-sized) and one map-side-combined
  * aggregation of contributions keyed by destination. Edges live once;
  * out-degrees are joined, not recomputed. The synthetic edge derivation
  * (each doc links to `1 + doc_id % 4` targets at `(doc_id*7 + j*13) %
  * N`) stands in for a real link table and is computed identically by the
  * oracle.
  */
object Graph {

  private def linkrank(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
    val n = docs.count()
    val edges = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(4L)))).as("j"))
      .select(col("src"), pmod(col("src") * 7L + col("j") * 13L, lit(n)).as("dst"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("g"))
    // materialized once, reused every iteration — without the persist each
    // iteration would re-derive the edge list and re-aggregate the degrees
    // from scratch (3× the scans at 100 TB); production loops checkpoint
    // this the same way
    val edgesDeg = edges.join(deg, "src").persist()
    var rank = docs.select(col("doc_id").as("node"), lit(1000000L).as("r"))
    (1 to 3).foreach { _ =>
      val contrib = edgesDeg
        .join(rank.select(col("node").as("src"), col("r").as("rs")), "src")
        .select(col("dst").as("node"), floor(col("rs") / col("g")).as("c"))
      rank = docs.select(col("doc_id").as("node"))
        .join(contrib.groupBy("node").agg(sum("c").as("cs")), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + floor(coalesce(col("cs"), lit(0L)) * 85L / lit(100.0)))
            .as("r"))
    }
    rank.select(col("node").as("doc_id"), col("r").as("rank_u"))
  }

  /** Per-document triangle count over the undirected link graph — the
    * local clustering signal (spam farms and boilerplate rings are
    * triangle-dense; organic link neighborhoods are sparse). Exact, via
    * DEGREE-ORDERED edge orientation: every edge points from its
    * lower-(degree, id) endpoint to the higher, wedges are generated only
    * at each edge's SOURCE, and a wedge closes iff its (oriented) third
    * edge exists. Each triangle is counted exactly once, and — the reason
    * this shape survives a web-scale graph — a vertex generates wedges
    * only among its HIGHER-ranked neighbors, so a degree-D hub produces
    * O(sqrt(E)) wedges instead of O(D²): the celebrity node that melts
    * the naive id-ordered join is exactly the node degree ordering
    * defuses. Three joins total (wedge self-join + closure), all keyed
    * shuffles, no broadcast assumed (the edge list is corpus-sized). */
  private def triangleCounts(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
    val n = docs.count()
    val edges = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(4L)))).as("j"))
      .select(col("src"), pmod(col("src") * 7L + col("j") * 13L, lit(n)).as("dst"))
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("g"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("g").as("gu")), "u")
      .join(deg.select(col("node").as("v"), col("g").as("gv")), "v")
    val uLower = col("gu") < col("gv") ||
      (col("gu") === col("gv") && col("u") < col("v"))
    val ore = withDeg.select(
      when(uLower, col("u")).otherwise(col("v")).as("s"),
      when(uLower, col("v")).otherwise(col("u")).as("t"),
      when(uLower, col("gv")).otherwise(col("gu")).as("gt"))
    val e1 = ore.select(col("s"), col("t").as("b"), col("gt").as("gb"))
    val e2 = ore.select(col("s"), col("t").as("c"), col("gt").as("gc"))
    val tri = e1.join(e2, "s")
      .filter(col("gb") < col("gc") ||
        (col("gb") === col("gc") && col("b") < col("c")))
      .join(ore.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
      .select(col("s").as("x"), col("b").as("y"), col("c").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("nt"))
    docs.join(perNode, docs("doc_id") === perNode("node"), "left")
      .select(col("doc_id"), coalesce(col("nt"), lit(0L)).as("n_tri"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "gr2_triangles",
      (s, dir) => triangleCounts(s, dir),
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |  nn AS (SELECT count(*) AS n FROM d),
             |  e AS (SELECT doc_id AS src,
             |      (doc_id * 7 + j * 13) % (SELECT n FROM nn) AS dst
             |    FROM d, UNNEST(range(1, 2 + doc_id % 4)) t(j)),
             |  und AS (SELECT DISTINCT least(src, dst) u, greatest(src, dst) v
             |    FROM e WHERE src <> dst),
             |  deg AS (SELECT node, count(*) g FROM (
             |      SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
             |    GROUP BY 1),
             |  ore AS (SELECT
             |      CASE WHEN du.g < dv.g OR (du.g = dv.g AND u < v)
             |           THEN u ELSE v END AS s,
             |      CASE WHEN du.g < dv.g OR (du.g = dv.g AND u < v)
             |           THEN v ELSE u END AS t,
             |      CASE WHEN du.g < dv.g OR (du.g = dv.g AND u < v)
             |           THEN dv.g ELSE du.g END AS gt
             |    FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
             |  tri AS (SELECT e1.s x, e1.t y, e2.t z
             |    FROM ore e1 JOIN ore e2 ON e1.s = e2.s
             |      AND (e1.gt < e2.gt OR (e1.gt = e2.gt AND e1.t < e2.t))
             |    JOIN ore e3 ON e3.s = e1.t AND e3.t = e2.t),
             |  pern AS (SELECT node, count(*) nt FROM (
             |      SELECT x AS node FROM tri
             |      UNION ALL SELECT y FROM tri
             |      UNION ALL SELECT z FROM tri) GROUP BY 1)
             |SELECT d.doc_id, CAST(coalesce(pern.nt, 0) AS BIGINT) AS n_tri
             |FROM d LEFT JOIN pern ON pern.node = d.doc_id""".stripMargin)),

    QueryDef(
      "gr1_linkrank",
      (s, dir) => linkrank(s, dir),
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |  nn AS (SELECT count(*) AS n FROM d),
             |  e AS (SELECT doc_id AS src,
             |      (doc_id * 7 + j * 13) % (SELECT n FROM nn) AS dst
             |    FROM d, UNNEST(range(1, 2 + doc_id % 4)) t(j)),
             |  deg AS (SELECT src, count(*) AS g FROM e GROUP BY 1),
             |  r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r FROM d),
             |  c1 AS (SELECT e.dst AS node, CAST(floor(r0.r / deg.g) AS BIGINT) AS c
             |    FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src),
             |  r1 AS (SELECT d.doc_id AS node, 150000 +
             |      CAST(floor(coalesce(s.cs, 0) * 85 / 100.0) AS BIGINT) AS r
             |    FROM d LEFT JOIN
             |      (SELECT node, sum(c) AS cs FROM c1 GROUP BY 1) s
             |      ON s.node = d.doc_id),
             |  c2 AS (SELECT e.dst AS node, CAST(floor(r1.r / deg.g) AS BIGINT) AS c
             |    FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src),
             |  r2 AS (SELECT d.doc_id AS node, 150000 +
             |      CAST(floor(coalesce(s.cs, 0) * 85 / 100.0) AS BIGINT) AS r
             |    FROM d LEFT JOIN
             |      (SELECT node, sum(c) AS cs FROM c2 GROUP BY 1) s
             |      ON s.node = d.doc_id),
             |  c3 AS (SELECT e.dst AS node, CAST(floor(r2.r / deg.g) AS BIGINT) AS c
             |    FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src),
             |  r3 AS (SELECT d.doc_id AS node, 150000 +
             |      CAST(floor(coalesce(s.cs, 0) * 85 / 100.0) AS BIGINT) AS r
             |    FROM d LEFT JOIN
             |      (SELECT node, sum(c) AS cs FROM c3 GROUP BY 1) s
             |      ON s.node = d.doc_id)
             |SELECT node AS doc_id, r AS rank_u FROM r3""".stripMargin))
  )
}
