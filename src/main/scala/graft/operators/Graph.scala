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

  val defs: Seq[QueryDef] = Seq(
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
