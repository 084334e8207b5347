package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** dd10 — incremental dedup of a new batch against the PERSISTED corpus
  * band index. Pins the two properties that make it incremental:
  *  1. the corpus text is never re-read: the plan scans documents.parquet
  *     exactly once (the batch side); the corpus side reads the bucketed
  *     band-index table;
  *  2. only the batch side shuffles: no Exchange sits above the corpus
  *     index scan (bucket-aligned join).
  * Plus the semantic anchor: the incremental pairs equal the from-scratch
  * dd3 collision pairs restricted to corpus x batch.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("incremental plan: one documents scan, corpus side shuffle-free") {
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // disable broadcast: at corpus scale the band index cannot broadcast,
      // so the shape that must hold is the bucket-aligned shuffle-free one.
      // AQE off so the static plan is traversable (query stages hide
      // subtrees from collect) — the shape is decided before AQE anyway.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = SparkEntry.queries("dd10_incremental")(spark, dir)
      val plan = df.queryExecution.executedPlan

      val scans = plan.collect { case s: FileSourceScanExec => s }
      val docScans = scans.filter(_.toString.contains("documents.parquet"))
      assert(docScans.size == 1,
        s"corpus text must not be re-read; documents scans = ${docScans.size}\n" +
          plan.toString.take(3000))
      val idxScans = scans.filter(_.toString.contains("graft_bands_"))
      assert(idxScans.nonEmpty, "corpus side must read the persisted band index")
      assert(idxScans.forall(_.toString.contains("Bucketed: true")),
        "band index scan must be bucket-aligned")

      // no Exchange BETWEEN the index scan and the join: the join's
      // corpus-side subtree must be exchange-free (the post-join distinct
      // legitimately shuffles the projected (a, b) pairs). The batch side
      // is the one that pays a shuffle.
      val join = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(join.size == 1, s"expected one shuffled join:\n${plan.toString.take(2000)}")
      val sides = join.head.children.partition(_.toString.contains("graft_bands_"))
      val (corpusSide, batchSide) = (sides._1, sides._2)
      assert(corpusSide.size == 1 && batchSide.size == 1)
      assert(corpusSide.head.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"corpus index side must not shuffle:\n${corpusSide.head.toString.take(1500)}")
      assert(batchSide.head.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        "sanity: the batch side is the shuffled side")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("incremental pairs equal from-scratch cross pairs") {
    val tup = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val inc = SparkEntry.queries("dd10_incremental")(spark, dir)
      .as[(Long, Long)](tup).collect().toSet

    // dd3's from-scratch pairs are the same collision relation over ALL
    // documents (a < b); the incremental result must be exactly its
    // corpus x batch restriction, re-oriented to (corpus, batch)
    val dd3 = SparkEntry.queries("dd3_minhash_lsh")(spark, dir)
      .as[(Long, Long)](tup).collect().toSet
    val expected = dd3.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (x, y) if x % 5 != 0 && y % 5 == 0 => (x, y) }
    assert(inc == expected, s"inc=${inc.size} expected=${expected.size}")
  }

  test("map-only banding is row-identical to the aggregate pipeline") {
    val docs = Tables.load(spark, dir, "documents")
    val viaAgg = operators.Dedup.bandKeys(operators.Dedup.shinglesOf(docs))
      .collect().map(_.toSeq).toSet
    val mapOnly = operators.Dedup.bandKeysMapOnly(docs)
      .collect().map(_.toSeq).toSet
    assert(mapOnly == viaAgg,
      s"mapOnly=${mapOnly.size} viaAgg=${viaAgg.size}")
    assert(mapOnly.nonEmpty)

    // and the map-only plan really is map-only: zero exchanges
    val p = operators.Dedup.bandKeysMapOnly(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }
}
