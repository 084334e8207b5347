package graft

import graft.operators.AnnSearch
import org.apache.spark.sql.functions._

/** The distributed minibatch IVF fit (AnnSearch.fitMinibatch): shape,
  * cell balance vs the bounded driver fit, and mode-agnostic oracle
  * inlining. The driver fit sees only the first 512 vectors by id; the
  * minibatch fit sees hash-sampled slices of the WHOLE corpus, so its
  * cells should cover the corpus at least as evenly.
  */
class IvfFitSpec extends SparkSpec {

  private def withFitMode[A](mode: String)(f: => A): A = {
    val prev = spark.conf.getOption(AnnSearch.FitModeConf)
    spark.conf.set(AnnSearch.FitModeConf, mode)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(AnnSearch.FitModeConf, v)
      case None    => spark.conf.unset(AnnSearch.FitModeConf)
    }
  }

  /** Per-cell corpus counts under the fitted centroids (query-path
    * assignment expression — the thing that must balance). */
  private def cellCounts(dir: String, cents: Array[Array[Long]]): Map[Int, Long] =
    AnnSearch.quantized(spark, dir)
      .withColumn("cell", -array_max(AnnSearch.cellScoreArr(spark, cents)).getField("i"))
      .groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("minibatch fit: k full-dim centroids from a distributed aggregate") {
    val cents = withFitMode("minibatch") {
      AnnSearch.fitQuantizedCentroids(spark, sf("sf0.01"))
    }
    assert(cents.length == AnnSearch.IvfCells)
    assert(cents.forall(_.length == AnnSearch.EmbeddingDim))
    val driver = AnnSearch.fitQuantizedCentroids(spark, sf("sf0.01"))
    // different sample → different fit (also proves the cache keys on mode)
    assert(!cents.sameElements(driver) && cents.toSeq.map(_.toSeq) != driver.toSeq.map(_.toSeq))
  }

  test("minibatch fit balances cells no worse than the 512-vector driver fit (sf0.1)") {
    val dir = sf("sf0.1")
    val driverCents = AnnSearch.fitQuantizedCentroids(spark, dir)
    val mbCents = withFitMode("minibatch") { AnnSearch.fitQuantizedCentroids(spark, dir) }
    val total = AnnSearch.quantized(spark, dir).count().toDouble
    def maxShare(cc: Map[Int, Long]) = cc.values.max / total
    val dCC = cellCounts(dir, driverCents)
    val mCC = cellCounts(dir, mbCents)
    info(s"driver: nonEmpty=${dCC.size} maxShare=${maxShare(dCC)}")
    info(s"minibatch: nonEmpty=${mCC.size} maxShare=${maxShare(mCC)}")
    // corpus-wide coverage: at least as many live cells, and the hottest
    // cell no more than 25% worse than the driver fit's hottest
    assert(mCC.size >= dCC.size)
    assert(maxShare(mCC) <= maxShare(dCC) * 1.25)
  }

  test("ann3 under minibatch mode: same result contract, minibatch centroids inlined in oracle") {
    val qd = AnnSearch.defs.find(_.name == "ann3_topk_ivf").get
    val (rows, sql, cents) = withFitMode("minibatch") {
      val r = qd.fn(spark, sf("sf0.01")).collect()
      (r, qd.oracleDyn.get.apply(), AnnSearch.fitQuantizedCentroids(spark, sf("sf0.01")))
    }
    assert(rows.length == AnnSearch.NumQueries * AnnSearch.LshTopK)
    // the dynamic oracle carries the centroids that actually ran
    assert(sql.contains(cents(1).mkString("[", ",", "]")))
  }
}
