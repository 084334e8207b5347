package graft

import graft.operators.AnnSearch

/** The distributed minibatch PQ fit (AnnSearch.fitPqMinibatch): codebook
  * shape, corpus-wide quantization quality vs the bounded driver fit, and
  * mode-agnostic oracle inlining — the PQ mirror of IvfFitSpec. The
  * driver fit sees only the first 512 vectors by id; the minibatch fit
  * sees hash-sampled slices of the WHOLE corpus, so its codebooks must
  * quantize the corpus at least as well (lower or equal MSE).
  */
class PqFitSpec extends SparkSpec {

  private def withFitMode[A](mode: String)(f: => A): A = {
    val prev = spark.conf.getOption(AnnSearch.FitModeConf)
    spark.conf.set(AnnSearch.FitModeConf, mode)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(AnnSearch.FitModeConf, v)
      case None    => spark.conf.unset(AnnSearch.FitModeConf)
    }
  }

  test("minibatch PQ fit: M×k×subdim codebooks from one aggregate per round") {
    val cbs = withFitMode("minibatch") {
      AnnSearch.fitPqCodebooks(spark, sf("sf0.01"))
    }
    assert(cbs.length == AnnSearch.PqM)
    assert(cbs.forall(_.length == AnnSearch.PqK))
    assert(cbs.forall(_.forall(_.length == AnnSearch.PqSubDim)))
    val driver = AnnSearch.fitPqCodebooks(spark, sf("sf0.01"))
    // different sample → different fit (also proves the cache keys on mode)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq != driver.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("minibatch codebooks quantize the corpus at least as well as the driver fit (sf0.1)") {
    val dir = sf("sf0.1")
    val driverCbs = AnnSearch.fitPqCodebooks(spark, dir)
    val mbCbs = withFitMode("minibatch") { AnnSearch.fitPqCodebooks(spark, dir) }
    val dMse = AnnSearch.pqQuantMse(spark, dir, driverCbs)
    val mbMse = AnnSearch.pqQuantMse(spark, dir, mbCbs)
    info(s"driver MSE=$dMse minibatch MSE=$mbMse")
    // corpus-wide coverage: the whole-corpus fit must not quantize worse
    // (small tolerance — both are 3-round Lloyd, not converged optima)
    assert(mbMse <= dMse * 1.05,
      s"minibatch codebooks underfit: MSE $mbMse vs driver $dMse")
  }

  test("ann4 under minibatch mode: same result contract, minibatch codebooks inlined in oracle") {
    val qd = AnnSearch.defs.find(_.name == "ann4_topk_pq").get
    val (rows, sql, cbs) = withFitMode("minibatch") {
      val r = qd.fn(spark, sf("sf0.01")).collect()
      (r, qd.oracleDyn.get.apply(), AnnSearch.fitPqCodebooks(spark, sf("sf0.01")))
    }
    assert(rows.length == AnnSearch.NumQueries * AnnSearch.LshTopK)
    // the dynamic oracle carries the codebooks that actually ran
    assert(sql.contains(cbs(1)(0).mkString("[", ",", "]")))
  }
}
