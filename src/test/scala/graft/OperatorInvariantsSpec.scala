package graft

import org.apache.spark.sql.Row

/** Cross-operator semantic invariants on the sf0.001 tables — properties
  * the DuckDB hash-compare can't express (relationships BETWEEN operators).
  */
class OperatorInvariantsSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def pairs(name: String): Set[(Long, Long)] =
    run(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH candidates achieve full recall of true Jaccard>=0.6 pairs here") {
    val truth = pairs("dd2_ngram_jaccard")
    val lsh = pairs("dd3_minhash_lsh")
    assert(truth.nonEmpty, "fixture should contain near-duplicate documents")
    assert(truth.subsetOf(lsh),
      s"LSH missed true near-dup pairs: ${truth -- lsh}")
  }

  test("SQL over the registered indexed table prunes files at plan time") {
    run("idx11_sql_indexed").collect()
    val exec = graft.operators.Indexed.lastExecution(spark, dir)
    assert(exec.isDefined)
    val scanned = exec.get.scannedFiles.size
    assert(scanned > 0 && scanned < 8,
      s"expected the l_orderkey<1000 SQL query to prune the 8-file fixture, scanned=$scanned")
  }

  test("exact dedup keeps every distinct document") {
    val docs = Tables.load(spark, dir, "documents").count()
    val kept = run("dd1_exact").count()
    assert(kept <= docs)
    // each group's copy count sums back to the corpus size
    val total = run("dd1_exact").agg(org.apache.spark.sql.functions.sum("n_copies"))
      .collect().head.getLong(0)
    assert(total == docs)
  }

  test("LSH top-k neighbors are a subset-ranked view of brute-force scores") {
    // every (q, neighbor) the LSH path returns must appear in the
    // brute-force top-5 OR be ranked below it (LSH can only miss, never
    // invent a better-than-true neighbor). Check rank-1 agreement rate.
    val brute = run("ann1_topk_brute").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val lsh = run("ann2_topk_lsh").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(lsh.nonEmpty)
    val bruteTop = brute.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    val lshTop = lsh.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    // at least one query's best LSH neighbor equals the true nearest
    val agree = lshTop.count { case (q, n) => bruteTop.get(q).contains(n) }
    assert(agree >= 1, s"LSH rank-1 never matched brute force: $lshTop vs $bruteTop")
  }

  test("IVF top-k achieves reasonable recall of brute-force top-k") {
    val brute = run("ann1_topk_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = run("ann3_topk_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.nonEmpty)
    // every IVF neighbor is a real vector and at least some of the true
    // top-k are recovered despite probing only 2 of 16 cells
    val recalled = brute.intersect(ivf).size
    assert(recalled >= 2, s"IVF recalled only $recalled of ${brute.size} true neighbors")
  }

  test("PQ top-k achieves reasonable recall of brute-force top-k") {
    val brute = run("ann1_topk_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = run("ann4_topk_pq").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pq.nonEmpty)
    // 8x16 codebooks compress 64 dims to 8 bytes; the decoded-centroid
    // scores must still recover a solid share of the true top-k through
    // the 16-candidate rerank
    val recalled = brute.intersect(pq).size
    assert(recalled >= brute.size / 3,
      s"PQ recalled only $recalled of ${brute.size} true neighbors")
  }

  test("IVFADC (ann5) recall: the composed index still recovers true neighbors") {
    val brute = run("ann1_topk_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = run("ann5_topk_ivfpq").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivfpq.nonEmpty)
    // the composition stacks BOTH approximations (2-of-16 cell probing AND
    // 8-byte-code scoring), so require the weaker of the two bounds
    val recalled = brute.intersect(ivfpq).size
    assert(recalled >= 2,
      s"IVFADC recalled only $recalled of ${brute.size} true neighbors")
    // candidate containment: everything ann5 returns must come from the
    // probed cells — i.e. be a subset of what pure IVF would consider, so
    // IVFADC can only reorder-within or miss, never invent
    val ivf = run("ann3_topk_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivfpq.forall { case (q, _) => ivf.exists(_._1 == q) })
  }

  test("emb5 k-NN graph is EXACT within probed blocks and recalls globally (vs brute truth)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.AnnSearch
    // the dynamic oracle MIRRORS the blocked construction, so a silently
    // degraded blocking would stay oracle-green — pin against ground
    // truths the oracle never sees
    val knn = run("emb5_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(knn.nonEmpty)
    val q = AnnSearch.quantized(spark, dir)
    val cents = AnnSearch.fitQuantizedCentroids(spark, dir)
    val scoreArr = AnnSearch.cellScoreArr(spark, cents)
    val assigned = q.withColumn("cell", -array_max(scoreArr).getField("i"))
    def topPerSrc(pairs: org.apache.spark.sql.DataFrame) = {
      val d = graft.functions.VectorMath.dot(spark, col("va"), col("vb"))
      val sc = (d * abs(d)).cast("double") / (col("na") * col("nb")).cast("double")
      val w = Window.partitionBy("src").orderBy(col("sc").desc, col("dst").asc)
      pairs.where(col("src") =!= col("dst"))
        .withColumn("sc", sc)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= AnnSearch.KnnK)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // source side mirrors the operator's MULTI-PROBE: each vector
    // searches its top-KnnProbes cells; corpus side is the single
    // top-1 assignment
    val probes = slice(reverse(array_sort(scoreArr)), 1, AnnSearch.KnnProbes)
    val a = q.select(col("vec_id").as("src"), col("v").as("va"),
      col("nn").as("na"),
      explode(transform(probes, p => p.getField("i") * -1)).as("cell"))
    val b = assigned.select(col("cell"), col("vec_id").as("dst"),
      col("v").as("vb"), col("nn").as("nb"))
    val probedPairs = a.join(b, Seq("cell"))
    // the construction's actual GUARANTEE: with no hot cells, the graph
    // must EQUAL the exact top-K over the probed candidate set
    val hot = assigned.groupBy("cell").count()
      .agg(max("count")).collect().head.getLong(0) > graft.operators.Dedup.MaxBlock
    if (!hot) assert(knn === topPerSrc(probedPairs),
      "blocked k-NN diverged from the probed-cells exact top-K")
    else {
      // subdivision can drop candidates, but every emitted edge must
      // still connect a source to a member of one of its probed cells
      val pairSet = probedPairs.where(col("src") =!= col("dst"))
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(knn.subsetOf(pairSet),
        "an edge escaped the source's probed cells")
    }
    // global recall floor vs all-pairs brute truth (which the oracle
    // never sees): random vectors are the adversarial case — near-dups,
    // the operator's target, share cells by construction. The floor is
    // set where SINGLE-probe construction fails: multi-probe must
    // recover the cross-cell neighbors that motivated it.
    val af = q.select(col("vec_id").as("src"), col("v").as("va"),
      col("nn").as("na"))
    val bf = q.select(col("vec_id").as("dst"), col("v").as("vb"),
      col("nn").as("nb"))
    val exactGlobal = topPerSrc(af.crossJoin(bf))
    val recalled = exactGlobal.intersect(knn).size
    // floor 1/3: on this fixture single-probe lands at 359/1500 (24%)
    // and multi-probe at 604/1500 (40%) — a silent regression to
    // single-probe fails this
    assert(recalled * 3 >= exactGlobal.size,
      s"k-NN graph recalled only $recalled of ${exactGlobal.size} exact edges")
  }

  test("language-ID prediction is total (never null) and from the lexicon set") {
    val langs = run("tx3_langid").select("pred_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh", "und")))
  }

  test("simhash of identical texts is identical") {
    import org.apache.spark.sql.functions._
    val fp = run("dd4_simhash")
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val joined = fp.join(docs, "doc_id")
      .groupBy("text").agg(countDistinct("simhash").as("k"))
      .agg(max("k")).collect().head.getLong(0)
    assert(joined == 1L)
  }

  test("dd14: unique corpus reassembles verbatim; repeated segment cut at later docs only") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def words(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i")
    val segA = words("a", 8).mkString(" ")     // doc 10's first segment
    val uniq1 = words("u", 8).mkString(" ")
    val uniq2 = words("v", 8).mkString(" ")
    val uniq3 = words("w", 5).mkString(" ")    // short tail segment
    val corpus = Seq(
      (10L, s"$segA $uniq1"),                  // first occurrence of segA
      (20L, s"$uniq2 $segA"),                  // later doc repeats it → cut
      (30L, s"$uniq3")                         // unique short doc
    ).toDF("doc_id", "text")
    val out = operators.Dedup.segmentDedup(corpus)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(10L) === ((2L, 2L, s"$segA $uniq1")),
      "globally-first doc must reassemble verbatim")
    assert(out(20L) === ((2L, 1L, uniq2)),
      "the repeated segment must be cut from the LATER doc only")
    assert(out(30L) === ((1L, 1L, uniq3)),
      "a short tail segment is a segment like any other")
    // and on the real corpus: kept never exceeds total, totals add up
    val real = run("dd14_segment_dedup")
      .agg(sum("n_seg").cast("long"), sum("n_kept").cast("long"))
      .collect().head
    assert(real.getLong(1) <= real.getLong(0) && real.getLong(1) > 0)
  }

  test("tx21 selects exactly the maximal quality-ranked prefix within budget") {
    val rows = run("tx21_token_budget").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "budget selection picked nothing")
    // the running total is consistent and within budget
    val totalAll = run("tx1_tokens").collect().map(_.getInt(1).toLong).sum
    val budget = totalAll / 2
    val maxCum = rows.map(_._4).max
    assert(maxCum <= budget, s"cum $maxCum exceeded budget $budget")
    // MAXIMAL prefix: the selected set in (q DESC, doc_id) order has
    // cum == running sum of its own nt, and the next document in the
    // global order would overflow the budget
    val ordered = rows.sortBy(t => (-t._2, t._1))
    var running = 0L
    ordered.foreach { case (id, _, nt, cum) =>
      running += nt
      assert(cum === running, s"doc $id: cum $cum != running $running")
    }
    // a STRICT prefix at a 50% budget: something was left out, and the
    // oracle hash-compare already pins that what was left out is exactly
    // the tail of the (q DESC, doc_id) order
    assert(running <= budget && rows.length < run("tx1_tokens").count(),
      "selection must be a strict prefix at a 50% budget")
  }

  test("triangle attribution: per-node counts sum to 3x the triangle total") {
    import org.apache.spark.sql.functions._
    // the fixture graph has a KNOWN nonzero triangle count (degenerate
    // all-zero output would vacuously pass the oracle's shape)
    val total = run("gr2_triangles").agg(sum("n_tri")).collect().head.getLong(0)
    assert(total == 36L, s"sum of per-node counts = $total (12 triangles x 3)")
  }
}
