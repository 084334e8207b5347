package graft

/** Regression guard on PHYSICAL plan shape — the properties that matter at
  * scale must survive refactors: filters and column pruning reach the
  * parquet scan, dimension joins broadcast, no cartesian products sneak in,
  * hot paths stay inside whole-stage codegen.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q2_filter: predicates and projection pushed to the parquet scan") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(2000))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"))
  }

  test("q4_join_agg: both dimension joins broadcast, no sort-merge") {
    val p = plan("q4_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5_multijoin: the full dimension chain broadcasts") {
    val p = plan("q5_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("idx1_point: data filters pushed through the indexed relation's scan") {
    val p = plan("idx1_point")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,100)]"),
      p.take(2000))
  }

  test("ann1: query side broadcasts; scoring stays in whole-stage codegen") {
    val p = plan("ann1_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("*("), "expected WholeStageCodegen spans (the *(n) markers)")
    assert(p.contains("graft_dot"), "native dot expression should be in the plan")
  }

  test("idx7: row-group skip scan is the columnar plan node") {
    val df = SparkEntry.queries("idx7_rgskip")(spark, dir)
    df.collect() // materialize THIS plan's AQE final form, with transitions
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RowGroupScan"), p.take(2000))
    // supportsColumnar leaf => Spark wraps it in its codegen ColumnarToRow
    assert(p.contains("ColumnarToRow"), p.take(2000))
  }

  test("bf1: bloom probe is a codegen expression, not a UDF") {
    val p = plan("bf1_bloom_semijoin")
    assert(p.contains("might_contain"), p.take(2000))
    assert(!p.contains("BatchEvalPython"))
    // a Scala UDF would surface as a non-codegen ScalaUDF invocation
    assert(!p.toLowerCase.contains("scalaudf"), p.take(2000))
  }

  test("no ScalaUDF anywhere in the registered operator surface") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, dir).queryExecution.analyzed
      val hasUdf = plan.collectWithSubqueries { case p =>
        p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF]))
      }.exists(identity)
      if (hasUdf) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"UDFs found in: $offenders")
  }

  test("tx9_sample: fact side shuffle-free — broadcast rate join, pruned scan") {
    val p = plan("tx9_sample")
    // the only exchange is the broadcast of the tiny rate table; the
    // corpus side must never shuffle
    assert(!p.contains("ShuffleExchange"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      p.take(2000))
  }

  test("zo1: both box dimensions reach the z-ordered parquet scan as PushedFilters") {
    // the PushedFilters render truncates at maxMetadataStringLength=100 —
    // widen so every bound is visible to the assertion
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    val df = SparkEntry.queries("zo1_zorder_2col")(spark, dir)
    df.count()
    val p = try df.queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(p.contains("GreaterThanOrEqual(l_orderkey,200)") &&
      p.contains("LessThanOrEqual(l_orderkey,299)"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_partkey,40)") &&
      p.contains("LessThanOrEqual(l_partkey,79)"), p.take(2000))
    // projection pruned to the referenced columns only
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_linenumber:int,l_returnflag:string>"),
      p.take(2000))
  }

  test("idx12/idx13: probe derivation is O(index) — no scaffolding data scan") {
    // the probe key comes from ONE JDBC MIN over the stats catalog
    // (minIndexedValue), so the query's own physical plan must contain
    // exactly its pruned indexed scan — no second scan of lineitem.parquet
    // deriving the key (the r4 'weak' finding)
    Seq("idx12_bloom", "idx13_routed").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("lineitem.parquet"), s"$name scans raw lineitem:\n${p.take(2000)}")
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$name has extra scans:\n${p.take(2000)}")
    }
  }

  test("dd1_exact: aggregation is partial before the exchange (map-side combine)") {
    val p = plan("dd1_exact")
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0)
    // plan prints top-down: final agg, exchange, partial agg — a partial
    // HashAggregate must appear BELOW (after) the exchange in the text
    assert(p.indexOf("HashAggregate", firstExchange) > firstExchange,
      "expected a partial aggregate under the exchange")
  }

  test("emb3_gram: one exchange, partial agg under it (shuffle is O(d^2 x tasks))") {
    val p = plan("emb3_gram")
    assert("Exchange".r.findAllIn(p).size == 1, p.take(2000))
    val firstExchange = p.indexOf("Exchange")
    assert(p.indexOf("HashAggregate", firstExchange) > firstExchange,
      "the d(d+1)/2 products must combine map-side before the shuffle")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("tx16_shuffle_shard: one hash exchange on shard, no global sort") {
    val p = plan("tx16_shuffle_shard")
    assert("Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("hashpartitioning(shard"), p.take(2000))
    assert(!p.contains("rangepartitioning"),
      "a range exchange means a global sort snuck in")
  }

  test("tx17_temperature_mix: rate table broadcasts, corpus never sort-merges") {
    val p = plan("tx17_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("ann4/ann5: candidate pass is true ADC — codes + table lookups, no decoded vector") {
    // the decoded-vector form was a flatten(array(element_at(codebook, code)…))
    // per candidate row; true ADC replaces it with per-query lookup tables,
    // so no flatten (the decoded-vector constructor) may appear anywhere
    val p5 = plan("ann5_topk_ivfpq")
    assert(!p5.contains("flatten("), p5.take(3000))
    // probe and query sides stay broadcast — the candidate pass must not
    // shuffle the corpus codes
    assert(p5.contains("BroadcastHashJoin"), p5.take(2000))
    assert(!p5.contains("CartesianProduct"), p5.take(2000))
    val p4 = plan("ann4_topk_pq")
    assert(!p4.contains("flatten("), p4.take(3000))
    assert(p4.contains("Broadcast"), p4.take(2000))
    assert(!p4.contains("CartesianProduct"), p4.take(2000))
  }

  test("tx18: weight table broadcasts and the margin sum combines map-side") {
    val p = plan("tx18_quality_score")
    // the exploded (doc, fid) feature stream must meet the F=1024 weight
    // table as a BROADCAST (a shuffled weight join would exchange the
    // feature stream by fid — corpus-sized); the doc-keyed margin agg and
    // the final doc-keyed left join legitimately shuffle (both sides are
    // corpus-sized at scale)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the margin sum must be partial under its exchange (map-side combine)
    val aggExchange = p.indexOf("Exchange hashpartitioning(doc_id")
    assert(aggExchange >= 0, p.take(3000))
    assert(p.indexOf("HashAggregate", aggExchange) > aggExchange,
      "margin sum must combine map-side before the shuffle")
  }

  test("q38_resample_gapfill: gap-fill reads the cached aggregate, not the corpus") {
    val p = plan("q38_resample_gapfill")
    // span, type list, and the gap-fill join must all read the persisted
    // |types|×|buckets| aggregate — the events themselves are scanned once
    // when that cache materializes (each InMemoryTableScan echoes the
    // cached child plan in the STRING, so count cache reads, not scans)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("ts3: weight tables broadcast; top-k is TakeOrdered, not a global sort") {
    val p = plan("ts3_ranked_search")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must avoid a full sort:\n${p.take(2000)}")
    // df and N both broadcast back onto the postings; the only hash
    // exchanges are the two aggregations (tf and the per-doc score)
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("tx20: pair counts combine map-side; top-20 is TakeOrdered") {
    val p = plan("tx20_bpe_pair_counts")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"pair counting must be a single keyed agg:\n${p.take(3000)}")
  }

  test("up3: untouched dimension bulk flows through broadcast joins — never shuffled") {
    val p = plan("up3_scd2")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"the dimension side must not shuffle:\n${p.take(3000)}")
  }

  test("q44: lateral decorrelates to WindowGroupLimit — no per-row re-execution") {
    val p = plan("q44_lateral")
    assert(p.contains("WindowGroupLimit"),
      s"per-group top-N must keep a bounded heap:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lateral must not plan as a nested loop:\n${p.take(3000)}")
  }

  test("ao2: tolerance as-of stays one sort-within-key pass — no range join") {
    val p = plan("ao2_asof_tolerance")
    // ao1's shape: the ref-side (user, ts) dedupe agg + the user-keyed
    // window — and NO join anywhere (a range join would explode pairs)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected the dedupe + window exchanges only:\n${p.take(3000)}")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n${p.take(3000)}")
  }

  test("dd14: segment construction is map-only; text shuffles as segments exactly once") {
    val p = plan("dd14_segment_dedup")
    // exchanges: the seg-keyed window and the doc-keyed reassembly agg —
    // nothing below the posexplode (slicing is expression work)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 hash exchanges, saw $exchanges:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }
}
