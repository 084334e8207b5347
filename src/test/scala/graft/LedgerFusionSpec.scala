package graft

import graft.sources.IndexedParquet
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** r16 fused ledger build (index/LedgerBuild.scala): one scan attaching
  * bloom + freq + sum + HLL + quantile + CMS must leave the catalog in
  * EXACTLY the state the standalone per-family builds produce — checked
  * ledger-by-ledger, row group by row group, through the public index
  * API (per-group slice estimates expose each group's raw sketch).
  */
class LedgerFusionSpec extends SparkSpec {

  // fixture: 2 files x 2 row groups of 100 rows; k integral (dominant
  // min/max runs), s strings with nulls, z all-null long, q doubles with
  // a NaN sprinkle (quantile must skip them)
  private lazy val env = {
    val base = Files.createTempDirectory("graft-lfuse").toString
    val dir = s"$base/data"
    Files.createDirectories(Paths.get(dir))
    import spark.implicits._
    (0 until 2).foreach { fi =>
      val rows = (0 until 200).map { j =>
        val i = fi * 200 + j
        (i % 300,
          if (i % 4 == 0) None else Some(s"s${i % 50}"),
          None: Option[Long],
          if (i % 37 == 0) Double.NaN else (i % 97).toDouble)
      }
      val tmp = s"$base/tmp-$fi"
      rows.toDF("k", "s", "z", "q").coalesce(1)
        .write.option("parquet.block.row.count.limit", "100")
        .mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(dir, s"f$fi.parquet"))
    }
    // two catalogs over the SAME files: one built family-by-family (the
    // reference implementations), one through the fused pass
    val (sep, schema) = IndexedParquet.buildIndex(
      spark, dir, Seq("k", "s", "z", "q"), s"$base/sepdb",
      bloomCols = Seq("k", "s"))
    sep.rebuildShadows(spark, dir, sep.allFiles(), schema,
      freqCols = Seq("k", "s"), sumCols = Seq("k"))
    sep.rebuildHll(spark, dir, sep.allFiles(), schema, Seq("k", "s", "z"))
    sep.rebuildQuantiles(spark, dir, sep.allFiles(), schema, Seq("k", "q"))
    sep.rebuildCms(spark, dir, sep.allFiles(), schema, Seq("k", "s"))
    val (fus, _) = IndexedParquet.buildIndex(
      spark, dir, Seq("k", "s", "z", "q"), s"$base/fusedb",
      bloomCols = Seq("k", "s"))
    fus.rebuildLedgers(spark, dir, fus.allFiles(), schema,
      freqCols = Seq("k", "s"), sumCols = Seq("k"),
      hllCols = Seq("k", "s", "z"), quantileCols = Seq("k", "q"),
      cmsCols = Seq("k", "s"), blooms = true)
    (dir, sep, fus, schema)
  }

  test("fused build equals standalone builds on every ledger and row group") {
    val (_, sep, fus, _) = env
    // per-row-group slices: each single-group estimate exposes that
    // group's raw sketch through the public API
    val slices = sep.allFiles().flatMap(p =>
      p.scanRowGroups.toSeq.map(rg =>
        Seq(p.copy(scanRowGroups = scala.collection.immutable.SortedSet(rg)))))
    for (plans <- slices.map(Option(_)) :+ (None: Option[Seq[graft.index.FileScanPlan]])) {
      for (c <- Seq("k", "s", "z"))
        assert(sep.approxDistinct(c, plans) == fus.approxDistinct(c, plans),
          s"hll($c) diverges on $plans")
      for (c <- Seq("k", "q"))
        assert(sep.approxQuantiles(c, Seq(0.1, 0.5, 0.9), plans) ==
          fus.approxQuantiles(c, Seq(0.1, 0.5, 0.9), plans),
          s"qsk($c) diverges on $plans")
      for ((c, v) <- Seq(("k", 5), ("s", "s7")))
        assert(sep.approxFrequency(c, v, plans) == fus.approxFrequency(c, v, plans),
          s"cms($c=$v) diverges on $plans")
    }
    // freq + sum shadows surface per group in rowGroupStats
    for (c <- Seq("k", "s")) {
      val a = sep.rowGroupStats(c).get.map(s =>
        (s.fileName, s.rowGroup, s.minFreq, s.maxFreq, s.sumVal)).sorted
      val b = fus.rowGroupStats(c).get.map(s =>
        (s.fileName, s.rowGroup, s.minFreq, s.maxFreq, s.sumVal)).sorted
      assert(a == b, s"freq/sum shadows diverge for $c")
    }
    assert(sep.totalSum("k") == fus.totalSum("k"))
    // bloom parity: equality probes must prune to the identical plan set
    def plansOf(ix: graft.index.StatsIndex, v: Int) = {
      val e = graft.sources.RowGroupSkipScan.resolvePredicate(
        spark, env._4, col("k") === v)
      ix.getFiles(e).map(p => (p.fileName, p.scanRowGroups)).sortBy(_._1)
    }
    for (v <- Seq(0, 5, 77, 299, 12345))
      assert(plansOf(sep, v) == plansOf(fus, v), s"bloom pruning diverges at k=$v")
  }

  test("all-null and empty-family groups behave like the standalone builds") {
    val (_, sep, fus, _) = env
    // z is all-null: HLL estimates 0, freq/sum were never requested for z
    assert(fus.approxDistinct("z") == Some(0L))
    assert(sep.approxDistinct("z") == fus.approxDistinct("z"))
    // q was not a CMS column: both catalogs decline identically
    assert(sep.approxFrequency("q", 1.0) == fus.approxFrequency("q", 1.0))
  }
}
