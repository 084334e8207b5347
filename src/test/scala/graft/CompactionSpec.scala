package graft

import graft.sources.{Compaction, IndexedParquet}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Compaction must preserve data exactly, reduce file count, and compose
  * with incremental re-indexing (upsert + retention). */
class CompactionSpec extends SparkSpec {

  test("bin-packing: big files untouched, singleton bins skipped") {
    val p = Compaction.plan(
      Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "big" -> 100L, "lone" -> 25L),
      targetBytes = 30L, smallThresholdBytes = 30L)
    assert(p.untouched.contains("big"))
    assert(p.bins.flatten.toSet ++ p.untouched.toSet ==
      Set("a", "b", "c", "big", "lone"))
    assert(p.bins.forall(_.size > 1))
  }

  test("compaction preserves data and the index stays correct after re-build") {
    val base = Files.createTempDirectory("graft-compact").toString
    val dir = s"$base/data"
    Files.createDirectories(Paths.get(dir))
    import spark.implicits._
    // 6 tiny files + nothing big
    (1 to 6).foreach { fi =>
      val tmp = s"$base/tmp-$fi"
      (0 until 50).map(v => (v + fi * 1000, s"r$v")).toDF("k", "s").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(dir, s"f$fi.parquet"))
    }
    val before = spark.read.parquet(dir).orderBy("k").collect().toSeq

    val bins = Compaction.compact(spark, dir,
      targetBytes = 1L << 20, smallThresholdBytes = 1L << 20)
    assert(bins >= 1)
    val filesAfter = Files.list(Paths.get(dir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.endsWith(".parquet"))
    assert(filesAfter.length < 6, s"expected fewer files, got ${filesAfter.toSeq}")

    val after = spark.read.parquet(dir).orderBy("k").collect().toSeq
    assert(after == before)

    // incremental re-index over the compacted layout stays sound
    val (index, schema) = IndexedParquet.buildIndex(spark, dir, Seq("k"), s"$base/db")
    val (df, fileIndex) = IndexedParquet.read(spark, dir, index, schema)
    assert(df.filter(col("k") === 3025).count() == 1)
    assert(fileIndex.lastExecution.get.scannedFiles.nonEmpty)
    assert(df.count() == 300)
  }
}
