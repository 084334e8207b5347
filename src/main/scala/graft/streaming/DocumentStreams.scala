package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming admission control for a document corpus — the online face of
  * dd10's incremental dedup: documents ARRIVE as a stream and each
  * micro-batch is checked against the persisted corpus band index before
  * admission. The pipeline is fully STATELESS on the stream side:
  * banding is the map-only variant (`Dedup.bandKeysMapOnly` — a doc's
  * shingles never leave its row, so there is no streaming aggregation and
  * no state store), and the membership check is a STREAM-STATIC join
  * against the bucketed corpus band table (the static side is planned per
  * micro-batch; only the arriving batch shuffles). At 100 TB the same
  * topology runs against a Kafka source with the band table maintained by
  * the ingestion pipeline (IndexedSink's catalog-maintenance pattern).
  */
object DocumentStreams {

  private val fixture = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Once per sfDir: the ARRIVING documents (doc_id % 5 = 0 — dd10's
    * batch slice) re-materialized as 2 doc_id-range files so the file
    * source feeds them one micro-batch at a time (two batches prove the
    * per-micro-batch admission topology; the pipeline is stateless, so
    * more batches add only fixed planning cost, no coverage). Order
    * doesn't matter (the emitted pair set is batch-order-independent:
    * each document's matches depend only on its own row and the static
    * table), but mtimes are stamped ascending anyway so batch boundaries
    * are deterministic run to run. */
  private[graft] def docStreamDir(s: SparkSession, sfDir: String): String =
    fixture.getOrElseUpdate(sfDir + "@" + s.hashCode(), {
      val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new java.io.File(s"target/tmp/streamdocs/$safe/docs-v2").getAbsolutePath
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
        graft.Tables.load(s, sfDir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(out)
      }
      val parts = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.setLastModifiedTime(f.toPath,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      out
    })

  /** `st5_stream_dedup_inc`: the streaming incremental-dedup gate. The
    * memory sink collects raw (corpus a, batch b) band collisions —
    * duplicates only within a single micro-batch (a document's bands all
    * live in its one row), so the gate's batch-side `distinct()` yields
    * exactly dd10's pair set and the ANSI oracle applies verbatim. */
  def streamIncDedupQuery(s: SparkSession, sfDir: String): DataFrame = {
    val corpus = s.table(Dedup.corpusBandTable(s, sfDir))
      .withColumnRenamed("doc_id", "a")
    val dir = docStreamDir(s, sfDir)
    val src = s.readStream
      .schema(s.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val sinkName = "graft_st5_sink"
    s.catalog.dropTempView(sinkName)
    val bands = Dedup.bandKeysMapOnly(src).withColumnRenamed("doc_id", "b")
    val q = corpus.join(bands, Seq("band", "bkey"))
      .select(col("a"), col("b"))
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sinkName).distinct()
  }

  private val allFixture = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Once per sfDir: ALL documents re-materialized as 2 doc_id-range
    * files so the file source feeds the corpus one micro-batch at a time
    * — st6's continuous-ingestion fixture (the corpus is built from
    * EMPTY through the maintaining sink; two batches prove the
    * establish/merge cadence — the repeated-merge case is pinned
    * cheaply by StreamingDedupSpec's direct 3-commit test, so the
    * driver gate doesn't pay a third streaming round). Ascending
    * mtimes make batch boundaries deterministic run to run. */
  private[graft] def allDocsStreamDir(s: SparkSession, sfDir: String): String =
    allFixture.getOrElseUpdate(sfDir + "@" + s.hashCode(), {
      val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new java.io.File(s"target/tmp/streamdocs/$safe/alldocs-v2").getAbsolutePath
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
        graft.Tables.load(s, sfDir, "documents")
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(out)
      }
      val parts = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.setLastModifiedTime(f.toPath,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      out
    })

  /** Recursive delete of a per-run temp dir, AFTER the result frame is
    * materialized (localCheckpoint) — without this each bench/verify
    * pass leaks a full copy of the run's artifact stores on disk. */
  private def rmrf(p: String): Unit = {
    def del(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(del)
      f.delete(); ()
    }
    del(new java.io.File(p))
  }

  /** `st6_stream_components`: continuous corpus ingestion through the
    * maintaining sink — each micro-batch lands data + footer stats
    * (IndexedSink) AND the dedup artifacts (band append + star-merged
    * component labels, [[DedupMaintenance]]). The emitted frame is the
    * maintained label table after the last batch; the oracle is dd6's
    * full-graph recursive closure over the same documents, so the check
    * IS the incremental-merge-equals-full-recompute claim, end to end
    * through the streaming seam. Fresh temp dirs per run (removed once
    * the result is materialized): the result is a pure function of the
    * fixture, so re-runs (bench medians, verify) are deterministic. */
  def streamComponentsQuery(s: SparkSession, sfDir: String): DataFrame = {
    val dir = allDocsStreamDir(s, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-st6").toString
    val docsSchema = s.read.parquet(dir).schema
    val idxSchema = org.apache.spark.sql.types.StructType(
      docsSchema.filter(_.name == "doc_id"))
    // r17: template-copied fresh catalog (see EventStreams — schema-only,
    // per-JVM DDL amortization; content still from this run's ingest)
    val index = graft.index.DerbyStatsIndex.freshInitialized(
      s"$base/db", idxSchema)
    val out =
      try {
        val src = s.readStream.schema(docsSchema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        // compactEvery = 1: the 2-batch gate exercises the scheduled
        // compaction path (batch 1 folds batch 0's artifacts) and the
        // oracle proves the folded store still serves exactly
        val q = IndexedSink.start(src, s"$base/data", index, Seq("doc_id"),
          s"$base/ckpt", dedupArtifacts = Some(s"$base/art"),
          compactEvery = 1)
        try q.awaitTermination() finally q.stop()
        val hconf = new org.apache.spark.util.SerializableConfiguration(
          s.sparkContext.hadoopConfiguration)
        DedupMaintenance.currentLabels(s, s"$base/art", hconf).localCheckpoint()
      } finally {
        // failed runs must not leak the temp copy either, and the booted
        // Derby database must be shut down BEFORE its directory goes away
        // (close() only closes the connection; the engine's background
        // writer would otherwise error against the deleted store)
        EventStreams.cleanupIndexTemp(index, base)
      }
    out
  }

  /** `st7_stream_pairstats`: continuous pair-statistics maintenance —
    * the sink keeps dd2/dd9's overlap table fresh per micro-batch
    * ([[DedupMaintenance.commitPairStats]]: append-only shingle/size
    * stores + signed pair-count deltas with cap-crossing retraction).
    * The emitted frame is the merged delta view after the last batch;
    * the oracle is the full inverted-index pass over every arrived
    * document, so the check IS incremental-equals-full for the pair
    * statistics, through the streaming seam. */
  def streamPairStatsQuery(s: SparkSession, sfDir: String): DataFrame = {
    val dir = allDocsStreamDir(s, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-st7").toString
    val docsSchema = s.read.parquet(dir).schema
    val idxSchema = org.apache.spark.sql.types.StructType(
      docsSchema.filter(_.name == "doc_id"))
    // r17: template-copied fresh catalog (see streamComponentsQuery)
    val index = graft.index.DerbyStatsIndex.freshInitialized(
      s"$base/db", idxSchema)
    val out =
      try {
        val src = s.readStream.schema(docsSchema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        // compactEvery = 1: see streamComponentsQuery — the gate proves
        // the scheduled fold preserves the maintained view. With the
        // 2-batch fixture this is already the MINIMUM cadence that
        // exercises the path: batch 0 never folds (batchId > 0 guard),
        // so exactly one fold runs (at batch 1). Production sets
        // compactEvery >> 1; the gate pays one fold by design.
        val q = IndexedSink.start(src, s"$base/data", index, Seq("doc_id"),
          s"$base/ckpt", pairStatsArtifacts = Some(s"$base/art"),
          compactEvery = 1)
        try q.awaitTermination() finally q.stop()
        val hconf = new org.apache.spark.util.SerializableConfiguration(
          s.sparkContext.hadoopConfiguration)
        DedupMaintenance.currentPairStats(s, s"$base/art", hconf)
          .localCheckpoint()
      } finally {
        // see streamComponentsQuery: cleanup on every path, database shut
        // down before the directory is removed
        EventStreams.cleanupIndexTemp(index, base)
      }
    out
  }

  /** `st8_stream_search`: continuous search-index maintenance — the sink
    * keeps ts3's term statistics fresh per micro-batch
    * ([[SearchMaintenance.commitBatch]]: append-only postings + doc
    * counts under batchId-deterministic subdirs). The emitted frame is
    * ts3's ranked retrieval served FROM the maintained store after the
    * last batch; the oracle is the full corpus pass, so the check IS
    * incremental-equals-full for the search index, through the
    * streaming seam. */
  def streamSearchQuery(s: SparkSession, sfDir: String): DataFrame = {
    val dir = allDocsStreamDir(s, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-st8").toString
    val docsSchema = s.read.parquet(dir).schema
    val src = s.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SearchMaintenance.commitBatch(
          batch.select("doc_id", "text"), batchId, s"$base/art")
        // scheduled search-store compaction, same discipline as the
        // dedup artifacts: the newest dir (this batch) is never folded
        if (batchId > 0) {
          val hc = new org.apache.spark.util.SerializableConfiguration(
            batch.sparkSession.sparkContext.hadoopConfiguration)
          SearchMaintenance.compact(batch.sparkSession, s"$base/art", hc)
        }
      }
      .start()
    val out =
      try {
        try q.awaitTermination() finally q.stop()
        SearchMaintenance.rankedSearch(s, s"$base/art",
          Seq("spark", "vector", "merge"), 15).localCheckpoint()
      } finally rmrf(base) // no Derby here — just never leak the temp copy
    out
  }

  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "st5_stream_dedup_inc",
      (s, dir) => streamIncDedupQuery(s, dir),
      Some(s"""WITH ${Dedup.mhBandsCtes}
              |SELECT DISTINCT x.doc_id a, y.doc_id b
              |FROM bands x JOIN bands y
              |  ON x.band = y.band AND x.bkey = y.bkey
              |WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0""".stripMargin)),

    graft.QueryDef(
      "st6_stream_components",
      (s, dir) => streamComponentsQuery(s, dir),
      // dd6's full-closure oracle over ALL documents: the incremental
      // star-merge must equal the full recompute
      Some(s"""WITH RECURSIVE ${Dedup.mhBandsCtes},
              |pairs AS (SELECT DISTINCT x.doc_id a, y.doc_id b
              |  FROM bands x JOIN bands y
              |    ON x.band = y.band AND x.bkey = y.bkey
              |  WHERE x.doc_id < y.doc_id),
              |ed AS (SELECT a s, b d FROM pairs
              |       UNION ALL SELECT b, a FROM pairs),
              |reach(src, dst) AS (
              |  SELECT s, s FROM (SELECT DISTINCT s FROM ed)
              |  UNION
              |  SELECT r.src, e.d FROM reach r JOIN ed e ON e.s = r.dst)
              |SELECT src AS doc_id, min(dst) AS component
              |FROM reach GROUP BY src""".stripMargin)),

    graft.QueryDef(
      "st7_stream_pairstats",
      (s, dir) => streamPairStatsQuery(s, dir),
      // the full inverted-index pass over ALL documents: the merged
      // deltas (with cap-crossing retraction) must equal it exactly
      Some(s"""WITH ${Dedup.shingleSql},
              |shh AS (SELECT DISTINCT doc_id,
              |          CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) s FROM sh),
              |n AS (SELECT doc_id, count(*) ns FROM shh GROUP BY doc_id),
              |post AS (SELECT s FROM shh GROUP BY s
              |         HAVING count(DISTINCT doc_id) > 1
              |            AND count(DISTINCT doc_id) <= ${Dedup.MaxPosting}),
              |p AS (SELECT x.doc_id a, y.doc_id b, count(*) c
              |      FROM shh x JOIN shh y USING (s) JOIN post USING (s)
              |      WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
              |SELECT a, b, c, na.ns AS na, nb.ns AS nb FROM p
              |JOIN n na ON na.doc_id = p.a
              |JOIN n nb ON nb.doc_id = p.b""".stripMargin)),

    graft.QueryDef(
      "st8_stream_search",
      (s, dir) => streamSearchQuery(s, dir),
      // ts3's oracle verbatim: the maintained index must serve the
      // identical ranked answer as the full corpus pass
      Some("""WITH toks AS (
             |  SELECT doc_id, t.w FROM documents,
             |    UNNEST(string_split(text, ' ')) AS t(w)
             |  WHERE t.w IN ('spark', 'vector', 'merge')),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT tf.doc_id, CAST(sum(tf.tf * (n.n - df.df)) AS BIGINT) AS score
             |FROM tf JOIN df USING (w) CROSS JOIN n
             |GROUP BY tf.doc_id
             |HAVING sum(tf.tf * (n.n - df.df)) > 0
             |ORDER BY score DESC, doc_id
             |LIMIT 15""".stripMargin))
  )
}
