package graft.streaming

import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Incremental maintenance of the PERSISTED dedup artifacts from the
  * streaming sink — dd13's star-merge and dd10's band append made
  * CONTINUOUS: each committed micro-batch (a) appends its LSH band keys
  * to the corpus band store and (b) merges the arriving documents into
  * the maintained component-label table via star edges, so cluster
  * identity is carried forward batch over batch instead of re-propagated
  * over the corpus pair graph per corpus version (the dd13 proof: star
  * edges preserve each component's connectivity AND its min-vertex
  * label, and band keys are per-document, so corpus∪batch banding
  * discovers exactly the pairs a full recompute would — the merged
  * labels EQUAL the full-graph closure, which is what the st6 oracle
  * checks).
  *
  * Exactly-once under foreachBatch replay, the [[IndexedSink]] way —
  * batchId-deterministic artifact locations:
  *  - bands land in `bands/b<batchId>/` with mode=overwrite, so a
  *    replayed batch REPLACES its band files (band content is a pure
  *    function of the batch rows);
  *  - labels land in `labels/v<batchId>/`, and the LIVE version is
  *    DISCOVERED as the highest fully-written one (`_SUCCESS` present —
  *    Spark writes it last, so a half-written attempt is invisible; no
  *    marker file, no non-atomic pointer flip). A replayed batch merges
  *    its pairs onto whatever is live — the PRE-batch state on first
  *    failure, its OWN previous attempt after a post-write crash — and
  *    both yield identical labels: re-adding edges a label set already
  *    implies changes no component and no min-label
  *    (StreamingDedupSpec pins this directly).
  *
  * Scale, per commit: banding is map-only over the BATCH; the candidate
  * join BROADCASTS the batch's bands against the band store, so the
  * corpus side is scanned (columnar, 3 narrow columns) but NEVER
  * shuffled; the label merge runs over |labels| + |new pairs| star/pair
  * edges — O(corpus docs + batch²-bounded pairs) edge rows, never the
  * corpus pair graph. Earlier batches' band files are never rewritten.
  */
object DedupMaintenance {

  private def bandsRoot(artifactDir: String) = new Path(artifactDir, "bands")
  private def labelsRoot(artifactDir: String) = new Path(artifactDir, "labels")

  /** The live label version: the highest `v<batchId>` directory whose
    * `_SUCCESS` exists (fully written — Spark writes it last). */
  private[graft] def latestVersion(artifactDir: String,
      hconf: SerializableConfiguration): Option[Long] = {
    val root = labelsRoot(artifactDir)
    val fs = root.getFileSystem(hconf.value)
    if (!fs.exists(root)) return None
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+") &&
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(1).toLong)
      .maxOption
  }

  /** The maintained (doc_id, component) labels at the live version —
    * empty before the first commit. */
  def currentLabels(spark: org.apache.spark.sql.SparkSession,
      artifactDir: String, hconf: SerializableConfiguration): DataFrame =
    latestVersion(artifactDir, hconf) match {
      case Some(v) =>
        spark.read.parquet(new Path(labelsRoot(artifactDir), s"v$v").toString)
          .select(col("v").as("doc_id"), col("l").as("component"))
      case None =>
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("doc_id", "component")
    }

  /** Candidate pairs the arriving batch adds: every (store doc, batch
    * doc) sharing a band bucket — the batch side BROADCAST so the band
    * store never shuffles (the spec pins the plan shape). Because the
    * batch's own bands are already in the store, this single join also
    * yields the batch-internal pairs; both orientations of those are
    * emitted and collapse in the label propagation's symmetrization. */
  private[graft] def newPairs(allBands: DataFrame, batchBands: DataFrame): DataFrame =
    allBands.withColumnRenamed("doc_id", "a")
      .join(broadcast(batchBands.withColumnRenamed("doc_id", "b")),
        Seq("band", "bkey"))
      .where(col("a") =!= col("b"))
      .select("a", "b").distinct()

  /** One batch's artifact commit: band append + star-merge label update.
    * `docs` must carry (doc_id, text). Idempotent per (docs, batchId). */
  private[graft] def commitBatch(docs: DataFrame, batchId: Long,
      artifactDir: String, hconf: SerializableConfiguration): Unit = {
    val spark = docs.sparkSession
    val fs = new Path(artifactDir).getFileSystem(hconf.value)
    val batchBands = Dedup.bandKeysMapOnly(docs.select(col("doc_id"), col("text")))
      .persist()
    try {
      // 1. idempotent band append
      batchBands.write.mode("overwrite")
        .parquet(new Path(bandsRoot(artifactDir), s"b$batchId").toString)
      // 2. star edges from the live labels (diameter-2 compression of
      // every already-merged component)
      val stars = latestVersion(artifactDir, hconf) match {
        case Some(v) =>
          spark.read.parquet(new Path(labelsRoot(artifactDir), s"v$v").toString)
            .where(col("l") =!= col("v"))
            .select(col("l").as("a"), col("v").as("b"))
        case None =>
          import spark.implicits._
          Seq.empty[(Long, Long)].toDF("a", "b")
      }
      // 3. the batch's new candidate pairs against the whole band store
      // (which now includes this batch's own bands)
      val allBands = spark.read
        .parquet(new Path(bandsRoot(artifactDir), "b*").toString)
      val pairs = newPairs(allBands, batchBands)
      // 4. merged labels — CC over star + new edges only; the version
      // becomes live the moment its _SUCCESS lands
      val merged = Dedup.connectedComponents(stars.union(pairs))
      merged.write.mode("overwrite")
        .parquet(new Path(labelsRoot(artifactDir), s"v$batchId").toString)
      // 5. retention: once this version is live, older ones are never
      // consulted again (a replay of THIS batch merges onto this version
      // and gets identical labels) — sweep them
      fs.listStatus(labelsRoot(artifactDir)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+") &&
          st.getPath.getName.drop(1).toLong < batchId)
        .foreach(st => fs.delete(st.getPath, true))
    } finally batchBands.unpersist()
    ()
  }
}
