package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the RANKED-RETRIEVAL index from the
  * streaming sink — ts3's term statistics kept fresh per micro-batch,
  * completing the continuously-maintained artifact family (footer
  * stats, blooms, row-level postings, dedup bands/labels, pair
  * statistics — and now the search index). Documents are immutable
  * after arrival, so the state is PURELY append-only LSM batches
  * under batchId-deterministic subdirs (no deltas, no retraction —
  * the simplest member of the family):
  *  - `postings/b<id>`: the batch's (doc_id, w, tf) term frequencies —
  *    a doc's postings never change after arrival;
  *  - `docn/b<id>`: the batch's document count (N's summand — kept
  *    separate so a query's read can stay restricted to ITS terms'
  *    postings instead of scanning the store for a distinct count).
  * A replayed batch OVERWRITES its own subdirs with identical content
  * (both are pure functions of the batch rows), so foreachBatch's
  * at-least-once is exactly-once by construction.
  *
  * Query-side: [[rankedSearch]] is ts3's scorer verbatim — BIGINT-exact
  * Σ tf·(N − df) — served from the maintained store: the term filter
  * pushes into the postings scan (only the queried terms' rows read —
  * pinned by StreamingSearchSpec), df is an aggregate over those same
  * rows (each (doc, term) pair exists in exactly one batch, so the
  * cross-batch count is exact), N is the sum of the per-batch counts,
  * and the top-k is a TakeOrderedAndProject. Incremental equals the
  * full corpus pass by construction — the st8 oracle checks exactly
  * that through the streaming seam. */
object SearchMaintenance {

  private def postRoot(artifactDir: String) = new Path(artifactDir, "postings")
  private def nRoot(artifactDir: String) = new Path(artifactDir, "docn")

  /** One batch's idempotent commit: map-only tokenization, one
    * batch-sized (doc, term) agg, two overwrite writes. O(batch). */
  private[graft] def commitBatch(docs: DataFrame, batchId: Long,
      artifactDir: String): Unit = {
    // r16: the two writes are independent pure functions of the
    // already-materialized micro-batch rows — run them as concurrent
    // driver jobs (guide §2.6) instead of two sequential fixed-overhead
    // rounds; overwrite-idempotence under replay is unchanged
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try Awaits.all(Seq(
        scala.concurrent.Future {
          docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
            .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
            .write.mode("overwrite")
            .parquet(new Path(postRoot(artifactDir), s"b$batchId").toString)
        },
        scala.concurrent.Future {
          docs.agg(count(lit(1)).as("n"))
            .write.mode("overwrite")
            .parquet(new Path(nRoot(artifactDir), s"b$batchId").toString)
        }))
    finally pool.shutdown()
    ()
  }

  /** THE rarity-weighted scorer — the one implementation ts3, the
    * maintained-store query, and the specs all share (so the three can
    * never drift apart): Σ tf·(N − df) per doc over the given
    * (doc_id, w, tf) postings, df derived from those same rows, score
    * > 0, top-k by (score DESC, doc_id). BIGINT-exact throughout. */
  private[graft] def rankedScore(tf: DataFrame, n: DataFrame, k: Int): DataFrame = {
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(sum(col("tf") * (col("n") - col("df"))).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Scheduled LSM compaction of the search store: fold every postings /
    * docn batch dir below the newest into a `base-<m>` dir (content
    * rewritten verbatim — the store is append-only, so the fold is the
    * identity; docn additionally pre-sums to one row). Bounds the
    * per-query dir count (and the planning-time listing behind it) on a
    * long-running stream; reads stay correct with or without it. */
  private[graft] def compact(spark: SparkSession, artifactDir: String,
      hconf: org.apache.spark.util.SerializableConfiguration): Unit = {
    // r16: disjoint roots, independent folds — concurrent (guide §2.6)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try Awaits.all(Seq(
        scala.concurrent.Future(DedupMaintenance.compactStore(
          spark, postRoot(artifactDir), hconf, identity)),
        scala.concurrent.Future(DedupMaintenance.compactStore(
          spark, nRoot(artifactDir), hconf,
          df => df.agg(sum(col("n")).as("n"))))))
    finally pool.shutdown()
    ()
  }

  /** ts3's rarity-weighted ranked retrieval over the maintained store —
    * read through the LSM live-set discovery (base fold + tail batch
    * dirs), so it serves identically before and after [[compact]]. */
  def rankedSearch(spark: SparkSession, artifactDir: String,
      terms: Seq[String], k: Int): DataFrame = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    def dirs(root: Path) =
      DedupMaintenance.storeDirs(root, hconf).map(_.toString)
    val post = spark.read.parquet(dirs(postRoot(artifactDir)): _*)
      .where(col("w").isin(terms: _*))
    val n = spark.read.parquet(dirs(nRoot(artifactDir)): _*)
      .agg(sum(col("n")).as("n"))
    rankedScore(post, n, k)
  }
}
