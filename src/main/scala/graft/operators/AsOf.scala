package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical "operator Spark lacks"
  * composed from built-ins (preference (a) of the build guidelines): for
  * each probe event, the most recent reference event of the same key at or
  * before its timestamp.
  *
  * Implementation: tag both sides, union, and take `last_value(ref_id)
  * IGNORE NULLS` over a per-key window ordered by (ts, side, id) — one
  * shuffle by key, no range-explosion join. The (ts, side, id) ordering
  * makes ties deterministic: a reference row at exactly the probe's
  * timestamp IS visible to it (side 0 sorts first), and among equal-ts
  * reference rows the highest id wins.
  *
  * Scale note: this is a single sort-within-key pass — the same shape as
  * sessionization; an interval/range join would explode to O(probe x ref)
  * pairs per key.
  */
object AsOf {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ao1_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val probe = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("us"), lit(1).as("side"))
        val ref = ev.filter(col("event_type") === "view")
          // dedupe equal (user, ts) reference rows to the max id so the
          // as-of pick is unique (matches the oracle's arg_max)
          .groupBy("user_id", "us").agg(max(col("event_id")).as("ref_id"))
          .select(col("ref_id").as("event_id"), col("user_id"), col("us"),
            lit(0).as("side"))
        val merged = probe.withColumn("ref_id", lit(null).cast("long"))
          .unionByName(ref.withColumn("ref_id", col("event_id")))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us").asc, col("side").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        merged
          .withColumn("asof_ref", last(col("ref_id"), ignoreNulls = true).over(w))
          .where(col("side") === 1)
          .select(col("event_id"), col("user_id"), col("asof_ref"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
             |    event_type FROM events),
             |probe AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'click'),
             |ref AS (SELECT user_id, us, max(event_id) AS ref_id FROM ev
             |        WHERE event_type = 'view' GROUP BY user_id, us)
             |SELECT p.event_id, p.user_id, r.ref_id AS asof_ref
             |FROM probe p ASOF LEFT JOIN ref r
             |  ON p.user_id = r.user_id AND p.us >= r.us""".stripMargin)),

    // ----- as-of join with TOLERANCE ----------------------------------------
    // ao1's pandas `merge_asof(tolerance=...)` / kdb `wj` variant: the
    // most recent same-key reference at or before the probe COUNTS ONLY
    // within a 5-minute window — staler references yield no match (the
    // market-data and feature-store semantics: a quote/feature too old is
    // no quote at all). Same single sort-within-key pass as ao1 — the
    // window carries the candidate's (id, ts) struct and the tolerance is
    // one codegen comparison after the pick, NEVER a range join (the
    // nearest-at-or-before candidate is the only one that could be in
    // window, so filtering after the pick is exact).
    QueryDef(
      "ao2_asof_tolerance",
      (s, dir) => {
        val tolUs = 300L * 1000 * 1000
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val probe = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("us"), lit(1).as("side"))
        val ref = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "us").agg(max(col("event_id")).as("ref_id"))
          .select(col("ref_id").as("event_id"), col("user_id"), col("us"),
            lit(0).as("side"))
        val merged = probe
          .withColumn("cand", lit(null).cast("struct<rid:long,rus:long>"))
          .unionByName(ref.withColumn("cand",
            struct(col("event_id").as("rid"), col("us").as("rus"))))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us").asc, col("side").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        merged
          .withColumn("pick", last(col("cand"), ignoreNulls = true).over(w))
          .where(col("side") === 1)
          .select(col("event_id"), col("user_id"),
            when(col("us") - col("pick.rus") <= tolUs, col("pick.rid"))
              .as("asof_ref"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
             |    event_type FROM events),
             |probe AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'click'),
             |ref AS (SELECT user_id, us, max(event_id) AS ref_id FROM ev
             |        WHERE event_type = 'view' GROUP BY user_id, us)
             |SELECT p.event_id, p.user_id,
             |  CASE WHEN p.us - r.us <= 300000000 THEN r.ref_id END AS asof_ref
             |FROM probe p ASOF LEFT JOIN ref r
             |  ON p.user_id = r.user_id AND p.us >= r.us""".stripMargin)),

    // ----- bucketed range join ----------------------------------------------
    // For each purchase, the number of clicks by the same user in the
    // preceding 10 minutes. A naive range join is a per-key cross product;
    // bucketing time into window-sized buckets turns it into an equi-join
    // on (user, bucket) with each probe exploded to 2 adjacent buckets —
    // the standard scalable range-join shape (pairs bounded by bucket
    // population, not key population).
    QueryDef(
      "rj1_range_join",
      (s, dir) => {
        val winUs = 600L * 1000 * 1000
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val bucket = expr(s"us div ${winUs}L")
        val probe = ev.filter(col("event_type") === "purchase")
          .withColumn("bkt", explode(array(bucket - 1, bucket)))
          .select(col("event_id"), col("user_id"), col("us").as("pus"), col("bkt"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us").as("cus"), bucket.as("bkt"))
        probe.join(ref, Seq("user_id", "bkt"), "left_outer")
          .withColumn("hit",
            when(col("cus").isNotNull &&
              col("pus") - col("cus") > 0 && col("pus") - col("cus") <= winUs, 1L)
              .otherwise(0L))
          .groupBy("event_id", "user_id")
          .agg(sum(col("hit")).as("clicks_before"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
             |    event_type FROM events),
             |p AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, us FROM ev WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             |  (SELECT count(*) FROM c WHERE c.user_id = p.user_id
             |     AND p.us - c.us > 0 AND p.us - c.us <= 600000000) AS clicks_before
             |FROM p""".stripMargin))
  )
}
