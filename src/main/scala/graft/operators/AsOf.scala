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
             |  ON p.user_id = r.user_id AND p.us >= r.us""".stripMargin))
  )
}
