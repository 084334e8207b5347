package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second batch of relational surface: SQL entry point, outer joins, set
  * ops, cube/pivot, moment statistics, subqueries, sessionization, rolling
  * windows. Same oracle-parity discipline as [[Relational]]: double SUMs go
  * through element-wise DECIMAL casts (order-independent), orderings carry
  * unique tiebreakers, moment statistics are emitted as exact decimal sums
  * rather than engine-rounded stddev/corr floats — and every decimal is
  * rendered as a fixed-scale string before it reaches the output schema
  * (the driver hash mishandles DECIMAL columns; see [[Relational]]).
  */
object Relational2 {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  val defs: Seq[QueryDef] = Seq(

    // ----- the SQL entry point (reference Q1 surface, ctx.sql parity) -------
    QueryDef(
      "q21_sql_entry",
      (s, dir) => {
        Tables.register(s, dir, "lineitem", "orders")
        s.sql("""SELECT l_returnflag, count(*) AS n,
                |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS qty
                |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                |WHERE o_orderstatus = 'F'
                |GROUP BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'F'
             |GROUP BY l_returnflag""".stripMargin)),

    // ----- left outer join with null-group semantics ------------------------
    QueryDef(
      "q22_outerjoin",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(dec(col("o_totalprice"))), lit(0).cast(DecimalType(18, 4)))
              .cast(DecimalType(38, 4)).cast("string").as("spend"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |  CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))),
             |           CAST(0 AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS spend
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey""".stripMargin)),

    // ----- UNION ALL (bag semantics) ----------------------------------------
    QueryDef(
      "q23_union_all",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("k"), lit("o").as("src"))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("k"), lit("l").as("src"))
        o.unionAll(li).groupBy("src").agg(count(lit(1)).as("n"),
          countDistinct(col("k")).as("nk"))
      },
      Some("""SELECT src, count(*) AS n, count(DISTINCT k) AS nk FROM (
             |  SELECT o_orderkey AS k, 'o' AS src FROM orders
             |  UNION ALL
             |  SELECT l_orderkey AS k, 'l' AS src FROM lineitem) t
             |GROUP BY src""".stripMargin)),

    // ----- CUBE grouping sets ----------------------------------------------
    QueryDef(
      "q24_cube",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast(DecimalType(38, 4)).cast("string").as("qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // ----- pivot (explicit value list => deterministic columns) -------------
    QueryDef(
      "q25_pivot",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
      },
      Some("""SELECT c_mktsegment,
             |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS F,
             |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS O,
             |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS P
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // ----- moment statistics as exact decimal sums --------------------------
    // stddev/var/corr are derivable from (n, Σx, Σx², Σxy); emitting the
    // exact sums keeps the check engine-exact while exercising the same
    // one-pass partial-aggregation plan a stddev would use.
    QueryDef(
      "q26_moments",
      (s, dir) => {
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).cast(DecimalType(38, 4)).cast("string").as("sx"),
            sum(x * x).cast(DecimalType(38, 8)).cast("string").as("sxx"),
            sum(y).cast(DecimalType(38, 4)).cast("string").as("sy"),
            sum(x * y).cast(DecimalType(38, 8)).cast("string").as("sxy"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sx,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS VARCHAR) AS sxx,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sy,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS VARCHAR) AS sxy
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ----- scalar + IN subqueries -------------------------------------------
    QueryDef(
      "q27_subqueries",
      (s, dir) => {
        Tables.register(s, dir, "orders", "customer")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_custkey IN (
                |    SELECT c_custkey FROM customer
                |    WHERE c_acctbal > (SELECT max(c_acctbal) * 0.5 FROM customer))
                |  AND o_totalprice > 100000.0""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_custkey IN (
             |    SELECT c_custkey FROM customer
             |    WHERE c_acctbal > (SELECT max(c_acctbal) * 0.5 FROM customer))
             |  AND o_totalprice > 100000.0""".stripMargin)),

    // ----- sessionization (gaps-and-islands) --------------------------------
    // 10-minute inactivity gap; all time math in exact integer microseconds.
    QueryDef(
      "q28_sessions",
      (s, dir) => {
        val gapUs = 600L * 1000 * 1000
        val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag(col("us"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
          .withColumn("sess", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id")
          .agg(max(col("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
             |m AS (SELECT user_id, event_id, us,
             |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM e),
             |sess AS (SELECT user_id,
             |    sum(CASE WHEN prev IS NULL OR us - prev > 600000000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY us, event_id
             |            ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM m)
             |SELECT user_id, CAST(max(sess) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM sess GROUP BY user_id""".stripMargin)),

    // ----- rolling window aggregate (ROWS frame) ----------------------------
    QueryDef(
      "q29_rolling",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-3, Window.currentRow)
        Tables.load(s, dir, "events")
          .withColumn("rsum",
            sum(dec(col("value"))).over(w).cast(DecimalType(38, 4)).cast("string"))
          .select("event_id", "user_id", "rsum")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(38,4)) AS VARCHAR) AS rsum
             |FROM events""".stripMargin)),

    // ----- first/last per group (deterministic via struct-min/max) ----------
    QueryDef(
      "q30_firstlast",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(
            min(struct(col("o_orderdate"), col("o_orderkey"))).getField("o_orderkey")
              .as("first_order"),
            max(struct(col("o_orderdate"), col("o_orderkey"))).getField("o_orderkey")
              .as("last_order"))
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_orderdate, o_orderkey) rn_a,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_orderdate DESC, o_orderkey DESC) rn_d
             |  FROM orders)
             |SELECT o_custkey,
             |  max(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_order,
             |  max(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_order
             |FROM r GROUP BY o_custkey""".stripMargin)),

    // ----- explicit GROUPING SETS + grouping_id ------------------------------
    QueryDef(
      "q32_grouping_sets",
      (s, dir) => {
        Tables.register(s, dir, "lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                |  count(*) AS n
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                |                        (l_returnflag, l_linestatus))""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
             |                        (l_returnflag, l_linestatus))""".stripMargin)),

    // ----- deterministic array aggregation (flattened for engine-exact
    // compare: array string renderings differ between engines) -------------
    QueryDef(
      "q33_array_agg",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(
            concat_ws(",", sort_array(collect_list(col("o_orderkey"))))
              .as("order_keys"),
            size(collect_set(col("o_orderpriority"))).cast("long").as("n_priorities"))
      },
      Some("""SELECT o_custkey,
             |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
             |  CAST(len(list_distinct(list(o_orderpriority))) AS BIGINT) AS n_priorities
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ----- semi-structured extraction (JSON props column) -------------------
    QueryDef(
      "q31_json",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .withColumn("kv", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(count(col("kv")).as("n"), sum(col("kv")).as("sk"),
            min(col("kv")).as("mn"), max(col("kv")).as("mx"))
      },
      Some("""SELECT event_type, count(CAST(props ->> '$.k' AS BIGINT)) AS n,
             |  CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sk,
             |  min(CAST(props ->> '$.k' AS BIGINT)) AS mn,
             |  max(CAST(props ->> '$.k' AS BIGINT)) AS mx
             |FROM events GROUP BY event_type""".stripMargin)),

    // ----- exact distributed percentiles (histogram method) -----------------
    // Linear-interpolated p50/p90 of l_quantity per return flag, computed
    // EXACTLY and engine-exactly: quantity's domain is small integers, so
    // instead of a per-group total sort (the naive shape — one task must
    // sort a whole group at 100 TB) the plan aggregates a (flag, value)
    // HISTOGRAM — one map-side-combined shuffle of ≤ |domain| rows per
    // flag — and reads the interpolation positions off the cumulative
    // counts. All arithmetic is integer (positions scaled by 10; values
    // scaled by 10 in the output) so there is no float to diverge: with
    // zero-indexed position p·(n-1), value v spanning cumulative rows
    // [lo, hi) contributes v·(10−rem) at index ⌊p·(n-1)⌋ and v·rem at the
    // next index. For unbounded domains the same plan works over a
    // quantized key (the standard t-digest/bucketed trade).
    QueryDef(
      "q34_percentile",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("v"))
          .groupBy("l_returnflag", "v").agg(count(lit(1)).as("c"))
        val byFlag = Window.partitionBy("l_returnflag")
        val cum = counts
          .withColumn("hi", sum("c").over(byFlag.orderBy("v")))
          .withColumn("lo", col("hi") - col("c"))
          .withColumn("n", sum("c").over(byFlag))
        def contrib(tenthsK: Int): Column = {
          val pos = lit(tenthsK.toLong) * (col("n") - 1) // p·(n-1), ×10
          val idx = floor(pos / 10.0).cast("long")
          val rem = pmod(pos, lit(10L))
          val atIdx = when(idx >= col("lo") && idx < col("hi"),
            col("v") * (lit(10L) - rem)).otherwise(0L)
          val atNext = when(rem > 0 && idx + 1 >= col("lo") && idx + 1 < col("hi"),
            col("v") * rem).otherwise(0L)
          atIdx + atNext
        }
        cum.groupBy("l_returnflag")
          .agg(max("n").as("n"),
            sum(contrib(5)).as("p50x10"),
            sum(contrib(9)).as("p90x10"))
      },
      Some("""WITH counts AS (
             |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) v, count(*) c
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (
             |  SELECT l_returnflag, v, c,
             |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) hi,
             |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) - c lo,
             |    sum(c) OVER (PARTITION BY l_returnflag) n
             |  FROM counts)
             |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN (5*(n-1))//10 >= lo AND (5*(n-1))//10 < hi
             |             THEN v * (10 - (5*(n-1))%10) ELSE 0 END
             |         + CASE WHEN (5*(n-1))%10 > 0 AND (5*(n-1))//10 + 1 >= lo
             |                 AND (5*(n-1))//10 + 1 < hi
             |             THEN v * ((5*(n-1))%10) ELSE 0 END) AS BIGINT) AS p50x10,
             |  CAST(sum(CASE WHEN (9*(n-1))//10 >= lo AND (9*(n-1))//10 < hi
             |             THEN v * (10 - (9*(n-1))%10) ELSE 0 END
             |         + CASE WHEN (9*(n-1))%10 > 0 AND (9*(n-1))//10 + 1 >= lo
             |                 AND (9*(n-1))//10 + 1 < hi
             |             THEN v * ((9*(n-1))%10) ELSE 0 END) AS BIGINT) AS p90x10
             |FROM cum GROUP BY l_returnflag""".stripMargin)),

    // ----- window navigation breadth ---------------------------------------
    // lag/lead/ntile/percent_rank/cume_dist over a unique (date, key)
    // order — fills out the window-function surface beyond row_number
    // (q7), rolling frames (q29) and first/last (q30). percent_rank and
    // cume_dist are single IEEE divisions of exact integers, so values
    // are bit-identical cross-engine. One shuffle by o_custkey; within-
    // partition sort only (no global sort).
    QueryDef(
      "q35_window_nav",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.load(s, dir, "orders")
          .withColumn("prev_ok", lag(col("o_orderkey"), 1).over(w))
          .withColumn("next_ok", lead(col("o_orderkey"), 1).over(w))
          .withColumn("tile", ntile(4).over(w))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .select("o_custkey", "o_orderkey", "prev_ok", "next_ok",
            "tile", "pr", "cd")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_orderkey) OVER w AS prev_ok,
             |  lead(o_orderkey) OVER w AS next_ok,
             |  CAST(ntile(4) OVER w AS INTEGER) AS tile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin)),

    // ----- bag-semantics set operations -------------------------------------
    // EXCEPT ALL / INTERSECT ALL (q11/q12 cover the DISTINCT variants):
    // multiplicity-preserving set ops plan as aggregates over counts, not
    // sorts — one shuffle each on the row value.
    QueryDef(
      "q36_setops_all",
      (s, dir) => {
        val flags = Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
        val highQty = Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity") >= 25.0)
          .select(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
        flags.exceptAll(highQty)
          .groupBy("f", "st").agg(count(lit(1)).as("n_except"))
      },
      Some("""WITH a AS (SELECT l_returnflag f, l_linestatus st FROM lineitem),
             |b AS (SELECT l_returnflag f, l_linestatus st FROM lineitem
             |      WHERE l_quantity >= 25.0),
             |d AS (SELECT f, st FROM a EXCEPT ALL SELECT f, st FROM b)
             |SELECT f, st, count(*) AS n_except FROM d GROUP BY 1, 2""".stripMargin)),

    // ----- string-distance functions ----------------------------------------
    // levenshtein over the nation-name pairs (unit-cost DP — identical
    // definition in Spark and DuckDB): the fuzzy-matching primitive entity
    // resolution and near-dup title matching build on. Small-side
    // self-join broadcasts; at scale the left side streams.
    QueryDef(
      "q37_edit_distance",
      (s, dir) => {
        val a = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("ka"), col("n_name").as("na"))
        val b = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("kb"), col("n_name").as("nb"))
        a.join(broadcast(b), col("ka") < col("kb"))
          .withColumn("d", levenshtein(col("na"), col("nb")))
          .filter(col("d") <= 6)
          .select(col("na"), col("nb"), col("d"))
      },
      Some("""SELECT a.n_name AS na, b.n_name AS nb,
             |  CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS d
             |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
             |WHERE levenshtein(a.n_name, b.n_name) <= 6""".stripMargin)),

    // ----- time-series resample + gap-fill ----------------------------------
    // 15-minute resampling of the event stream onto a DENSE generated
    // grid (~half the grid cells have no events — they must appear with
    // n=0, which no plain GROUP BY can produce). The dashboard/feature
    // regularization shape: downstream consumers need every bucket
    // present. Scale: one map-side-combined agg over the events (the only
    // O(data) step), then the gap-fill works entirely in AGGREGATED space
    // — the grid is |types| × buckets rows from an exploded sequence over
    // a broadcast 1-row span, left-joined to the aggregate; O(output),
    // never a second pass over the corpus.
    QueryDef(
      "q38_resample_gapfill",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val bucket = expr(
          "timestampadd(MINUTE, CAST(floor(minute(ts)/15)*15 AS INT), date_trunc('hour', ts))")
        val b = ev.select(col("event_type"), bucket.as("bucket"), col("value"))
        // the aggregate is |types|×|buckets| — tiny — and every downstream
        // branch (span, type list, the gap-fill join) needs it, so persist
        // it: the corpus is scanned exactly once (PlanShapeSpec pins this;
        // without the cache each pruned branch re-scans the events)
        val agg = b.groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("value"))).cast(DecimalType(38, 4)).cast("string").as("sv"))
          .persist()
        val span = agg.agg(min("bucket").as("lo"), max("bucket").as("hi"))
        val grid = agg.select("event_type").distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(expr("sequence(lo, hi, interval 15 minutes)")).as("bucket"))
        grid.join(agg, Seq("event_type", "bucket"), "left")
          .select(col("event_type"), col("bucket"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sv"), lit("0.0000")).as("sv"))
      },
      Some("""WITH b AS (
             |  SELECT event_type,
             |    date_trunc('hour', ts)
             |      + to_minutes(CAST(floor(minute(ts)/15)*15 AS BIGINT)) AS bucket,
             |    value
             |  FROM events),
             |a AS (SELECT event_type, bucket, count(*) AS n,
             |        CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sv
             |      FROM b GROUP BY 1, 2),
             |s AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM a),
             |g AS (SELECT t.event_type, gs.bucket
             |      FROM (SELECT DISTINCT event_type FROM a) t
             |      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
             |                  FROM s) gs)
             |SELECT g.event_type, g.bucket, COALESCE(a.n, 0) AS n,
             |  COALESCE(a.sv, '0.0000') AS sv
             |FROM g LEFT JOIN a USING (event_type, bucket)""".stripMargin)),

    // ----- ordered event funnel ---------------------------------------------
    // view → click → purchase IN TEMPORAL ORDER per user: each stage is
    // the min event time strictly after the previous stage's — the
    // product-analytics funnel, and the same shape as multi-step
    // interaction mining over behavioral training data. Every join and
    // aggregate is keyed on user_id (one partitioning reused down the
    // chain; each stage's input is the type-filtered subset, not the full
    // stream). Timestamps compare exactly cross-engine: the generator
    // emits whole-microsecond ns values, so Spark's µs narrowing loses
    // nothing (checked: 0 rows with sub-µs components).
    QueryDef(
      "q39_funnel",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        def stage(df: org.apache.spark.sql.DataFrame, typ: String,
                  prev: String, out: String) =
          ev.filter(col("event_type") === typ).join(df, "user_id")
            .filter(col("ts") > col(prev))
            .groupBy("user_id").agg(min("ts").as(out))
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val t2 = stage(t1, "click", "t1", "t2")
        val t3 = stage(t2, "purchase", "t2", "t3")
        t1.agg(count(lit(1)).as("s_view"))
          .crossJoin(t2.agg(count(lit(1)).as("s_click")))
          .crossJoin(t3.agg(count(lit(1)).as("s_purchase")))
      },
      Some("""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |            WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(e.ts) AS t2
             |       FROM events e JOIN t1 USING (user_id)
             |       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
             |t3 AS (SELECT e.user_id, min(e.ts) AS t3
             |       FROM events e JOIN t2 USING (user_id)
             |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
             |SELECT (SELECT count(*) FROM t1) AS s_view,
             |       (SELECT count(*) FROM t2) AS s_click,
             |       (SELECT count(*) FROM t3) AS s_purchase""".stripMargin)),

    // ----- retention cohorts ------------------------------------------------
    // Day-grain cohort retention: users bucketed by first-active day,
    // counted per (cohort, day-offset). After the user-day distinct the
    // per-(cohort, offset) count(*) IS the distinct-user count — no
    // second distinct. Shape: user-day dedup agg, cohort min agg, one
    // user-keyed join (partitioning reused from the aggs), final
    // (cohort, offset) agg — all map-side partial.
    QueryDef(
      "q40_retention",
      (s, dir) => {
        val ud = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val cohort = ud.groupBy("user_id").agg(min("d").as("cohort"))
        ud.join(cohort, "user_id")
          .groupBy(col("cohort"),
            datediff(col("d"), col("cohort")).as("offset_days"))
          .agg(count(lit(1)).as("users"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
             |            FROM events),
             |c AS (SELECT user_id, min(d) AS cohort FROM ud GROUP BY 1)
             |SELECT c.cohort, CAST(ud.d - c.cohort AS INT) AS offset_days,
             |       count(*) AS users
             |FROM ud JOIN c USING (user_id)
             |GROUP BY 1, 2""".stripMargin)),

    // ----- recursive CTE (q41) ----------------------------------------------
    // WITH RECURSIVE through Spark's native SQL surface (new in Spark 4 —
    // the hierarchical/reachability query class that previously forced a
    // driver-side loop): per-node depth in a synthetic reporting tree over
    // supplier (node k >= 2 reports to k DIV 2, root 1 — derived from the
    // key itself so both engines build the identical graph; key 0 is
    // excluded to avoid the 0 DIV 2 = 0 self-loop). Spark iterates the
    // recursive step as chained joins exactly like dd6's label rounds, but
    // declared in SQL; depth is bounded by log2(|supplier|), far under the
    // recursion guard. Scale: each iteration is one keyed join of the
    // frontier against supplier — frontier-sized, not table-sized.
    QueryDef(
      "q41_recursive_cte",
      (s, dir) => {
        Tables.register(s, dir, "supplier")
        s.sql("""WITH RECURSIVE chain AS (
                |  SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 1
                |  UNION ALL
                |  SELECT sup.s_suppkey, c.depth + 1
                |  FROM supplier sup JOIN chain c ON sup.s_suppkey DIV 2 = c.s_suppkey
                |  WHERE sup.s_suppkey > 1)
                |SELECT s_suppkey, depth FROM chain""".stripMargin)
      },
      Some("""WITH RECURSIVE chain(s_suppkey, depth) AS (
             |  SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 1
             |  UNION ALL
             |  SELECT sup.s_suppkey, c.depth + 1
             |  FROM supplier sup JOIN chain c ON sup.s_suppkey // 2 = c.s_suppkey
             |  WHERE sup.s_suppkey > 1)
             |SELECT s_suppkey, depth FROM chain""".stripMargin)),

    // ----- VALUE-RANGE window frames (rolling time windows) -----------------
    // The trailing-31-day rolling aggregate — RANGE BETWEEN, not ROWS:
    // the frame is bounded by ORDER-KEY VALUE distance, so every order
    // on the same day is in or out together and the result is
    // deterministic under ties (a ROWS frame would depend on intra-day
    // order). Dates are bridged to integer day offsets from a fixed
    // epoch so both engines frame over plain integers; the rolling sum
    // runs over DECIMAL(18,4)-cast prices (exact, order-independent —
    // the suite's standard FP discipline). Scale: one shuffle by the
    // partition key, then a per-partition ordered pass with O(frame)
    // sliding state — Spark's RANGE frame implementation never
    // re-aggregates the window per row. (At 100 TB the partition key
    // would be a higher-cardinality dimension; 5 priorities here keep
    // the fixture's frames populated.)
    QueryDef(
      "q42_rolling_range",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderpriority").orderBy(col("d"))
          .rangeBetween(-30, Window.currentRow)
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            datediff(col("o_orderdate").cast("date"),
              lit("1992-01-01").cast("date")).as("d"),
            col("o_totalprice").cast("decimal(18,4)").as("p"))
          .withColumn("n31", count(lit(1)).over(w))
          // the suite's decimal discipline: DECIMAL(38,4) intermediate,
          // rendered as a fixed-scale string so decimal never reaches
          // the driver-visible schema
          .withColumn("sum31", sum(col("p")).over(w)
            .cast("decimal(38,4)").cast("string"))
          .select("o_orderkey", "d", "n31", "sum31")
      },
      Some("""SELECT o_orderkey,
             |  date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
             |  count(*) OVER w AS n31,
             |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w
             |       AS DECIMAL(38,4)) AS VARCHAR) AS sum31
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
             |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ----- equi-depth bucketing via ntile (q43) -----------------------------
    // The distribution-rank window family: ntile(k) deals each nation's
    // customers into k near-equal account-balance quartiles (earlier
    // buckets one row larger on remainders — the ANSI dealing both
    // engines implement). The order is made TOTAL with the unique key as
    // tiebreak, so bucket assignment is deterministic and hash-exact —
    // ntile is the integer-valued member of the family (percent_rank /
    // cume_dist are float ratios; their division is engine-identical IEEE
    // but ntile is the one a pipeline actually partitions by). Scale: one
    // hash exchange on the partition key, per-partition sort only —
    // never a global sort.
    QueryDef(
      "q43_ntile",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            ntile(4).over(w).as("quartile"),
            ntile(10).over(w).as("decile"))
      },
      Some("""SELECT c_custkey, c_nationkey,
             |  ntile(4) OVER w AS quartile,
             |  ntile(10) OVER w AS decile
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey
             |             ORDER BY c_acctbal, c_custkey)""".stripMargin)),

    // ----- correlated LATERAL subquery (q44) --------------------------------
    // The SQL-standard lateral join through Spark 4's SQL surface: per
    // outer row (nation), a correlated derived table — here the nation's
    // top-2 customers by account balance, the canonical per-group top-N
    // written as LATERAL instead of a window. Catalyst decorrelates this
    // into the window/aggregate shape (no per-row re-execution, no
    // driver loop); the unique-key tiebreak makes the LIMIT 2 cut
    // deterministic and hash-exact. DuckDB runs the identical statement.
    QueryDef(
      "q44_lateral",
      (s, dir) => {
        Tables.register(s, dir, "nation", "customer")
        s.sql("""SELECT n.n_name, t.c_custkey, t.c_acctbal
                |FROM nation n,
                |LATERAL (
                |  SELECT c_custkey, c_acctbal FROM customer
                |  WHERE c_nationkey = n.n_nationkey
                |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
      },
      Some("""SELECT n.n_name, t.c_custkey, t.c_acctbal
             |FROM nation n,
             |LATERAL (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)),

    // ----- bitwise / boolean aggregate family (q45) -------------------------
    // bit_and/bit_or/bit_xor over a key column (the bitmap-index and
    // feature-flag aggregation primitives — xor doubles as a cheap
    // set-digest) and bool_and/bool_or over predicates (ANSI EVERY/ANY).
    // All integer/boolean-exact and order-insensitive, so the hash
    // compare is trivial; one map-side-combined agg, scalars only.
    QueryDef(
      "q45_bitwise_bool_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("bit_and(l_orderkey)").as("band"),
          expr("bit_or(l_orderkey)").as("bor"),
          expr("bit_xor(l_orderkey)").as("bxor"),
          expr("bool_and(l_quantity > 25.0)").as("ba"),
          expr("bool_or(l_quantity > 49.0)").as("bo")),
      Some("""SELECT l_returnflag,
             |  bit_and(l_orderkey) AS band, bit_or(l_orderkey) AS bor,
             |  bit_xor(l_orderkey) AS bxor,
             |  bool_and(l_quantity > 25.0) AS ba,
             |  bool_or(l_quantity > 49.0) AS bo
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ----- UNPIVOT / melt (q46, r15) -----------------------------------------
    // The wide-to-long reshape (SQL-standard UNPIVOT, pandas melt):
    // Spark 3.4+'s native Dataset.unpivot — a zero-shuffle Expand over
    // the wide frame (each input row emits one row per value column), so
    // at 100 TB it costs exactly the wide aggregate that feeds it. All
    // three measures are BIGINT so the single long `value` column is
    // exact; DuckDB runs its native UNPIVOT.
    QueryDef(
      "q46_unpivot",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_linenumber").cast("long")).as("sln"),
          max(col("l_orderkey")).as("mxo"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("cnt"), col("sln"), col("mxo")),
          "metric", "value"),
      Some("""WITH wide AS (
             |  SELECT l_returnflag, count(*) AS cnt,
             |    CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sln,
             |    max(l_orderkey) AS mxo
             |  FROM lineitem GROUP BY 1)
             |UNPIVOT wide ON cnt, sln, mxo INTO NAME metric VALUE value"""
        .stripMargin))
  )
}
