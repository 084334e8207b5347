package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, SessCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives the streaming operators through MemoryStream micro-batches and
  * asserts (a) incremental results per batch and (b) parity between
  * incremental streaming sessionization and the batch gaps-and-islands
  * query (q28_sessions) on the same events.
  */
class StreamingSpec extends SparkSpec {

  private def us(minutes: Long): Long = minutes * 60L * 1000 * 1000

  test("flatMapGroupsWithState sessionization accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("update").start()
    try {
      // batch 1: user 1 -> two events 1 min apart (one session);
      //          user 2 -> two events 20 min apart (two sessions)
      in.addData(Ev(1, us(0)), Ev(1, us(1)), Ev(2, us(0)), Ev(2, us(20)))
      q.processAllAvailable()
      val r1 = spark.table("sess").as[SessCount].collect().map(s => s.user_id -> s).toMap
      assert(r1(1L).n_sessions == 1 && r1(1L).n_events == 2)
      assert(r1(2L).n_sessions == 2 && r1(2L).n_events == 2)

      // batch 2: user 1 returns after a 30-min gap -> second session;
      //          user 2 continues within the gap -> still two sessions
      in.addData(Ev(1, us(31)), Ev(2, us(25)))
      q.processAllAvailable()
      val r2 = spark.table("sess").as[SessCount].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      assert(r2(1L).n_sessions == 2 && r2(1L).n_events == 3)
      assert(r2(2L).n_sessions == 2 && r2(2L).n_events == 3)
    } finally q.stop()
  }

  test("streaming sessionization matches the batch gaps-and-islands query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us")).as[Ev]
      .collect().toSeq
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess_parity").outputMode("update").start()
    try {
      // feed in two event-time-ordered micro-batches to exercise state carry
      val sorted = events.sortBy(_.us)
      val (b1, b2) = sorted.splitAt(sorted.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val streamed = spark.table("sess_parity").as[SessCount].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      val batch = SparkEntry.queries("q28_sessions")(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (u, s) =>
        assert((s.n_sessions, s.n_events) == batch(u),
          s"user $u: streaming ${(s.n_sessions, s.n_events)} != batch ${batch(u)}")
      }
    } finally q.stop()
  }

  test("stream-stream interval join matches the equivalent batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(7200L * 1000 + m * 60000L)
    case class E(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
    val clicks = Seq(E(1, 7, t(0)), E(2, 7, t(5)), E(3, 7, t(30)), E(4, 8, t(1)))
    val purchases = Seq(E(10, 7, t(6)), E(11, 7, t(31)), E(12, 9, t(6)))

    val inC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val inP = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStreams.clickToPurchaseJoin(
      inC.toDF().toDF("event_id", "user_id", "ts"),
      inP.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      inC.addData(clicks.map(e => (e.event_id, e.user_id, e.ts)))
      inP.addData(purchases.map(e => (e.event_id, e.user_id, e.ts)))
      q.processAllAvailable()
      val got = spark.table("ssj").select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // purchase 10 (t6): clicks 1 (t0) and 2 (t5) within 10 min before;
      // purchase 11 (t31): click 3 (t30); purchase 12: other user, none
      assert(got == Set((10L, 1L), (10L, 2L), (11L, 3L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val q = EventStreams.dedupStream(df, "event_id")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      def t(m: Int) = new java.sql.Timestamp(3600L * 1000 + m * 60000L)
      in.addData((t(0), 1L), (t(1), 2L), (t(1), 1L)) // 1 duplicated in-batch
      q.processAllAvailable()
      in.addData((t(2), 2L), (t(3), 3L)) // 2 duplicated across batches
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("st1_stream_dedup matches the batch distinct over the same events") {
    val dir = sf("sf0.001")
    val streamed = SparkEntry.queries("st1_stream_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batch = Tables.load(spark, dir, "events")
      .filter(pmod(col("user_id"), lit(2L)) === 0) // the gate fixture's slice
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // exactly once per key: set parity AND no duplicate emissions
    assert(streamed.length === streamed.toSet.size, "a key was emitted twice")
    assert(streamed.toSet === batch.toSet)
  }

  test("streaming dedup re-admits a key after its watermark state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    // 10-minute horizon: state for a key is evictable once the watermark
    // passes its event time + 10 min
    val q = EventStreams.dedupStream(df, "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_expiry").outputMode("append").start()
    try {
      def t(m: Int) = new java.sql.Timestamp(3600L * 1000 + m * 60000L)
      in.addData((t(0), 1L), (t(2), 1L)) // duplicate within the horizon: dropped
      q.processAllAvailable()
      in.addData((t(60), 99L)) // advances the watermark far past t(0)+10min
      q.processAllAvailable()
      in.addData((t(61), 1L)) // state expired: key 1 is re-admitted
      q.processAllAvailable()
      val ones = spark.table("dedup_expiry").filter(col("event_id") === 1L).count()
      assert(ones === 2L,
        "expected key 1 re-emitted after watermark expiry (bounded state)")
    } finally q.stop()
  }

  test("watermarked hourly window aggregation emits per-window counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "event_type")
    val q = EventStreams.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      in.addData((t(1, 5), "click"), (t(1, 40), "click"), (t(2, 10), "view"))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select(hour(col("hour")).as("h"), col("event_type"), col("n"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((1, "click", 2L), (2, "view", 1L)))
    } finally q.stop()
  }
}
