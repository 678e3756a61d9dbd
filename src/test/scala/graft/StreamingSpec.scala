package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.streaming.Streams

/** Stream/batch parity for the event operators: the same rows produce
  * the same windows whether read as a table or fed through a
  * MemoryStream in micro-batches, and mapGroupsWithState accumulates
  * across batches to the batch-mode totals. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2026-01-01 10:05:00"), "click", 1.0),
    (1L, ts("2026-01-01 10:20:00"), "click", 2.0),
    (1L, ts("2026-01-01 11:05:00"), "click", 4.0),
    (2L, ts("2026-01-01 10:40:00"), "view", 8.0),
    (2L, ts("2026-01-01 10:55:00"), "view", 16.0))

  test("tumblingAggStream (complete mode) matches batch tumblingAgg") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val streamed = Streams.tumblingAggStream(
      in.toDF.toDF("user_id", "ts", "event_type", "value"),
      "ts", "event_type", "value", "1 hour", "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("t_agg").outputMode("complete").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      val got = spark.table("t_agg")
        .as[(Timestamp, String, Long, Double, Double)].collect().toSet
      val want = Events.tumblingAgg(
        rows.toDF("user_id", "ts", "event_type", "value"),
        "ts", "event_type", "value", "1 hour")
        .as[(Timestamp, String, Long, Double, Double)].collect().toSet
      assert(got === want)
      assert(want.size === 3) // (10h click), (11h click), (10h view)
    } finally q.stop()
  }

  test("srmUnitCountStream: distinct units per (window, arm), append emission") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val streamed = Streams.srmUnitCountStream(
      in.toDF.toDF("ts", "user_id", "arm"),
      "ts", "user_id", "arm", "1 hour", "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("t_srm").outputMode("append").start()
    try {
      // u1 appears TWICE in arm a / 10h window: must count once; u2
      // once in b; the 13h row only advances the watermark past 10h
      in.addData(Seq(
        (ts("2026-01-01 10:05:00"), 1L, "a"),
        (ts("2026-01-01 10:20:00"), 1L, "a"),
        (ts("2026-01-01 10:40:00"), 2L, "b")))
      q.processAllAvailable()
      in.addData(Seq((ts("2026-01-01 13:00:00"), 9L, "a")))
      q.processAllAvailable()
      val got = spark.table("t_srm")
        .as[(Timestamp, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === Map(
        (ts("2026-01-01 10:00:00"), "a") -> 1L,
        (ts("2026-01-01 10:00:00"), "b") -> 1L))
    } finally q.stop()
  }

  test("windowedCountStream: exact per-(window, key) counts across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val streamed = Streams.windowedCountStream(
      in.toDF.toDF("user_id", "ts", "event_type", "value"),
      "ts", "user_id", "1 hour", "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("t_wc").outputMode("complete").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      val got = spark.table("t_wc")
        .as[(Timestamp, Timestamp, Long, Long)].collect()
        .map(r => (r._1, r._3) -> r._4).toMap
      // u1: 2 in the 10h window (merged across batches), 1 in 11h;
      // u2: 2 in 10h — the feed a batch rank turns into top-k
      assert(got === Map(
        (ts("2026-01-01 10:00:00"), 1L) -> 2L,
        (ts("2026-01-01 11:00:00"), 1L) -> 1L,
        (ts("2026-01-01 10:00:00"), 2L) -> 2L))
    } finally q.stop()
  }

  test("approxDistinctStream (complete mode) equals batch distinct counts (sparse regime)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val streamed = Streams.approxDistinctStream(
      in.toDF.toDF("user_id", "ts", "event_type", "value"),
      "ts", "event_type", "user_id", "1 hour", "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("t_hll").outputMode("complete").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable() // dup users merge across batches
      val got = spark.table("t_hll")
        .as[(Timestamp, String, Long)].collect().toSet
      val want = rows.toDF("user_id", "ts", "event_type", "value")
        .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
        .agg(count_distinct(col("user_id")).as("n"))
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got === want)
    } finally q.stop()
  }

  test("sessionizeStream merges gap-adjacent events like the batch sessionizer") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val streamed = Streams.sessionizeStream(
      in.toDF.toDF("user_id", "ts", "event_type", "value"),
      "user_id", "ts", "value", "30 minutes", "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("t_sess").outputMode("complete").start()
    try {
      in.addData(rows); q.processAllAvailable()
      val got = spark.table("t_sess")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      // batch lag-gap sessionizer on the same rows (30-min gap):
      // user 1 -> {10:05,10:20} and {11:05}; user 2 -> {10:40,10:55}
      val batch = Events.sessionize(
        rows.toDF("user_id", "ts", "event_type", "value"),
        "user_id", "ts", "value", gapMinutes = 30, orderTiebreak = "value")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === batch)
      assert(got === Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 2L, 24.0)))
    } finally q.stop()
  }

  test("sessionizeStream finalized sessions equal batch lag-gap sessions (property)") {
    // r5 VERDICT item 7: lock q_stream_session's semantics beyond its one
    // fixture. Random event streams (3 users, minute-granularity offsets —
    // exact-gap boundary collisions INCLUDED) run through the streaming
    // session_window in APPEND mode with a far-future sentinel event
    // advancing the watermark past every real session; the finalized
    // output must equal the batch lag-gap sessionizer restricted by the
    // same cut (session_end = last_ts + gap ≤ max_ts − delay). Values are
    // integer-valued doubles so sums are order-exact.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    implicit val ctx = spark.sqlContext
    val base = ts("2026-01-01 00:00:00").getTime
    def at(minute: Long) = new Timestamp(base + minute * 60000L)
    val sentinel = (9L, at(100000L), 1.0)
    val gen = Gen.listOf(
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 600L), Gen.choose(1, 9)))
    var runId = 0
    val prop = Prop.forAll(gen) { xs =>
      runId += 1
      val real = xs.map { case (u, m, v) => (u, at(m), v.toDouble) }
      val in = MemoryStream[(Long, Timestamp, Double)]
      val q = Streams.sessionizeStream(
          in.toDF.toDF("user_id", "ts", "value"),
          "user_id", "ts", "value", "30 minutes", "30 minutes")
        .writeStream.format("memory").queryName(s"t_sess_prop_$runId")
        .outputMode("append").start()
      try {
        // all real rows in batch 1 (nothing is late w.r.t. the initial
        // watermark floor), then the sentinel advances the watermark
        if (real.nonEmpty) { in.addData(real); q.processAllAvailable() }
        in.addData(sentinel); q.processAllAvailable()
        val got = spark.table(s"t_sess_prop_$runId")
          .select("user_id", "session_start", "session_end", "n_events", "total_value")
          .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
        val all = (sentinel :: real).toDF("user_id", "ts", "value")
        val maxTs = (100000L * 60000L + base)
        val want = Events.sessionize(all, "user_id", "ts", "value",
            gapMinutes = 30, orderTiebreak = "value")
          .select(col("user_id"), col("session_start"),
            (col("session_end") + expr("INTERVAL 30 MINUTES")).as("session_end"),
            col("n_events"), col("total_value"))
          .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
          .filter(_._3.getTime <= maxTs - 30L * 60000L).toSet
        got === want
      } finally q.stop()
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("session ending exactly AT the watermark is emitted (non-strict cut)") {
    // Guards q_stream_session's oracle, whose finalization predicate is
    // `session_end <= max(ts) - delay`: Spark's append-mode session
    // eviction is likewise NON-strict, so a dataset where some session
    // ends exactly on the watermark still hash-matches. (Discovered
    // empirically — the random-stream property can't hit this boundary
    // because its sentinel sits far past every real session.)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.sessionizeStream(
        in.toDF.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("t_sess_boundary")
      .outputMode("append").start()
    try {
      // user 1 session ends at exactly 10:30 (= 10:00 + gap); the 11:00
      // event puts the watermark at exactly 10:30 after this batch
      in.addData((1L, ts("2026-01-01 10:00:00"), 1.0),
        (2L, ts("2026-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("t_sess_boundary")
        .select("user_id").as[Long].collect().toSet
      assert(got === Set(1L), "exact-tie session must emit, user-2 tail must not")
    } finally q.stop()
  }

  test("watermarked interval join bounds state: late matches drop, fresh ones flow") {
    // q_stream_join_wm's production claim, exercised across REAL batch
    // boundaries (the judged single-file replay never advances the
    // watermark mid-stream): after the watermark passes, a late right row
    // must not produce its would-be match, while in-range pairs keep
    // joining.
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[(Long, Long, Timestamp)]
    val right = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.intervalJoinStreamWm(
      left.toDF.toDF("user_id", "error_id", "error_ts"), "error_ts",
      right.toDF.toDF("c_user", "click_id", "click_ts"), "click_ts",
      "10 minutes",
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("error_ts") - expr("INTERVAL 5 MINUTES") &&
        col("click_ts") <= col("error_ts") + expr("INTERVAL 5 MINUTES"))
    val q = joined.select("error_id", "click_id")
      .writeStream.format("memory").queryName("t_join_wm")
      .outputMode("append").start()
    try {
      // batch 1: two in-range pairs; the 12:0x rows push the global
      // watermark (min of both sides' max − 10min) to ~11:50
      left.addData((1L, 100L, ts("2026-01-01 10:00:00")),
        (1L, 101L, ts("2026-01-01 12:00:00")))
      right.addData((1L, 200L, ts("2026-01-01 10:02:00")),
        (1L, 201L, ts("2026-01-01 12:01:00")))
      q.processAllAvailable()
      // batch 2: click 202 arrives ~1h50m behind the watermark — its
      // match with error 100 must be DROPPED (state evicted / row late);
      // the fresh pair proves the join is still live
      right.addData((1L, 202L, ts("2026-01-01 10:03:00")),
        (2L, 203L, ts("2026-01-01 12:31:00")))
      left.addData((2L, 102L, ts("2026-01-01 12:30:00")))
      q.processAllAvailable()
      val got = spark.table("t_join_wm").as[(Long, Long)].collect().toSet
      assert(got === Set((100L, 200L), (101L, 201L), (102L, 203L)))
    } finally q.stop()
  }

  test("deterministic sampling is stateless, so it streams unchanged") {
    // Sampling.sample is a pure scan-stage filter — the SAME operator
    // works on an unbounded stream with no state store, and membership
    // matches the batch sample exactly (the auditable-sample property,
    // now also under continuous ingestion).
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Long]
    val sampled = graft.operators.Sampling.sample(
      in.toDF.toDF("id"), graft.operators.Sampling.fibHash(col("id")), 0.4)
    val q = sampled.writeStream.format("memory")
      .queryName("t_sample").outputMode("append").start()
    try {
      in.addData(0L until 500L); q.processAllAvailable()
      in.addData(500L until 1000L); q.processAllAvailable()
      val got = spark.table("t_sample").as[Long].collect().toSet
      val batch = graft.operators.Sampling.sample(
        spark.range(0, 1000).toDF("id"),
        graft.operators.Sampling.fibHash(col("id")), 0.4)
        .as[Long].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("blocklistGateStream: stateless verdicts match the batch gate's " +
      "any-occurrence point; case folding; empty lists pass everything") {
    implicit val ctx = spark.sqlContext
    val bw = Seq("BADWORD").toDF("w")
    val bd = Seq("Blocked.Example.com").toDF("d")
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.blocklistGateStream(
        in.toDF.toDF("doc_id", "text", "url"),
        "doc_id", "text", "url", bw, bd)
      .writeStream.format("memory").queryName("t_blk")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "clean prose here", "https://ok.example.com/a"),
        (2L, "has BadWord inside", "https://ok.example.com/b"),
        (3L, "clean again", "https://blocked.example.com/c"),
        (4L, "badword AND https://BLOCKED.example.com/d both",
          "https://blocked.example.com/d"))
      q.processAllAvailable()
      val got = spark.table("t_blk")
        .as[(Long, Boolean, Boolean, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === Map(
        1L -> ((false, false, true)),
        2L -> ((true, false, false)),
        3L -> ((false, true, false)),
        4L -> ((true, true, false))))
    } finally q.stop()
    // empty policy lists: everything passes (the batch gate's contract)
    val in2 = MemoryStream[(Long, String, String)]
    val q2 = Streams.blocklistGateStream(
        in2.toDF.toDF("doc_id", "text", "url"), "doc_id", "text", "url",
        spark.emptyDataset[String].toDF("w"),
        spark.emptyDataset[String].toDF("d"))
      .writeStream.format("memory").queryName("t_blk2")
      .outputMode("append").start()
    try {
      in2.addData((9L, "badword everywhere", "https://blocked.example.com"))
      q2.processAllAvailable()
      assert(spark.table("t_blk2").as[(Long, Boolean, Boolean, Boolean)]
        .collect().toSeq === Seq((9L, false, false, true)))
    } finally q2.stop()
  }

  test("exactDedupStream emits first occurrence only, across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Streams.DocRow]
    val q = Streams.exactDedupStream(in.toDS())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try {
      // same-batch duplicate fed LARGER id first: survivor must still be
      // the min id (iterator order after the shuffle is not encounter
      // order — the kernel takes minBy explicitly)
      in.addData(Streams.DocRow(5, "same text"), Streams.DocRow(1, "same text"),
        Streams.DocRow(2, "other"))
      q.processAllAvailable()
      // batch 2: duplicate of batch-1 text must NOT re-emit (state wins)
      in.addData(Streams.DocRow(3, "same text"), Streams.DocRow(4, "third"))
      q.processAllAvailable()
      val got = spark.table("t_dedup")
        .as[Streams.DocRow].collect().map(d => (d.doc_id, d.text)).toSet
      assert(got === Set((1L, "same text"), (2L, "other"), (4L, "third")))
      // agreement with batch exactDedup over the full replay
      val batch = graft.operators.Dedup.exactDedup(
        Seq((5L, "same text"), (1L, "same text"), (2L, "other"),
          (3L, "same text"), (4L, "third"))
          .toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, String)].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("throttleStream: in-batch sort determinism, cross-batch arrival-order divergence") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long)]
    val q = Streams.throttleStream(
      in.toDS().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", 600L)
      .writeStream.format("memory").queryName("t_throttle")
      .outputMode("append").start()
    try {
      // fed out of order: the kernel sorts to 10:00 (kept), 10:30 (kept)
      in.addData((1L, ts("2026-01-01 10:30:00"), 3L),
        (1L, ts("2026-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      // a LATE 10:11 arrival: state already carries lastKept = 10:30,
      // so it drops — though batch order would have kept it
      in.addData((1L, ts("2026-01-01 10:11:00"), 2L))
      q.processAllAvailable()
      val got = spark.table("t_throttle").select("event_id")
        .as[Long].collect().toSet
      assert(got === Set(1L, 3L))
      // the batch operator over the full replay KEEPS the late row —
      // the inherent arrival-order divergence, pinned here
      val batchKept = Events.throttleEvents(
        Seq((1L, ts("2026-01-01 10:30:00"), 3L),
          (1L, ts("2026-01-01 10:00:00"), 1L),
          (1L, ts("2026-01-01 10:11:00"), 2L))
          .toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", 600L)
        .filter(col("kept")).select("event_id").as[Long].collect().toSet
      assert(batchKept === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("holtStream: one-batch equals batch fold bit-for-bit; state carries across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = Streams.holtStream(
      in.toDS().toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value")
      .writeStream.format("memory").queryName("t_holt")
      .outputMode("append").start()
    try {
      // fed out of order: the kernel sorts to 4, 8 -> l=4 b=0; l=5 b=.5
      in.addData((1L, ts("2026-01-01 11:00:00"), 2L, 8.0),
        (1L, ts("2026-01-01 10:00:00"), 1L, 4.0))
      q.processAllAvailable()
      // second batch folds at the CARRIED state (l=5, b=.5):
      // l = .25*6 + .75*5.5 = 5.625; b = .5*.625 + .5*.5 = .5625
      in.addData((1L, ts("2026-01-01 12:00:00"), 3L, 6.0))
      q.processAllAvailable()
      val got = spark.table("t_holt")
        .select("event_id", "level", "trend")
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(1L -> ((4.0, 0.0)), 2L -> ((5.0, 0.5)),
        3L -> ((5.625, 0.5625))))
      // identical to the batch operator over the same total replay —
      // here arrival order HAPPENS to respect event order, so the
      // carried state equals the batch fold exactly
      val batch = Events.holtLinear(
        Seq((1L, 1L, ts("2026-01-01 10:00:00"), 4.0),
          (2L, 1L, ts("2026-01-01 11:00:00"), 8.0),
          (3L, 1L, ts("2026-01-01 12:00:00"), 6.0))
          .toDF("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id", "value")
        .select("event_id", "level", "trend")
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(batch === got)
    } finally q.stop()
  }

  test("nearDupFlagStream flags index near-dups once per pair, skips disjoint docs") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.minHashIndex(corpus, "text", "doc_id")
    val in = MemoryStream[(Long, String)]
    val q = Streams.nearDupFlagStream(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id",
        index, "doc_id", 0.9)
      .writeStream.format("memory").queryName("t_neardup")
      .outputMode("append").start()
    try {
      in.addData(
        // exact dup of corpus doc 1 → flags (10, 1, 1.0)
        (10L, "alpha beta gamma delta epsilon zeta eta theta"),
        // token-disjoint → no flag
        (11L, "red orange yellow green blue indigo violet pink"))
      q.processAllAvailable()
      // the SAME dup again in a later batch: pair state dedups it
      in.addData((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      val got = spark.table("t_neardup")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got === Seq((10L, 1L, 1.0)))
    } finally q.stop()
  }

  test("nearDupFlagStreamWm: per-pair-once within the horizon, late re-collision re-emits") {
    // the bounded-state trade the q_stream_neardup_wm plan makes,
    // exercised across real batches: the pair state is evicted once the
    // watermark passes the flag's event time + delay, so the SAME pair
    // re-colliding late emits again (the unbounded variant suppresses
    // it forever — nearDupFlagStream covers that contract).
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.minHashIndex(corpus, "text", "doc_id")
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.nearDupFlagStreamWm(
        in.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id",
        "ts", "10 minutes", index, "doc_id", 0.9)
      .writeStream.format("memory").queryName("t_neardup_wm")
      .outputMode("append").start()
    try {
      val dup = "alpha beta gamma delta epsilon zeta eta theta"
      // batch 1: the pair (10, 1) flags; an in-horizon repeat is dropped
      in.addData((10L, dup, ts("2026-01-01 10:00:00")),
        (10L, dup, ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      // batch 2: a disjoint doc advances the watermark past eviction
      in.addData((11L, "red orange yellow green blue indigo violet pink",
        ts("2026-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 3: the same pair re-collides AFTER eviction -> re-emits
      in.addData((10L, dup, ts("2026-01-01 12:01:00")))
      q.processAllAvailable()
      val got = spark.table("t_neardup_wm")
        .select("da", "db", "est_jaccard").as[(Long, Long, Double)]
        .collect().toSeq
      assert(got === Seq((10L, 1L, 1.0), (10L, 1L, 1.0)))
    } finally q.stop()
  }

  test("exactDedupStreamWm: in-horizon duplicates suppressed, evicted keys re-emit") {
    // the bounded-state trade q_stream_dedup_wm's plan makes, exercised
    // across real batches: a duplicate inside the watermark horizon is
    // dropped; once the watermark evicts the key's state, the same text
    // re-emits (global dedup would suppress it forever — exactDedupStream
    // covers that contract).
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.exactDedupStreamWm(
        in.toDF.toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("t_dedup_wm")
      .outputMode("append").start()
    try {
      // batch 1: first occurrence + an in-horizon duplicate
      in.addData((1L, "alpha", ts("2026-01-01 10:00:00")),
        (2L, "alpha", ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      // batch 2: advance the watermark far past alpha's eviction point
      in.addData((3L, "beta", ts("2026-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 3: alpha returns AFTER eviction -> re-emitted
      in.addData((4L, "alpha", ts("2026-01-01 12:01:00")))
      q.processAllAvailable()
      val got = spark.table("t_dedup_wm")
        .select("doc_id").as[Long].collect().toSet
      assert(got === Set(1L, 3L, 4L))
    } finally q.stop()
  }

  test("runningUserTotals accumulates across micro-batches to batch totals") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Streams.UserEvent]
    val q = Streams.runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("t_tot")
      .outputMode("update").start()
    try {
      in.addData(Streams.UserEvent(1, 1.0), Streams.UserEvent(2, 10.0))
      q.processAllAvailable()
      in.addData(Streams.UserEvent(1, 2.0), Streams.UserEvent(1, 4.0))
      q.processAllAvailable()
      // latest update per user is the running total
      val latest = spark.table("t_tot").groupBy("user_id")
        .agg(max("n_events").as("n"), max("total_value").as("v"))
        .as[(Long, Long, Double)].collect().toSet
      assert(latest === Set((1L, 3L, 7.0), (2L, 1L, 10.0)))
      // batch mode over all rows agrees with the streamed final state
      val batch = Streams.runningUserTotals(Seq(
        Streams.UserEvent(1, 1.0), Streams.UserEvent(2, 10.0),
        Streams.UserEvent(1, 2.0), Streams.UserEvent(1, 4.0)).toDS())
        .as[(Long, Long, Double)].collect().toSet
      assert(batch === latest)
    } finally q.stop()
  }

  test("binnedDistributionStream: bin edges (ties lower) and hourly windows in batch parity") {
    import java.sql.Timestamp
    val df = Seq(
      (Timestamp.valueOf("2026-01-01 10:05:00"), 1.0),  // bin 0
      (Timestamp.valueOf("2026-01-01 10:20:00"), 2.0),  // = boundary: lower
      (Timestamp.valueOf("2026-01-01 10:40:00"), 5.0),  // bin 1
      (Timestamp.valueOf("2026-01-01 11:10:00"), 9.0))  // bin 2, next hour
      .toDF("ts", "value")
    // the identical code path runs in batch (watermark is a no-op)
    val got = graft.streaming.Streams
      .binnedDistributionStream(df, "ts", "value", Seq(2.0, 6.0),
        "1 hour", "30 minutes")
      .collect().map(r => (r.getTimestamp(0).toString, r.getInt(1)) ->
        r.getLong(2)).toMap
    assert(got === Map(
      ("2026-01-01 10:00:00.0", 0) -> 2L,
      ("2026-01-01 10:00:00.0", 1) -> 1L,
      ("2026-01-01 11:00:00.0", 2) -> 1L))
    intercept[IllegalArgumentException](
      graft.streaming.Streams.binnedDistributionStream(
        df, "ts", "value", Seq(6.0, 2.0), "1 hour", "30 minutes"))
  }

  test("funnelStream: chained-min matches equal-ts behind the anchor, " +
      "non-starters silent, cross-batch advance") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = Streams.funnelStream(
      in.toDS().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type",
      Seq("signup", "view", "click"))
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("append").start()
    def micros(s: String) = ts(s).getTime * 1000L
    try {
      // user 1: the 09:00 view precedes signup (no match); the 10:00
      // view shares the signup anchor's timestamp and SMALLER event_id
      // — a forward scan would miss it, chained-min matches it
      in.addData(
        (1L, ts("2026-01-01 09:00:00"), 1L, "view"),
        (1L, ts("2026-01-01 10:00:00"), 2L, "view"),
        (1L, ts("2026-01-01 10:00:00"), 3L, "signup"),
        (2L, ts("2026-01-01 10:00:00"), 4L, "click")) // never enters
      q.processAllAvailable()
      val b1 = spark.table("t_funnel")
        .as[(Long, Long, Long)].collect().toSet
      assert(b1 === Set((1L, 2L, micros("2026-01-01 10:00:00"))))
      // batch 2 advances from carried state (done=2, anchor 10:00)
      in.addData((1L, ts("2026-01-01 11:00:00"), 5L, "click"))
      q.processAllAvailable()
      val b2 = spark.table("t_funnel")
        .as[(Long, Long, Long)].collect().toSet
      assert(b2 === b1 + ((1L, 3L, micros("2026-01-01 11:00:00"))))
    } finally q.stop()
  }
}
