package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Event-operator unit tests: as-of join boundary semantics (before /
  * exactly-at / after, no-match nulls, duplicate-instant determinism) and
  * JSON extraction edge cases. The full-table behaviors are
  * oracle-checked (q_sessionize / q_window_agg / q_asof_join); these pin
  * the edges literals make obvious. */
class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the latest right payload at or before each left ts") {
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")), // before any purchase -> null
      (2L, 10L, ts("2026-01-01 11:00:00")), // exactly at a purchase -> inclusive
      (3L, 10L, ts("2026-01-01 12:30:00")), // between purchases -> the 11:00 one
      (4L, 10L, ts("2026-01-01 14:00:00")), // after the last -> the 13:00 one
      (5L, 20L, ts("2026-01-01 12:00:00"))) // user with no purchases -> null
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2026-01-01 11:00:00"), 1.5),
      (10L, ts("2026-01-01 11:00:00"), 2.5), // duplicate instant -> max wins
      (10L, ts("2026-01-01 13:00:00"), 4.0))
      .toDF("user_id", "ts", "value")
    val out = Events.asofJoin(clicks, purchases, "user_id", "ts", "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> None, 2L -> Some(2.5), 3L -> Some(2.5), 4L -> Some(4.0), 5L -> None))
  }

  test("asofJoinForward attaches the earliest right payload at or after each left ts") {
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")), // before both -> the 11:00 one
      (2L, 10L, ts("2026-01-01 11:00:00")), // exactly at a purchase -> inclusive
      (3L, 10L, ts("2026-01-01 12:30:00")), // between -> the 13:00 one
      (4L, 10L, ts("2026-01-01 14:00:00")), // after the last -> null
      (5L, 20L, ts("2026-01-01 12:00:00"))) // user with no purchases -> null
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2026-01-01 11:00:00"), 1.5),
      (10L, ts("2026-01-01 11:00:00"), 2.5), // duplicate instant -> max wins
      (10L, ts("2026-01-01 13:00:00"), 4.0))
      .toDF("user_id", "ts", "value")
    val out = Events.asofJoinForward(clicks, purchases, "user_id", "ts", "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> Some(2.5), 2L -> Some(2.5), 3L -> Some(4.0), 4L -> None, 5L -> None))
  }

  test("asofJoin keeps every left row exactly once") {
    val left = (1L to 100L).map(i => (i, i % 7, ts(f"2026-01-01 10:00:${i % 60}%02d")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2026-01-01 10:00:30"), 9.0)).toDF("user_id", "ts", "value")
    val out = Events.asofJoin(left, right, "user_id", "ts", "value", "v")
    assert(out.count() === 100L)
    assert(out.select("event_id").distinct().count() === 100L)
  }

  test("rangeJoin pairs exactly the within-tolerance rows, once each") {
    val errors = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),
      (2L, 10L, ts("2026-01-01 18:00:00")),
      (3L, 20L, ts("2026-01-01 10:00:00"))) // other user
      .toDF("error_id", "user_id", "error_ts")
      .select(col("user_id"), col("error_id"), col("error_ts"))
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 10:30:00")), // within, same bucket region
      (2L, 10L, ts("2026-01-01 11:00:00")), // exactly at tolerance -> inclusive
      (3L, 10L, ts("2026-01-01 11:00:01")), // one second outside -> excluded
      (4L, 10L, ts("2026-01-01 09:10:00")), // within, bucket below
      (5L, 20L, ts("2026-01-01 10:05:00"))) // other user, within
      .toDF("click_id0", "user_id", "click_ts")
      .select(col("user_id"), col("click_id0").as("click_id"), col("click_ts"))
    val out = Events.rangeJoin(errors, "error_ts", clicks, "click_ts", "user_id", 60)
      .select("error_id", "click_id").as[(Long, Long)].collect()
    assert(out.length === out.distinct.length) // single-sided explode: no dupes
    assert(out.toSet === Set((1L, 1L), (1L, 2L), (1L, 4L), (3L, 5L)))
  }

  test("intervalJoin equals brute-force overlap on random intervals (property)") {
    // intervals spanning 0..3 bins (binDays=2, lengths to 5 days) with
    // boundary-exact endpoints; every overlapping pair appears EXACTLY
    // once, non-overlapping never — against the O(n·m) definition
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = ts("2026-01-01 00:00:00").getTime
    val iv = for {
      start <- Gen.choose(0L, 20L * 24) // hour offsets over ~3 weeks
      len <- Gen.choose(0L, 5L * 24)
    } yield (new Timestamp(base + start * 3600000L),
      new Timestamp(base + (start + len) * 3600000L))
    val gen = for {
      ls <- Gen.listOfN(12, iv)
      rs <- Gen.listOfN(8, iv)
    } yield (ls, rs)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val right = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val expect = (for {
        (li, s1, e1) <- left; (ri, s2, e2) <- right
        if !s1.after(e2) && !s2.after(e1)
      } yield (li, ri)).sorted
      // result must be bin-width independent (intervals span 0..N bins)
      Seq(1, 2, 7).forall { bd =>
        val got = Events.intervalJoin(
            left.toDF("lid", "ls", "le"), "ls", "le",
            right.toDF("rid", "rs", "re"), "rs", "re", binDays = bd)
          .select("lid", "rid").as[(Long, Long)].collect().toList
        got.sorted == expect // exactly-once: sorted lists, not sets
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("zScoreOutliers flags beyond sigma; singleton groups never flag") {
    val rows = ((1 to 20).map(i => ("a", 1.0 + (i % 3 - 1) * 0.1)) ++
      Seq(("a", 100.0), ("b", 42.0))) // clear outlier; singleton group
      .zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
    val got = Events.zScoreOutliers(
        rows.toDF("event_id", "event_type", "value"), "event_type", "value")
      .select("event_id").as[Long].collect().toSet
    assert(got === Set(20L)) // the 100.0; the singleton's null sd never flags
  }

  test("jsonProp extracts the field and yields null on missing key or junk") {
    val out = Seq("""{"k": 7}""", """{"other": 1}""", "not json", null)
      .toDF("props")
      .select(Events.jsonProp(col("props"), "k").as("v"))
      .as[Option[Long]].collect().toSeq
    assert(out === Seq(Some(7L), None, None, None))
  }

  test("resampleHourly fills gaps with n=0 and NULL sums") {
    // the harness corpus is dense (zero empty buckets at sf0.01), so the
    // gap-fill contract is pinned here: 10:00 and 13:00 have events,
    // 11:00 and 12:00 must appear with n=0 and null sum_value
    val ev = Seq(
      ("2024-03-01 10:15:00", 1.0), ("2024-03-01 10:45:00", 2.0),
      ("2024-03-01 13:05:00", 4.0))
      .toDF("s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.resampleHourly(ev, "ts", "value")
      .orderBy("window_start")
      .as[(Timestamp, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (ts("2024-03-01 10:00:00"), 2L, Some(3.0)),
      (ts("2024-03-01 11:00:00"), 0L, None),
      (ts("2024-03-01 12:00:00"), 0L, None),
      (ts("2024-03-01 13:00:00"), 1L, Some(4.0))))
  }

  test("funnel counts ordered completions with greedy earliest matching") {
    // user 1 completes all three in order; user 2's only view PRECEDES
    // their signup (order violated -> stops after signup); user 3 never
    // signs up (counts nowhere); equal timestamps satisfy >= (user 4).
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:05:00", "view"),
      (1L, "2024-01-01 10:10:00", "click"),
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:30:00", "signup"),
      (3L, "2024-01-01 08:00:00", "view"),
      (3L, "2024-01-01 08:10:00", "click"),
      (4L, "2024-01-01 07:00:00", "signup"),
      (4L, "2024-01-01 07:00:00", "view"))
      .toDF("user_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "view", "click"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((0, "signup", 3L), (1, "view", 2L), (2, "click", 1L)))
  }

  test("forwardFill carries the latest prior non-null per key; leading nulls stay") {
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", None),           // leading null -> stays
      (2L, 10L, "2026-01-01 11:00:00", Some(5.0)),
      (3L, 10L, "2026-01-01 12:00:00", None),           // -> 5.0
      (4L, 10L, "2026-01-01 13:00:00", None),           // run of nulls -> 5.0
      (5L, 10L, "2026-01-01 14:00:00", Some(7.0)),      // own value survives
      (6L, 20L, "2026-01-01 12:30:00", None))           // other key: no bleed
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.forwardFill(ev, "user_id", Seq("ts", "event_id"), "value")
      .select("event_id", "value").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> None, 2L -> Some(5.0), 3L -> Some(5.0),
      4L -> Some(5.0), 5L -> Some(7.0), 6L -> None))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, nesting absorbed") {
    val iv = Seq(
      (1L, "2026-01-01 10:00:00", "2026-01-01 11:00:00"),
      (1L, "2026-01-01 10:30:00", "2026-01-01 10:40:00"), // nested -> absorbed
      (1L, "2026-01-01 11:00:00", "2026-01-01 12:00:00"), // touching -> merges
      (1L, "2026-01-01 12:30:00", "2026-01-01 13:00:00"), // gap -> new span
      (2L, "2026-01-01 10:30:00", "2026-01-01 10:45:00")) // other key isolated
      .toDF("k", "ss", "es")
      .select(col("k"), to_timestamp(col("ss")).as("s"),
        to_timestamp(col("es")).as("e"))
    val out = Events.mergeIntervals(iv, "k", "s", "e")
      .select(col("k"), col("span_start").cast("string"),
        col("span_end").cast("string"), col("n_merged"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(out === Set(
      (1L, "2026-01-01 10:00:00", "2026-01-01 12:00:00", 3L),
      (1L, "2026-01-01 12:30:00", "2026-01-01 13:00:00", 1L),
      (2L, "2026-01-01 10:30:00", "2026-01-01 10:45:00", 1L)))
  }

  test("mergeIntervals equals brute-force interval union on random inputs (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = ts("2026-01-01 00:00:00").getTime
    val iv = for {
      k <- Gen.choose(1L, 3L)
      start <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 30L)
    } yield (k, new Timestamp(base + start * 3600000L),
      new Timestamp(base + (start + len) * 3600000L))
    val prop = Prop.forAll(Gen.listOfN(25, iv)) { ivs =>
      // brute force: per key, sort by (start, end), fold into spans
      // merging when start <= running max end (touch merges)
      val expect = ivs.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.map(r => (r._2.getTime, r._3.getTime))
          .sortBy(identity)
        val spans = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        for ((s, e) <- sorted) {
          if (spans.nonEmpty && s <= spans.last._2)
            spans(spans.size - 1) =
              (spans.last._1, math.max(spans.last._2, e), spans.last._3 + 1)
          else spans += ((s, e, 1L))
        }
        spans.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
      val got = Events.mergeIntervals(
          ivs.toDF("k", "s", "e"), "k", "s", "e")
        .select(col("k"), col("span_start"), col("span_end"), col("n_merged"))
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4)).toSet
      got == expect
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, r.status.toString)
  }

  test("sessionizeCapped splits on gap OR duration cap; boundaries continue") {
    // gap 30min, cap 120min. Events at 0, 25, 50, ... keep the gap
    // alive; the cap forces a split at the first event strictly past
    // session_start + 120min — and the new session's clock restarts.
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00"), // s1 start
      (2L, 10L, "2026-01-01 10:25:00"), // 25min gap: s1
      (3L, 10L, "2026-01-01 10:50:00"), // s1
      (4L, 10L, "2026-01-01 11:15:00"), // s1
      (5L, 10L, "2026-01-01 11:40:00"), // s1
      (6L, 10L, "2026-01-01 12:00:00"), // EXACTLY at cap (120min): continues
      (7L, 10L, "2026-01-01 12:25:00"), // gap fine but offset 145 > cap -> s2
      (8L, 10L, "2026-01-01 12:55:00"), // EXACTLY 30min gap: continues s2
      (9L, 10L, "2026-01-01 13:30:00"), // 35min gap -> s3
      (10L, 20L, "2026-01-01 10:00:00")) // other key: own s1
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.sessionizeCapped(ev, "user_id", "ts", "event_id", 30, 120)
      .select("event_id", "session_seq").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 1,
      7L -> 2, 8L -> 2, 9L -> 3, 10L -> 1))
  }

  test("ewma applies the sequential recurrence per key in order, keys isolated") {
    val a = 0.5
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", 2.0),
      (2L, 10L, "2026-01-01 11:00:00", 4.0),  // 0.5*4 + 0.5*2 = 3
      (3L, 10L, "2026-01-01 12:00:00", 8.0),  // 0.5*8 + 0.5*3 = 5.5
      (4L, 20L, "2026-01-01 09:00:00", 100.0)) // fresh key restarts state
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.ewma(ev, "user_id", "ts", "event_id", "value", a)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 2.0, 2L -> 3.0, 3L -> 5.5, 4L -> 100.0))
  }

  test("anomalyDays: spike flags, dense zero-fill, lower-median and MAD-0 edges") {
    // 14 calendar days, 10.00/day, one 100.00 spike, one silent day
    val ev = (0 until 14).filter(_ != 5).map { d =>
      (d.toLong, 1L, f"2026-01-${d + 1}%02d 12:00:00",
        if (d == 9) 100.0 else 10.0)
    }.toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val got = Events.anomalyDays(ev, "ts", "value")
      .orderBy("day").collect()
    assert(got.length === 14)
    val byDay = got.map(r => r.getLong(0) - got.head.getLong(0) -> r).toMap
    // the silent day densified to a real 0-cents day
    assert(byDay(5L).getLong(2) === 0L)
    // LOWER median of two samples is the SMALLER: the zero-filled day
    // drags its phase's expectation to 0, so its twin (day 12) reads
    // +1000 while day 5 itself reads 0; the spike phase keeps 1000 so
    // day 9 reads +9000. MAD = lower median of |resid| = 0 -> any
    // nonzero residual flags
    assert(byDay(9L).getLong(4) === 9000L && byDay(9L).getBoolean(6))
    assert(byDay(5L).getLong(4) === 0L && !byDay(5L).getBoolean(6))
    assert(byDay(12L).getLong(4) === 1000L && byDay(12L).getBoolean(6))
    assert(got.count(_.getBoolean(6)) === 2)
    assert(got.forall(_.getLong(5) === 0L))
    graft.engine.Caches.releaseAll()
  }

  test("activeUsers: cover dedup, ramp-in windows, stickiness identity") {
    // user 10 active days 1 and 2; user 20 only day 1; user 30 day 4
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00"), (2L, 10L, "2026-01-01 11:00:00"),
      (3L, 10L, "2026-01-02 10:00:00"),
      (4L, 20L, "2026-01-01 10:00:00"),
      (5L, 30L, "2026-01-04 10:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val got = Events.activeUsers(ev, "user_id", "ts", window = 3)
      .collect().map(r => r.getLong(0) - 20454 ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 2026-01-01 is epoch day 20454; only active days emit: 1, 2, 4
    // day1: dau 2 (u10,u20), wau(trailing 3d) 2; day2: dau 1,
    // wau 2 (u10 once despite two active days, u20 carried);
    // day4: dau 1 (u30), wau 2 (u10 from day2 still covers, u30)
    assert(got === Map(0L -> ((2L, 2L, 1000L)), 1L -> ((1L, 2L, 500L)),
      3L -> ((1L, 2L, 500L))))
  }

  test("dispersionIndex: metronome below 1000, burst above, dense-axis zeros") {
    // 4-day span: user 10 is a metronome (1/day), user 20 bursts all 4
    // events on day 1 (3 silent days zero-filled by the dense axis)
    val ev = (
      (0 until 4).map(d => (d.toLong, 10L, f"2026-01-${d + 1}%02d 12:00:00")) ++
        (4 until 8).map(i => (i.toLong, 20L, "2026-01-01 12:00:00")))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val got = Events.dispersionIndex(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // metronome: variance 0 -> fano 0
    assert(got(10L) === ((4L, 4L, 0L)))
    // burst: counts (4,0,0,0): (4*16 - 16)*1000 div (4*4) = 3000
    assert(got(20L) === ((4L, 4L, 3000L)))
  }

  test("throttleEvents: greedy cadence, inclusive boundary, key isolation") {
    def at(m: Int, sec: Int = 0) =
      f"2026-01-01 10:$m%02d:$sec%02d"
    val ev = Seq(
      (1L, 10L, at(0)),   // kept: first
      (2L, 10L, at(5)),   // dropped: inside 10 min
      (3L, 10L, at(10)),  // kept: exactly at the boundary (>=)
      (4L, 10L, at(19)),  // dropped: 9 min after the 10:10 keep
      (5L, 10L, at(20)),  // kept
      (6L, 20L, at(1)))   // other key: its own first, kept
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
      .select("user_id", "ts", "event_id")
    val got = Events.throttleEvents(ev, "user_id", "ts", "event_id", 600L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> true))
  }

  test("theilSen: exact line recovery, outlier immunity, lower-median convention") {
    def series(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong + 1, x) }.toDF("k", "x")
    // exact line y = 100k: every pairwise slope is 100
    val line = Events.theilSen(series(Seq(100, 200, 300, 400)), "k", "x")
      .collect().head
    assert(line.getLong(0) === 6L && line.getLong(3) === 100000L)
    // one wild outlier: the median pair still reads the clean slope
    val outlier = Events.theilSen(
      series(Seq(100, 200, 300, 1000000, 500)), "k", "x").collect().head
    assert(outlier.getLong(3) === 100000L)
    // two points: the single pair IS the median; negative slope floors
    // through sign*abs, not toward -inf
    val neg = Events.theilSen(series(Seq(10, 3)), "k", "x").collect().head
    assert((neg.getLong(0), neg.getLong(1), neg.getLong(2),
      neg.getLong(3)) === ((1L, -7L, 1L, -7000L)))
    graft.engine.Caches.releaseAll()
  }

  test("rollingSlope: exact line slope, flat zero, partial windows suppressed") {
    // 10 consecutive days, cents = 200/day increments -> slope 200000
    val ev = (0 until 10).map(d =>
      (d.toLong, 1L, f"2026-01-${d + 1}%02d 12:00:00", 2.0 * (d + 1)))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val got = Events.rollingSlope(ev, "ts", "value").orderBy("day").collect()
    // first 6 days suppressed: 10 - 6 full windows
    assert(got.length === 4)
    assert(got.forall(_.getLong(4) === 200000L))
    // den for 7 consecutive days is the constant n·Σ(x-x̄)² = 7·28
    assert(got.forall(_.getLong(3) === 196L))
    // flat series reads exactly zero
    val flat = (0 until 8).map(d =>
      (d.toLong, 1L, f"2026-02-${d + 1}%02d 12:00:00", 5.0))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val z = Events.rollingSlope(flat, "ts", "value").collect()
    assert(z.length === 2 && z.forall(_.getLong(4) === 0L))
  }

  test("pettitt: step series locates the shift, tie-to-earliest, U_n excluded") {
    def series(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong + 1, x) }.toDF("k", "x")
    // clean level shift after k=3: V = (-3,-3,-3,+3,+3,+3),
    // U = -3,-6,-9,-6,-3,(0 excluded) -> split at k=3, U=-9
    val step = Events.pettitt(series(Seq(1, 1, 1, 9, 9, 9)), "k", "x")
      .collect().head
    assert((step.getLong(0), step.getLong(1), step.getLong(2),
      step.getLong(3)) === ((6L, 3L, -9L, 9L)))
    // |U| = 1 at both candidate splits: earliest k wins
    val tie = Events.pettitt(series(Seq(1, 9, 1)), "k", "x")
      .collect().head
    assert((tie.getLong(1), tie.getLong(3)) === ((1L, 1L)))
    // constant series: every U = 0, the earliest split reported
    val const = Events.pettitt(series(Seq(5, 5, 5, 5)), "k", "x")
      .collect().head
    assert(const.getLong(1) === 1L && const.getLong(3) === 0L)
    graft.engine.Caches.releaseAll()
  }

  test("ljungBox: hand single-lag identity, impulse small vs " +
      "alternating large, constant-series fence, lag cap") {
    def ev(key: String, weekly: Seq[Int]) = weekly.zipWithIndex.flatMap {
      case (c, w) => Seq.fill(c)((key,
        java.sql.Timestamp.valueOf(s"1970-01-${1 + 7 * w} 10:00:00"))) }
    def run(rows: Seq[(String, java.sql.Timestamp)], m: Int) =
      Events.ljungBox(rows.toDF("k", "ts"), "k", "ts", m)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // alternating [2,0,2,0,2]: rho1 = -96/120, Q1 milli =
    // (96^2*1000*35) div (4*120^2) = 5600 (the n(n+2)rho^2/(n-1) hand
    // identity, milli-truncated with the folded divisor)
    val alt = run(ev("a", Seq(2, 0, 2, 0, 2)), 1)
    assert(alt("a") === ((5L, 1L, 5600L)))
    // two far-apart impulses (the series densifies only between
    // observed buckets, so both ends anchor): small Q
    // rho1 = -4/30 -> t = (16*1000*35) div (4*900) = 155
    val imp = run(ev("b", Seq(1, 0, 0, 0, 1)), 1)
    assert(imp("b")._3 === 155L && imp("b")._3 < alt("a")._3)
    // constant series: zero variance -> fenced NULL
    val const = run(ev("c", Seq(1, 1, 1, 1)), 1)
    assert(const("c")._3 === -1L)
    // lags >= n drop: n = 3 weeks, maxLag 4 -> only 2 usable lags
    val cap = run(ev("d", Seq(2, 0, 1)), 4)
    assert(cap("d")._1 === 3L && cap("d")._2 === 2L)
    graft.engine.Caches.releaseAll()
  }

  test("burstiness: periodic -1000, hand two-gap, bursty positive, " +
      "degenerate fences") {
    def ev(rows: Seq[(Long, Int)]) = rows.zipWithIndex.map {
      case ((u, sec), i) => (u,
        java.sql.Timestamp.valueOf(f"2026-01-01 10:${sec / 60}%02d:" +
          f"${sec % 60}%02d"), i.toLong) }.toDF("u", "ts", "tie")
    // perfectly periodic: sigma = 0 -> B = -1000 exactly
    val per = Events.burstiness(ev((0 to 4).map(s => (1L, s))),
      "u", "ts", "tie").collect().head
    assert(per.getLong(0) === 4L && per.getLong(2) === -1000L)
    // gaps {1s, 3s}: B = (2e6-4e6)/(2e6+4e6) = -1/3 -> floor -334
    val two = Events.burstiness(ev(Seq((1L, 0), (1L, 1), (1L, 4))),
      "u", "ts", "tie").collect().head
    assert(two.getLong(0) === 2L &&
      two.getLong(1) === 2000000L && two.getLong(2) === -334L)
    // bursty: three tight gaps then a 97s silence — positive B
    // (B is bounded by (sqrt(n-1)-1)/(sqrt(n-1)+1) ~ 0.27 at n=4)
    val b = Events.burstiness(
      ev(Seq((1L, 0), (1L, 1), (1L, 2), (1L, 3), (1L, 100))),
      "u", "ts", "tie").collect().head
    assert(b.getLong(2) === 248L)
    // single-event users contribute no gaps; one gap is not enough
    val one = Events.burstiness(ev(Seq((1L, 0), (1L, 5), (2L, 0),
      (3L, 0))), "u", "ts", "tie").collect().head
    assert(one.getLong(0) === 1L && one.isNullAt(2))
    // all-simultaneous: sigma = mu = 0 -> NULL
    val zero = Events.burstiness(ev(Seq((1L, 0), (1L, 0), (1L, 0))),
      "u", "ts", "tie").collect().head
    assert(zero.getLong(0) === 2L && zero.isNullAt(2))
    graft.engine.Caches.releaseAll()
  }

  test("circadianProfile: single-hour zero, two-hour ln2, flat-clock " +
      "maximum, peak tie rule") {
    def ev(hours: Seq[Int]) = hours.zipWithIndex.map { case (h, i) =>
      ("k", java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00"),
        i.toLong) }.toDF("key", "ts", "id")
    val mono = Events.circadianProfile(ev(Seq(10, 10, 10)), "key", "ts")
      .collect().head
    assert((mono.getLong(1), mono.getLong(2), mono.getLong(3),
      mono.getInt(4), mono.getLong(5)) === ((3L, 1L, 0L, 10, 1000L)))
    // two equal hours: 2 * floor(0.5 * ln 2 * 1e6); peak tie -> hour 3
    val two = Events.circadianProfile(ev(Seq(3, 3, 7, 7)), "key", "ts")
      .collect().head
    assert(two.getLong(3) ===
      2L * math.floor(0.5 * math.log(2.0) * 1000000.0).toLong)
    assert(two.getInt(4) === 3 && two.getLong(5) === 500L)
    // flat clock: maximum entropy 24 * floor(ln(24)/24 * 1e6)
    val flat = Events.circadianProfile(ev(0 until 24), "key", "ts")
      .collect().head
    assert(flat.getLong(2) === 24L)
    assert(flat.getLong(3) ===
      24L * math.floor(math.log(24.0) / 24.0 * 1000000.0).toLong)
    assert(flat.getInt(4) === 0) // all tie -> earliest hour
    graft.engine.Caches.releaseAll()
  }

  test("kneePoint: hand unit elbow, tie to earliest, collinear zero, " +
      "too-short empty") {
    def series(xs: Seq[(Long, Long)]) = xs.toDF("k", "x")
    // L-shaped curve: flat then rising — the corner (2, 0) is the knee
    // chord (0,0)->(4,20): cross at k=2: 4*(0-0) - 20*(2-0) = -40
    val got = Events.kneePoint(series(Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (3L, 10L), (4L, 20L))), "k", "x").collect().head
    assert((got.getLong(0), got.getLong(3), got.getLong(4))
      === ((5L, 2L, 40L)))
    // symmetric V: both interior points tie on |cross| -> earliest k
    val tie = Events.kneePoint(series(Seq((0L, 10L), (1L, 0L),
      (2L, 0L), (3L, 10L))), "k", "x").collect().head
    assert(tie.getLong(3) === 1L)
    // collinear: every cross 0, earliest interior point reported
    val line = Events.kneePoint(series(Seq((0L, 0L), (1L, 5L),
      (2L, 10L))), "k", "x").collect().head
    assert(line.getLong(3) === 1L && line.getLong(4) === 0L)
    // n <= 2: no interior point, zero rows
    assert(Events.kneePoint(series(Seq((0L, 1L), (9L, 5L))), "k", "x")
      .collect().isEmpty)
    graft.engine.Caches.releaseAll()
  }

  test("cohensD: hand 7.07-sigma pair, floor antisymmetry, " +
      "zero-variance fence, Hedges shrinkage") {
    // a = {0, 2}, b = {10, 12} dollars: pooled sd = 1.4142..., mean
    // diff -10 -> d = -7.0710678
    val df = Seq((true, 0.0), (true, 2.0), (false, 10.0), (false, 12.0))
      .toDF("g", "y")
    val r = Events.cohensD(df, "y", "g").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getLong(2) === -7071068L)
    assert(r.getLong(3) === -4040610L) // g = d * 4/7 at N=4
    assert(math.abs(r.getLong(3)) < math.abs(r.getLong(2))) // shrinkage
    // swapped groups: same magnitude up to the floor asymmetry
    val sw = Events.cohensD(df.withColumn("g", !col("g")), "y", "g")
      .collect().head
    assert(sw.getLong(2) === 7071067L && sw.getLong(3) === 4040609L)
    // both groups constant: zero pooled variance -> fenced NULL
    val flat = Events.cohensD(Seq((true, 5.0), (true, 5.0),
      (false, 7.0), (false, 7.0)).toDF("g", "y"), "y", "g")
      .collect().head
    assert(flat.isNullAt(2) && flat.isNullAt(3))
    graft.engine.Caches.releaseAll()
  }

  test("durbinWatson: alternating hand value, convex positive " +
      "autocorrelation, perfect-line fence, single-point fence") {
    def series(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k", "x")
    // alternating 0/10 over 6 points: E = (-1800, 3960, -2880, 2880,
    // -3960, 1800), sum E^2 = 54432000, sum dE^2 = 193104000 ->
    // dw_milli = 3547 (near 4: alternation)
    val alt = Events.durbinWatson(series(Seq(0, 10, 0, 10, 0, 10)),
      "k", "x").collect().head
    assert(alt.getLong(0) === 6L && alt.getLong(1) === 3547L)
    // convex curve: residuals positively autocorrelated, DW below the
    // independence value 2.0 (measured 1071 milli on this 6-pointer)
    val convex = Events.durbinWatson(
      series(Seq(0, 1, 4, 9, 16, 25)), "k", "x").collect().head
    assert(convex.getLong(1) === 1071L)
    // perfect line: every residual 0 -> fenced NULL
    val line = Events.durbinWatson(series(Seq(3, 5, 7, 9)), "k", "x")
      .collect().head
    assert(line.isNullAt(1))
    // single point: undefined
    assert(Events.durbinWatson(series(Seq(42)), "k", "x")
      .collect().head.isNullAt(1))
    graft.engine.Caches.releaseAll()
  }

  test("bollingerFlags: hand spike/drop, constant window inside, " +
      "warm-up exclusion, exact-boundary inside") {
    def series(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k", "x")
    // win 3, k 1: the spike day breaks +1, the dip day -1, constant
    // windows and spike-inflated-sigma windows stay 0
    val got = Events.bollingerFlags(
      series(Seq(10, 10, 10, 10, 100, 10, 10, 10, 4)), "k", "x",
      win = 3, kSigma = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got.size === 7)          // warm-up: first win-1 rows absent
    assert(!got.contains(0L) && !got.contains(1L))
    assert(got(2L) === 0 && got(3L) === 0) // constant windows: d = 0
    assert(got(4L) === 1)                  // the spike breaks out high
    assert(got(5L) === 0 && got(6L) === 0) // sigma inflated by the spike
    assert(got(8L) === -1)                 // the dip breaks out low
    // every win=2, k=1 window sits EXACTLY on the band (d^2 = rhs):
    // strict compare keeps it inside
    val edge = Events.bollingerFlags(series(Seq(3, 9, 1)), "k", "x",
      win = 2, kSigma = 1).collect().map(_.getInt(3))
    assert(edge.toSeq === Seq(0, 0))
    graft.engine.Caches.releaseAll()
  }

  test("mannKendall: monotone extremes, flat zero-variance fence, " +
      "hand tie variance, single-point fence") {
    def series(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k", "x")
    def z(s: Long, var18: Long): Long =
      math.floor((s - math.signum(s.toDouble)) * 1000000.0 /
        math.sqrt(var18.toDouble / 18.0)).toLong
    // strictly increasing: S = n(n-1)/2, no ties
    val up = Events.mannKendall(series(Seq(1, 2, 3, 4, 5)), "k", "x")
      .collect().head
    assert((up.getLong(0), up.getLong(1), up.getLong(2))
      === ((5L, 10L, 300L)))
    assert(up.getLong(3) === z(10L, 300L))
    // strictly decreasing mirrors through the continuity correction
    val dn = Events.mannKendall(series(Seq(5, 4, 3, 2, 1)), "k", "x")
      .collect().head
    assert(dn.getLong(1) === -10L && dn.getLong(3) === z(-10L, 300L))
    // flat series: every pair tied, var18 = 0 -> fenced NULL
    val flat = Events.mannKendall(series(Seq(7, 7, 7, 7, 7)), "k", "x")
      .collect().head
    assert(flat.getLong(1) === 0L && flat.getLong(2) === 0L &&
      flat.isNullAt(3))
    // hand tie variance: [1,1,2] -> S=2, tt=18, var18 = 66-18 = 48
    val tie = Events.mannKendall(series(Seq(1, 1, 2)), "k", "x")
      .collect().head
    assert((tie.getLong(1), tie.getLong(2)) === ((2L, 48L)))
    assert(tie.getLong(3) === z(2L, 48L))
    // single point: no pairs, var18 = 0
    val one = Events.mannKendall(series(Seq(3)), "k", "x").collect().head
    assert(one.getLong(1) === 0L && one.isNullAt(3))
    graft.engine.Caches.releaseAll()
  }

  test("pettittEvents: hand step series, series-operator equivalence, " +
      "tie-to-earliest, band invariance") {
    def ev(xs: Seq[Double]) = xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Timestamp.valueOf(f"2026-01-01 10:${i}%02d:00"),
        i.toLong, x) }.toDF("ts", "tie", "v")
    // clean level shift: V = (-3,-3,-3,+3,+3,+3), U = -3,-6,-9,-6,-3
    val step = Events.pettittEvents(ev(Seq(1, 1, 1, 9, 9, 9)
      .map(_.toDouble)), "ts", "tie", "v").collect().head
    assert((step.getLong(0), step.getLong(2), step.getLong(3),
      step.getLong(4)) === ((6L, 2L, -9L, 9L)))
    assert(step.getTimestamp(1) ===
      java.sql.Timestamp.valueOf("2026-01-01 10:02:00"))
    // tie in |U|: earliest (ts, tie) wins — mirrors the series op
    val tie = Events.pettittEvents(ev(Seq(1.0, 9.0, 1.0)),
      "ts", "tie", "v").collect().head
    assert(tie.getLong(2) === 0L && tie.getLong(3) === -1L &&
      tie.getLong(4) === 1L)
    assert(tie.getTimestamp(1) ===
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))
    // equivalence with the O(n^2) series operator on a mixed series
    // (integer values: the series op takes raw longs, this one cents)
    val xs = Seq(3.0, 7.0, 3.0, 1.0, 9.0, 9.0, 2.0, 8.0, 1.0, 6.0,
      6.0, 4.0)
    val fromSeries = Events.pettitt(
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x.toLong) }
        .toDF("k", "x"), "k", "x").collect().head
    val fromEvents = Events.pettittEvents(ev(xs), "ts", "tie", "v")
      .collect().head
    assert(fromEvents.getLong(2) === fromSeries.getLong(1)) // same split
    assert(fromEvents.getLong(3) === fromSeries.getLong(2))
    assert(fromEvents.getLong(4) === fromSeries.getLong(3))
    // banding is an implementation detail: 1 band == 32 bands == 7
    for (b <- Seq(1, 7)) {
      val alt = Events.pettittEvents(ev(xs), "ts", "tie", "v", bands = b)
        .collect().head
      assert(alt.getLong(2) === fromEvents.getLong(2) &&
        alt.getLong(3) === fromEvents.getLong(3))
    }
    graft.engine.Caches.releaseAll()
  }

  test("saxWords: quartile hand symbols, constant-series 'a' run, tie order") {
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", 1.0),
      (2L, 10L, "2026-01-01 11:00:00", 2.0),
      (3L, 10L, "2026-01-01 12:00:00", 3.0),
      (4L, 10L, "2026-01-01 13:00:00", 4.0),
      // constant series: zero variance reads all-'a'
      (5L, 20L, "2026-01-01 10:00:00", 7.0),
      (6L, 20L, "2026-01-01 11:00:00", 7.0),
      // same-instant rows: event_id breaks the tie
      (8L, 30L, "2026-01-01 10:00:00", 9.0),
      (7L, 30L, "2026-01-01 10:00:00", 1.0))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val got = Events.saxWords(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // 1,2,3,4: z quartiles land one value per symbol
    assert(got(10L) === ((4L, "abcd")))
    assert(got(20L) === ((2L, "aa")))
    // id 7 (low) precedes id 8 (high) at the tied instant
    assert(got(30L) === ((2L, "ad")))
  }

  test("holtLinear: hand recursion, key reset, line tracking to the slope") {
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", 4.0),
      (2L, 10L, "2026-01-01 11:00:00", 8.0),
      // l2 = .25*8 + .75*4 = 5; b2 = .5*(5-4) = 0.5
      (3L, 20L, "2026-01-01 09:00:00", 100.0)) // fresh key: l=v, b=0
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.holtLinear(ev, "user_id", "ts", "event_id", "value")
      .select("event_id", "level", "trend")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((4.0, 0.0)))
    assert(out(2L) === ((5.0, 0.5)))
    assert(out(3L) === ((100.0, 0.0)))
    // pure line v = t: the recursion converges toward level = v,
    // trend = slope; assert bit-equality against a Scala replay
    val n = 40
    val line = (1 to n).map(i =>
      (i.toLong, 7L, f"2026-01-01 ${9 + i / 60}%02d:${i % 60}%02d:00",
        i.toDouble)).toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val got = Events.holtLinear(line, "user_id", "ts", "event_id", "value")
      .select("event_id", "level", "trend")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    var l = 1.0; var b = 0.0
    val replay = (1 to n).map { i =>
      if (i > 1) {
        val lNew = 0.25 * i + 0.75 * (l + b)
        b = 0.5 * (lNew - l) + 0.5 * b
        l = lNew
      }
      (i.toLong, l, b)
    }
    assert(got.toSeq === replay)
    assert(math.abs(got.last._3 - 1.0) < 0.01 &&
      math.abs(got.last._2 - n) < 0.1)
  }

  test("holtBacktest: hand errors, negative bias sign-routing, single-row keys excluded") {
    // key 10: values 4, 8, 6 (alpha .25, beta .5)
    //  t2: forecast = 4+0 = 4, e = 4 -> l=5 b=.5
    //  t3: forecast = 5.5, e = .5
    //  mae = (4000+500)/2 = 2250; bias = (4000+500)/2 = 2250
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", 4.0),
      (2L, 10L, "2026-01-01 11:00:00", 8.0),
      (3L, 10L, "2026-01-01 12:00:00", 6.0),
      (4L, 20L, "2026-01-01 09:00:00", 99.0)) // single row: no eval
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.holtBacktest(ev, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(10L -> ((2L, 2250L, 2250L))))
    // negative bias routes through sign-abs: values 8, 4 -> e = -4
    val neg = Seq((1L, 30L, "2026-01-01 10:00:00", 8.0),
      (2L, 30L, "2026-01-01 11:00:00", 4.0))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val n = Events.holtBacktest(neg, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Long)].collect().head
    assert(n === ((30L, 1L, 4000L, -4000L)))
  }

  test("holtWinters: hand recursion with seasonal ring, key reset, period-1 degenerate") {
    // period 2, alpha .25, beta .5, gamma .25; key 10: rows 4, 8, 6
    //  t=0: l=4 b=0 s[0]=0 (emitted 0)
    //  t=1: sOld=s[1]=0; l=.25*8+.75*4=5; b=.5*1=.5; s[1]=.25*(8-5)=.75
    //  t=2: sOld=s[0]=0; l=.25*6+.75*5.5=5.625; b=.5*.625+.5*.5=.5625;
    //       s[0]=.25*(6-5.625)=.09375
    val ev = Seq(
      (1L, 10L, 4.0), (2L, 10L, 8.0), (3L, 10L, 6.0),
      (4L, 20L, 100.0)) // fresh key: l=v, b=0, zero ring
      .toDF("event_id", "user_id", "value")
    val out = Events.holtWinters(ev, "user_id", "event_id", "value", 2)
      .select("event_id", "level", "trend", "seasonal")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((4.0, 0.0, 0.0)))
    assert(out(2L) === ((5.0, 0.5, 0.75)))
    assert(out(3L) === ((5.625, 0.5625, 0.09375)))
    assert(out(4L) === ((100.0, 0.0, 0.0)))
    // period 1: the single slot is s_{t-1} — still a well-defined fold;
    // assert bit-equality against a Scala replay
    val n = 20
    val series = (1 to n).map(i => (i.toLong, 7L, (i % 5 + 1).toDouble))
      .toDF("event_id", "user_id", "value")
    val got = Events.holtWinters(series, "user_id", "event_id", "value", 1)
      .select("event_id", "level", "trend", "seasonal")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    var l = 2.0; var b = 0.0; var s = 0.0
    val replay = (1 to n).map { i =>
      val v = (i % 5 + 1).toDouble
      if (i > 1) {
        val lNew = 0.25 * (v - s) + 0.75 * (l + b)
        b = 0.5 * (lNew - l) + 0.5 * b
        s = 0.25 * (v - lNew) + 0.75 * s
        l = lNew
      }
      (i.toLong, l, b, s)
    }
    assert(got.toSeq === replay)
  }

  test("interpolateLinear: line between brackets, edge fill both directions, keys isolated") {
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", Some(2.0)),
      (2L, 10L, "2026-01-01 11:00:00", None),       // 1/3 of the way 10:00->13:00
      (3L, 10L, "2026-01-01 13:00:00", Some(8.0)),  // => 2 + 6*(1/3) = 4
      (4L, 10L, "2026-01-01 14:00:00", None),       // trailing -> hold 8
      (5L, 20L, "2026-01-01 09:00:00", None),       // leading -> backfill 50
      (6L, 20L, "2026-01-01 10:00:00", Some(50.0)))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.interpolateLinear(ev, "user_id", "ts", "event_id", "value")
      .select("event_id", "filled").as[(Long, Double)].collect().toMap
    assert(out(1L) === 2.0 && out(3L) === 8.0)
    assert(out(2L) === 4.0, s"interpolated ${out(2L)}")
    assert(out(4L) === 8.0 && out(5L) === 50.0 && out(6L) === 50.0)
    // an all-null key stays null
    val allNull = Seq((7L, 30L, "2026-01-01 10:00:00", Option.empty[Double]))
      .toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    assert(Events.interpolateLinear(allNull, "user_id", "ts", "event_id", "value")
      .filter(col("filled").isNull).count() === 1)
  }

  test("quantileBucketize: ties to the lower bucket, keys isolated, probs validated") {
    // key A: values 1..4 — quartile boundaries 1.75/2.5/3.25 (linear
    // interpolation); key B shifted by 100 must bin independently
    val ev = (1L to 4L).map(i => (i, "A", i.toDouble)) ++
      (5L to 8L).map(i => (i, "B", (i - 4).toDouble + 100))
    val df = ev.toDF("event_id", "event_type", "value")
    val out = Events.quantileBucketize(df, "event_type", "value",
        Seq(0.25, 0.5, 0.75))
      .select("event_id", "bucket").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3,
      5L -> 0, 6L -> 1, 7L -> 2, 8L -> 3))
    // a value EQUAL to a boundary sits in the lower bucket (strict >)
    val tie = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0))
      .toDF("event_id", "event_type", "value")
    val tied = Events.quantileBucketize(tie, "event_type", "value", Seq(0.5))
      .select("event_id", "bucket").as[(Long, Int)].collect().toMap
    assert(tied === Map(1L -> 0, 2L -> 0, 3L -> 1)) // median 2.0: the 2.0 row stays low
    intercept[IllegalArgumentException](
      Events.quantileBucketize(df, "event_type", "value", Seq(0.75, 0.25)))
    intercept[IllegalArgumentException](
      Events.quantileBucketize(df, "event_type", "value", Seq.empty))
    // duplicated prob → duplicated boundary → a bucket id silently
    // skipped; rejected up front (strict monotonicity, r9 advice)
    intercept[IllegalArgumentException](
      Events.quantileBucketize(df, "event_type", "value", Seq(0.5, 0.5)))
  }

  test("gaps: silences over the threshold only, keys isolated, duplicate ts safe") {
    val ev = Seq(
      (1L, 10L, "2026-01-01 00:00:00"),
      (2L, 10L, "2026-01-01 00:20:00"),  // 20 min — under
      (3L, 10L, "2026-01-01 02:20:00"),  // 120 min — gap
      (4L, 10L, "2026-01-01 02:20:00"),  // duplicate ts — gap 0, never a silence
      (5L, 20L, "2026-01-01 00:00:00"),
      (6L, 20L, "2026-01-02 00:00:00"))  // 24h — gap (key isolated)
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = Events.gaps(ev, "user_id", "ts", gapMinutes = 30,
        orderTiebreak = "event_id")
      .select("user_id", "gap_seconds").as[(Long, Long)].collect().sorted
    assert(out === Seq((10L, 7200L), (20L, 86400L)))
    // threshold is strict: exactly-30-min spacing is not a silence
    val edge = Seq((1L, 1L, "2026-01-01 00:00:00"), (2L, 1L, "2026-01-01 00:30:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    assert(Events.gaps(edge, "user_id", "ts", 30, "event_id").isEmpty)
    intercept[IllegalArgumentException](Events.gaps(ev, "user_id", "ts", 0, "event_id"))
  }

  test("growthAccounting: new/retained/churned/resurrected bookkeeping; churn-only day emitted") {
    // u1: days 1,2,4 (new d1, retained d2, churned d3, resurrected d4)
    // u2: day 2 only (new d2, churned d3)
    val ev = Seq((1L, 1L, "2026-03-01 10:00:00"), (2L, 1L, "2026-03-02 09:00:00"),
      (3L, 1L, "2026-03-04 08:00:00"), (4L, 2L, "2026-03-02 23:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.growthAccounting(ev, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("2026-03-01") === ((1L, 1L, 0L, 0L)))
    assert(got("2026-03-02") === ((2L, 1L, 1L, 0L)))
    // March 3: nobody active — the churn-only day still emits a row
    assert(got("2026-03-03") === ((0L, 0L, 0L, 2L)))
    // March 4: u1 resurrects (active but neither new nor retained)
    assert(got("2026-03-04") === ((1L, 0L, 0L, 0L)))
    // March 5: u1 churns off the end
    assert(got("2026-03-05") === ((0L, 0L, 0L, 1L)))
    // the identity: active = new + retained + resurrected each day
    got.values.foreach { case (a, n, r, _) => assert(a >= n + r) }
  }

  test("growthAccounting on harness events: the DAU identity holds corpus-wide") {
    val ev = graft.engine.Tables(spark, sfDir, "events")
    val rows = Events.growthAccounting(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // active >= new + retained (the difference is resurrected, never
    // negative); total new across all days = distinct users
    rows.foreach { case (a, n, r, _) => assert(a >= n + r) }
    assert(rows.map(_._2).sum ===
      ev.select("user_id").distinct().count())
    // total churn = total resurrections + users inactive on the final
    // active day (every activity span that ENDS is a churn event)
    graft.engine.Caches.releaseAll()
  }

  test("funnelWindowed: deadline inclusive at the bound, measured from the greedy anchor") {
    def ev(rows: Seq[(Long, Long, String, Int)]) = rows
      .toDF("event_id", "user_id", "event_type", "m")
      .withColumn("ts", to_timestamp(
        concat(lit("2026-01-01 "), format_string("%02d", col("m")),
          lit(":00:00")))).drop("m")
    // u1 converts exactly AT the 2h deadline (inclusive); u2 misses by
    // an hour; u3 would convert from a LATER signup but the greedy
    // anchor is the FIRST signup — strict semantics exclude it
    val e = ev(Seq(
      (1L, 1L, "signup", 1), (2L, 1L, "purchase", 3),
      (3L, 2L, "signup", 1), (4L, 2L, "purchase", 4),
      (5L, 3L, "signup", 1), (6L, 3L, "signup", 9), (7L, 3L, "purchase", 10)))
    val got = Events.funnelWindowed(e, "user_id", "ts", "event_type",
        Seq("signup", "purchase"), maxGapMinutes = 120)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(0 -> 3L, 1 -> 1L))
    // the unconstrained funnel counts u2 and u3 as well
    val base = Events.funnel(e, "user_id", "ts", "event_type",
        Seq("signup", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(base === Map(0 -> 3L, 1 -> 3L))
  }

  test("quantileNormalize: rank-map selection from the reference; ties by tiebreak") {
    val in = Seq((1L, 30.0), (2L, 10.0), (3L, 20.0)).toDF("id", "v")
    val ref = (1L to 6L).map(i => (i, i * 100.0)).toDF("rid", "rv")
    val got = Events.quantileNormalize(in, "id", "v", ref, "rv", "rid")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // ranks by value: id2=1, id3=2, id1=3 -> ref indices 1, 3, 5
    assert(got(2L) === ((10.0, 100.0)))
    assert(got(3L) === ((20.0, 300.0)))
    assert(got(1L) === ((30.0, 500.0)))
    // tied values order by the tiebreak id: deterministic map
    val tied = Seq((7L, 5.0), (6L, 5.0)).toDF("id", "v")
    val r2 = (1L to 2L).map(i => (i, i * 1.0)).toDF("rid", "rv")
    val t = Events.quantileNormalize(tied, "id", "v", r2, "rv", "rid")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(t === Map(6L -> 1.0, 7L -> 2.0))
    graft.engine.Caches.releaseAll()
  }

  test("twap: holding-time weights beat sample counts; zero-span nulls; last obs bounds") {
    def mk(rows: Seq[(Long, Long, Int, Double)]) = rows
      .toDF("event_id", "user_id", "m", "value")
      .withColumn("ts", to_timestamp(
        concat(lit("2026-01-01 00:"), format_string("%02d", col("m")),
          lit(":00")))).drop("m")
    // u1: value 100 held 10 min, then a BURST of five 200-readings over
    // 1 min each, end at min 15 — plain avg is dominated by the burst
    // (183), twap is not (~133)
    val ev = mk(Seq((1L, 1L, 0, 100.0)) ++
      (0 until 5).map(i => (2L + i, 1L, 10 + i, 200.0)) :+ (7L, 1L, 15, 0.0))
    val r = Events.twap(ev, "user_id", "ts", "value", "event_id")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // num = 10000c*600s + 20000c*60s*5 = 12_000_000; sec = 900
    assert(r(1L) === ((12000000L, 900L, 12000000.0 / 900.0 / 100.0)))
    // all observations at one instant: zero holding time -> null twap
    val same = mk(Seq((1L, 2L, 5, 10.0), (2L, 2L, 5, 20.0)))
    val z = Events.twap(same, "user_id", "ts", "value", "event_id").collect()
    assert(z.length === 1 && z.head.getLong(2) === 0L && z.head.isNullAt(3))
    // a single observation has no span at all: no row
    assert(Events.twap(mk(Seq((1L, 3L, 1, 5.0))), "user_id", "ts", "value",
      "event_id").isEmpty)
  }

  test("cooccurrence: distinct-key weighting, pair ordering, single-item keys") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),   // duplicate (1, a): still weight 1
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "c"))                          // single item: no pairs
      .toDF("user_id", "event_type")
    val got = Events.cooccurrence(df, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
    graft.engine.Caches.releaseAll()
  }

  test("conversionLag: greedy-earliest pair, pre-from events ignored, same-instant is 0") {
    val ev = Seq(
      (1L, 1L, "purchase", 5),  // BEFORE signup: ignored
      (2L, 1L, "signup", 10), (3L, 1L, "purchase", 25), (4L, 1L, "purchase", 40),
      (5L, 2L, "signup", 10),   // never converts: no row
      (6L, 3L, "signup", 10), (7L, 3L, "purchase", 10)) // same instant: lag 0
      .toDF("event_id", "user_id", "event_type", "m")
      .withColumn("ts", to_timestamp(
        concat(lit("2026-01-01 00:"), col("m"), lit(":00")))).drop("m")
    val got = Events.conversionLag(ev, "user_id", "ts", "event_type",
        "signup", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 900L, 3L -> 0L)) // 15 min = 900s
  }

  test("journeys: ordered per key with tiebreak; regex cohorts; single-event keys") {
    val ev = Seq(
      (1L, 1L, "signup", 10), (2L, 1L, "view", 20), (3L, 1L, "purchase", 30),
      (4L, 2L, "view", 10), (5L, 2L, "signup", 20),
      (6L, 3L, "view", 10))
      .toDF("event_id", "user_id", "event_type", "m")
      .withColumn("ts", to_timestamp(
        concat(lit("2026-01-01 00:"), col("m"), lit(":00")))).drop("m")
    val got = Events.journeyMatch(ev, "user_id", "ts", "event_type",
        "event_id", "signup.*purchase")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(got(1L) === (("signup>view>purchase", true)))
    assert(got(2L) === (("view>signup", false))) // order matters
    assert(got(3L) === (("view", false)))        // single-event key
    // same-ts events order by the tiebreak column
    val tie = Seq((2L, 9L, "b"), (1L, 9L, "a"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
    assert(Events.journeys(tie, "user_id", "ts", "event_type", "event_id")
      .collect().head.getString(1) === "a>b")
    // consecutive-repeat pattern: exactly the 3-in-a-row key matches
    val reps = Seq((1L, 1L, "e"), (2L, 1L, "e"), (3L, 1L, "e"),
      (4L, 2L, "e"), (5L, 2L, "x"), (6L, 2L, "e"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    val r = Events.journeyMatch(reps, "user_id", "ts", "event_type",
        "event_id", "(e>){2}e")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r === Map(1L -> true, 2L -> false))
  }

  test("cusumDaily: recovers an injected level shift; flat series all-zero; gaps are real days") {
    def mk(vals: Seq[(Int, Double)]) = vals.map { case (d, v) =>
      (d.toLong, f"2026-01-${d + 1}%02d 12:00:00", v)
    }.toDF("event_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    // 100/day for days 1..10, 200/day for 11..20: the last day of the
    // first regime (Jan 10) uniquely holds the peak |S|
    val shifted = mk((0 until 20).map(d => (d, if (d < 10) 100.0 else 200.0)))
    val got = Events.cusumDaily(shifted, "ts", "value").orderBy("day").collect()
    assert(got.filter(_.getBoolean(3)).map(_.getDate(0).toString)
      === Array("2026-01-10"))
    // exact scaled value: N=20, prefix=100000, idx=10, T=300000
    assert(got.find(_.getDate(0).toString == "2026-01-10").get
      .getLong(2) === -1000000L)
    // flat series: every deviation is zero, so every day ties at the
    // "peak" — the documented no-changepoint signature
    val flat = Events.cusumDaily(mk((0 until 5).map((_, 42.0))), "ts", "value")
      .collect()
    assert(flat.forall(r => r.getLong(2) === 0L && r.getBoolean(3)))
    // a calendar gap densifies to a real 0-cents day
    val g = Events.cusumDaily(mk(Seq((0, 100.0), (2, 100.0))), "ts", "value")
      .orderBy("day").collect()
    assert(g.length === 3 && g(1).getLong(1) === 0L)
  }

  test("transitions: hand matrix, key isolation, tiebreak determinism, milli floor") {
    // u1: a -> b -> a -> a ; u2: b -> a ; u3: single event (no pairs)
    val ev = Seq(
      (1L, 1L, "a", 10), (2L, 1L, "b", 20), (3L, 1L, "a", 30), (4L, 1L, "a", 40),
      (5L, 2L, "b", 10), (6L, 2L, "a", 20),
      (7L, 3L, "a", 10))
      .toDF("event_id", "user_id", "event_type", "m")
      .withColumn("ts", to_timestamp(
        concat(lit("2026-01-01 00:"), col("m"), lit(":00")))).drop("m")
    val got = Events.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from a: a->b (u1) and a->a (u1): 1 each of 2 -> 500 milli
    assert(got(("a", "b")) === ((1L, 500L)))
    assert(got(("a", "a")) === ((1L, 500L)))
    // from b: b->a twice (u1, u2), the only exits -> 1000 milli
    assert(got(("b", "a")) === ((2L, 1000L)))
    // no pair bridges users (u2's last event never chains into u3)
    assert(got.size === 3)
    // tiebreak: same-ts events order by event_id, so the pair flips if
    // the tiebreak column were ignored
    val tie = Seq((1L, 1L, "x"), (2L, 1L, "y"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
    val t2 = Events.transitions(tie, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(t2 === Seq(("x", "y")))
    // milli floor: 1 of 3 exits -> 333, never rounded up
    // p,q,p,r,p,s: from p the exits are q, r, s — one each of three
    val third = Seq((1L, 1L, "p"), (2L, 1L, "q"), (3L, 1L, "p"),
      (4L, 1L, "r"), (5L, 1L, "p"), (6L, 1L, "s"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    val t3 = Events.transitions(third, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(t3(("p", "q")) === 333L && t3(("p", "r")) === 333L &&
      t3(("p", "s")) === 333L && t3(("q", "p")) === 1000L)
  }

  test("growthAccounting(withResurrected): explicit leg makes the identity exact") {
    // same fixture as the base test: u1 resurrects on day 4
    val ev = Seq((1L, 1L, "2026-03-01 10:00:00"), (2L, 1L, "2026-03-02 09:00:00"),
      (3L, 1L, "2026-03-04 08:00:00"), (4L, 2L, "2026-03-02 23:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.growthAccounting(ev, "user_id", "ts", withResurrected = true)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("2026-03-01") === ((1L, 1L, 0L, 0L, 0L)))
    assert(got("2026-03-04") === ((1L, 0L, 0L, 0L, 1L))) // the resurrection
    assert(got("2026-03-03") === ((0L, 0L, 0L, 2L, 0L))) // churn-only day: res 0
    // the identity holds EXACTLY (not >=) with the explicit leg
    got.values.foreach { case (a, n, r, _, z) => assert(a === n + r + z) }
    // and corpus-wide on harness events — the leg is computed
    // independently, so equality is a real check, not an echo
    val rows = Events.growthAccounting(graft.engine.Tables(spark, sfDir, "events"),
        "user_id", "ts", withResurrected = true)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, n, r, z) => assert(a === n + r + z) }
    graft.engine.Caches.releaseAll()
  }

  test("seasonalIndices: recovers an injected weekly pattern; endpoints excluded; constant series is flat") {
    // 21 days from a Thursday (1970-01-01): value = 100 + boost on
    // phase 2; the additive decomposition must surface the boost spread
    // as +boost·6/7 on phase 2 and −boost/7 elsewhere (centered MA
    // absorbs boost/7 into the trend of every full window)
    def mkDays(vals: Int => Double) = (0 until 21).map { d =>
      (d.toLong, f"1970-01-${d + 1}%02d 12:00:00", vals(d))
    }.toDF("event_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val boosted = mkDays(d => if (d % 7 == 2) 170.0 else 100.0)
    val got = Events.seasonalIndices(boosted, "ts", "value")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    // full windows: days 3..17 -> 15 rows; phases 3..6 have n=2, 0..2 n=3
    assert(got.map(_._1).toSeq === (0 to 6))
    assert(got.map(_._2).sum === 15L)
    val byPhase = got.map(g => g._1 -> g._3).toMap
    assert(math.abs(byPhase(2) - 70.0 * 6 / 7) < 1e-9)
    (0 to 6).filter(_ != 2).foreach(p =>
      assert(math.abs(byPhase(p) + 70.0 / 7) < 1e-9, s"phase $p: $byPhase"))
    // constant series: every seasonal index exactly 0
    val flat = Events.seasonalIndices(mkDays(_ => 42.0), "ts", "value")
      .as[(Int, Long, Double)].collect()
    assert(flat.forall(_._3 === 0.0))
    // even periods have no centered window
    intercept[IllegalArgumentException](
      Events.seasonalIndices(boosted, "ts", "value", period = 4))
  }

  test("acf: period-2 impulse signs, zero-gap densification, constant-series null") {
    def day(k: String, d: Int) = (k, ts(f"2026-01-${d + 1}%02d 09:00:00"))
    // k1: one event on days 0,2,4 -> daily series [1,0,1,0,1]
    //   n=5, S=3, c = 5x-3 = [2,-3,2,-3,2], den = 30
    //   lag1 = 4 terms of (2)(-3)/( -3)(2) = -24; lag2 = 4+9+4 = 17
    // k2: events on days 0 and 2 ONLY -> densified [1,0,1]
    //   n=3, S=2, c = [1,-2,1], den = 6, lag1 = -4, lag2 = 1
    // k3: one event per day, 3 days -> constant, den = 0 -> null acf
    val df = (Seq(0, 2, 4).map(day("k1", _)) ++
        Seq(0, 2).map(day("k2", _)) ++
        Seq(0, 1, 2).map(day("k3", _)))
      .toDF("k", "ts")
    val got = Events.acf(df, "k", "ts", maxLag = 2, bucketDays = 1)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), Option(r.get(4)))).toMap
    assert(got(("k1", 1)) === ((-24L, 30L, Some(-0.8))))
    assert(got(("k1", 2))._1 === 17L)
    assert(got(("k2", 1)) === ((-4L, 6L, Some(-4.0 / 6.0))))
    assert(got(("k2", 2)) === ((1L, 6L, Some(1.0 / 6.0))))
    assert(got(("k3", 1))._2 === 0L && got(("k3", 1))._3.isEmpty)
    intercept[IllegalArgumentException](Events.acf(df, "k", "ts", 0))
    graft.engine.Caches.releaseAll()
  }

  test("ksStatistic: hand ECDF sup, identical-sample zero, disjoint-support 1000, band invariance") {
    def df(a: Seq[Double], b: Seq[Double]) =
      (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    // A = [1,2,3,4], B = [2,4,6,8]: sup at v=3 (or 4): |12-4|/16 = 0.5
    val hand = Events.ksStatistic(df(Seq(1, 2, 3, 4), Seq(2, 4, 6, 8)),
      "g", "v", "A", "B").collect().head
    assert((hand.getLong(0), hand.getLong(1), hand.getLong(2),
      hand.getLong(3)) === ((4L, 4L, 8L, 500L)))
    // identical samples: D = 0
    val same = Events.ksStatistic(df(Seq(1, 2, 3), Seq(1, 2, 3)),
      "g", "v", "A", "B").collect().head
    assert(same.getLong(2) === 0L && same.getLong(3) === 0L)
    // disjoint support: D = 1
    val dis = Events.ksStatistic(df(Seq(1, 2), Seq(10, 11)),
      "g", "v", "A", "B").collect().head
    assert(dis.getLong(3) === 1000L)
    // banding is an implementation detail
    val b1 = Events.ksStatistic(df(Seq(1, 2, 3, 4), Seq(2, 4, 6, 8)),
      "g", "v", "A", "B", bands = 1).collect().head
    assert(b1.getLong(2) === 8L && b1.getLong(3) === 500L)
    graft.engine.Caches.releaseAll()
  }

  test("psiBins: identical slices zero, shift attributed to its bins, smoothing keeps empties finite") {
    val ref = (1 to 100).map(v => ("r", v.toDouble))
    // identical current slice: every term exactly 0
    val zero = Events.psiBins((ref ++ (1 to 100).map(v => ("c", v.toDouble)))
      .toDF("g", "v"), "g", "v", "r", "c")
      .collect().map(_.getDouble(3))
    assert(zero.length === 10 && zero.forall(_ === 0.0))
    // hard shift: current mass all in the top reference decile
    val shifted = Events.psiBins(
      (ref ++ (1 to 100).map(_ => ("c", 99.5))).toDF("g", "v"),
      "g", "v", "r", "c").orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // cur_n = 0 in bins 0..8 (smoothing keeps their terms finite > 0),
    // all 100 in bin 9
    assert(shifted.count(_._3 == 0L) === 9)
    assert(shifted.last._3 === 100L)
    assert(shifted.forall(t => t._4 >= 0.0 && !t._4.isInfinite))
    assert(shifted.map(_._4).sum > 0.25) // "action" territory
    intercept[IllegalArgumentException](
      Events.psiBins(ref.toDF("g", "v"), "g", "v", "r", "c", nBins = 1))
  }

  test("clampedRunningSum: hand Lindley trace, clamp-then-recover, all-positive identity") {
    def row(k: String, i: Long, d: Long) =
      (k, ts(f"2026-01-${i}%02d 09:00:00"), i, d)
    // deltas +5, -10, +3, -1, +4: naive 5,-5,-2,-3,1
    // Lindley: 5, 0, 3, 2, 6 (clamped at the -10; recovers after)
    val df = Seq(row("k", 1, 5), row("k", 2, -10), row("k", 3, 3),
      row("k", 4, -1), row("k", 5, 4),
      row("pos", 1, 2), row("pos", 2, 3))
      .toDF("k", "ts", "id", "d")
    val got = Events.clampedRunningSum(df, "k", "ts", "id", "d")
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(("k", 1L)) === ((5L, 5L, 0L)))
    assert(got(("k", 2L)) === ((-5L, 0L, 5L)))
    assert(got(("k", 3L)) === ((-2L, 3L, 5L)))
    assert(got(("k", 4L)) === ((-3L, 2L, 5L)))
    assert(got(("k", 5L)) === ((1L, 6L, 5L)))
    // never-negative prefix: clamped == naive, shortfall 0
    assert(got(("pos", 2L)) === ((5L, 5L, 0L)))
  }

  test("attribution: bookend split, same-instant rule, pre-touch and no-touch conversions drop") {
    def e(u: Long, d: Int, c: String, id: Long) =
      (u, ts(f"2026-01-${d}%02d 09:00:00"), c, id)
    val df = Seq(
      e(1, 1, "a", 10), e(1, 2, "b", 11), e(1, 3, "purchase", 12),
      // u2 converts BEFORE any touch (drops), then touches c, converts
      e(2, 1, "purchase", 20), e(2, 2, "c", 21), e(2, 3, "purchase", 22),
      // u3 has no touches at all
      e(3, 1, "purchase", 30),
      // u4: touch at the SAME instant as the conversion is attributable
      (4L, ts("2026-01-05 09:00:00"), "d", 40L),
      (4L, ts("2026-01-05 09:00:00"), "purchase", 41L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.attribution(df, "user_id", "ts", "event_type",
        "event_id", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("first", "a") -> 1L, ("first", "c") -> 1L, ("first", "d") -> 1L,
      ("last", "b") -> 1L, ("last", "c") -> 1L, ("last", "d") -> 1L))
    graft.engine.Caches.releaseAll()
  }

  test("madScale: hand values, outlier resistance, constant-series zero") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("k", _)) ++
      Seq(5.0, 5.0).map(("flat", _))).toDF("g", "v")
    val got = Events.madScale(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // median 3, deviations [2,1,0,1,97] -> MAD 1: the 100 outlier that
    // would dominate a stddev moves the MAD not at all
    assert(got("k") === ((5L, 3.0, 1.0)))
    assert(got("flat") === ((2L, 5.0, 0.0)))
    graft.engine.Caches.releaseAll()
  }

  test("welchTTest: identical slices t=0, separation sign, degenerate null") {
    val same = (Seq(1.0, 2.0, 3.0).map(("A", _)) ++
      Seq(1.0, 2.0, 3.0).map(("B", _))).toDF("g", "v")
    val s = Events.welchTTest(same, "g", "v", "A", "B").collect().head
    assert(s.getDouble(4) === 0.0)
    // A well above B: positive t, df near n_a + n_b - 2 for equal vars
    val sep = (Seq(10.0, 11.0, 12.0).map(("A", _)) ++
      Seq(1.0, 2.0, 3.0).map(("B", _))).toDF("g", "v")
    val t = Events.welchTTest(sep, "g", "v", "A", "B").collect().head
    assert(t.getDouble(4) > 5.0 && t.getDouble(5) === 4.0)
    // singleton side: undefined variance -> null, not Infinity
    val one = (Seq(1.0).map(("A", _)) ++ Seq(2.0, 3.0).map(("B", _)))
      .toDF("g", "v")
    val u = Events.welchTTest(one, "g", "v", "A", "B").collect().head
    assert(u.isNullAt(4) && u.isNullAt(5))
  }

  test("winsorize: clamp matrix, interior values untouched, degenerate quantiles") {
    val df = (1 to 10).map(v => ("k", v.toDouble)).toDF("k", "v")
    val got = Events.winsorize(df, "k", "v", 0.25, 0.75)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // n=10: p25 = 3.25, p75 = 7.75 (linear interpolation)
    assert(got(1.0) === 3.25 && got(3.0) === 3.25)
    assert(got(9.0) === 7.75 && got(10.0) === 7.75)
    assert((4 to 7).forall(v => got(v.toDouble) === v.toDouble))
    // all-equal series: lo = hi = v, everything untouched
    val flat = Events.winsorize(Seq(("k", 5.0), ("k", 5.0)).toDF("k", "v"),
      "k", "v", 0.1, 0.9).collect().map(_.getDouble(2))
    assert(flat.forall(_ === 5.0))
    intercept[IllegalArgumentException](
      Events.winsorize(df, "k", "v", 0.9, 0.1))
  }

  test("kaplanMeier: censoring in risk set, suffix-sum at-risk, exact left-fold survival") {
    def d(k: String, day: Int) = (k, ts(f"2026-01-${day + 1}%02d 12:00:00"))
    // horizon = day 20 (u3's last). censorDays = 3:
    //   u1 first 0 last 10 -> gap 10 -> churn t=10
    //   u2 0,5   -> gap 15 -> churn t=5
    //   u3 2,20  -> gap 0  -> censored t=18
    //   u4 0,5   -> gap 15 -> churn t=5
    //   u5 18    -> gap 2  -> censored t=2
    //   u6 0     -> gap 20 -> churn t=0
    val df = (Seq(0, 4, 10).map(d("u1", _)) ++ Seq(0, 5).map(d("u2", _)) ++
      Seq(2, 20).map(d("u3", _)) ++ Seq(0, 5).map(d("u4", _)) ++
      Seq(18).map(d("u5", _)) ++ Seq(0).map(d("u6", _)))
      .toDF("k", "ts")
    val got = Events.kaplanMeier(df, "k", "ts", lit("all"), censorDays = 3)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // steps with churn: t=0 (n=6), t=5 (n=4: u1,u2,u3,u4), t=10 (n=2:
    // u1,u3). censored u5 (t=2) thins the risk set without a step row.
    var acc = 1.0
    acc *= 1.0 - 1.0 / 6.0
    assert(got(0) === ((6L, 1L, 0L, acc)))
    acc *= 1.0 - 2.0 / 4.0
    assert(got(5) === ((4L, 2L, 0L, acc)))
    acc *= 1.0 - 1.0 / 2.0
    assert(got(10) === ((2L, 1L, 0L, acc)))
    assert(got.size === 3)
    // cohorts partition the estimator: two copies of one cohort's data
    // under different labels reproduce the single-cohort curve twice
    val two = df.withColumn("c", when(col("k").isin("u1", "u2"), "A")
      .otherwise("B"))
    val byC = Events.kaplanMeier(two, "k", "ts", col("c"), censorDays = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // cohort A: u1 churn t=10, u2 churn t=5 -> at t=5 risk {u1,u2}=2
    assert(byC(("A", 5)) === 2L && byC(("A", 10)) === 1L)
    intercept[IllegalArgumentException](
      Events.kaplanMeier(df, "k", "ts", lit("all"), censorDays = -1))
  }

  test("nelsonAalen: exact hazard increments, censored thins risk, cumsum") {
    def d(k: String, day: Int) = (k, ts(f"2026-01-${day + 1}%02d 12:00:00"))
    // horizon day 10 (marker m, censored t=0). a,b churn t=1; c churn
    // t=3. risk: t=1 -> {a,b,c}=3, t=3 -> {c}=1.
    val df = (Seq(0, 1).map(d("a", _)) ++ Seq(0, 1).map(d("b", _)) ++
      Seq(0, 3).map(d("c", _)) ++ Seq(10).map(d("m", _)))
      .toDF("k", "ts")
    val got = Events.nelsonAalen(df, "k", "ts", lit("all"), censorDays = 0)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getAs[Long]("h_term_micro"),
          r.getAs[Long]("h_cum_micro")))).toMap
    assert(got(1) === ((3L, 2L, 666666L, 666666L)))
    assert(got(3) === ((1L, 1L, 1000000L, 1666666L)))
    assert(got.size === 2)
    // H ≈ −ln S sanity (loose): KM surv at t=3 is (1/3)·0 -> compare at
    // t=1 only: −ln(1 − 2/3) = 1.0986 vs H = 0.666 + ... skip exact —
    // monotone non-decreasing is the structural claim
    assert(got(3)._4 >= got(1)._4)
  }

  test("stlDecompose: pure trend, pure weekly cycle, interior cut, sign routing") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    // pure linear trend (cents = 100·i over 15 days): centered MA of a
    // line is the line → num = 0 → zero seasonal, zero residual
    val lin = (0 until 15).map(i => (day(i), i * 1.0)).toDF("ts", "v")
    val lt = Events.stlDecompose(lin, "ts", "v", period = 7)
      .collect()
    assert(lt.length === 15 - 6) // interior days only
    assert(lt.forall(r => r.getAs[Long]("seasonal_micro") === 0L &&
      r.getAs[Long]("resid_micro") === 0L))
    assert(lt.forall(r =>
      r.getAs[Long]("trend_micro") === r.getAs[Long]("cents") * 1000000L))
    // pure weekly cycle over 21 days: residual exactly 0 at every
    // interior day (per-day detrended equals its phase mean as a
    // rational; both floors agree), seasonal nonzero with BOTH signs
    val pat = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
    val cyc = (0 until 21).map(i => (day(i), pat(i % 7))).toDF("ts", "v")
    val ct = Events.stlDecompose(cyc, "ts", "v", period = 7).collect()
    assert(ct.forall(_.getAs[Long]("resid_micro") === 0L))
    assert(ct.exists(_.getAs[Long]("seasonal_micro") > 0L) &&
      ct.exists(_.getAs[Long]("seasonal_micro") < 0L))
    graft.engine.Caches.releaseAll()
  }

  test("logRank: identical groups z=0, hand asymmetric case, risk carry") {
    def e(u: Long, day: Int) = (u, ts(f"2026-01-${day + 1}%02d 12:00:00"))
    // symmetric: one churn at t=1 and one at t=3 per group; markers 5,6
    // censored at the horizon (day 10), never in the t>=1 risk sets
    val sym = (Seq(0, 1).map(e(1, _)) ++ Seq(0, 1).map(e(2, _)) ++
      Seq(0, 3).map(e(3, _)) ++ Seq(0, 3).map(e(4, _)) ++
      Seq(10).map(e(5, _)) ++ Seq(10).map(e(6, _)))
      .toDF("u", "ts")
    val z0 = Events.logRank(sym, "u", "ts", col("u") % 2 === 1, 0)
      .collect().head
    assert(z0.getAs[Long]("o1") * 1000000L === z0.getAs[Long]("e1_micro"))
    assert(z0.getAs[Long]("z_milli") === 0L)
    // asymmetric: g1 (odd users 1,3) churns at t=1, g0 (2,4) at t=3.
    // pooled t=1: n=4, d=2, n1=2, d1=2 -> e=1e6, v=floor(16e6/48+.5)
    // pooled t=3: n=2, d=2, n1=0 -> e=0, v=0
    // z_milli = floor((2e6-1e6)/sqrt(333333)) = 1732
    val asym = (Seq(0, 3).map(e(2, _)) ++ Seq(0, 3).map(e(4, _)) ++
      Seq(0, 1).map(e(1, _)) ++ Seq(0, 1).map(e(3, _)) ++
      Seq(10).map(e(6, _)) ++ Seq(10).map(e(5, _)))
      .toDF("u", "ts")
    val za = Events.logRank(asym, "u", "ts", col("u") % 2 === 1, 0)
      .collect().head
    assert((za.getAs[Long]("o1"), za.getAs[Long]("e1_micro"),
      za.getAs[Long]("v_micro"), za.getAs[Long]("z_milli"))
      === ((2L, 1000000L, 333333L, 1732L)))
    graft.engine.Caches.releaseAll()
  }

  test("associationRules: hand metrics, direction asymmetry, min-support cut") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"), // dup membership ignored
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "d"))
      .toDF("user_id", "event_type")
    // N=4, n_a=3, n_b=3, n_c=1, n_d=1; a∧b on u1,u2 -> n_both=2
    val all = Events.associationRules(df, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // a->b: support 2000/4=500, conf 2000/3=666, lift 2*4*1000/(3*3)=888
    assert(all(("a", "b")) === ((2L, 500L, 666L, 888L)))
    assert(all(("b", "a")) === ((2L, 500L, 666L, 888L)))
    // direction asymmetry: c->a conf 1000 vs a->c conf 333
    assert(all(("c", "a"))._3 === 1000L)
    assert(all(("a", "c"))._3 === 333L)
    // d pairs only with b, never with a/c (different keys)
    assert(!all.contains(("d", "a")) && all(("d", "b"))._1 === 1L)
    // min-support cut keeps only the n_both >= 2 rules
    val cut = Events.associationRules(df, "user_id", "event_type", 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cut === Set(("a", "b"), ("b", "a")))
    graft.engine.Caches.releaseAll()
  }

  test("ltvCurve: cohort isolation, gap densification, cumulative exactness") {
    // all offsets are multiples of 7 days, so period arithmetic is
    // phase-independent: cohort A = base week, cohort B = base + 3
    val b = "2026-01-01"
    def at(day: String) = ts(s"$day 12:00:00")
    val df = Seq(
      ("u1", at(b), "signup", 0.0),
      ("u1", at(b), "purchase", 1.004),          // age 0: 100 cents
      ("u1", at("2026-01-15"), "purchase", 2.5), // age 2: 250 cents
      ("u2", at(b), "view", 9.99),               // in cohort A, no revenue
      ("u3", at("2026-01-22"), "purchase", 4.0)) // cohort B, age 0
      .toDF("user_id", "ts", "event_type", "value")
    val got = Events.ltvCurve(df, "user_id", "ts", "value", "event_type",
      "purchase").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val periods = got.keys.map(_._1).toSet
    assert(periods.size === 2)
    val pA = periods.min
    assert(periods.max === pA + 3)
    // cohort A: 2 users; age 1 densified to an explicit zero row
    assert(got((pA, 0)) === ((2L, 100L, 100L)))
    assert(got((pA, 1)) === ((2L, 0L, 100L)))
    assert(got((pA, 2)) === ((2L, 250L, 350L)))
    // cohort B is isolated: 1 user, its own cumulative from zero
    assert(got((pA + 3, 0)) === ((1L, 400L, 400L)))
    assert(got.size === 4)
    graft.engine.Caches.releaseAll()
  }

  test("ccf: impulse lag recovery, symmetry, zero-variance null") {
    def at(day: String) = ts(s"$day 12:00:00")
    // a fires week 0, b fires week 1: x leads y by exactly one period
    val df = Seq(("a", at("2026-01-01")), ("b", at("2026-01-08")))
      .toDF("t", "ts")
    def run(x: String, y: String) =
      Events.ccf(df, "t", "ts", x, y, maxLag = 1)
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
        .toMap
    val ab = run("a", "b")
    assert(ab(1)._2 === 0.5 && ab(0)._2 === -1.0)
    assert(ab(1)._1 === 1L && ab(0)._1 === -2L)
    // ccf_xy(l) = ccf_yx(-l)
    val ba = run("b", "a")
    assert(ba(-1) === ab(1) && ba(0) === ab(0) && ba(1) === ab(-1))
    // a constant series has zero variance: ccf is null, never NaN-div
    val const = Seq(("a", at("2026-01-01")), ("b", at("2026-01-01")),
      ("b", at("2026-01-08"))).toDF("t", "ts")
    val z = Events.ccf(const, "t", "ts", "b", "a", 1)
      .collect().map(r => r.isNullAt(4))
    assert(z.forall(identity))
    graft.engine.Caches.releaseAll()
  }

  test("qqTable: identical-slices zero, shift recovery, rank arithmetic") {
    def rows(slice: String, shift: Double) =
      (0 to 8).map(i => (slice, i.toDouble + shift))
    val same = (rows("a", 0) ++ rows("b", 0)).toDF("s", "v")
    val zero = Events.qqTable(same, "s", "v", "a", "b", k = 4)
      .orderBy("rank_milli").collect()
    assert(zero.map(_.getLong(0)).toSeq === Seq(250L, 500L, 750L))
    assert(zero.forall(_.getDouble(3) === 0.0))
    // a pure +5 location shift: every quantile diff reads exactly -5
    // (linear interpolation commutes with shifts)
    val shifted = (rows("a", 0) ++ rows("b", 5)).toDF("s", "v")
    val d = Events.qqTable(shifted, "s", "v", "a", "b", k = 4).collect()
    assert(d.forall(_.getDouble(3) === -5.0))
    intercept[IllegalArgumentException](
      Events.qqTable(same, "s", "v", "a", "b", k = 1))
  }

  test("weightedMedian: weight dominance, unit-weight lower median, tie accumulation") {
    def run(rows: Seq[(String, Double, Long)]) =
      Events.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    val got = run(Seq(
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 10.0, 10L), // weight pulls
      ("b", 1.0, 1L), ("b", 2.0, 1L), ("b", 3.0, 1L), ("b", 4.0, 1L),
      ("c", 5.0, 1L), ("c", 5.0, 1L), ("c", 7.0, 1L))) // tie sums first
    assert(got("a") === ((12L, 10.0)))
    assert(got("b") === ((4L, 2.0))) // lower median convention
    assert(got("c") === ((3L, 5.0)))
  }

  test("inventoryAge: partial/full/untouched lot matrix, age arithmetic") {
    def at(d: Int) = ts(f"2026-01-$d%02d 10:00:00")
    val df = Seq(
      ("u", at(1), 1L, 10L, "buy"), ("u", at(2), 2L, 5L, "buy"),
      ("u", at(3), 3L, 12L, "sell"), // exhausts lot 1, eats 2 of lot 2
      ("v", at(4), 4L, 7L, "buy"),   // untouched lot
      ("w", at(1), 5L, 4L, "buy"), ("w", at(5), 6L, 10L, "sell"))
      .toDF("k", "ts", "id", "qty", "side")
    val got = Events.inventoryAge(df, "k", "ts", "id", "qty", "side",
      "buy", "sell")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // horizon = Jan 5 (the global max event date)
    assert(got === Map(
      ("u", 2L) -> ((3L, 3L)),  // 5 - 2 consumed, bought Jan 2
      ("v", 4L) -> ((7L, 1L)))) // whole lot, bought Jan 4
  }

  test("streaks: split/merge boundaries, single-day runs, multi-event dedup") {
    def at(d: Int) = ts(f"2026-01-$d%02d 10:00:00")
    val df = (Seq(1, 2, 2, 3, 5).map(d => ("u1", at(d))) ++
      Seq(("u2", at(10))))
      .toDF("k", "ts")
    val got = Events.streaks(df, "k", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // u1: days {1,2,3} one run (the duplicate day-2 events collapse),
    // day 5 its own run after the gap
    assert(got === Map("u1" -> ((4L, 2L, 3L)), "u2" -> ((1L, 1L, 1L))))
  }

  test("eventuallyFollows: EF superset of DF, same-instant exclusion, shares") {
    def at(d: Int) = ts(f"2026-01-$d%02d 10:00:00")
    val df = Seq(
      ("u1", at(1), "A"), ("u1", at(2), "B"), ("u1", at(3), "C"),
      ("u2", at(1), "D"), ("u2", at(1), "A")) // same instant: no order
      .toDF("k", "ts", "t")
    val got = Events.eventuallyFollows(df, "k", "ts", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // A→C exists though never ADJACENT (EF ⊇ DF); no reverse rows;
    // u2's tie carries no evidence; shares over 2 cases
    assert(got === Map(
      ("A", "B") -> ((1L, 500L)), ("A", "C") -> ((1L, 500L)),
      ("B", "C") -> ((1L, 500L))))
    graft.engine.Caches.releaseAll()
  }

  test("entryExitReport: single-event sessions, gap splits, share arithmetic") {
    def at(t: String) = ts(s"2026-01-01 $t")
    val df = Seq(
      ("u1", at("10:00:00"), 1L, "A"), ("u1", at("10:10:00"), 2L, "B"),
      ("u1", at("12:00:00"), 3L, "C"), // > 30min gap: its own session
      ("u2", at("10:00:00"), 4L, "D"))
      .toDF("k", "ts", "id", "t")
    val got = Events.entryExitReport(df, "k", "ts", "id", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 3 sessions: (A..B), (C), (D) — C and D enter AND exit theirs
    assert(got === Map(
      "A" -> ((1L, 0L, 333L, 0L)), "B" -> ((0L, 1L, 0L, 333L)),
      "C" -> ((1L, 1L, 333L, 333L)), "D" -> ((1L, 1L, 333L, 333L))))
    intercept[IllegalArgumentException](
      Events.entryExitReport(df, "k", "ts", "id", "t", 0))
    graft.engine.Caches.releaseAll()
  }

  test("dwellReport: attribute-to-current, open-tail exclusion, same-instant zero") {
    def at(t: String) = ts(s"2026-01-01 $t")
    val df = Seq(
      ("u1", at("10:00:00"), 1L, "A"), // dwells 600s as A
      ("u1", at("10:10:00"), 2L, "B"), // dwells 300s as B
      ("u1", at("10:15:00"), 3L, "A"), // open tail: excluded
      ("u2", at("10:00:00"), 4L, "C"), // single event: nothing
      ("u3", at("10:00:00"), 5L, "D"), // same instant: 0-dwell
      ("u3", at("10:00:00"), 6L, "E"))
      .toDF("k", "ts", "id", "state")
    val got = Events.dwellReport(df, "k", "ts", "id", "state")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      "A" -> ((1L, 600000000L, 600000000L)),
      "B" -> ((1L, 300000000L, 300000000L)),
      "D" -> ((1L, 0L, 0L))))
  }

  test("topTrigrams: chain overlap, key isolation, tie order") {
    def at(m: Int) = ts(f"2026-01-01 10:$m%02d:00")
    val df = Seq(
      ("u1", at(0), 1L, "A"), ("u1", at(1), 2L, "B"),
      ("u1", at(2), 3L, "C"), ("u1", at(3), 4L, "D"),
      ("u2", at(0), 5L, "C"), ("u2", at(1), 6L, "D"))
      .toDF("k", "ts", "id", "t")
    val got = Events.topTrigrams(df, "k", "ts", "id", "t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // 4 events -> exactly n-2 = 2 overlapping trigrams; u2's pair
    // never joins u1's chain; equal counts order lexicographically
    assert(got.toSeq === Seq(("A>B>C", 1L), ("B>C>D", 1L)))
    intercept[IllegalArgumentException](
      Events.topTrigrams(df, "k", "ts", "id", "t", 0))
  }

  test("maxDrawdown: hand trace, monotone-up zero, single-event zero") {
    def at(m: Int) = ts(f"2026-01-01 10:$m%02d:00")
    val df = (Seq((10L, 1), (-4L, 2), (2L, 3), (-7L, 4), (20L, 5))
      .map { case (d, i) => ("u", at(i), i.toLong, d) } ++
      Seq(("v", at(1), 10L, 1L), ("v", at(2), 11L, 2L),
        ("w", at(1), 12L, 5L)))
      .toDF("k", "ts", "id", "dc")
    val got = Events.maxDrawdown(df, "k", "ts", "id", "dc")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // u: eq 10,6,8,1,21 / peak 10,10,10,10,21 -> dd max 9 at the dip
    assert(got("u") === ((9L, 21L, 21L)))
    // strictly rising and single-event series never draw down
    assert(got("v") === ((0L, 3L, 3L)))
    assert(got("w") === ((0L, 5L, 5L)))
  }

  test("periodOverPeriod: gap-zero lag, negative truncation, zero-base null") {
    // key A: weeks 0, 2 (gap at 1) with 3 then 2 events; offsets are
    // multiples of 7 so the period arithmetic is phase-independent
    def at(day: String) = ts(s"$day 12:00:00")
    val df = (Seq.fill(3)(("A", at("2026-01-01"))) ++
      Seq.fill(2)(("A", at("2026-01-15"))) ++
      Seq(("B", at("2026-01-01"))))
      .toDF("k", "ts")
    val got = Events.periodOverPeriod(df, "k", "ts")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5))).toMap
    val p0 = got.keys.filter(_._1 == "A").map(_._2).min
    // first period: no predecessor -> lag/delta/pct all null
    assert(got(("A", p0)) === ((3L, null, null, null)))
    // the gap week exists as a REAL zero: delta -3, pct -1000
    assert(got(("A", p0 + 1)) === ((0L, 3L, -3L, -1000L)))
    // growth from a zero base is null, never infinite
    assert(got(("A", p0 + 2)) === ((2L, 0L, 2L, null)))
    assert(got(("B", p0)) === ((1L, null, null, null)))
    assert(got.size === 4)
    // toward-zero truncation on a negative pct: 2 -> 1 is -500, and
    // 3 -> 1 is -666 (floor would give -667)
    val neg = (Seq.fill(3)(("C", at("2026-01-01"))) ++
      Seq(("C", at("2026-01-08")))).toDF("k", "ts")
    val n2 = Events.periodOverPeriod(neg, "k", "ts")
      .collect().map(r => r.getInt(1) -> r).toMap
    val pn = n2.keys.min
    assert(n2(pn + 1).getLong(5) === -666L)
  }

  test("fifoAllocate: hand ledger, conservation, input-order invariance") {
    def row(k: String, t: String, id: Long, q: Long, side: String) =
      (k, ts(s"2026-01-01 $t"), id, q, side)
    val rows = Seq(
      row("u", "10:00:00", 1L, 10L, "buy"),
      row("u", "10:30:00", 2L, 4L, "sell"),   // [0,4) of b1
      row("u", "11:00:00", 3L, 5L, "buy"),    // lot [10,15)
      row("u", "11:30:00", 4L, 8L, "sell"),   // [4,12): spans b1+b2
      row("u", "12:00:00", 5L, 10L, "sell"),  // [12,22): exhausts b2
      row("v", "10:00:00", 6L, 10L, "buy"),
      row("v", "10:10:00", 7L, 3L, "sell"),   // open inventory remains
      row("w", "10:00:00", 8L, 2L, "sell"))   // short: nothing to take
    def run(seq: Seq[(String, java.sql.Timestamp, Long, Long, String)]) =
      Events.fifoAllocate(seq.toDF("k", "ts", "id", "qty", "side"),
        "k", "ts", "id", "qty", "side", "buy", "sell")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          r.getLong(3)).toMap
    val got = run(rows)
    assert(got === Map(
      ("u", 1L, 2L) -> 4L, ("u", 1L, 4L) -> 6L,
      ("u", 3L, 4L) -> 2L, ("u", 3L, 5L) -> 3L,
      ("v", 6L, 7L) -> 3L))
    // conservation: per key Σalloc = min(ΣB, ΣS)
    assert(got.filter(_._1._1 == "u").values.sum === 15L)
    assert(got.filter(_._1._1 == "v").values.sum === 3L)
    assert(!got.keys.exists(_._1 == "w"))
    // physical input order never matters: windows order by (ts, id)
    assert(run(rows.reverse) === got)
    graft.engine.Caches.releaseAll()
  }

  test("peakConcurrency: overlap matrix, same-instant handoff, first-peak tie") {
    def iv(s: String, e: String) =
      (ts(s"2026-01-01 $s"), ts(s"2026-01-01 $e"))
    // [10:00,10:10) [10:05,10:15) [10:10,10:20): the 10:10 handoff is
    // NOT an overlap (half-open), so peak = 2; the 11:00 pair re-reaches
    // 2 later — first_peak_ts must stay 10:05
    val df = Seq(
      iv("10:00:00", "10:10:00"), iv("10:05:00", "10:15:00"),
      iv("10:10:00", "10:20:00"),
      iv("11:00:00", "11:10:00"), iv("11:05:00", "11:15:00"))
      .toDF("s", "e")
    val rows = Events.peakConcurrency(df, "s", "e").collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 2L)
    assert(rows(0).getTimestamp(1) === ts("2026-01-01 10:05:00"))
    // three identical starts at one instant aggregate to a single +3
    // delta; the later single start on top of them sets the peak
    val dup = Seq(
      iv("12:00:00", "12:01:00"), iv("12:00:00", "12:01:00"),
      iv("12:00:00", "12:01:00"), iv("12:00:30", "12:02:00"))
      .toDF("s", "e")
    val r2 = Events.peakConcurrency(dup, "s", "e").collect()
    assert(r2(0).getLong(0) === 4L)
    assert(r2(0).getTimestamp(1) === ts("2026-01-01 12:00:30"))
    graft.engine.Caches.releaseAll()
  }

  test("movingMedian: spike resistance, full windows, calendar fill") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    // constant 100 cents/day with one huge spike: the median ignores
    // the spike everywhere (it is never the middle of 7), while the
    // mean would shift every window containing it
    val rows = (0 until 15).map(i =>
      (day(i), if (i == 7) 9999.0 else 1.0)).toDF("ts", "v")
    val mm = Events.movingMedian(rows, "ts", "v", period = 7)
      .orderBy("day").collect()
    assert(mm.length === 15 - 6) // full centered windows only
    assert(mm.forall(_.getAs[Long]("med2x_cents") === 200L))
    // a silent calendar day is a real 0: over days 1..7 with day 4
    // missing, the window multiset is {0, six 100s} -> median 100
    val gap = (0 until 7).filter(_ != 3).map(i => (day(i), 1.0))
      .toDF("ts", "v")
    val g = Events.movingMedian(gap, "ts", "v", period = 7).collect()
    assert(g.length === 1 && g.head.getAs[Long]("med2x_cents") === 200L)
    // even-position median: doubled statistic is the exact middle * 2
    val asc = (0 until 7).map(i => (day(i), i * 1.0)).toDF("ts", "v")
    val a = Events.movingMedian(asc, "ts", "v", period = 7).collect()
    assert(a.head.getAs[Long]("med2x_cents") === 600L) // middle=300c
    graft.engine.Caches.releaseAll()
  }

  test("recsHitRate: hand hits, single-item exclusion, cold items miss") {
    def f(rows: Seq[(Long, String)]) = rows.toDF("k", "i")
    // train: A,B co-occur in 3 baskets -> model A<->B (and C alone)
    val train = f(Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (4L, "C")))
    // test: {A,B} hits both ways; {A,C} misses both (B absent, C cold);
    // {D} single-item basket excluded entirely
    val test = f(Seq((10L, "A"), (10L, "B"), (11L, "A"), (11L, "C"),
      (12L, "D")))
    val got = Events.recsHitRate(train, test, "k", "i",
      minPairKeys = 2L, k = 2).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((2L, 4L, 2L, 500L)))
    graft.engine.Caches.releaseAll()
  }

  test("dtwDistance: identical zero, shift forgiveness, unequal lengths") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    def rows(pairs: Seq[(Int, String, Double)]) =
      pairs.map { case (d, k, v) => (day(d), k, v) }.toDF("ts", "k", "v")
    // identical curves: DTW = 0
    val same = rows((0 until 5).flatMap(i =>
      Seq((i, "a", (i + 1).toDouble), (i, "b", (i + 1).toDouble))))
    val s = Events.dtwDistance(same, "ts", "k", "v", "a", "b")
      .collect().head
    assert(s.getAs[Long]("dtw_cents") === 0L)
    // a one-day-shifted spike: pointwise L1 is 18 dollars, DTW warps
    // the time axis and scores 0
    val shift = rows(Seq(
      (0, "a", 0.0), (1, "a", 0.0), (2, "a", 9.0), (3, "a", 0.0),
      (4, "a", 0.0),
      (0, "b", 0.0), (1, "b", 9.0), (2, "b", 0.0), (3, "b", 0.0),
      (4, "b", 0.0)))
    val sh = Events.dtwDistance(shift, "ts", "k", "v", "a", "b")
      .collect().head
    assert(sh.getAs[Long]("dtw_cents") === 0L)
    // unequal lengths: x=[5c], y=[1c,2c] -> D = |5-1| + |5-2| = 7
    val uneq = rows(Seq((0, "a", 0.05),
      (0, "b", 0.01), (1, "b", 0.02)))
    val u = Events.dtwDistance(uneq, "ts", "k", "v", "a", "b")
      .collect().head
    assert((u.getAs[Long]("n_x"), u.getAs[Long]("n_y"),
      u.getAs[Long]("dtw_cents")) === ((1L, 2L, 7L)))
    graft.engine.Caches.releaseAll()
  }

  test("behaviorEditPairs: hand distance, tie order, length cap") {
    def e(u: Long, i: Int, t: String) =
      (u, ts(f"2026-01-01 10:${i}%02d:00"), i.toLong, t)
    // u0: click,view -> "cv"; u1: click,error,view -> "cev": dist 1;
    // u2/u3: 25 events each, single type: signatures cap at 20
    val df = (Seq(e(0L, 1, "click"), e(0L, 2, "view"),
      e(1L, 1, "click"), e(1L, 2, "error"), e(1L, 3, "view")) ++
      (1 to 25).map(i => e(2L, i, "click")) ++
      (1 to 25).map(i => e(3L, i, "view")))
      .toDF("u", "ts", "id", "t")
    val got = Events.behaviorEditPairs(df, "u", "ts", "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) === ((2L, 3L, 1L, 667L)))
    // capped at 20 chars; all-c vs all-v distance = 20, sim 0
    assert(got(2L) === ((20L, 20L, 20L, 0L)))
    graft.engine.Caches.releaseAll()
  }

  test("rollingCorr: perfect/anti windows, zero variance null, full-only") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    // x ascends 1..10, y = x: every full window r ~ +1
    val up = (0 until 10).flatMap(i => Seq(
      (day(i), "click", (i + 1).toDouble),
      (day(i), "purchase", (i + 1).toDouble)))
      .toDF("ts", "t", "v")
    val pos = Events.rollingCorr(up, "ts", "t", "v", "click", "purchase")
      .orderBy("day").collect()
    assert(pos.length === 4) // days 7..10 only (full 7-day windows)
    assert(pos.forall(r => math.abs(r.getAs[Long]("r_micro")
      - 1000000L) <= 1L))
    // y descends while x ascends: r ~ -1
    val anti = (0 until 10).flatMap(i => Seq(
      (day(i), "click", (i + 1).toDouble),
      (day(i), "purchase", (10 - i).toDouble)))
      .toDF("ts", "t", "v")
    val neg = Events.rollingCorr(anti, "ts", "t", "v",
      "click", "purchase").collect()
    assert(neg.forall(r => math.abs(r.getAs[Long]("r_micro")
      + 1000000L) <= 1L))
    // constant y: zero variance -> NULL r
    val flat = (0 until 10).flatMap(i => Seq(
      (day(i), "click", (i + 1).toDouble),
      (day(i), "purchase", 5.0)))
      .toDF("ts", "t", "v")
    val z = Events.rollingCorr(flat, "ts", "t", "v",
      "click", "purchase").collect()
    assert(z.forall(_.isNullAt(3)))
    graft.engine.Caches.releaseAll()
  }

  test("haarDecompose: hand pyramid, constant flat, spike locality") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    // 4-day series [3,1,4,2] cents at levels=2:
    // L1: (3-1)=2, (4-2)=2; L2: (3+1)-(4+2)=-2; approx 10
    val hand = Seq((day(0), 0.03), (day(1), 0.01), (day(2), 0.04),
      (day(3), 0.02)).toDF("ts", "v")
    val h = Events.haarDecompose(hand, "ts", "v", levels = 2)
      .orderBy("level", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(h === Map((0, 0L) -> 10L, (1, 0L) -> 2L, (1, 1L) -> 2L,
      (2, 0L) -> -2L))
    // constant series: every detail coefficient is exactly 0
    val const = (0 until 16).map(i => (day(i), 1.0)).toDF("ts", "v")
    val c = Events.haarDecompose(const, "ts", "v", levels = 4).collect()
    assert(c.filter(_.getInt(0) > 0).forall(_.getLong(2) === 0L))
    assert(c.find(_.getInt(0) === 0).get.getLong(2) === 1600L)
    // a single spike loads EXACTLY ONE block per level
    val spike = (0 until 16).map(i =>
      (day(i), if (i == 5) 9.0 else 0.0)).toDF("ts", "v")
    val s = Events.haarDecompose(spike, "ts", "v", levels = 4).collect()
    (1 to 4).foreach { l =>
      assert(s.count(r => r.getInt(0) == l && r.getLong(2) != 0L) === 1)
    }
    graft.engine.Caches.releaseAll()
  }

  test("croston: hand recursion, zero-day inertness, per-key reset") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    // demand on days 0 (1000c), 2 (2000c), 3 (3000c); silent day 1
    val rows = Seq(("a", day(0), 10.0), ("a", day(2), 20.0),
      ("a", day(3), 30.0), ("b", day(0), 10.0))
      .toDF("k", "ts", "v")
    val got = Events.croston(rows, "k", "ts", "v")
      .orderBy("k", "day").collect()
    assert(got.length === 4) // zero days emit nothing
    val a = got.filter(_.getString(0) == "a")
    assert(a(0).getDouble(3) === 1000.0 && a(0).getDouble(4) === 1.0)
    // gap 2: z = .25*2000 + .75*1000 = 1250; p = .25*2 + .75*1 = 1.25
    assert(a(1).getDouble(3) === 1250.0 && a(1).getDouble(4) === 1.25)
    assert(a(1).getDouble(5) === 1000.0) // 1250/1.25 exactly
    // gap 1: z = .25*3000 + .75*1250 = 1687.5; p = .25 + .9375
    assert(a(2).getDouble(3) === 1687.5 && a(2).getDouble(4) === 1.1875)
    // key b restarts cleanly
    val b = got.filter(_.getString(0) == "b").head
    assert(b.getDouble(3) === 1000.0 && b.getDouble(4) === 1.0)
    graft.engine.Caches.releaseAll()
  }

  test("shapleyAttribution: hand split, efficiency, null player, symmetry") {
    def f(rows: Seq[(Long, String)]) = rows.toDF("u", "ch")
    val conv = col("ch") === "p"
    // hand case: u1 {a} conv, u2 {a,b} conv, u3 {b} no, u4 {} conv
    // -> v(0)=1 v(a)=2 v(b)=1 v(ab)=3; phi*2! = (a: 3, b: 1)
    val base = Seq((1L, "a"), (1L, "p"), (2L, "a"), (2L, "b"), (2L, "p"),
      (3L, "b"), (4L, "p"))
    val got = Events.shapleyAttribution(f(base), "u", "ch", conv,
      Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((3L, 1500000L)), "b" -> ((1L, 500000L))))
    // null player: an untouched channel earns exactly 0, and the
    // efficiency identity sum(phi*k!) = (v(full)-v(empty))*k! holds
    val g3 = Events.shapleyAttribution(f(base), "u", "ch", conv,
      Seq("a", "b", "c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g3("c") === 0L)
    assert(g3.values.sum === 2L * 6L)
    // symmetry: channels that always co-occur split equally
    val sym = Events.shapleyAttribution(
      f(Seq((1L, "a"), (1L, "b"), (1L, "p"), (2L, "x"))), "u", "ch",
      conv, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sym("a") === sym("b"))
    graft.engine.Caches.releaseAll()
  }

  test("jsdBins: identical zero, bounded by ln2, nonneg terms") {
    def f(rows: Seq[(String, Double)]) = rows.toDF("seg", "v")
    // identical ref/cur samples: pr == pc in every bin -> term 0.0
    val same = (1 to 100).flatMap(i =>
      Seq(("ref", i.toDouble), ("cur", i.toDouble)))
    val z = Events.jsdBins(f(same), "seg", "v", "ref", "cur").collect()
    assert(z.length === 10)
    assert(z.forall(_.getAs[Double]("term") === 0.0))
    // disjoint masses: sum approaches ln 2 but never exceeds it, and
    // every per-bin term is non-negative (log-sum inequality)
    val disj = (1 to 100).map(i => ("ref", i.toDouble)) ++
      (1 to 100).map(i => ("cur", 1000.0 + i))
    val d = Events.jsdBins(f(disj), "seg", "v", "ref", "cur").collect()
    assert(d.forall(_.getAs[Double]("term") >= 0.0))
    val total = d.map(_.getAs[Double]("term")).sum
    assert(total > 0.3 && total <= math.log(2.0) + 1e-9)
    graft.engine.Caches.releaseAll()
  }

  test("kleinbergBursts: planted burst, gamma extremes") {
    def day(i: Int) = ts(f"2026-01-${i + 1}%02d 12:00:00")
    // counts: 10/day for days 0..9, 100/day for 10..14, 10/day 15..19
    val rows = (0 until 20).flatMap { i =>
      val n = if (i >= 10 && i < 15) 100 else 10
      (0 until n).map(_ => Tuple1(day(i)))
    }.toDF("ts")
    val got = Events.kleinbergBursts(rows, "ts")
      .orderBy("day").collect()
    assert(got.length === 20)
    assert(got.map(_.getAs[Boolean]("burst")).toSeq
      === (0 until 20).map(i => i >= 10 && i < 15))
    assert(got.map(_.getAs[Long]("n_events")).sum === 650L)
    // a prohibitive entry cost suppresses every burst
    val none = Events.kleinbergBursts(rows, "ts",
      gammaMicro = 1000000000000L).collect()
    assert(none.forall(!_.getAs[Boolean]("burst")))
    // free switching: burst exactly where the burst state is cheaper
    // pointwise (c1 < c0), i.e. the 100-count days
    val free = Events.kleinbergBursts(rows, "ts", gammaMicro = 0L)
      .orderBy("day").collect()
    assert(free.map(_.getAs[Boolean]("burst")).toSeq
      === (0 until 20).map(i => i >= 10 && i < 15))
    graft.engine.Caches.releaseAll()
  }

  test("itemSimilarityTopK: hand cosine, popularity cut, ties, k cut") {
    // baskets: items x,y always together (2 of 2); z in every basket
    // (4): cos(x,y) = 2/sqrt(2*2) = 1.0; cos(x,z) = 2/sqrt(2*4) ~ .7071
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "z"), (3L, "w"),
      (4L, "z"), (4L, "w"))
      .toDF("k", "i")
    val got = Events.itemSimilarityTopK(df, "k", "i",
        minPairKeys = 2L, k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // perfect pair ranks first for both x and y
    assert(got(("x", "y")) === ((1L, 2L, 1000000L)))
    assert(got(("y", "x")) === ((1L, 2L, 1000000L)))
    assert(got(("x", "z")) === ((2L, 2L, 707106L)))
    assert(got(("w", "z")) === ((1L, 2L, 707106L)))
    // z's neighbors: x,y,w all cos .7071 n_both 2 -> tie breaks by nbr
    assert(got(("z", "w")) === ((1L, 2L, 707106L)))
    assert(got(("z", "x")) === ((2L, 2L, 707106L)))
    assert(got(("z", "y")) === ((3L, 2L, 707106L)))
    // minPairKeys cuts singleton co-occurrences entirely
    val cut = Events.itemSimilarityTopK(df, "k", "i",
      minPairKeys = 3L, k = 5).collect()
    assert(cut.isEmpty) // no pair co-occurs in 3 baskets
    // k cut: z keeps only its single best neighbor
    val k1 = Events.itemSimilarityTopK(df, "k", "i",
        minPairKeys = 2L, k = 1)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(k1("z") === "w")
    graft.engine.Caches.releaseAll()
  }

  test("sprtDaily: drift directions, first-day identity, bound behavior") {
    def mk(rows: Seq[(Int, Boolean)]) = rows.map { case (d, h) =>
      (java.sql.Timestamp.valueOf(f"2026-01-${d + 1}%02d 10:00:00"), h) }
      .toDF("ts", "hi")
    // all hits: llr climbs by n*ln(4/3) a day and accepts H1
    val up = Events.sprtDaily(
      mk((0 until 20).flatMap(d => Seq.fill(10)((d, true)))),
      "ts", "hi", 300L, 400L, 50L).orderBy("day").collect()
    assert(up.head.getLong(3) === up.head.getLong(4)) // day1: llr = delta
    assert(up.head.getLong(3) === 10L * 287682L)      // 10*floor(ln(4/3)e6)
    assert(up.last.getString(5) === "accept_h1")
    // all misses: llr falls by n*|ln(6/7)| and accepts H0
    val dn = Events.sprtDaily(
      mk((0 until 20).flatMap(d => Seq.fill(10)((d, false)))),
      "ts", "hi", 300L, 400L, 50L).orderBy("day").collect()
    assert(dn.head.getLong(3) === 10L * -154151L)     // floor rounds down
    assert(dn.last.getString(5) === "accept_h0")
    // one borderline day stays inside the bounds
    val mid = Events.sprtDaily(mk(Seq((0, true), (0, false))),
      "ts", "hi", 300L, 400L, 50L).collect().head
    assert(mid.getString(5) === "continue")
    intercept[IllegalArgumentException](
      Events.sprtDaily(mk(Seq((0, true))), "ts", "hi", 400L, 300L, 50L))
  }

  test("markovStationary: alternating-cycle uniformity, hand 2-state " +
      "limit, mass conservation, dead-state fence") {
    def ev(types: Seq[String]) = types.zipWithIndex.map { case (t, i) =>
      (1L, java.sql.Timestamp.valueOf(f"2026-01-01 10:${i}%02d:00"),
        i.toLong, t) }.toDF("user_id", "ts", "event_id", "event_type")
    // a<->b cycle: pi = (1/2, 1/2) at every even iterate
    val cyc = Events.markovStationary(
      ev(Seq("a", "b", "a", "b", "a")), "user_id", "ts", "event_id",
      "event_type", 30).orderBy("state").collect()
    assert(cyc.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("a", 2L, 500000L), ("b", 2L, 500000L)))
    // P = [[3/4, 1/4], [1, 0]] has stationary (4/5, 1/5); 30 pinned
    // iterations land within one micro of it
    val hand = Events.markovStationary(
      ev(Seq("a", "a", "a", "a", "b", "a")), "user_id", "ts",
      "event_id", "event_type", 30).orderBy("state").collect()
    val pa = hand(0).getLong(2)
    assert(math.abs(pa - 800000L) <= 1L)
    assert(math.abs(hand.map(_.getLong(2)).sum - 1000000L) <= 2L)
    // a state with no outgoing transitions is a modeling error
    intercept[IllegalArgumentException](
      Events.markovStationary(ev(Seq("a", "b")), "user_id", "ts",
        "event_id", "event_type", 10))
    // config-scale contract: the state-count guard fires BEFORE the
    // K x K collect, pointing high-cardinality callers at rareCollapse
    val wide = ev((0 until 8).map(i => s"s$i") ++ Seq("s0"))
    val guard = intercept[IllegalArgumentException](
      Events.markovStationary(wide, "user_id", "ts", "event_id",
        "event_type", 10, maxStates = 4))
    assert(guard.getMessage.contains("rareCollapse"))
    // at the bound it still runs
    assert(Events.markovStationary(wide, "user_id", "ts", "event_id",
      "event_type", 10, maxStates = 8).count() === 8L)
    graft.engine.Caches.releaseAll()
  }

  test("itemSimilarityTopK/recsHitRate: basket cap drops pathological " +
      "keys, capped output is a subset, default cap non-binding") {
    // one crawler basket touching 30 items next to two clean baskets
    val crawler = (0 until 30).map(i => (99L, s"i$i"))
    val clean = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val df = (clean ++ crawler).toDF("k", "i")
    val capped = Events.itemSimilarityTopK(df, "k", "i",
      minPairKeys = 1L, k = 5, maxBasketSize = 10L).collect()
    val uncapped = Events.itemSimilarityTopK(df, "k", "i",
      minPairKeys = 1L, k = 5).collect()
    // capped model = exactly the clean-basket model: the crawler's
    // pairs are gone, x<->y survives
    assert(capped.map(r => (r.getString(0), r.getString(2))).toSet ===
      Set(("x", "y"), ("y", "x")))
    // capped pair set is a subset of the uncapped pair set
    val up = uncapped.map(r => (r.getString(0), r.getString(2))).toSet
    assert(capped.map(r => (r.getString(0), r.getString(2))).toSet
      .subsetOf(up))
    assert(up.size > 2)
    // default cap doesn't bind on ordinary baskets: identical output
    val dflt = Events.itemSimilarityTopK(df, "k", "i",
      minPairKeys = 1L, k = 5, maxBasketSize = 10000L).collect()
    assert(dflt.map(r => (r.getString(0), r.getString(2))).toSet === up)
    // recsHitRate threads the cap: an oversized TEST basket is
    // excluded from evaluation (no evals left -> hit rate over 2 evals
    // of the clean test basket only)
    val train = df
    val test = (Seq((10L, "x"), (10L, "y")) ++
      (0 until 30).map(i => (11L, s"i$i"))).toDF("k", "i")
    val hr = Events.recsHitRate(train, test, "k", "i",
      minPairKeys = 1L, k = 5, maxBasketSize = 10L).collect().head
    // basket 11 excluded: 1 basket, 2 evals, both hit via x<->y
    assert((hr.getLong(0), hr.getLong(1), hr.getLong(2), hr.getLong(3))
      === ((1L, 2L, 2L, 1000L)))
    graft.engine.Caches.releaseAll()
  }

  test("asofJoinTolerance: stale match nulls, boundary inclusive, " +
      "zero tolerance = same instant, no-match passthrough") {
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 12:00:00")), // 30 min stale -> kept
      (2L, 10L, ts("2026-01-01 14:00:00")), // 2.5 h stale -> nulled
      (3L, 10L, ts("2026-01-01 11:30:00")), // same instant -> kept
      (4L, 10L, ts("2026-01-01 12:30:00")), // exactly AT tolerance
      (5L, 20L, ts("2026-01-01 12:00:00"))) // no purchases at all
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((10L, ts("2026-01-01 11:30:00"), 5.0))
      .toDF("user_id", "ts", "value")
    def run(tolMicros: Long) = graft.operators.Events.asofJoinTolerance(
      clicks, purchases, "user_id", "ts", "value", "v", tolMicros)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    val hour = run(3600L * 1000000L)
    assert(hour === Map(1L -> 5.0, 2L -> -1.0, 3L -> 5.0, 4L -> 5.0,
      5L -> -1.0))
    val zero = run(0L)
    assert(zero === Map(1L -> -1.0, 2L -> -1.0, 3L -> 5.0, 4L -> -1.0,
      5L -> -1.0))
  }

  test("asofJoinTolerance: null payload on the latest right row stays " +
      "with its own timestamp (no stale decoupled payload)") {
    // right: 11:00 -> 5.0, 11:45 -> NULL. A click at 12:00 with 30 min
    // tolerance matches the 11:45 row (in budget) whose payload is
    // NULL — it must NOT surface the 11:00 payload (60 min stale)
    // against the 11:45 timestamp.
    val clicks = Seq((1L, 10L, ts("2026-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2026-01-01 11:00:00"), Some(5.0)),
      (10L, ts("2026-01-01 11:45:00"), Option.empty[Double]))
      .toDF("user_id", "ts", "value")
    val out = graft.operators.Events.asofJoinTolerance(
      clicks, purchases, "user_id", "ts", "value", "v",
      30L * 60L * 1000000L).collect().head
    assert(out.isNullAt(3))
    // with a 90 min budget the matched row is STILL 11:45 (the latest
    // right row defines the match, native-ASOF style) -> still NULL
    val wide = graft.operators.Events.asofJoinTolerance(
      clicks, purchases, "user_id", "ts", "value", "v",
      90L * 60L * 1000000L).collect().head
    assert(wide.isNullAt(3))
  }

  test("recsMrr: buried hit scores half, miss contributes zero") {
    // model from {1,2}x3 and {1,3}x3: item 1's neighbors tie on count
    // and rank by nbr asc -> (2 at rank 1, 3 at rank 2); items 2 and 3
    // each have only neighbor 1 at rank 1
    val train = ((101L to 103L).flatMap(k => Seq((k, 1L), (k, 2L))) ++
      (104L to 106L).flatMap(k => Seq((k, 1L), (k, 3L))))
      .toDF("k", "i")
    // basket {1,3}: item 1 finds 3 at rank 2 (rr 500000), item 3 finds
    // 1 at rank 1 (rr 1000000); basket {2,3}: both items miss
    val test = Seq((201L, 1L), (201L, 3L), (202L, 2L), (202L, 3L))
      .toDF("k", "i")
    val r = graft.operators.Events.recsMrr(train, test, "k", "i",
      minPairKeys = 3L, k = 5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((4L, 2L, 375000L)))
    graft.engine.Caches.releaseAll()
  }

  test("maseBacktest: perfect weekly 0, constant NULL, step series " +
      "punishes the seasonal forecast, gaps densify to zero days") {
    def series(key: String, vals: Seq[Double]) = vals.zipWithIndex.map {
      case (v, i) => (key, ts(f"2026-01-${i + 1}%02d 12:00:00"), v)
    }
    // 14 days cycling 1..7 twice: x_t == x_{t-7} exactly -> MASE 0
    val weekly = series("w", (0 until 14).map(i => (i % 7 + 1).toDouble))
    // constant: naive error 0 -> NULL
    val const = series("c", Seq.fill(10)(5.0))
    // a level shift at day 8: seasonal error pays it for 7 days,
    // naive pays once -> MASE = 7000
    val step = series("s", Seq.fill(7)(0.0) ++ Seq.fill(7)(10.0))
    val df = (weekly ++ const ++ step).toDF("k", "ts", "v")
    val got = graft.operators.Events.maseBacktest(df, "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("w") === ((7L, 0L, 12L * 100L, 0L)))
    assert(got("c")._4 === -1L)
    assert(got("s") === ((7L, 7L * 1000L, 1000L, 7000L)))
    // a silent day is a real zero: days 1..3 and 11..13 present, the
    // 7-day gap densifies, so day 11 (= t10) sees x_{t-7} = day 4 = 0
    val gappy = (series("g", Seq(2.0, 2.0, 2.0)) ++
      Seq(10, 11, 12).map(d => ("g", ts(f"2026-01-$d%02d 12:00:00"), 2.0)))
      .toDF("k", "ts", "v")
    val g = graft.operators.Events.maseBacktest(gappy, "k", "ts", "v")
      .collect().head
    // dense days 1..12, eval days 8..12: seasonal errors (200, 200,
    // 0, 200, 200) = 800 cents against days 1..5; naive errors all 0
    // except the day-10 re-entry (200) -> MASE 4000
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4))
      === ((5L, 800L, 200L, 4000L)))
    graft.engine.Caches.releaseAll()
  }
}
