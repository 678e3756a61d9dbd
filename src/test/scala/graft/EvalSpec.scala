package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

/** Model-eval operator tests: exact AUC (separation extremes, tie
  * halving, brute-force pair-enumeration equality, band invariance)
  * and the decile lift table (perfect/uniform scorers, tie
  * determinism, equal-count buckets). */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def scored(rows: Seq[(Double, Int)]) =
    rows.zipWithIndex.map { case ((s, y), i) => (i.toLong, s, y) }
      .toDF("id", "score", "y")

  test("aucExact: separation extremes, all-tied 500, empty side null") {
    // positives strictly above negatives: AUC = 1
    val perfect = Eval.aucExact(
      scored(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))), "score", "y")
      .collect().head
    assert((perfect.getLong(2), perfect.getLong(3), perfect.getDouble(4))
      === ((8L, 1000L, 1.0)))
    // reversed: AUC = 0
    val rev = Eval.aucExact(
      scored(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))), "score", "y")
      .collect().head
    assert(rev.getLong(2) === 0L && rev.getDouble(4) === 0.0)
    // every score tied: pure ties, AUC exactly 1/2
    val tied = Eval.aucExact(
      scored(Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0))), "score", "y")
      .collect().head
    assert(tied.getLong(2) === 4L && tied.getDouble(4) === 0.5)
    // no positives: undefined, null not div-by-zero
    val none = Eval.aucExact(
      scored(Seq((0.9, 0), (0.1, 0))), "score", "y").collect().head
    assert(none.isNullAt(3) && none.isNullAt(4))
    graft.engine.Caches.releaseAll()
  }

  test("aucExact: equals brute-force pair enumeration; band invariance") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(60)((rnd.nextInt(10).toDouble, rnd.nextInt(2)))
    def brute(rs: Seq[(Double, Int)]): Long = {
      val pos = rs.filter(_._2 == 1).map(_._1)
      val neg = rs.filter(_._2 == 0).map(_._1)
      pos.map(p => 2L * neg.count(p > _) + neg.count(p == _)).sum
    }
    val expected = brute(rows)
    for (bands <- Seq(1, 4, 32)) {
      val got = Eval.aucExact(scored(rows), "score", "y", bands)
        .collect().head
      assert(got.getLong(2) === expected, s"bands=$bands")
    }
    graft.engine.Caches.releaseAll()
  }

  test("liftTable: perfect and uniform scorers, equal buckets, tie determinism") {
    // N=100, P=10, perfect scorer: all positives in decile 0
    val perfect = (0 until 100).map(i =>
      (i.toLong, (100 - i).toDouble, if (i < 10) 1 else 0))
      .toDF("id", "score", "y")
    val p = Eval.liftTable(perfect, "score", "y", "id")
      .orderBy("decile").collect()
    assert(p.length === 10 && p.forall(_.getLong(1) === 10L))
    assert(p.head.getInt(0) === 0 && p.head.getLong(2) === 10L)
    assert(p.head.getLong(4) === 10000L) // 10x lift in the top decile
    assert(p.last.getLong(4) === 1000L)  // whole population: 1x
    assert(p.head.getLong(5) === 1000L)  // top decile captures all
    // uniform scorer (all scores tied, ids break ties): one positive
    // per decile -> lift 1000 everywhere
    val uniform = (0 until 100).map(i =>
      (i.toLong, 1.0, if (i % 10 == 0) 1 else 0)).toDF("id", "score", "y")
    val u = Eval.liftTable(uniform, "score", "y", "id")
      .orderBy("decile").collect()
    assert(u.forall(r => r.getLong(4) === 1000L))
    // tie determinism: with all scores tied the rank order IS id order
    assert(u.forall(_.getLong(2) === 1L))
    graft.engine.Caches.releaseAll()
  }

  test("confusionReport: hand matrix, degenerate thresholds, P/N identities") {
    val df = scored(Seq((0.9, 1), (0.8, 0), (0.6, 1), (0.4, 0),
      (0.2, 1), (0.1, 0)))
    val got = Eval.confusionReport(df, "score", "y",
      Seq(0L, 500L, 10000L)).collect()
      .map(r => r.getLong(0) -> r).toMap
    // thr 500: {900,800,600} predicted positive -> tp=2 fp=1 tn=2 fn=1
    val m = got(500L)
    assert((m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
      === ((2L, 1L, 2L, 1L)))
    assert((m.getLong(5), m.getLong(6), m.getLong(7))
      === ((666L, 666L, 666L)))
    // thr 0: everything predicted positive; precision = prevalence
    val lo = got(0L)
    assert((lo.getLong(1), lo.getLong(2), lo.getLong(3), lo.getLong(4))
      === ((3L, 3L, 0L, 0L)))
    assert(lo.getLong(5) === 500L && lo.getLong(6) === 1000L)
    // thr 10000: nothing predicted positive; precision undefined (null)
    val hi = got(10000L)
    assert((hi.getLong(1), hi.getLong(2), hi.getLong(3), hi.getLong(4))
      === ((0L, 0L, 3L, 3L)))
    assert(hi.isNullAt(5) && hi.getLong(6) === 0L && hi.getLong(7) === 0L)
    // P = tp + fn and N = fp + tn hold at every threshold
    assert(got.values.forall(r =>
      r.getLong(1) + r.getLong(4) === 3L &&
        r.getLong(2) + r.getLong(3) === 3L))
  }

  test("diffInDiff: parallel-trends zero, pure treatment lift, cell bookkeeping") {
    import java.sql.Timestamp
    def at(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    // midpoint cutover = 11:00; both groups drift +1.00 pre→post
    def frame(treatPost: Double) = Seq(
      (false, at(10), 1.0), (false, at(12), 2.0),
      (true, at(10), 3.0), (true, at(12), treatPost))
      .toDF("treat", "ts", "v")
    val nul = Eval.diffInDiff(frame(4.0), "treat", "ts", "v")
      .collect().head
    assert((0 to 7).map(nul.getLong).toSeq ===
      Seq(1L, 400L, 1L, 300L, 1L, 200L, 1L, 100L))
    assert(nul.getDouble(8) === 0.0)
    // +0.50 only where treatment was live: the estimate reads 50 cents
    val lift = Eval.diffInDiff(frame(4.5), "treat", "ts", "v")
      .collect().head
    assert(lift.getLong(1) === 450L && lift.getDouble(8) === 50.0)
  }

  test("mccKappa: hand matrix, perfect/inverted extremes, degenerate nulls") {
    // thr 500: tp=2 fp=1 tn=2 fn=1 -> MCC = 3/9, kappa = 6/18 = 1/3
    val hand = Eval.mccKappa(
      scored(Seq((0.9, 1), (0.8, 0), (0.6, 1), (0.4, 0), (0.2, 1),
        (0.1, 0))), "score", "y", 500L).collect().head
    assert((hand.getLong(1), hand.getLong(2), hand.getLong(3),
      hand.getLong(4)) === ((2L, 1L, 2L, 1L)))
    assert(hand.getLong(5) === 333333L && hand.getLong(6) === 333333L)
    // perfect separation: both coefficients read exactly +1
    val perfect = Eval.mccKappa(
      scored(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))),
      "score", "y", 500L).collect().head
    assert(perfect.getLong(5) === 1000000L &&
      perfect.getLong(6) === 1000000L)
    // inverted labels: exactly -1 (floor of an exact -1.0 is -1)
    val inv = Eval.mccKappa(
      scored(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))),
      "score", "y", 500L).collect().head
    assert(inv.getLong(5) === -1000000L && inv.getLong(6) === -1000000L)
    // all-positive labels: a zero marginal nulls MCC; kappa reads 0
    val degen = Eval.mccKappa(
      scored(Seq((0.9, 1), (0.8, 1), (0.2, 1))), "score", "y", 500L)
      .collect().head
    assert(degen.isNullAt(5) && degen.getLong(6) === 0L)
  }

  test("averagePrecision: perfect/worst orderings, interleaved hand value") {
    // positives rank 1..P: every precision term is exactly 1
    val perfect = Eval.averagePrecision(
      scored(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))),
      "score", "y", "id").collect().head
    assert((perfect.getLong(0), perfect.getLong(1), perfect.getLong(2))
      === ((4L, 2L, 1000000L)))
    // positives at the bottom: (1e6 div 3 + 2e6 div 4) div 2
    val worst = Eval.averagePrecision(
      scored(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))),
      "score", "y", "id").collect().head
    assert(worst.getLong(2) === (333333L + 500000L) / 2)
    // interleaved: ranks 1 and 3 positive
    val mid = Eval.averagePrecision(
      scored(Seq((0.9, 1), (0.8, 0), (0.2, 1), (0.1, 0))),
      "score", "y", "id").collect().head
    assert(mid.getLong(2) === (1000000L + 666666L) / 2)
    graft.engine.Caches.releaseAll()
  }

  test("mannWhitney: hand tie ranks, U identity, separation, all-tied null z") {
    def frame(g1: Seq[Double], g2: Seq[Double]) =
      (g1.map((_, true)) ++ g2.map((_, false))).toDF("v", "grp")
    // {1,2} vs {2,3}: doubled ranks 2, 5|5, 8 -> r2=7, u2=1
    val hand = Eval.mannWhitney(frame(Seq(1, 2), Seq(2, 3)), "v", "grp")
      .collect().head
    assert((hand.getLong(0), hand.getLong(1), hand.getLong(2),
      hand.getLong(3)) === ((2L, 2L, 7L, 1L)))
    // U1 + U2 = 2*n1*n2: recompute with groups swapped
    val swapped = Eval.mannWhitney(frame(Seq(2, 3), Seq(1, 2)), "v", "grp")
      .collect().head
    assert(hand.getLong(3) + swapped.getLong(3) === 8L)
    // full separation: u2 = 2*n1*n2 and z strictly positive
    val sep = Eval.mannWhitney(frame(Seq(5, 6, 7), Seq(1, 2)), "v", "grp")
      .collect().head
    assert(sep.getLong(3) === 12L && sep.getLong(4) > 0L)
    // every value tied: tie-corrected variance collapses to 0 -> null z
    val tied = Eval.mannWhitney(frame(Seq(1, 1), Seq(1, 1)), "v", "grp")
      .collect().head
    assert(tied.getLong(3) === 4L && tied.isNullAt(4))
    graft.engine.Caches.releaseAll()
  }

  test("kendallTau: extremes, hand tie table, pair bookkeeping identity") {
    def series(rows: Seq[(Long, Long, Long)]) = rows.toDF("k", "x", "y")
    // perfect monotone: tau exactly +1; reversed exactly -1
    val up = Eval.kendallTau(
      series(Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L))),
      "k", "x", "y").collect().head
    assert(up.getLong(5) === 1000000L && up.getLong(2) === 0L)
    val down = Eval.kendallTau(
      series(Seq((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L))),
      "k", "x", "y").collect().head
    assert(down.getLong(5) === -1000000L)
    // hand ties: (1,1),(2,1),(3,2) -> nc=2 nd=0 tx=0 ty=1,
    // tau = 2/sqrt(3*2) -> floor 816496
    val tie = Eval.kendallTau(
      series(Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 2L))),
      "k", "x", "y").collect().head
    assert((tie.getLong(0), tie.getLong(1), tie.getLong(2),
      tie.getLong(3), tie.getLong(4)) === ((3L, 2L, 0L, 0L, 1L)))
    assert(tie.getLong(5) === 816496L)
    // all pairs accounted for: n0 = n(n-1)/2
    assert(tie.getLong(0) === 3L)
    graft.engine.Caches.releaseAll()
  }

  test("wilsonIntervals: edge bounds inside [0,1], replay equality, nesting") {
    def frame(rows: Seq[(String, Boolean)]) = rows.toDF("g", "ok")
    def wilson(k: Long, n: Long): (Long, Long) = {
      val z = 1.96; val nD = n.toDouble; val p = k.toDouble / nD
      val z2 = z * z
      val denom = 1.0 + z2 / nD
      val center = p + z2 / (2.0 * nD)
      val margin = z * math.sqrt(p * (1.0 - p) / nD + z2 / (4.0 * nD * nD))
      (math.floor((center - margin) / denom * 1000000.0).toLong,
        math.floor((center + margin) / denom * 1000000.0).toLong)
    }
    val got = Eval.wilsonIntervals(
      frame(Seq.fill(3)(("a", false)) ++ Seq.fill(4)(("b", true)) ++
        Seq(("c", true)) ++ Seq.fill(3)(("c", false))), "g", "ok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // bit-exact against the same-op-order Scala replay
    for ((g, (k, n, lo, hi)) <- got)
      assert((lo, hi) === wilson(k, n), g)
    // k=0 and k=n stay inside [0, 1] where the normal interval escapes
    val (lo0, hi0) = (got("a")._3, got("a")._4)
    assert(lo0 === 0L && hi0 > 0L && hi0 < 1000000L)
    val (loN, hiN) = (got("b")._3, got("b")._4)
    assert(loN > 0L && hiN <= 1000000L)
    // more data, same rate: the interval tightens
    val wide = wilson(1, 4)
    val tight = wilson(100, 400)
    assert(tight._1 > wide._1 && tight._2 < wide._2)
  }

  test("calibrationBins: zero gaps when calibrated, constant scorer, bin counts") {
    // two score levels whose observed rates equal the scores exactly
    val cal = scored(
      Seq.fill(4)((0.8, 1)) ++ Seq((0.8, 0)) ++
        Seq((0.2, 1)) ++ Seq.fill(4)((0.2, 0)))
    val c = Eval.calibrationBins(cal, "score", "y", "id", k = 2)
      .orderBy("bin").collect()
    assert(c.length === 2 && c.forall(_.getLong(1) === 5L))
    assert((c(0).getLong(3), c(0).getLong(4), c(0).getLong(5))
      === ((800L, 800L, 0L)))
    assert((c(1).getLong(3), c(1).getLong(4), c(1).getLong(5))
      === ((200L, 200L, 0L)))
    // constant scorer: both bins read the same mean prediction; ids
    // split the tie deterministically into equal bins
    val const = scored((0 until 10).map(i => (0.5, if (i < 3) 1 else 0)))
    val k2 = Eval.calibrationBins(const, "score", "y", "id", k = 2)
      .orderBy("bin").collect()
    assert(k2.forall(_.getLong(3) === 500L))
    assert(k2.map(_.getLong(1)).toSeq === Seq(5L, 5L))
    // id order under total tie: positives (ids 0,1,2) land in bin 0
    assert(k2(0).getLong(2) === 3L && k2(1).getLong(2) === 0L)
    graft.engine.Caches.releaseAll()
  }

  test("ndcgAtK: perfect ranking = 1000, hand inversion, zero-relevance NULL, k cap") {
    // group 1: model ranks rel (3,2,1) by score — the ideal order => 1000
    // group 2: model ranks rel (1,3) — one inversion;
    //   dcg = t(1,1) + t(3,2) where t(r,i) = floor(r*1e6/log2(i+1) + .5)
    //   idcg = t(3,1) + t(1,2)
    // group 3: all rel 0 => idcg 0 => ndcg NULL
    val rows = Seq(
      (1L, 9.0, 1L, 3L), (1L, 8.0, 2L, 2L), (1L, 7.0, 3L, 1L),
      (2L, 9.0, 1L, 1L), (2L, 8.0, 2L, 3L),
      (3L, 9.0, 1L, 0L), (3L, 8.0, 2L, 0L))
      .toDF("g", "score", "id", "rel")
    def t6(r: Long, i: Int): Long =
      math.floor(r * 1000000.0 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong
    val out = Eval.ndcgAtK(rows, "g", "score", "id", "rel", 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    val d1 = t6(3, 1) + t6(2, 2) + t6(1, 3)
    assert(out(1L) === ((d1, d1, 1000L)))
    val d2 = t6(1, 1) + t6(3, 2); val i2 = t6(3, 1) + t6(1, 2)
    assert(out(2L) === ((d2, i2, d2 * 1000 / i2)))
    assert(out(3L) === ((0L, 0L, -1L)))
    // k cap: with k = 1 only the top row counts
    val capped = Eval.ndcgAtK(rows, "g", "score", "id", "rel", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(1L) === t6(3, 1) && capped(2L) === t6(1, 1))
  }

  test("bhAdjust: hand q-values, step-up property, monotone q, band invariance") {
    def ps(micros: Seq[Long]) =
      micros.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("k", "p")
    // textbook: p = (.01, .02, .03, .50), α = .05 → reject first 3;
    // q = suffix-min of m·p/rank = (.04, .04, .04, .50)
    val out = Eval.bhAdjust(ps(Seq(10000L, 20000L, 30000L, 500000L)),
        "k", "p", alphaMilli = 50L)
      .orderBy("p_rank").collect()
    assert(out.map(_.getAs[Long]("q_micro")).toSeq
      === Seq(40000L, 40000L, 40000L, 500000L))
    assert(out.map(_.getAs[Boolean]("rejected")).toSeq
      === Seq(true, true, true, false))
    // step-up: p = (.01, .04, .049) — p2 fails ITS critical (.0333) but
    // p3 passes (.05), so the step-up cutoff rejects all three
    val su = Eval.bhAdjust(ps(Seq(10000L, 40000L, 49000L)), "k", "p",
      alphaMilli = 50L).collect()
    assert(su.forall(_.getAs[Boolean]("rejected")))
    // monotone q on an arbitrary set + band invariance (bands is an
    // implementation detail)
    val mixed = Seq(812345L, 3000L, 451000L, 90000L, 90000L, 7L, 999999L)
    val q32 = Eval.bhAdjust(ps(mixed), "k", "p", 50L, bands = 32)
      .orderBy("p_rank").collect()
    assert(q32.map(_.getAs[Long]("q_micro")).toSeq
      === q32.map(_.getAs[Long]("q_micro")).toSeq.sorted)
    val q1 = Eval.bhAdjust(ps(mixed), "k", "p", 50L, bands = 1)
      .orderBy("p_rank").collect()
    assert(q32.map(r => (r.getLong(0), r.getAs[Long]("q_micro"),
        r.getAs[Boolean]("rejected"))).toSeq
      === q1.map(r => (r.getLong(0), r.getAs[Long]("q_micro"),
        r.getAs[Boolean]("rejected"))).toSeq)
    graft.engine.Caches.releaseAll()
  }

  test("fleissKappa: perfect 1000, symmetric -1000, one-category NULL, first-r") {
    def rt(rows: Seq[(Long, Long, String)]) =
      rows.toDF("item", "ord", "cat")
    // per-item unanimity across two different categories: κ = 1
    val perfect = Eval.fleissKappa(rt(Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"),
      (2L, 1L, "b"), (2L, 2L, "b"), (2L, 3L, "b"))),
      "item", "ord", "cat", r = 3).collect().head
    assert(perfect.getAs[Long]("kappa_milli") === 1000L)
    // symmetric (a,b) disagreement on every item: κ = −1 at r = 2
    val anti = Eval.fleissKappa(rt(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "a"), (2L, 2L, "b"))),
      "item", "ord", "cat", r = 2).collect().head
    assert(anti.getAs[Long]("kappa_milli") === -1000L)
    // every rating one category: P̄e = 1 → NULL guard (factor test)
    val flat = Eval.fleissKappa(rt(Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (2L, 1L, "a"), (2L, 2L, "a"))),
      "item", "ord", "cat", r = 2).collect().head
    assert(flat.isNullAt(flat.fieldIndex("kappa_milli")))
    // first-r selection: item 1's 4th rating ignored (order 4 breaks
    // unanimity only if included); item 2 has one rating → dropped
    val sel = Eval.fleissKappa(rt(Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"), (1L, 4L, "z"),
      (2L, 1L, "b"),
      (3L, 1L, "b"), (3L, 2L, "b"), (3L, 3L, "b"))),
      "item", "ord", "cat", r = 3).collect().head
    assert(sel.getAs[Long]("n_items") === 2L &&
      sel.getAs[Long]("kappa_milli") === 1000L)
    graft.engine.Caches.releaseAll()
  }

  test("qiniCurve: hand prefix arithmetic, null-effect zero curve") {
    // ids 1..8, score = 9−id (id 1 ranks first), treat = odd id, k = 2
    def f(ys: Seq[Int]) =
      (1L to 8L).zip(ys).map { case (id, y) =>
        (id, 9.0 - id, id % 2 == 1, y) }.toDF("id", "s", "t", "y")
    // top half: treated {1,3} both hit, controls {2,4} miss;
    // bottom half: treated {5,7} miss, control 6 hits
    val out = Eval.qiniCurve(f(Seq(1, 0, 1, 0, 0, 1, 0, 0)),
        "s", "t", "y", "id", k = 2)
      .orderBy("decile").collect()
    assert(out.map(r => (r.getAs[Long]("cum_pos_t"),
      r.getAs[Long]("cum_pos_c"), r.getAs[Long]("qini_milli"),
      r.getAs[Long]("uplift_milli"))).toSeq
      === Seq((2L, 0L, 2000L, 1000L), (2L, 1L, 1000L, -500L)))
    // null effect: y depends on rank only, balanced arms → qini ≡ 0
    val nul = Eval.qiniCurve(f(Seq(1, 1, 1, 1, 0, 0, 0, 0)),
        "s", "t", "y", "id", k = 2)
      .orderBy("decile").collect()
    assert(nul.forall(_.getAs[Long]("qini_milli") === 0L))
    graft.engine.Caches.releaseAll()
  }

  test("brierDecomposition: perfect, base-rate, anti-calibrated; Murphy identity") {
    def f(rows: Seq[(Long, Int)]) = rows.toDF("p", "y")
    // perfect: brier 0; REL 0; RES == UNC == 250000
    val perf = Eval.brierDecomposition(
      f(Seq((1000L, 1), (0L, 0))), "p", "y").collect().head
    assert((perf.getAs[Long]("brier_micro"), perf.getAs[Long]("rel_micro"),
      perf.getAs[Long]("res_micro"), perf.getAs[Long]("unc_micro"))
      === ((0L, 0L, 250000L, 250000L)))
    // constant base-rate forecaster p = .5 on a balanced set:
    // brier = .25, REL = RES = 0, UNC = .25
    val base = Eval.brierDecomposition(
      f(Seq((500L, 1), (500L, 1), (500L, 0), (500L, 0))), "p", "y")
      .collect().head
    assert((base.getAs[Long]("brier_micro"), base.getAs[Long]("rel_micro"),
      base.getAs[Long]("res_micro"), base.getAs[Long]("unc_micro"))
      === ((250000L, 0L, 0L, 250000L)))
    // anti-calibrated: brier = 1 exactly
    val anti = Eval.brierDecomposition(
      f(Seq((0L, 1), (1000L, 0))), "p", "y").collect().head
    assert(anti.getAs[Long]("brier_micro") === 1000000L)
    // Murphy identity holds to per-bin quantization when forecasts are
    // constant within bins (heterogeneous bins add within-bin variance
    // terms — the standard 3-way form doesn't include them)
    val mixed = Eval.brierDecomposition(
      f(Seq((100L, 0), (350L, 0), (350L, 1), (620L, 1), (620L, 0),
        (950L, 1), (950L, 1), (100L, 0))), "p", "y").collect().head
    val id = mixed.getAs[Long]("rel_micro") - mixed.getAs[Long]("res_micro") +
      mixed.getAs[Long]("unc_micro")
    assert(math.abs(id - mixed.getAs[Long]("brier_micro")) <= 12L)
  }

  test("minDetectableEffect: hand variance, asymmetry, zero variance") {
    def f(rows: Seq[(Boolean, Long)]) = rows.toDF("t", "y")
    // control {0,2}, treat {1,3}: per-arm SS = 2, pooled var = 2
    val hand = Eval.minDetectableEffect(
      f(Seq((false, 0L), (false, 2L), (true, 1L), (true, 3L))),
      "t", "y").collect().head
    assert(hand.getAs[Long]("pooled_var_cents2") === 2L)
    val want = math.floor(
      2.8016 * math.sqrt(2.0 * (1.0 / 2.0 + 1.0 / 2.0)) * 1000000.0 + 0.5)
      .toLong
    assert(hand.getAs[Long]("mde_micro") === want)
    // more data, same variance: MDE shrinks
    val big = Eval.minDetectableEffect(
      f(Seq.tabulate(100)(i => (i % 2 == 1, (i % 4).toLong * 2))),
      "t", "y").collect().head
    assert(big.getAs[Long]("mde_micro") < hand.getAs[Long]("mde_micro"))
    // zero variance: MDE exactly 0 (floor(0 + .5) = 0 both engines)
    val zero = Eval.minDetectableEffect(
      f(Seq((false, 5L), (false, 5L), (true, 5L), (true, 5L))),
      "t", "y").collect().head
    assert(zero.getAs[Long]("pooled_var_cents2") === 0L)
    assert(zero.getAs[Long]("mde_micro") === 0L)
  }

  test("cuped: perfect covariate collapses, zero variance no-op, hand theta") {
    def f(rows: Seq[(Boolean, Long, Long)]) = rows.toDF("t", "x", "y")
    // x == y: theta = 1, every adjusted mean collapses to the pooled
    // mean x-bar = 250 cents -> 2_500_000 micro on both arms
    val perf = Eval.cuped(
      f(Seq((false, 100L, 100L), (false, 200L, 200L),
        (true, 300L, 300L), (true, 400L, 400L))), "t", "x", "y")
      .orderBy("treat").collect()
    assert(perf.map(_.getAs[Long]("theta_micro")).toSeq
      === Seq(1000000L, 1000000L))
    assert(perf.map(_.getAs[Long]("adj_mean_micro")).toSeq
      === Seq(250000000L, 250000000L))
    assert(perf.map(_.getAs[Long]("varred_micro")).toSeq
      === Seq(1000000L, 1000000L))
    // constant covariate: var(x) = 0 -> theta null, adjusted == raw
    val const = Eval.cuped(
      f(Seq((false, 5L, 100L), (true, 5L, 300L))), "t", "x", "y")
      .orderBy("treat").collect()
    assert(const.forall(_.isNullAt(4)))
    assert(const.map(_.getAs[Long]("adj_mean_micro")).toSeq
      === const.map(_.getAs[Long]("mean_y_micro")).toSeq)
    // hand theta: x in {0,2}, y = 10 + 3x -> cov/var = 3 exactly
    val hand = Eval.cuped(
      f(Seq((false, 0L, 10L), (false, 2L, 16L),
        (true, 0L, 10L), (true, 2L, 16L))), "t", "x", "y")
      .orderBy("treat").collect()
    assert(hand.forall(_.getAs[Long]("theta_micro") === 3000000L))
    // symmetric arms: adjusted means equal across arms
    assert(hand(0).getAs[Long]("adj_mean_micro")
      === hand(1).getAs[Long]("adj_mean_micro"))
  }

  test("srmCheck: perfect ratios zero, hand imbalance, missing arm") {
    def f(rows: Seq[(Long, String)]) = rows.toDF("u", "arm")
    // 2 units in a, 2 in b against 500/500: chi2 = 0
    val even = Eval.srmCheck(
      f(Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"),
        (3L, "b"))), // duplicate unit rows collapse
      "u", "arm", Seq("a" -> 500L, "b" -> 500L))
      .orderBy("arm").collect()
    assert(even.forall(_.getAs[Long]("term_micro") === 0L))
    assert(even.forall(_.getAs[Long]("chi2_micro") === 0L))
    assert(even.map(_.getAs[Long]("n_units")).toSeq === Seq(2L, 2L))
    // hand imbalance: 3 vs 1 against 500/500, n=4, e=2 each:
    // term = (3-2)^2/2 = .5 -> 500000 micro each, chi2 = 1e6
    val skew = Eval.srmCheck(
      f(Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))),
      "u", "arm", Seq("a" -> 500L, "b" -> 500L))
      .orderBy("arm").collect()
    assert(skew.map(_.getAs[Long]("term_micro")).toSeq
      === Seq(500000L, 500000L))
    assert(skew.forall(_.getAs[Long]("chi2_micro") === 1000000L))
    // an arm in the design with zero observed units still emits a row
    val miss = Eval.srmCheck(
      f(Seq((1L, "a"), (2L, "a"))),
      "u", "arm", Seq("a" -> 500L, "b" -> 500L))
      .orderBy("arm").collect()
    assert(miss.length === 2)
    assert(miss(1).getAs[Long]("n_units") === 0L)
    // (2-1)^2/1 + (0-1)^2/1 = 2 -> 2e6 micro
    assert(miss.forall(_.getAs[Long]("chi2_micro") === 2000000L))
    // weights must sum to 1000
    intercept[IllegalArgumentException] {
      Eval.srmCheck(f(Seq((1L, "a"))), "u", "arm", Seq("a" -> 999L))
    }
  }

  test("isotonicCalibrate: PAV block means, monotone, identity fit") {
    def f(rows: Seq[(Long, Int)]) = rows.toDF("p", "y")
    // hand violator: bins 100 (rate 1) and 200 (rate 0) pool to 1/2;
    // bin 300 (rate 1) stays above the pooled block
    val v = Eval.isotonicCalibrate(
      f(Seq((100L, 1), (200L, 0), (300L, 1))), "p", "y")
      .orderBy("score_milli").collect()
    assert(v.map(_.getAs[Long]("fit_micro")).toSeq
      === Seq(500000L, 500000L, 1000000L))
    // already monotone: fit == raw rate per bin (identity)
    val mono = Eval.isotonicCalibrate(
      f(Seq((100L, 0), (100L, 0), (200L, 1), (200L, 0), (300L, 1))),
      "p", "y").orderBy("score_milli").collect()
    assert(mono.map(r => r.getAs[Long]("fit_micro")).toSeq
      === mono.map(r => r.getAs[Long]("raw_micro")).toSeq)
    // all-violator: everything pools to the global mean
    val all = Eval.isotonicCalibrate(
      f(Seq((100L, 1), (200L, 1), (300L, 0), (400L, 0))), "p", "y")
      .orderBy("score_milli").collect()
    assert(all.map(_.getAs[Long]("fit_micro")).toSeq
      === Seq.fill(4)(500000L))
    // monotonicity is structural: check on a mixed case
    val mixed = Eval.isotonicCalibrate(
      f(Seq((1L, 1), (2L, 0), (3L, 0), (4L, 1), (5L, 0), (6L, 1),
        (7L, 1), (8L, 0))), "p", "y")
      .orderBy("score_milli").collect().map(_.getAs[Long]("fit_micro"))
    assert(mixed.zip(mixed.tail).forall { case (a, b) => a <= b })
    graft.engine.Caches.releaseAll()
  }

  test("mcnemar: hand 2x2, symmetry null, zero-discordance fence, " +
      "continuity floor") {
    // y always true so pred == correctness; 3 rows p1-only right,
    // 1 row p2-only right, 2 both right, 1 both wrong
    val df = Seq(
      (true, true, true), (true, true, true), (false, false, true),
      (true, false, true), (true, false, true), (true, false, true),
      (false, true, true)).toDF("p1", "p2", "y")
    val r = Eval.mcnemar(df, "p1", "p2", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 3L, 1L, 1L)))
    // chi2 = (3-1)^2/4 = 1.0; cc = (|2|-1)^2/4 = 0.25
    assert(r.getLong(4) === 1000L && r.getLong(5) === 250L)
    // b == c: statistic exactly 0, cc floors at (1-1)^2 = 0
    val sym = Eval.mcnemar(Seq((true, false, true), (false, true, true))
      .toDF("p1", "p2", "y"), "p1", "p2", "y").collect().head
    assert(sym.getLong(4) === 0L && sym.getLong(5) === 0L)
    // perfect agreement: no discordant pair, both stats NULL
    val agree = Eval.mcnemar(Seq((true, true, true), (false, false, true))
      .toDF("p1", "p2", "y"), "p1", "p2", "y").collect().head
    assert(agree.isNullAt(4) && agree.isNullAt(5))
  }

  test("cochranArmitage: hand trend sign, flat-rate z~0, degenerate " +
      "fences") {
    // dose 0: 0/10 hit, dose 1: 5/10, dose 2: 10/10 — perfect up-trend
    val up = (0 until 10).flatMap(i => Seq((0L, false), (2L, true)) ++
      Seq((1L, i < 5))).toDF("dose", "y")
    val r = Eval.cochranArmitage(up, "dose", "y").collect().head
    assert(r.getLong(0) === 30L && r.getLong(1) === 15L)
    assert(r.getLong(3) > 0L && r.getLong(4) > 1960000L) // strongly sig.
    // reversed: same magnitude, negative sign
    val down = up.select((lit(2L) - col("dose")).as("dose"), col("y"))
    val d = Eval.cochranArmitage(down, "dose", "y").collect().head
    assert(d.getLong(4) === -r.getLong(4) || d.getLong(4) === -r.getLong(4) - 1L)
    // flat rate: numerator exactly 0
    val flat = (0 until 12).map(i => (i % 3L, i % 2 == 0)).toDF("dose", "y")
    val f = Eval.cochranArmitage(flat, "dose", "y").collect().head
    assert(f.getLong(3) === 0L && f.getLong(4) === 0L)
    // all-hit and single-dose: fenced NULL
    assert(Eval.cochranArmitage(Seq((0L, true), (1L, true))
      .toDF("dose", "y"), "dose", "y").collect().head.isNullAt(4))
    assert(Eval.cochranArmitage(Seq((1L, true), (1L, false))
      .toDF("dose", "y"), "dose", "y").collect().head.isNullAt(4))
  }

  test("kendallW: perfect and reversed agreement, hand 3-rater value, " +
      "duplicate collapse") {
    // 3 raters, identical value ordering over 4 items: W = 1000
    val perfect = (0 until 3).flatMap(r =>
      (0 until 4).map(i => (i.toLong, r.toLong, 100.0 - i)))
      .toDF("item", "rater", "v")
    assert(Eval.kendallW(perfect, "item", "rater", "v")
      .collect().head.getLong(2) === 1000L)
    // 2 raters in exact opposition over 4 items: every rank sum equals
    // m(n+1)/2 = 5, S4 = 0, W = 0
    val opposed = ((0 until 4).map(i => (i.toLong, 0L, 100.0 - i)) ++
      (0 until 4).map(i => (i.toLong, 1L, 100.0 + i)))
      .toDF("item", "rater", "v")
    assert(Eval.kendallW(opposed, "item", "rater", "v")
      .collect().head.getLong(2) === 0L)
    // hand value: raters A/B agree (a>b>c), C says b>c>a: rank sums
    // a=1+1+3=5, b=2+2+1=5, c=3+3+2=8; S4 with m=3,n=3: terms
    // (2R-12)^2 = 4+4+16 = 24, W = 3*24/(9*24) = 1/3 → 333 milli
    val hand = Seq(
      (0L, 0L, 3.0), (1L, 0L, 2.0), (2L, 0L, 1.0),
      (0L, 1L, 3.0), (1L, 1L, 2.0), (2L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 3.0), (2L, 2L, 2.0))
      .toDF("item", "rater", "v")
    assert(Eval.kendallW(hand, "item", "rater", "v")
      .collect().head.getLong(2) === 333L)
    // duplicate (rater, item) rows collapse by max before ranking
    val dup = Eval.kendallW(perfect.unionAll(
      Seq((0L, 0L, -999.0)).toDF("item", "rater", "v")),
      "item", "rater", "v").collect().head
    assert(dup.getLong(2) === 1000L)
  }

  test("grubbsTest: exact 1.5 hand case, symmetric tie to smaller, " +
      "zero-variance and n<3 fences") {
    def run(vals: Seq[Double]) = Eval.grubbsTest(
      vals.toDF("y"), "y").collect().head
    // {1,1,1,10} dollars: dev(1000c) = 2700, s-chain sqrt(202500)=450
    // exactly -> G = 2700/(4*450) = 1.5
    val hand = run(Seq(1.0, 1.0, 1.0, 10.0))
    assert((hand.getLong(0), hand.getLong(1), hand.getLong(2))
      === ((4L, 1000L, 1500000L)))
    // symmetric pair ties on |dev|: smaller value wins (n=2 fences G)
    val tie = run(Seq(0.0, 10.0))
    assert(tie.getLong(1) === 0L && tie.isNullAt(2))
    // constant: zero variance
    val const = run(Seq(7.0, 7.0, 7.0))
    assert(const.getLong(1) === 700L && const.isNullAt(2))
    graft.engine.Caches.releaseAll()
  }

  test("qte: constant shift, tail-only stretch, interpolation, " +
      "missing-arm nulls") {
    def mk(t: Seq[Double], c: Seq[Double]) =
      (t.map((true, _)) ++ c.map((false, _))).toDF("tr", "y")
    // treated = control + 5.00 everywhere: QTE constant 5000 deci-cents
    val shift = Eval.qte(mk(Seq(6, 7, 8, 9, 10).map(_.toDouble),
      Seq(1, 2, 3, 4, 5).map(_.toDouble)), "y", "tr", Seq(250, 500, 750))
      .collect()
    assert(shift.map(_.getLong(3)).toSeq === Seq(5000L, 5000L, 5000L))
    // tail-only stretch: medians equal, p900 moves
    val tail = Eval.qte(mk(Seq(1, 2, 3, 4, 100).map(_.toDouble),
      Seq(1, 2, 3, 4, 5).map(_.toDouble)), "y", "tr", Seq(500, 900))
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(tail(500) === 0L && tail(900) > 0L)
    // interpolation: {0, 1.00} at p500 -> 0.50 = 500 deci-cents
    val interp = Eval.qte(mk(Seq(0.0, 1.0), Seq(0.0, 0.0)), "y", "tr",
      Seq(500)).collect().head
    assert(interp.getLong(1) === 500L && interp.getLong(3) === 500L)
    // missing control arm: its side (and the effect) read NULL
    val solo = Eval.qte(Seq((true, 3.0)).toDF("tr", "y"), "y", "tr",
      Seq(500)).collect().head
    assert(solo.getLong(1) === 3000L && solo.isNullAt(2) &&
      solo.isNullAt(3))
    graft.engine.Caches.releaseAll()
  }

  test("calibrationError: perfect zero, anti-calibrated extreme, " +
      "ECE <= MCE on a mixed fixture") {
    def mk(rows: Seq[(Double, Int)]) = rows.zipWithIndex
      .map { case ((s, y), i) => (i.toLong, s, y) }
      .toDF("id", "score", "y")
    // perfectly calibrated halves: every bin gap 0
    val perfect = Eval.calibrationError(
      mk(Seq.fill(10)((1.0, 1)) ++ Seq.fill(10)((0.0, 0))),
      "score", "y", "id", k = 2).collect().head
    assert((perfect.getLong(2), perfect.getLong(3)) === ((0L, 0L)))
    // anti-calibrated: confident and always wrong
    val anti = Eval.calibrationError(
      mk(Seq.fill(10)((1.0, 0)) ++ Seq.fill(10)((0.0, 1))),
      "score", "y", "id", k = 2).collect().head
    assert((anti.getLong(2), anti.getLong(3)) === ((1000L, 1000L)))
    // mixed: one clean bin, one off bin -> ECE strictly below MCE
    val mixed = Eval.calibrationError(
      mk(Seq.fill(10)((1.0, 1)) ++ Seq.fill(5)((0.0, 0))
        ++ Seq.fill(5)((0.0, 1))),
      "score", "y", "id", k = 2).collect().head
    assert(mixed.getLong(2) < mixed.getLong(3))
    assert(mixed.getLong(3) === 500L)
    graft.engine.Caches.releaseAll()
  }

  test("kruskalWallis: hand 3-group value, 2-group separation, " +
      "all-tied zero + fence, single-group fence") {
    def df(rows: Seq[(Double, String)]) = rows.toDF("v", "g")
    // groups a={1,2} b={3,4} c={5,6}: R = 3,7,11 over n=2 each,
    // H = 12/42 * (9+49+121)/2 - 21 = 4.571428...
    val hand = Eval.kruskalWallis(df(Seq((1.0, "a"), (2.0, "a"),
      (3.0, "b"), (4.0, "b"), (5.0, "c"), (6.0, "c"))), "v", "g")
      .collect().head
    assert((hand.getLong(0), hand.getLong(1)) === ((6L, 3L)))
    assert(hand.getLong(2) === 4571428L)
    assert(hand.getLong(3) === 4571428L) // no ties: correction = identity
    // clean 2-group separation: H = 12/42*(12+75) - 21 = 3.857142...
    val sep = Eval.kruskalWallis(df(Seq((1.0, "a"), (2.0, "a"),
      (3.0, "a"), (4.0, "b"), (5.0, "b"), (6.0, "b"))), "v", "g")
      .collect().head
    assert(sep.getLong(2) === 3857142L)
    // all values tied: H exactly 0, correction denominator 0 -> NULL
    val tied = Eval.kruskalWallis(df(Seq((5.0, "a"), (5.0, "a"),
      (5.0, "b"), (5.0, "b"))), "v", "g").collect().head
    assert(tied.getLong(2) === 0L && tied.isNullAt(3))
    // one group: H undefined
    val one = Eval.kruskalWallis(df(Seq((1.0, "a"), (2.0, "a"))),
      "v", "g").collect().head
    assert(one.isNullAt(2) && one.isNullAt(3))
    graft.engine.Caches.releaseAll()
  }

  test("cemAtt: two-stratum ATT vs confounded crude diff, " +
      "common-support pruning, weight identity") {
    // stratum A: 3 treated @10.00 / 1 control @8.00; stratum B:
    // 1 treated @4.00 / 3 control @2.00 — the per-stratum effect is
    // 2.00 everywhere but treatment concentrates in the high-outcome
    // stratum, so the crude diff is confounded to 8.50-3.50 = 5.00
    val df = (Seq.fill(3)(("A", true, 10.0)) ++ Seq(("A", false, 8.0)) ++
      Seq(("B", true, 4.0)) ++ Seq.fill(3)(("B", false, 2.0)))
      .toDF("s", "tr", "y")
    val out = Eval.cemAtt(df, "s", "tr", "y").orderBy("stratum").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("A", "B", "TOTAL"))
    val (a, b, tot) = (out(0), out(1), out(2))
    assert((a.getLong(1), a.getLong(2)) === ((3L, 1L)))
    // weight identity: w_milli = n_treat * 1000 div n_control
    assert(a.getLong(3) === 3000L && b.getLong(3) === 333L)
    assert(a.getLong(4) === 1000000000L && a.getLong(5) === 800000000L)
    assert(a.getLong(6) === 200000000L && b.getLong(6) === 200000000L)
    // matched ATT = 2.00; TOTAL row carries null per-stratum fields
    assert(tot.getLong(1) === 4L && tot.getLong(2) === 4L)
    assert(tot.isNullAt(3) && tot.isNullAt(4) && tot.isNullAt(5))
    assert(tot.getLong(6) === 200000000L)
    // the crude (single-stratum) diff IS confounded: 5.00
    val crude = Eval.cemAtt(df.withColumn("all", lit("ALL")),
      "all", "tr", "y").orderBy("stratum").collect()
    assert(crude.last.getLong(6) === 500000000L)
    // common-support pruning: a treated-only stratum contributes
    // nothing — not a row, not weight in the TOTAL
    val plusC = df.unionAll(Seq(("C", true, 100.0), ("C", true, 90.0))
      .toDF("s", "tr", "y"))
    val pruned = Eval.cemAtt(plusC, "s", "tr", "y")
      .orderBy("stratum").collect()
    assert(pruned.map(_.getString(0)).toSeq === Seq("A", "B", "TOTAL"))
    assert(pruned.last.getLong(1) === 4L &&
      pruned.last.getLong(6) === 200000000L)
  }

  test("cemAtt: negative half-cent outcomes through the signed " +
      "division, empty-input TOTAL fence") {
    // floor(y*100 + 0.5) rounds half-cents toward +inf: -1.005 → -100
    // cents (not -101), -2.01 → -201; the signed micro division then
    // truncates the ABS value: (-301e6) div 2 → -150500000
    val neg = Seq(("N", true, -1.005), ("N", true, -2.01),
      ("N", false, 1.0)).toDF("s", "tr", "y")
    val n = Eval.cemAtt(neg, "s", "tr", "y").orderBy("stratum").collect()
    assert(n.head.getLong(4) === -150500000L)
    assert(n.head.getLong(5) === 100000000L)
    assert(n.head.getLong(6) === -250500000L)
    assert(n.last.getLong(6) === -250500000L)
    // empty input: exactly one TOTAL row, every numeric field NULL
    val empty = Eval.cemAtt(Seq.empty[(String, Boolean, Double)]
      .toDF("s", "tr", "y"), "s", "tr", "y").collect()
    assert(empty.length === 1 && empty.head.getString(0) === "TOTAL")
    assert(empty.head.isNullAt(1) && empty.head.isNullAt(6))
  }

  test("anovaF: hand 2-group values, F = pooled-t² consistency, " +
      "SSW = 0 and k = 1 fences") {
    // A = {1, 2, 3}, B = {2, 4} dollars → cents S_A=600 S_B=600:
    // SSB = 120000+180000−288000 = 12000 cents², SSW = 340000−300000
    // = 40000 cents², F = (12000/1)/(40000/3) = 0.9 — and the pooled
    // two-sample t on the same data squares to exactly 0.9
    val two = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 4.0)).toDF("g", "v")
    val r = Eval.anovaF(two, "v", "g").collect().head
    assert(r.getLong(0) === 5L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 12000000L) // ssb_milli
    assert(r.getLong(3) === 40000000L) // ssw_milli
    assert(r.getLong(4) === 900000L)   // f_micro = 0.9e6 = t²
    // pooled t by hand: diff = -1.0, sp² = SSW/(N-2) cents² = 40000/3,
    // t² = 10000 / (sp²·(1/3+1/2)) = 0.9
    val t2 = 10000.0 / ((40000.0 / 3) * (1.0 / 3 + 1.0 / 2))
    assert(math.abs(t2 - r.getLong(4) / 1e6) < 1e-9)
    // internally-constant groups with different means: SSW = 0 →
    // F is infinite, reported NULL; SSB stays positive
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val f0 = Eval.anovaF(flat, "v", "g").collect().head
    assert(f0.getLong(3) === 0L && f0.isNullAt(4))
    assert(f0.getLong(2) === 10000000L) // SSB = 10000 cents²
    // a single group has no between-variance to test
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(Eval.anovaF(one, "v", "g").collect().head.isNullAt(4))
  }

  test("hosmerLemeshow: calibrated zero, hand miscalibrated terms, " +
      "degenerate bin drops, df fence") {
    import spark.implicits._
    def rows(p: Double, n: Int, pos: Int) =
      (0 until n).map(i => (p, if (i < pos) 1 else 0))
    def df(xs: Seq[(Double, Int)]) = xs.zipWithIndex
      .map { case ((p, y), i) => (i.toLong, p, y) }.toDF("id", "p", "y")
    // within-bin calibrated: E = O in both deciles -> HL exactly 0
    val cal = df(rows(0.8, 10, 8) ++ rows(0.2, 10, 2))
    val c = Eval.hosmerLemeshow(cal, "p", "y", "id", k = 2)
      .orderBy("bin").collect()
    assert(c.forall(_.getLong(4) === 0L))
    assert(c.head.getLong(5) === 0L && c.head.isNullAt(6)) // df: 2 bins < 3
    // hand miscalibration: bin(p=.5, O=7) term 1600000,
    // bin(p=.1, O=3) term 4444444
    val mis = df(rows(0.5, 10, 7) ++ rows(0.1, 10, 3))
    val m = Eval.hosmerLemeshow(mis, "p", "y", "id", k = 2)
      .orderBy("bin").collect()
    assert(m(0).getLong(4) === 1600000L)
    assert(m(1).getLong(4) === 4444444L)
    assert(m(0).getLong(5) === 6044444L)
    // p = 0 everywhere in a bin: zero modeled variance, term NULL and
    // excluded from the sum
    val degen = df(rows(0.5, 10, 7) ++ rows(0.0, 10, 0))
    val d = Eval.hosmerLemeshow(degen, "p", "y", "id", k = 2)
      .orderBy("bin").collect()
    assert(d(1).isNullAt(4) && d(0).getLong(5) === 1600000L)
  }

  test("bestThreshold: hand sweep, asymmetric-cost divergence, tie to " +
      "lowest threshold, one-class fence") {
    import spark.implicits._
    // scores .9/.8 positive-heavy, .2/.1 negative-heavy
    val df = Seq((0.9, 1), (0.9, 1), (0.8, 1), (0.8, 0), (0.2, 0),
      (0.2, 1), (0.1, 0), (0.1, 0)).zipWithIndex
      .map { case ((s, y), i) => (i.toLong, s, y) }.toDF("id", "s", "y")
    // sweep: thr 900: tp2 fp0 -> J = 500000-0; thr 800: tp3 fp1 ->
    // 750000-250000=500000; thr 200: tp4 fp2 -> 1000000-500000=500000;
    // thr 100: tp4 fp4 -> 0. Three-way J tie -> LOWEST threshold 200
    val eq = graft.operators.Eval.bestThreshold(df, "s", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6),
          r.getLong(7)))).toMap
    assert(eq("youden") === ((200L, 4L, 2L, 500000L, 2000L)))
    // symmetric costs: thr 900 cost = 2fn*1000=2000, thr 200 cost =
    // 0fn+2fp=2000, thr 800: 1fn+1fp = 2000 -> tie -> lowest = 200
    assert(eq("min_cost")._1 === 200L)
    // expensive FP pushes the cost optimum up, J unchanged
    val cfp = graft.operators.Eval.bestThreshold(df, "s", "y",
      cFpMilli = 10000L, cFnMilli = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cfp("youden") === 200L && cfp("min_cost") === 900L)
    // one-class input: nothing to trade off
    val onec = Seq((1L, 0.5, 1), (2L, 0.6, 1)).toDF("id", "s", "y")
    assert(graft.operators.Eval.bestThreshold(onec, "s", "y").count() === 0L)
  }

  test("brownForsythe: hand doubled-cent deviations, equal-spread zero, " +
      "median robustness to one outlier") {
    // A = 1..5 (median 3), B = odd 1..9 (median 5): doubled deviations
    // (400,200,0,200,400) vs (800,400,0,400,800) → SSB = 144000 u²,
    // SSW = 560000 u², F = (144000/1)/(560000/8) = 2.057142
    val two = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("a", _)) ++
      Seq(1.0, 3.0, 5.0, 7.0, 9.0).map(("b", _))).toDF("g", "v")
    val r = Eval.brownForsythe(two, "v", "g").collect().head
    assert(r.getLong(2) === 144000000L && r.getLong(3) === 560000000L)
    assert(r.getLong(4) === 2057142L)
    // identical spread in different locations: deviations coincide,
    // SSB is exactly zero
    val shift = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(11.0, 12.0, 13.0).map(("b", _))).toDF("g", "v")
    val z = Eval.brownForsythe(shift, "v", "g").collect().head
    assert(z.getLong(2) === 0L && z.getLong(4) === 0L)
    // median centering: one huge outlier moves ITS OWN deviation only —
    // the group median (and every other row's deviation) is unchanged,
    // which mean-centering cannot claim
    val base = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("a", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("b", _))).toDF("g", "v")
    val withOut = (Seq(1.0, 2.0, 3.0, 4.0, 500.0).map(("a", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("b", _))).toDF("g", "v")
    val fBase = Eval.brownForsythe(base, "v", "g").collect().head
    assert(fBase.getLong(2) === 0L) // identical groups
    val fOut = Eval.brownForsythe(withOut, "v", "g").collect().head
    // group a's median is still 3.00: rows 1..4 keep deviations
    // (400,200,0,200); only the outlier row's deviation changed
    assert(fOut.getLong(0) === 10L && fOut.getLong(2) > 0L)
  }

  test("cochranQ: hand 3x4 table, k = 2 equals uncorrected McNemar, " +
      "all-constant fence, unbalanced panel rejected") {
    // rows (1,1,0),(1,0,0),(1,1,1),(1,0,0): C = (4,2,1), N = 7,
    // ΣR² = 15 → Q = 2·42/(3·6) = 4.666 → 4666 milli
    val t3 = Seq(
      (1L, "a", 1L), (1L, "b", 1L), (1L, "c", 0L),
      (2L, "a", 1L), (2L, "b", 0L), (2L, "c", 0L),
      (3L, "a", 1L), (3L, "b", 1L), (3L, "c", 1L),
      (4L, "a", 1L), (4L, "b", 0L), (4L, "c", 0L)).toDF("s", "t", "x")
    val r = Eval.cochranQ(t3, "s", "t", "x").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L && r.getLong(2) === 7L)
    assert(r.getLong(3) === 6L && r.getLong(4) === 4666L)
    // k = 2: Q = (b−c)²/(b+c) — 3 discordant (1,0), 1 discordant (0,1)
    // → (3−1)²/4 = 1.0
    val t2 = Seq(
      (1L, "x", 1L), (1L, "y", 0L), (2L, "x", 1L), (2L, "y", 0L),
      (3L, "x", 1L), (3L, "y", 0L), (4L, "x", 0L), (4L, "y", 1L),
      (5L, "x", 1L), (5L, "y", 1L), (6L, "x", 1L), (6L, "y", 1L),
      (7L, "x", 0L), (7L, "y", 0L)).toDF("s", "t", "x")
    assert(Eval.cochranQ(t2, "s", "t", "x").collect().head
      .getLong(4) === 1000L)
    // every subject constant across treatments: denominator 0 → NULL
    val const = Seq((1L, "x", 1L), (1L, "y", 1L), (2L, "x", 0L),
      (2L, "y", 0L)).toDF("s", "t", "x")
    assert(Eval.cochranQ(const, "s", "t", "x").collect().head.isNullAt(4))
    // a missing cell is an error, not a silent zero
    val unbal = Seq((1L, "x", 1L), (1L, "y", 0L), (2L, "x", 1L))
      .toDF("s", "t", "x")
    intercept[Exception](Eval.cochranQ(unbal, "s", "t", "x").collect())
    // a duplicated treatment row cannot MASK a missing cell: subject 2
    // has x twice and no y — row count k, distinct treatments k-1
    val masked = Seq((1L, "x", 1L), (1L, "y", 0L),
      (2L, "x", 1L), (2L, "x", 0L)).toDF("s", "t", "x")
    intercept[Exception](Eval.cochranQ(masked, "s", "t", "x").collect())
  }

  test("quadraticKappa: perfect 1000, off-by-one beats far-miss, " +
      "anti-agreement -1000, degenerate fence") {
    import spark.implicits._
    def qwk(rows: Seq[(Long, Long)]) =
      Eval.quadraticKappa(rows.toDF("p", "l"), "p", "l").collect().head
    val perfect = qwk(Seq((0L, 0L), (1L, 1L), (2L, 2L), (1L, 1L)))
    assert(perfect.getLong(4) === 1000L)
    // same 3 agreements + ONE disagreement: the near miss (0 vs 1)
    // scores 800, the far miss (0 vs 2) only 384 — plain kappa would
    // not distinguish them
    val near = qwk(Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 1L)))
    assert((near.getLong(2), near.getLong(3), near.getLong(4))
      === ((1L, 20L, 800L)))
    val far = qwk(Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 2L)))
    assert((far.getLong(2), far.getLong(3), far.getLong(4))
      === ((4L, 26L, 384L)))
    // systematic inversion on {0,2}: exactly -1
    val anti = qwk(Seq((0L, 2L), (0L, 2L), (2L, 0L), (2L, 0L)))
    assert(anti.getLong(4) === -1000L)
    // both raters constant: no expected disagreement to normalize by
    assert(qwk(Seq((1L, 1L), (1L, 1L))).isNullAt(4))
    graft.engine.Caches.releaseAll()
  }

  test("jonckheereTerpstra: hand 3-group perfect trend, tie halving, " +
      "reversed symmetry, k = 2 doubled Mann-Whitney") {
    import spark.implicits._
    def jt(rows: Seq[(Double, Long)]) =
      Eval.jonckheereTerpstra(rows.toDF("v", "o"), "v", "o")
        .collect().head
    // g1 = {1,2} < g2 = {3} < g3 = {4,5}: every cross pair concordant
    // -> JT = 8, doubled 16; e_jt2 = (25 - 9)/2 = 8
    val perfect = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L), (4.0, 3L),
      (5.0, 3L))
    val p = jt(perfect)
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))
      === ((3L, 5L, 16L, 8L)))
    // reversed group order: jt2 collapses to 0 and fwd + rev = 2·e
    val r = jt(perfect.map { case (v, o) => (v, -o) })
    assert(r.getLong(2) === 0L && p.getLong(2) + r.getLong(2)
      === 2 * p.getLong(3))
    // ties count once in the doubled statistic: g1 = {1,1},
    // g2 = {1,2}: 2U = 2·2 + 2 = 6
    val t = jt(Seq((1.0, 1L), (1.0, 1L), (1.0, 2L), (2.0, 2L)))
    assert((t.getLong(2), t.getLong(3)) === ((6L, 4L)))
    graft.engine.Caches.releaseAll()
  }

  test("friedmanTest: strict-order chi2 8000, tie correction 4500 -> " +
      "6000, all-tied fence, unbalanced panel rejected") {
    import spark.implicits._
    def strict(b: Long) = Seq((b, "a", 1.0), (b, "b", 2.0), (b, "c", 3.0))
    def tied(b: Long) = Seq((b, "a", 5.0), (b, "b", 5.0), (b, "c", 5.0))
    // 4 strictly-ordered blocks: doubled ranks (2,4,6) each ->
    // chi2 = 12/(4*3*4)*(16+64+144) - 3*4*4 = 8, no ties
    val s4 = (1L to 4L).flatMap(strict).toDF("b", "t", "v")
    val r = Eval.friedmanTest(s4, "b", "t", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 4L, 8000L, 8000L)))
    // 3 strict + 1 fully-tied block: chi2 4.5, correction factor
    // 1 - 24/96 -> adjusted exactly 6
    val mix = ((1L to 3L).flatMap(strict) ++ tied(4L)).toDF("b", "t", "v")
    val m = Eval.friedmanTest(mix, "b", "t", "v").collect().head
    assert(m.getLong(2) === 4500L && m.getLong(3) === 6000L)
    // every block tied: chi2 0 and the correction denominator hits 0
    val all = (1L to 4L).flatMap(tied).toDF("b", "t", "v")
    val a = Eval.friedmanTest(all, "b", "t", "v").collect().head
    assert(a.getLong(2) === 0L && a.isNullAt(3))
    val unbal = (strict(1L) ++ strict(2L).tail).toDF("b", "t", "v")
    intercept[Exception](Eval.friedmanTest(unbal, "b", "t", "v").collect())
    // duplicate-masking: block 2 repeats treatment a, drops c —
    // row count k but distinct treatments k-1 must still reject
    val masked = (strict(1L) ++
      Seq((2L, "a", 1.0), (2L, "a", 2.0), (2L, "b", 3.0)))
      .toDF("b", "t", "v")
    intercept[Exception](
      Eval.friedmanTest(masked, "b", "t", "v").collect())
  }

  test("cronbachAlpha: duplicated item alpha 1000, hand 0.75 case, " +
      "negative covariance sign, zero-total-variance fence, unbalanced " +
      "panel rejected") {
    def panel(rows: Seq[(Long, String, Double)]) = rows.toDF("s", "i", "v")
    // item2 ≡ item1 → alpha exactly 1
    val dup = panel((1L to 4L).flatMap(s =>
      Seq((s, "i1", s.toDouble), (s, "i2", s.toDouble))))
    assert(Eval.cronbachAlpha(dup, "s", "i", "v").collect().head
      .getLong(4) === 1000L)
    // hand case: i1 = (1,2,3,4), i2 = (2,1,4,3): V1 = V2 = 20·10⁴,
    // Vt = 64·10⁴ → alpha = 2·24/64 = 0.75
    val hand = panel(Seq((1L, "i1", 1.0), (2L, "i1", 2.0), (3L, "i1", 3.0),
      (4L, "i1", 4.0), (1L, "i2", 2.0), (2L, "i2", 1.0), (3L, "i2", 4.0),
      (4L, "i2", 3.0)))
    assert(Eval.cronbachAlpha(hand, "s", "i", "v").collect().head
      .getLong(4) === 750L)
    // anti-correlated items: alpha goes NEGATIVE through the signed route
    val neg = panel(Seq((1L, "i1", 1.0), (2L, "i1", 2.0), (3L, "i1", 3.0),
      (1L, "i2", 3.0), (2L, "i2", 1.0), (3L, "i2", 2.0)))
    assert(Eval.cronbachAlpha(neg, "s", "i", "v").collect().head
      .getLong(4) === -2000L)
    // perfectly anti-parallel items: every subject total equal → Vt = 0
    val flat = panel(Seq((1L, "i1", 1.0), (2L, "i1", 2.0),
      (1L, "i2", 2.0), (2L, "i2", 1.0)))
    assert(Eval.cronbachAlpha(flat, "s", "i", "v").collect().head.isNullAt(4))
    val unbal = panel(Seq((1L, "i1", 1.0), (1L, "i2", 2.0), (2L, "i1", 3.0)))
    intercept[Exception](Eval.cronbachAlpha(unbal, "s", "i", "v").collect())
    // CROSS-compensating duplicates (s1 has i1 twice/no i2, s2 has i2
    // twice/no i1): every row AND item count matches, only the
    // per-subject distinct-item check catches it
    val crossed = panel(Seq((1L, "i1", 1.0), (1L, "i1", 2.0),
      (2L, "i2", 3.0), (2L, "i2", 4.0)))
    intercept[Exception](
      Eval.cronbachAlpha(crossed, "s", "i", "v").collect())
  }
}
