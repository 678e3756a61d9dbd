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
}
