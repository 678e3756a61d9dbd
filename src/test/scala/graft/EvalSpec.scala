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
}
