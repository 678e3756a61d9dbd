package graft

import org.apache.spark.sql.functions._

import graft.operators.Spatial

/** Grid-blocked spatial join tests: hand pair sets, cell-boundary
  * crossing, negative coordinates, the inclusive d² = r² boundary,
  * brute-force equality, and the nearest-neighbor argmin readout. */
class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("id", "x", "y")

  test("gridRadiusJoin: hand pairs, boundary crossing, negatives, inclusive r²") {
    // (0,0)-(3,4) at d²=25 = r² inclusive; others out of range
    val tri = Spatial.gridRadiusJoin(
      pts((1L, 0L, 0L), (2L, 3L, 4L), (3L, 10L, 10L)), "id", "x", "y", 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.toSeq === Seq((1L, 2L, 25L)))
    // pair straddling a cell boundary (cells 0 and 1 at r=500)
    val cross = Spatial.gridRadiusJoin(
      pts((1L, 499L, 0L), (2L, 501L, 0L)), "id", "x", "y", 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cross.toSeq === Seq((1L, 2L, 4L)))
    // negative coordinates: floor cells keep uniform r-width on both
    // sides of zero (truncating div would merge (−r, r) into one
    // double-width cell — pairs survive by interval adjacency, but the
    // cell SEMANTICS the scaladoc promises would be wrong)
    val neg = Spatial.gridRadiusJoin(
      pts((1L, -501L, 0L), (2L, -499L, 0L)), "id", "x", "y", 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(neg.toSeq === Seq((1L, 2L, 4L)))
    graft.engine.Caches.releaseAll()
  }

  test("gridRadiusJoin: brute-force equality on an arithmetic scatter") {
    val rows = (0L until 80L).map(i =>
      (i, (i * 7919L) % 1000L, (i * 104729L) % 1000L))
    val fast = Spatial.gridRadiusJoin(pts(rows: _*), "id", "x", "y", 120L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ax, ay) <- rows; (b, bx, by) <- rows if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) if d2 <= 120L * 120L
    } yield (a, b, d2)).toSet
    assert(fast === brute && brute.nonEmpty)
    graft.engine.Caches.releaseAll()
  }

  test("nearestInRadius: argmin, tie breaks on smaller nbr id, isolated absent") {
    // 1 has two neighbors at d²=4 (ids 2 and 3) → tie keeps nbr 2;
    // 4 is isolated → absent
    val out = Spatial.nearestInRadius(
      pts((1L, 0L, 0L), (2L, 2L, 0L), (3L, 0L, 2L), (4L, 900L, 900L)),
      "id", "x", "y", 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) === ((2L, 4L)))
    assert(out(2L) === ((1L, 4L)) && out(3L) === ((1L, 4L)))
    assert(!out.contains(4L) && out.size === 3)
    graft.engine.Caches.releaseAll()
  }

  test("geohash: canonical vector, prefix property, pole/antimeridian " +
      "clamps, odd and even precisions") {
    import spark.implicits._
    def gh(lat: Double, lon: Double, p: Int): String =
      Seq((lat, lon)).toDF("lat", "lon")
        .select(graft.operators.Spatial.geohash(
          org.apache.spark.sql.functions.col("lat"),
          org.apache.spark.sql.functions.col("lon"), p))
        .head.getString(0)
    // the classic Niemeyer test point, odd precision 11
    assert(gh(57.64911, 10.40744, 11) === "u4pruydqqvj")
    // the prefix property: coarser precision = prefix of finer
    assert(gh(57.64911, 10.40744, 6) === "u4pruy")
    assert(gh(57.64911, 10.40744, 1) === "u")
    // boundary clamps: the poles/antimeridian stay in-range
    assert(gh(-90.0, -180.0, 6) === "000000")
    assert(gh(90.0, 180.0, 6) === "zzzzzz")
    assert(gh(0.0, 0.0, 8) === "s0000000")
  }
}
