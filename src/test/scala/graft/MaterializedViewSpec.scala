package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.tables.{MaterializedView, VersionedTable}

/** IVM contract: folding a CDF delta into a stored count/sum view equals
  * the full recompute at the target version, groups appear and drop out
  * with their membership, an empty delta is a no-op. */
class MaterializedViewSpec extends SparkTestBase {

  private def freshRoot(name: String): String = {
    val p = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_mv/$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  private def orders = Tables(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus")

  private def viewRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("applyDelta(build(v_from), changes(from, to)) == build(v_to)") {
    val root = freshRoot("invariant")
    VersionedTable.create(spark, root, orders.filter(col("o_orderkey") % 2 === 0))
    VersionedTable.append(spark, root, orders.filter(col("o_orderkey") % 2 === 1))
    VersionedTable.deleteWhere(spark, root, col("o_custkey") % 5 === 0)
    val keys = Seq("o_orderstatus")
    val sums = Seq("o_custkey")
    val v0 = MaterializedView.build(
      VersionedTable.readVersion(spark, root, 1), keys, sums)
    val delta = VersionedTable.changes(spark, root, 1, 3)
    val refreshed = MaterializedView.applyDelta(v0, delta, keys, sums)
    val direct = MaterializedView.build(
      VersionedTable.readVersion(spark, root, 3), keys, sums)
    assert(viewRows(refreshed) === viewRows(direct))
  }

  test("groups drop out at zero membership and appear on first insert") {
    import spark.implicits._
    val base = Seq(("a", 1L), ("a", 2L), ("b", 5L))
      .toDF("o_orderstatus", "o_custkey")
    val view = MaterializedView.build(base, Seq("o_orderstatus"), Seq("o_custkey"))
    val delta = Seq(
      ("b", 5L, "delete"),  // b's only row: group must vanish
      ("c", 7L, "insert"),  // brand-new group
      ("a", 3L, "insert")
    ).toDF("o_orderstatus", "o_custkey", "_change")
    val got = viewRows(MaterializedView.applyDelta(
      view, delta, Seq("o_orderstatus"), Seq("o_custkey")))
    assert(got === Seq(("a", 3L, 6L), ("c", 1L, 7L)))
  }

  test("an empty delta leaves the view unchanged") {
    import spark.implicits._
    val base = Seq(("a", 1L)).toDF("o_orderstatus", "o_custkey")
    val view = MaterializedView.build(base, Seq("o_orderstatus"), Seq("o_custkey"))
    val empty = Seq.empty[(String, Long, String)]
      .toDF("o_orderstatus", "o_custkey", "_change")
    assert(viewRows(MaterializedView.applyDelta(
      view, empty, Seq("o_orderstatus"), Seq("o_custkey"))) === viewRows(view))
  }

  test("join view: applyJoinDelta(buildJoin(v1), deltas) == buildJoin(final, final)") {
    val rootA = freshRoot("join_a")
    val rootB = freshRoot("join_b")
    val cust = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("segment"))
    VersionedTable.create(spark, rootA,
      orders.filter(col("o_orderkey") % 2 === 0).drop("o_orderkey"))
    VersionedTable.create(spark, rootB, cust.filter(col("o_custkey") % 3 =!= 1))
    val v0 = MaterializedView.buildJoin(
      VersionedTable.readVersion(spark, rootA, 1),
      VersionedTable.readVersion(spark, rootB, 1), Seq("o_custkey"))
    VersionedTable.append(spark, rootA,
      orders.filter(col("o_orderkey") % 2 === 1).drop("o_orderkey"))
    VersionedTable.deleteWhere(spark, rootA, col("o_custkey") % 5 === 0)
    VersionedTable.append(spark, rootB, cust.filter(col("o_custkey") % 3 === 1))
    VersionedTable.deleteWhere(spark, rootB, col("segment") === "BUILDING")
    val (dA, _) = VersionedTable.changesSince(spark, rootA, 1)
    val (dB, _) = VersionedTable.changesSince(spark, rootB, 1)
    val got = MaterializedView.applyJoinDelta(v0, dA,
      VersionedTable.readLatest(spark, rootA), dB,
      VersionedTable.readVersion(spark, rootB, 1), Seq("o_custkey"))
    val direct = MaterializedView.buildJoin(
      VersionedTable.readLatest(spark, rootA),
      VersionedTable.readLatest(spark, rootB), Seq("o_custkey"))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("join view sign algebra: cross terms count once, multiplicity decrements, zero drops") {
    import spark.implicits._
    def view(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("k", "pa", "pb", "__mult")
    def delta(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", "pa", "_change") // A-side: (k, pa)
    def deltaB(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", "pb", "_change")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    // inserted-a x deleted-b nets to ZERO (the pair never coexists)
    val got1 = MaterializedView.applyJoinDelta(
      view(Seq((1L, "x", "u", 1L))),
      delta(Seq((1L, "x", "insert"))),                      // dA
      Seq((1L, "x"), (1L, "x")).toDF("k", "pa"),            // A_new
      deltaB(Seq((1L, "u", "delete"))),                     // dB
      Seq((1L, "u")).toDF("k", "pb"),                       // B_old
      Seq("k"))
    assert(rowsOf(got1) === Set.empty)
    // doubly-deleted pair nets to -1: the view row vanishes
    val got2 = MaterializedView.applyJoinDelta(
      view(Seq((1L, "x", "u", 1L))),
      delta(Seq((1L, "x", "delete"))),
      Seq.empty[(Long, String)].toDF("k", "pa"),
      deltaB(Seq((1L, "u", "delete"))),
      Seq((1L, "u")).toDF("k", "pb"),
      Seq("k"))
    assert(rowsOf(got2) === Set.empty)
    // deleting ONE of two derivations decrements, never drops
    val got3 = MaterializedView.applyJoinDelta(
      view(Seq((1L, "x", "u", 2L))),
      delta(Seq((1L, "x", "delete"))),
      Seq((1L, "x")).toDF("k", "pa"),
      deltaB(Seq.empty[(Long, String, String)]),
      Seq((1L, "u")).toDF("k", "pb"),
      Seq("k"))
    assert(rowsOf(got3) === Set((1L, "x", "u", 1L)))
    // empty deltas: no-op
    val got4 = MaterializedView.applyJoinDelta(
      view(Seq((1L, "x", "u", 2L))),
      delta(Seq.empty[(Long, String, String)]),
      Seq((1L, "x")).toDF("k", "pa"),
      deltaB(Seq.empty[(Long, String, String)]),
      Seq((1L, "u")).toDF("k", "pb"),
      Seq("k"))
    assert(rowsOf(got4) === Set((1L, "x", "u", 2L)))
  }
}
