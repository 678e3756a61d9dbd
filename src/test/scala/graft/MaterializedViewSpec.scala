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
}
