package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped count/sum view over a
  * [[VersionedTable]]'s change-data feed — the consumer that makes CDF
  * worth emitting: instead of recomputing `groupBy(keys).agg(...)` over
  * the full table on every commit (a 100 TB scan to refresh a KB-scale
  * aggregate), the maintainer pulls the delta since its cursor and folds
  * it into the stored view. Count and sum are self-maintainable under
  * insert/delete (the classic IVM result): each delta row contributes
  * `±1` to the group's count and `±value` to its sums, so the refresh
  * costs O(|delta| + |view|) whatever the table size.
  *
  * The maintained invariant, judged end-to-end (`q_view_refresh`):
  *
  * {{{ applyDelta(build(v_from), changes(from, to)) == build(v_to) }}}
  *
  * The polling loop is [[VersionedTable.changesSince]]'s shape:
  * `val (delta, cursor) = changesSince(spark, root, lastCursor);
  * view = applyDelta(view, delta, keys, sums); persist(view, cursor)`.
  *
  * Contract: sum columns must be non-null in the table (the usual IVM
  * simplification — a view that must distinguish "no rows" from "all
  * null" tracks a per-column non-null count; counts and these sums
  * don't). Averages are derived (`sum/n`), min/max are NOT
  * self-maintainable under deletes (a deleted extremum needs a rescan)
  * and are deliberately out of scope.
  */
object MaterializedView {

  /** The view's full recompute: one row per key with `n` (row count) and
    * `<c>_sum` per sum column — both the bootstrap and the correctness
    * oracle for [[applyDelta]]. */
  def build(table: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "view requires grouping keys")
    val aggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"${c}_sum"))
    table.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a CDF delta (rows tagged `_change` insert/delete, exactly what
    * [[VersionedTable.changes]] emits) into a stored view: the delta
    * aggregates to per-key signed contributions (map-side combined — the
    * shuffle carries one row per touched key), full-outer-merges with
    * the view, and groups whose count reaches zero drop out. An empty
    * delta returns the view unchanged (modulo plan). */
  def applyDelta(view: DataFrame, delta: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(delta.columns.contains("_change"),
      "applyDelta expects the _change column produced by changes()")
    val sign = when(col("_change") === "insert", lit(1L))
      .when(col("_change") === "delete", lit(-1L))
    val aggs = sum(sign).as("__dn") +:
      sumCols.map(c => sum(sign * col(c)).as(s"__d_$c"))
    val d = delta.filter(col("_change").isin("insert", "delete"))
      .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val merged = view.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++
        ((coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n") +:
          sumCols.map(c =>
            (coalesce(col(s"${c}_sum"), lit(0L)) +
              coalesce(col(s"__d_$c"), lit(0L))).as(s"${c}_sum"))): _*)
    merged.filter(col("n") > 0)
  }
}
