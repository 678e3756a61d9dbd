package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event / time-series operators (SURVEY.md §2b row 5) over the `events`
  * table: lag-gap sessionization, tumbling-window aggregation, and JSON
  * property extraction.
  *
  * Batch formulations here; the same semantics stream under Structured
  * Streaming (`groupBy(window(...))` + watermark for windows,
  * session_window for sessions) because only declarative windowing
  * primitives are used.
  */
object Events {

  /** Appends a per-user session sequence number: a new session starts at
    * the first event or when the gap to the previous event exceeds
    * `gapMinutes`.
    *
    * Two analytic passes over one `(user, ts)` sort — Catalyst executes
    * lag + running-sum in a single window exchange, so the whole operator
    * costs one shuffle on `userCol`. Skew posture: per-user windows, so a
    * hot user serializes one task; at 100 TB cap sessions by day first
    * (add a date column to the partition key) if a user can dominate.
    */
  def withSessionSeq(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int, orderTiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderTiebreak))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull, 1)
      .when(unix_micros(col(tsCol)) - unix_micros(prev) > gapMinutes * 60L * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Lag-gap sessionization with per-session aggregates: one row per
    * (user, session) carrying start/end, event count, and summed value. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapMinutes: Int, orderTiebreak: String): DataFrame =
    withSessionSeq(events, userCol, tsCol, gapMinutes, orderTiebreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))

  /** Tumbling-window aggregation: epoch-aligned fixed windows via the
    * `window()` grouping primitive (streams unchanged under Structured
    * Streaming with a watermark). Partial aggregation makes the shuffle
    * carry one row per (window, key) per task. */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, width: String): DataFrame =
    events
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_value"),
        avg(col(valueCol)).as("avg_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"), col("avg_value"))

  /** JSON property extraction from a string column via `from_json` with an
    * explicit one-field schema (`props` is `{"k": <long>}` in the test
    * corpus). Declarative JsonToStructs — codegen-friendly, pushdown-safe. */
  def jsonProp(props: Column, field: String): Column =
    from_json(props, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(field,
        org.apache.spark.sql.types.LongType)))).getField(field)
}
