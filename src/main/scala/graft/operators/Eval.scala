package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators over scored rows — the offline-eval
  * primitives a ranking/classification pipeline reads before shipping:
  * exact AUC (Mann-Whitney with tie handling) and the decile
  * gains/lift table. Both are EXACT-INTEGER formulations: ranks,
  * concordant-pair counts and milli-scaled ratios never touch floats
  * except in one final deterministic division, so judged compares are
  * bit-exact (the repo's judged-double rule).
  */
object Eval {

  /** Exact ROC AUC via the Mann-Whitney rank-sum identity:
    * `AUC = (#concordant + ties/2) / (P·N)` over all positive×negative
    * pairs — computed WITHOUT enumerating pairs, from per-distinct-
    * score counts and one banded cumulative sum (the
    * [[Events.ksStatistic]] ECDF machinery): for each distinct score
    * `s`, positives at `s` pair concordantly with every negative
    * strictly below, and tie with negatives AT `s`. The doubled
    * numerator `2U = 2·Σ p_s·cneg_<s + Σ p_s·n_s` is an exact BIGINT
    * (overflow-safe while `2·P·N·1000 < 2^63` — ~2e7 rows a side),
    * `auc_milli = 2U·1000 div (2·P·N)` exact, `auc` one division.
    * An AUC of 500‰ is chance; `labelCol` must be 0/1 numeric or
    * boolean.
    *
    * Scale: rows partial-aggregate to per-distinct-score (p, n) counts
    * FIRST; banding replaces the global window exactly as in
    * [[Relational.concentration]]. Judged `q_auc`, fully ORACLED;
    * perfect/reversed/chance separations, tie halving and the
    * pair-enumeration property equality pinned in EvalSpec. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
      bands: Int = 32): DataFrame = {
    val per = graft.engine.Caches.persisted(
      df.select(col(scoreCol).as("v"),
          col(labelCol).cast("long").as("__y"))
        .groupBy("v")
        .agg(sum(col("__y")).as("p"),
          sum(lit(1L) - col("__y")).as("n")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg")))
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandAsc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(sum(col("n")).as("__bn"))
      .withColumn("__on", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__on"))
    val wB = Window.partitionBy(col("__band")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    banded.join(broadcast(offsets), "__band")
      // negatives STRICTLY below v: cumulative up to v minus the v row
      .withColumn("__cn", col("__on") + sum(col("n")).over(wB) - col("n"))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg((sum(col("p") * col("__cn")) * 2 + sum(col("p") * col("n")))
        .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("u2 * 1000 div nullif(2 * n_pos * n_neg, 0L)").as("auc_milli"),
        when(col("n_pos") * col("n_neg") > 0,
          col("u2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"))
          .otherwise(lit(null).cast("double")).as("auc"))
  }

  /** Decile gains/lift table — the campaign-targeting readout next to
    * [[aucExact]]'s single number: rows rank by (score desc, id asc),
    * split into `k` equal-count buckets by rank arithmetic
    * (`(rank−1)·k div N` — exact, no ntile nondeterminism), and each
    * bucket row reports exact counts plus
    * `lift_milli = cum_pos·N·1000 div (cum_n·P)` ("the top 2 deciles
    * capture 3.1× their share of positives") and
    * `capture_milli = cum_pos·1000 div P` (the cumulative-gains
    * curve). All-integer; a perfectly random scorer reads 1000‰ lift
    * everywhere.
    *
    * Scale: the global rank is the [[Relational.concentration]] banded
    * prefix-sum (band by score via broadcast min/max, in-band windows);
    * the decile aggregate is k rows and its running window trivial.
    * Judged `q_lift`, fully ORACLED; perfect-scorer lift `min(k, N/P)·
    * 1000‰`, uniform-scorer 1000‰ and tie determinism pinned in
    * EvalSpec. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, k: Int = 10, bands: Int = 32): DataFrame = {
    require(k >= 2 && k <= 100, s"k must be in 2..100: $k")
    val per = graft.engine.Caches.persisted(
      df.select(col(scoreCol).as("v"), col(idCol).as("__id"),
        col(labelCol).cast("long").as("__y")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      count(lit(1)).as("__N"), sum(col("__y")).as("__P")))
    // band DESCENDING by score so band order = rank order
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandDesc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__or", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__or"))
    val wB = Window.partitionBy(col("__band"))
      .orderBy(col("v").desc, col("__id"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Long.MinValue, 0)
    banded.join(broadcast(offsets), "__band")
      .withColumn("__rank", col("__or") + row_number().over(wB))
      .withColumn("decile", expr(s"(__rank - 1) * $k div __N").cast("int"))
      .groupBy(col("decile"), col("__N"), col("__P"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("pos")).over(wCum))
      .select(col("decile"), col("n"), col("pos"), col("cum_pos"),
        expr("cum_pos * __N * 1000 div nullif(cum_n * __P, 0L)")
          .as("lift_milli"),
        expr("cum_pos * 1000 div nullif(__P, 0L)").as("capture_milli"))
  }
}
