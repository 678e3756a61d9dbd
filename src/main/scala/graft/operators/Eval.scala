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

  /** Confusion-matrix report at a list of decision thresholds — the
    * operating-point readout between [[aucExact]] (threshold-free) and
    * [[liftTable]] (rank-bucketed): scores quantize to milli BIGINTs
    * (`floor(s·1000 + 0.5)` — the judged-double rule, identical IEEE
    * ops in any engine), a row predicts positive iff
    * `score_milli ≥ threshold`, and each threshold row carries the
    * exact tp/fp/tn/fn plus `precision_milli`, `recall_milli` and
    * `f1_milli = 2·tp·1000 div (2·tp + fp + fn)` — all integer
    * arithmetic, no float ever compared.
    *
    * Scale: ONE scan partial-aggregates to per-distinct-(score_milli,
    * label) counts; the per-threshold sums run over that config-scale
    * relation crossed with the broadcast threshold list — rows are
    * never re-scanned per threshold. Judged `q_confusion`, fully
    * ORACLED; hand matrix, degenerate all-positive/all-negative
    * thresholds and the P=tp+fn / N=fp+tn identities pinned in
    * EvalSpec. */
  def confusionReport(df: DataFrame, scoreCol: String, labelCol: String,
      thresholdsMilli: Seq[Long]): DataFrame = {
    require(thresholdsMilli.nonEmpty, "thresholdsMilli must be non-empty")
    val session = df.sparkSession
    import session.implicits._
    val per = df
      .select(floor(col(scoreCol) * 1000 + lit(0.5)).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s", "y").agg(count(lit(1)).as("c"))
    val thr = broadcast(
      thresholdsMilli.toDF("threshold_milli"))
    per.crossJoin(thr)
      .groupBy("threshold_milli")
      .agg(
        sum(when(col("s") >= col("threshold_milli") && col("y") === 1L,
          col("c")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("threshold_milli") && col("y") === 0L,
          col("c")).otherwise(0L)).as("fp"),
        sum(when(col("s") < col("threshold_milli") && col("y") === 0L,
          col("c")).otherwise(0L)).as("tn"),
        sum(when(col("s") < col("threshold_milli") && col("y") === 1L,
          col("c")).otherwise(0L)).as("fn"))
      .select(col("threshold_milli"), col("tp"), col("fp"), col("tn"),
        col("fn"),
        expr("tp * 1000 div nullif(tp + fp, 0L)").as("precision_milli"),
        expr("tp * 1000 div nullif(tp + fn, 0L)").as("recall_milli"),
        expr("tp * 2000 div nullif(2 * tp + fp + fn, 0L)").as("f1_milli"))
  }

  /** Calibration (reliability) bins — "when the model says 70%, does
    * it happen 70% of the time": rows rank by (milli-quantized score
    * desc, id asc) into `k` equal-count bins exactly as [[liftTable]]
    * buckets, and each bin reports the exact mean PREDICTED milli
    * (`sum(score_milli) div n` — integer division over exact sums)
    * against the exact OBSERVED positive rate (`pos·1000 div n`); the
    * gap column is their signed difference. A calibrated scorer reads
    * gap ≈ 0 in every bin; a ranking-good-but-miscalibrated one (high
    * AUC, big gaps) is what this catches.
    *
    * Scale: identical machinery to [[liftTable]] — banded global rank,
    * k-row aggregate. Judged `q_calibration`, fully ORACLED;
    * perfectly-calibrated zero gaps, constant-scorer single-mean and
    * bin-count exactness pinned in EvalSpec. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, k: Int = 10, bands: Int = 32): DataFrame = {
    require(k >= 2 && k <= 100, s"k must be in 2..100: $k")
    val per = graft.engine.Caches.persisted(
      df.select(
        floor(col(scoreCol) * 1000 + lit(0.5)).cast("long").as("v"),
        col(idCol).as("__id"), col(labelCol).cast("long").as("__y")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      count(lit(1)).as("__N")))
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
    banded.join(broadcast(offsets), "__band")
      .withColumn("__rank", col("__or") + row_number().over(wB))
      .withColumn("bin", expr(s"(__rank - 1) * $k div __N").cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(col("v")).as("__sv"))
      .select(col("bin"), col("n"), col("pos"),
        expr("__sv div n").as("mean_pred_milli"),
        expr("pos * 1000 div n").as("obs_rate_milli"),
        expr("__sv div n - pos * 1000 div n").as("gap_milli"))
  }

  /** Difference-in-differences — the workhorse causal readout when a
    * rollout has a before/after and a treated/control split (Card &
    * Krueger 1994 made it canon): the four (treat × post) cells carry
    * EXACT counts and cents, and the effect estimate is
    * `(mean_tp − mean_t0) − (mean_cp − mean_c0)` — what the treated
    * group moved beyond the control group's ambient drift. The cutover
    * defaults to the exact midpoint of the observed time range
    * (`(min+max) div 2` epoch micros — era-proof integer arithmetic);
    * the four means are the ONLY doubles, each one cents/n division
    * with the subtraction order mirrored verbatim in the oracle (the
    * Welch judged-double rule).
    *
    * Scale: one bounds broadcast + one 4-cell partial aggregate — two
    * scans, no window, no join beyond the 1-row broadcast. Judged
    * `q_did`, fully ORACLED; hand effect (parallel-trends null, pure
    * treatment lift) and cell bookkeeping pinned in EvalSpec. */
  def diffInDiff(df: DataFrame, treatCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val b = broadcast(df.agg(
      expr(s"(min(unix_micros($tsCol)) + max(unix_micros($tsCol)))" +
        " div 2").as("__cut")))
    df.crossJoin(b)
      .select(col(treatCol).cast("boolean").as("treat"),
        (unix_micros(col(tsCol)) >= col("__cut")).as("post"),
        floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("__c"))
      .agg(
        sum(when(col("treat") && col("post"), 1L).otherwise(0L))
          .as("n_tp"),
        sum(when(col("treat") && col("post"), col("__c")).otherwise(0L))
          .as("cents_tp"),
        sum(when(col("treat") && !col("post"), 1L).otherwise(0L))
          .as("n_t0"),
        sum(when(col("treat") && !col("post"), col("__c")).otherwise(0L))
          .as("cents_t0"),
        sum(when(!col("treat") && col("post"), 1L).otherwise(0L))
          .as("n_cp"),
        sum(when(!col("treat") && col("post"), col("__c")).otherwise(0L))
          .as("cents_cp"),
        sum(when(!col("treat") && !col("post"), 1L).otherwise(0L))
          .as("n_c0"),
        sum(when(!col("treat") && !col("post"), col("__c")).otherwise(0L))
          .as("cents_c0"))
      .withColumn("did_cents",
        expr("(cast(cents_tp as double) / cast(n_tp as double)" +
          " - cast(cents_t0 as double) / cast(n_t0 as double))" +
          " - (cast(cents_cp as double) / cast(n_cp as double)" +
          " - cast(cents_c0 as double) / cast(n_c0 as double))"))
  }
}
