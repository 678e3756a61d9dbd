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

  /** Qini / uplift curve over score deciles — [[liftTable]]'s
    * treatment-aware sibling (Radcliffe 2007), the readout an uplift
    * model gets instead of ROC: rank ALL subjects by score descending,
    * split each cumulative prefix by treatment, and report
    * `qini(k) = cumPos_t − cumPos_c·cumN_t/cumN_c` — incremental
    * positives the treated prefix shows beyond the control prefix's
    * rate. A random scorer's curve is ~0 everywhere; a perfect
    * targeter front-loads it.
    *
    * EXACT-INTEGER formulation: counts are BIGINTs off the banded DESC
    * rank ([[liftTable]]'s machinery — no global window), the control
    * scaling is one integer `div` (all quantities non-negative; NULL
    * when the control prefix is empty), and the per-decile uplift rate
    * is a subtraction of two non-negative milli divisions (the
    * CLAUDE-safe form). Judged `q_qini`, fully ORACLED; the
    * null-effect zero curve and hand prefix arithmetic pinned in
    * EvalSpec. */
  def qiniCurve(df: DataFrame, scoreCol: String, treatCol: String,
      labelCol: String, idCol: String, k: Int = 10,
      bands: Int = 32): DataFrame = {
    require(k >= 2 && k <= 100, s"k must be in 2..100: $k")
    val per = graft.engine.Caches.persisted(
      df.select(col(scoreCol).as("v"), col(idCol).as("__id"),
        col(treatCol).cast("boolean").as("__t"),
        col(labelCol).cast("long").as("__y")))
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
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Long.MinValue, 0)
    banded.join(broadcast(offsets), "__band")
      .withColumn("__rank", col("__or") + row_number().over(wB))
      .withColumn("decile", expr(s"(__rank - 1) * $k div __N").cast("int"))
      .groupBy(col("decile"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("pos_t"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("pos_c"))
      .withColumn("cum_n_t", sum(col("n_t")).over(wCum))
      .withColumn("cum_n_c", sum(col("n_c")).over(wCum))
      .withColumn("cum_pos_t", sum(col("pos_t")).over(wCum))
      .withColumn("cum_pos_c", sum(col("pos_c")).over(wCum))
      .select(col("decile"), col("n_t"), col("n_c"), col("pos_t"),
        col("pos_c"), col("cum_n_t"), col("cum_n_c"), col("cum_pos_t"),
        col("cum_pos_c"),
        expr("cum_pos_t * 1000 - cum_pos_c * cum_n_t * 1000" +
          " div nullif(cum_n_c, 0L)").as("qini_milli"),
        (expr("pos_t * 1000 div nullif(n_t, 0L)") -
          expr("pos_c * 1000 div nullif(n_c, 0L)")).as("uplift_milli"))
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
      idCol: String, k: Int = 10, bands: Int = 32): DataFrame =
    scoreBins(df, scoreCol, labelCol, idCol, k, bands)
      .select(col("bin"), col("n"), col("pos"),
        expr("__sv div n").as("mean_pred_milli"),
        expr("pos * 1000 div n").as("obs_rate_milli"),
        expr("__sv div n - pos * 1000 div n").as("gap_milli"))

  /** The shared equal-count score-decile relation under
    * [[calibrationBins]] / [[hosmerLemeshow]]: per bin (desc-rank
    * equal-count over milli scores, the liftTable total order) the
    * row count `n`, positive count `pos`, and the exact milli
    * prediction sum `__sv`. */
  private def scoreBins(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, k: Int, bands: Int): DataFrame = {
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
  }

  /** Hosmer–Lemeshow goodness-of-fit statistic (Hosmer & Lemeshow
    * 1980 — public): does the PROBABILITY MODEL fit — per score
    * decile, observed positives O against expected E = Σp̂, summed as
    * `HL = Σ_g (O−E)²/(E(1−E/n_g))`, χ²(g−2) under fit. The formal
    * TEST beside [[calibrationError]]'s descriptive gap summary (ECE
    * weights |gap|; HL variance-normalizes it, so a tight bin's small
    * gap can matter more than a loose bin's large one).
    *
    * Exact-integer route on the [[calibrationBins]] relation: with
    * `e = Σ score_milli` (exact — the per-row milli quantization is
    * the only float step), each bin's term is
    * `term_micro = (1000·O − e)²·n·10⁶ div (e·(1000n − e))` over
    * DECIMAL(38,0) (q_gini rule; all factors non-negative). A
    * degenerate bin (e = 0 or e = 1000n — zero modeled variance)
    * carries a NULL term and drops from the sum; `hl_micro` and
    * `df_chi2 = used − 2` (NULL when < 1) repeat on every row, the
    * [[Graph.modularity]] readout convention.
    *
    * Scale: the bins pipeline + a k-row readout. The DECIMAL(38,0)
    * numerator caps bin size at ~3e7 rows ((1000n)²·n·10⁶ < 10³⁸) —
    * raise k to keep bins under that at extreme corpus sizes. Judged
    * `q_hosmer`, fully ORACLED; the perfectly-calibrated small case,
    * the degenerate-bin fence and ECE-vs-HL divergence pinned in
    * EvalSpec. */
  def hosmerLemeshow(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, k: Int = 10, bands: Int = 32): DataFrame = {
    val per = scoreBins(df, scoreCol, labelCol, idCol, k, bands)
      .select(col("bin"), col("n"), col("pos"),
        col("__sv").as("exp_milli"),
        when(col("__sv") > 0 && col("__sv") < col("n") * 1000L,
          expr("""cast((cast(1000 * pos - __sv as decimal(38,0))
              * (1000 * pos - __sv) * n * 1000000)
            div (cast(__sv as decimal(38,0)) * (1000 * n - __sv))
            as bigint)"""))
          .as("term_micro"))
    per.crossJoin(broadcast(per.agg(
      sum(col("term_micro")).as("hl_micro"),
      when(count(col("term_micro")) >= 3,
        count(col("term_micro")) - 2).as("df_chi2"))))
  }

  /** Expected + maximum calibration error — [[calibrationBins]]
    * collapsed to the two numbers papers report (Naeini et al. 2015):
    * `ECE = Σ_b (n_b/N)·|conf_b − acc_b|` (the bin-weighted average
    * miscalibration) and `MCE = max_b |conf_b − acc_b|` (the worst
    * bin). Pure integer arithmetic ON the bins' exact milli gaps:
    * `ece_milli = Σ n_b·|gap_milli| div N`, `mce_milli = max|gap|` —
    * nothing new floats; the only quantization is the bins' own.
    *
    * Scale: the bins pipeline (banded equal-count ranking) + one
    * k-row readout. Judged `q_ece`, fully ORACLED; perfectly
    * calibrated → 0, anti-calibrated extreme, and ECE ≤ MCE pinned in
    * EvalSpec. */
  def calibrationError(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, k: Int = 10, bands: Int = 32): DataFrame =
    calibrationBins(df, scoreCol, labelCol, idCol, k, bands)
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_bins"),
        sum(expr("n * abs(gap_milli)")).as("__w"),
        max(abs(col("gap_milli"))).as("mce_milli"))
      .select(col("n"), col("n_bins"),
        expr("__w div n").as("ece_milli"), col("mce_milli"))

  /** Matthews correlation coefficient + Cohen's kappa at ONE decision
    * threshold — the single-number agreement readouts that stay honest
    * under class imbalance where accuracy and even F1 mislead
    * (Matthews 1975; Cohen 1960). Scores quantize to milli BIGINTs
    * exactly as [[confusionReport]]; the four cells are exact, and
    * both coefficients derive from them:
    * `MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))` and
    * `κ = (n·(tp+tn) − pe) / (n² − pe)` with
    * `pe = (tp+fp)(tp+fn) + (fn+tn)(fp+tn)`. κ is an exact-integer
    * ratio (sign·abs div — Spark `div` truncates, DuckDB `//` floors;
    * identical only routed through non-negatives); MCC's √ forces one
    * double, but every input is an exact (<2^53) integer and
    * multiply/√/divide/floor are IEEE-pinned ops any engine reproduces
    * bit-for-bit (the q_did rule). Both read ±1000‰-style micros.
    *
    * Scale: identical to [[confusionReport]] — one scan to
    * per-distinct-(score_milli, label) counts, one 4-cell aggregate.
    * Judged `q_mcc`, fully ORACLED; hand matrix, perfect/inverted ±1,
    * chance-level 0 and degenerate-marginal nulls pinned in EvalSpec. */
  def mccKappa(df: DataFrame, scoreCol: String, labelCol: String,
      thresholdMilli: Long): DataFrame = {
    df.select(floor(col(scoreCol) * 1000 + lit(0.5)).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s", "y").agg(count(lit(1)).as("c"))
      .agg(
        sum(when(col("s") >= thresholdMilli && col("y") === 1L,
          col("c")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= thresholdMilli && col("y") === 0L,
          col("c")).otherwise(0L)).as("fp"),
        sum(when(col("s") < thresholdMilli && col("y") === 0L,
          col("c")).otherwise(0L)).as("tn"),
        sum(when(col("s") < thresholdMilli && col("y") === 1L,
          col("c")).otherwise(0L)).as("fn"))
      .select(lit(thresholdMilli).as("threshold_milli"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        // the zero guard tests each marginal (a BIGINT product of four
        // data-scale sums would ANSI-overflow long before the sqrt)
        expr("""case when tp+fp = 0 or tp+fn = 0 or tn+fp = 0
            or tn+fn = 0 then null
          else cast(floor(cast(tp*tn - fp*fn as double) * 1000000.0
            / sqrt(cast(tp+fp as double) * cast(tp+fn as double)
                 * cast(tn+fp as double) * cast(tn+fn as double)))
            as bigint) end""").as("mcc_micro"),
        expr("""cast(sign((tp+tn+fp+fn)*(tp+tn)
            - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)))
          * (abs((tp+tn+fp+fn)*(tp+tn)
              - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn))) * 1000000
             div nullif((tp+tn+fp+fn)*(tp+tn+fp+fn)
              - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)), 0L))
          as bigint)""").as("kappa_micro"))
  }

  /** Operating-point selection: the Youden-J-optimal and the
    * expected-cost-optimal decision thresholds in one sweep (Youden
    * 1950; cost curves, Drummond & Holte 2006 — public). Where
    * [[mccKappa]] SCORES a caller-chosen threshold, this CHOOSES one:
    * over every realized threshold (predict positive iff
    * `score ≥ s` for each distinct milli score), pick (a) the J
    * maximizer `J = tpr − fpr` and (b) the minimizer of
    * `cost = fn·c_fn + fp·c_fp`. Exact integers throughout:
    * `j_micro = tp·10⁶ div P − fp·10⁶ div N` (a difference of two
    * non-negative truncated divisions — the documented-safe shape),
    * `cost_milli = (P − tp)·cFnMilli + fp·cFpMilli`. Ties resolve to
    * the LOWEST threshold (the more-recall operating point), pinned on
    * both sides. Returns two labeled rows (`criterion` ∈ 'youden',
    * 'min_cost'); empty when either class is absent (no tradeoff to
    * optimize — spec-pinned fence).
    *
    * Scale: the [[aucExact]] posture — rows partial-aggregate to
    * per-distinct-score (pos, neg) counts FIRST, the descending
    * cumulative rides the banded ECDF (no global window), and each
    * selection is a TakeOrdered(1). Judged `q_threshold_opt`, fully
    * ORACLED; hand sweep, tie rule, cost-vs-J divergence under
    * asymmetric costs and the one-class fence pinned in EvalSpec. */
  def bestThreshold(df: DataFrame, scoreCol: String, labelCol: String,
      cFpMilli: Long = 1000L, cFnMilli: Long = 1000L,
      bands: Int = 32): DataFrame = {
    require(cFpMilli >= 0 && cFnMilli >= 0)
    val per = graft.engine.Caches.persisted(
      df.select(floor(col(scoreCol) * 1000 + lit(0.5)).cast("long").as("v"),
          col(labelCol).cast("long").as("__y"))
        .groupBy("v")
        .agg(sum(col("__y")).as("__p"),
          sum(lit(1L) - col("__y")).as("__n")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      sum(col("__p")).as("__ptot"), sum(col("__n")).as("__ntot")))
    val banded = per.crossJoin(bounds)
      .filter(col("__ptot") > 0 && col("__ntot") > 0)
      .withColumn("__band", graft.engine.Banding.bandDesc(
        col("v"), col("__lo"), col("__hi"), bands))
      // drop the totals before the offsets self-join (re-attached
      // below) — shared lineage would make __P/__N ambiguous
      .select(col("v"), col("__p"), col("__n"), col("__band"))
    val offsets = banded.groupBy(col("__band"))
      .agg(sum(col("__p")).as("__bp"), sum(col("__n")).as("__bn"))
      .withColumn("__op", coalesce(sum(col("__bp")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .withColumn("__on", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__op"), col("__on"))
    val wB = Window.partitionBy(col("__band")).orderBy(col("v").desc)
      .rowsBetween(Long.MinValue, 0)
    val sweep = graft.engine.Caches.persisted(
      banded.join(broadcast(offsets), "__band")
        .withColumn("tp", col("__op") + sum(col("__p")).over(wB))
        .withColumn("fp", col("__on") + sum(col("__n")).over(wB))
        .crossJoin(broadcast(bounds.select(
          col("__ptot").as("__pt"), col("__ntot").as("__nt"))))
        .select(col("v").as("threshold_milli"), col("tp"), col("fp"),
          (col("__nt") - col("fp")).as("tn"),
          (col("__pt") - col("tp")).as("fn"),
          expr("""cast(cast(tp as decimal(38,0)) * 1000000 div __pt
              as bigint)
            - cast(cast(fp as decimal(38,0)) * 1000000 div __nt
              as bigint)""").as("j_micro"),
          ((col("__pt") - col("tp")) * lit(cFnMilli) +
            col("fp") * lit(cFpMilli)).as("cost_milli")))
    val youden = sweep
      .orderBy(col("j_micro").desc, col("threshold_milli"))
      .limit(1).withColumn("criterion", lit("youden"))
    val cheapest = sweep
      .orderBy(col("cost_milli"), col("threshold_milli"))
      .limit(1).withColumn("criterion", lit("min_cost"))
    youden.unionByName(cheapest)
      .select(col("criterion"), col("threshold_milli"), col("tp"),
        col("fp"), col("tn"), col("fn"), col("j_micro"), col("cost_milli"))
  }

  /** Average precision — the area under the precision–recall curve as
    * rankers are actually scored (the step-sum convention: the mean of
    * precision@rank over POSITIVE rows, total order pinned to
    * (score_milli desc, id asc) like [[liftTable]]). Every term is
    * exact integer: `prec_micro(r) = cum_pos(r)·10⁶ div r`, and
    * `ap_micro = Σ_{positives} prec_micro div P` — no float anywhere,
    * so the judged compare is bit-exact. The PR-curve twin of
    * [[aucExact]]: ROC-AUC rewards ranking negatives low, AP rewards
    * ranking positives high — under heavy imbalance (every retrieval /
    * near-dup / quality-filter eval) AP is the one that moves.
    *
    * Scale: the banded global rank (no global window) with a second
    * per-band POSITIVE-count offset riding the same tiny offsets
    * frame; one final 1-row aggregate. Judged `q_ap`, fully ORACLED;
    * perfect/worst orderings (1000000 vs harmonic floor), interleaved
    * hand value and the prevalence identity at full recall pinned in
    * EvalSpec. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, bands: Int = 32): DataFrame = {
    val per = graft.engine.Caches.persisted(
      df.select(
        floor(col(scoreCol) * 1000 + lit(0.5)).cast("long").as("v"),
        col(idCol).as("__id"), col(labelCol).cast("long").as("__y")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      count(lit(1)).as("n")))
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandDesc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bn"), sum(col("__y")).as("__bp"))
      .withColumn("__or", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .withColumn("__op", coalesce(sum(col("__bp")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__or"), col("__op"))
    val wB = Window.partitionBy(col("__band"))
      .orderBy(col("v").desc, col("__id"))
    banded.join(broadcast(offsets), "__band")
      .withColumn("__rank", col("__or") + row_number().over(wB))
      .withColumn("__cp",
        col("__op") + sum(col("__y")).over(wB.rowsBetween(Long.MinValue, 0)))
      .filter(col("__y") === 1L)
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_pos"),
        sum(expr("__cp * 1000000 div __rank")).as("__terms"))
      .select(col("n"), col("n_pos"),
        expr("__terms div n_pos").as("ap_micro"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
    * location test next to [[Events.welchTTest]]'s parametric one:
    * does the `group=true` sample stochastically dominate the rest,
    * decided on RANKS so outliers and monotone rescaling can't move
    * it. Tie-averaged ranks stay exact by doubling (a tie group at
    * cumulative offset c with t members has doubled average rank
    * `2c + t + 1` — the [[Relational.spearman]] identity), so
    * `r2 = 2·R₁` and `u2 = 2·U₁ = r2 − n₁(n₁+1)` are exact BIGINTs.
    * The normal-approximation z carries the exact tie correction
    * `σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1)))` — every sum an exact
    * integer, one IEEE √/divide/floor at the end (micro-quantized,
    * the judged-double rule). U₁ counts (group1 above) wins: u2 >
    * n₁n₂ ⇔ z > 0 ⇔ group1 larger.
    *
    * Scale: rows partial-agg to per-distinct-value (t₁, t) counts,
    * the strictly-below cumulative is the [[aucExact]] banded ECDF —
    * no global window, no pair enumeration. Judged `q_mwu`, fully
    * ORACLED; hand rank-sums under ties, separation extremes
    * (u2 = 2n₁n₂ / 0), symmetric-null z≈0 and the U₁+U₂ identity
    * pinned in EvalSpec. */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String,
      bands: Int = 32): DataFrame = {
    val per = graft.engine.Caches.persisted(
      df.select(col(valueCol).as("v"),
          col(groupCol).cast("boolean").cast("long").as("__g"))
        .groupBy("v")
        .agg(sum(col("__g")).as("t1"), count(lit(1)).as("t")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      sum(col("t1")).as("n1"), sum(col("t") - col("t1")).as("n2"),
      sum(expr("t*t*t - t")).as("__ties")))
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandAsc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(sum(col("t")).as("__bn"))
      .withColumn("__oc", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__oc"))
    val wB = Window.partitionBy(col("__band")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    banded.join(broadcast(offsets), "__band")
      // rows strictly below v, then the doubled tie-averaged rank sum
      .withColumn("__c", col("__oc") + sum(col("t")).over(wB) - col("t"))
      .groupBy(col("n1"), col("n2"), col("__ties"))
      .agg(sum(col("t1") * (col("__c") * 2 + col("t") + 1)).as("r2"))
      .withColumn("u2", expr("r2 - n1 * (n1 + 1)"))
      .withColumn("z_micro",
        expr("""case when n1 = 0 or n2 = 0 or n1 + n2 < 2 then null
          when cast(n1 as double) * cast(n2 as double) / 12.0
             * (cast(n1 + n2 + 1 as double)
                - cast(__ties as double)
                  / (cast(n1 + n2 as double) * cast(n1 + n2 - 1 as double)))
             <= 0.0 then null
          else cast(floor(cast(u2 - n1 * n2 as double) * 1000000.0
            / (2.0 * sqrt(cast(n1 as double) * cast(n2 as double) / 12.0
               * (cast(n1 + n2 + 1 as double)
                  - cast(__ties as double)
                    / (cast(n1 + n2 as double)
                       * cast(n1 + n2 - 1 as double))))))
            as bigint) end"""))
      .select(col("n1"), col("n2"), col("r2"), col("u2"), col("z_micro"))
  }

  /** Grubbs' test — is the single most extreme value a statistical
    * outlier (Grubbs 1950), the principled replacement for eyeballing
    * a max: `G = max|x − x̄| / s` compared against the t-derived
    * critical value. Exact-integer core: the argmax of `|n·x − S1|`
    * over distinct cents values is pure BIGINT (ties to the SMALLER
    * value — pinned), the sample variance numerator `n·S2 − S1²` rides
    * DECIMAL(38,0)/HUGEINT, and G takes the ONE micro-floored IEEE
    * chain `|dev|·10⁶ / (n·√((nS2−S1²)/(n(n−1))))` (the cochran
    * spelling discipline). Fences: n < 3 or zero variance → NULL G
    * (the outlier value still reports).
    *
    * Scale: one partial agg to distinct-value multiplicities, a
    * broadcast total, one TakeOrdered(1). Judged `q_grubbs`, fully
    * ORACLED; the exact 1.5 hand case (√202500 = 450), the symmetric
    * tie-to-smaller rule, zero-variance and n<3 fences pinned in
    * EvalSpec. */
  def grubbsTest(df: DataFrame, valueCol: String): DataFrame = {
    val per = graft.engine.Caches.persisted(
      df.select(floor(col(valueCol) * 100 + lit(0.5)).cast("long")
          .as("__c"))
        .groupBy("__c").agg(count(lit(1)).as("__m")))
    val tot = broadcast(per.agg(sum(col("__m")).as("n"),
      sum(col("__m") * col("__c")).as("__s1"),
      sum(expr("__m * cast(__c as decimal(38,0)) * __c")).as("__s2")))
    per.crossJoin(tot)
      .select(col("n"), col("__s1"), col("__s2"), col("__c"),
        abs(col("n") * col("__c") - col("__s1")).as("__dev"))
      .orderBy(col("__dev").desc, col("__c")).limit(1)
      .select(col("n"), col("__c").as("outlier_cents"),
        when(col("n") >= 3 &&
            expr("n * __s2 - cast(__s1 as decimal(38,0)) * __s1") > 0,
          expr("""cast(floor(cast(__dev as double) * 1000000.0
            / (cast(n as double)
               * sqrt(cast(n * __s2 -
                   cast(__s1 as decimal(38,0)) * __s1 as double)
                 / cast(n * (n - 1) as double)))) as bigint)"""))
          .as("g_micro"))
  }

  /** Quantile treatment effects — the DISTRIBUTIONAL view next to the
    * mean-only [[cemAtt]]/diff-in-means readouts (a treatment that
    * moves the median nothing but stretches the tail is invisible to
    * an ATT): per requested quantile p, `QTE(p) = Q_treat(p) −
    * Q_control(p)` over exact cents. Quantiles use Spark's exact
    * `percentile` (linear interpolation over the sorted multiset) —
    * bit-identical to DuckDB's `quantile_cont` (the robustScale
    * precedent) — and the output micro-floors each side ONCE
    * (`floor(q·10 + 0.5)` deci-cents of the SAME double both engines
    * computed — the floor can't disagree). A missing arm reads NULL
    * for its side (and for the effect).
    *
    * Scale: one full-sort-free percentile aggregate per arm (Spark's
    * percentile is a partial-aggregating sketch-free exact impl;
    * calendar/corpus scale applies — for 100 TB arms use the banded
    * exact-percentile machinery instead). Judged `q_qte` (p ∈ {250,
    * 500, 750, 900} milli), fully ORACLED; hand shift (constant QTE),
    * tail-only stretch (median 0, p90 positive) and interpolation
    * pinned in EvalSpec. */
  def qte(df: DataFrame, valueCol: String, treatCol: String,
      psMilli: Seq[Int]): DataFrame = {
    require(psMilli.nonEmpty && psMilli.forall(p => p >= 0 && p <= 1000),
      s"quantiles in 0..1000 milli: $psMilli")
    val session = df.sparkSession
    import session.implicits._
    val cents = df.select(col(treatCol).cast("boolean").as("__t"),
      floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("__c"))
    val ps = psMilli.distinct.sorted
    val aggs = ps.flatMap(p => Seq(
      expr(s"percentile(if(__t, __c, null), ${p / 1000.0})")
        .as(s"__qt_$p"),
      expr(s"percentile(if(not __t, __c, null), ${p / 1000.0})")
        .as(s"__qc_$p")))
    val row = cents.agg(aggs.head, aggs.tail: _*)
    val pdf = ps.toDF("p_milli")
    pdf.crossJoin(broadcast(row))
      .select(col("p_milli") +: ps.flatMap(p => Seq(
        when(col("p_milli") === p,
          floor(col(s"__qt_$p") * 10 + lit(0.5)).cast("long"))
          .as(s"__a_$p"),
        when(col("p_milli") === p,
          floor(col(s"__qc_$p") * 10 + lit(0.5)).cast("long"))
          .as(s"__b_$p"))): _*)
      .select(col("p_milli"),
        coalesce(ps.map(p => col(s"__a_$p")): _*).as("q_treat_decicents"),
        coalesce(ps.map(p => col(s"__b_$p")): _*).as("q_control_decicents"))
      .withColumn("qte_decicents",
        col("q_treat_decicents") - col("q_control_decicents"))
  }

  /** Kruskal–Wallis H — [[mannWhitney]] generalized to k groups (the
    * nonparametric one-way ANOVA): do ANY of the groups stochastically
    * dominate, decided on ranks. Tie-averaged ranks stay exact by
    * doubling (a tie group at cumulative offset c with t members has
    * doubled average rank `2c + t + 1` — the spearman identity), so
    * each group's doubled rank sum `r2_g` is an exact BIGINT and
    * `H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1)` evaluates as pure integer
    * division: per-group
    * `term_g = (r2_g²·12·10⁶) div (4·n_g·N·(N+1))` — micro-truncated
    * per term then summed (the chi2 pattern), with the FULL divisor
    * folded in so the result stays BIGINT while the numerator rides a
    * DECIMAL(38,0)/HUGEINT intermediate (the q_gini rule) — then
    * `h_micro = Σ term − 3(N+1)·10⁶`. The tie correction divides by
    * `1 − Σ(t³−t)/(N³−N)`:
    * `h_adj_micro = sign·(abs(h_micro)·(N³−N) div (N³−N−T))` (signed
    * route — quantization can push a null-ish H a hair negative;
    * all-tied input fences NULL). Values quantize to cents first so
    * both engines rank the identical integer domain.
    *
    * Scale: one partial agg to (value, group) cells, the strictly-below
    * cumulative is the [[aucExact]] banded ECDF over the distinct-value
    * table — no global window, no pair enumeration; groups are
    * config-scale. The per-term divisor 4·n_g·N·(N+1) rides
    * DECIMAL(38,0) (would ANSI-overflow BIGINT past N ≈ 1.3e6 with a
    * dominant group); remaining BIGINT bounds: the tie correction's
    * N³−N caps N < ~2e6 and Σ(t³−t) caps any single value's
    * multiplicity < ~2e6 — past that, quantize coarser first. The
    * r2² numerator is safe while N < ~3e9 (r2² < 10^38). Judged
    * `q_kruskal`, fully ORACLED; the 2-group H = z² consistency check,
    * a hand 3-group case, separation extremes and the all-tied fence
    * pinned in EvalSpec. */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String,
      bands: Int = 32): DataFrame = {
    val cells = graft.engine.Caches.persisted(
      df.select(floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("v"),
          col(groupCol).cast("string").as("g"))
        .groupBy("v", "g").agg(count(lit(1)).as("t1")))
    val per = cells.groupBy("v").agg(sum(col("t1")).as("t"))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      sum(col("t")).as("n"), sum(expr("t*t*t - t")).as("__ties")))
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandAsc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(sum(col("t")).as("__bn"))
      .withColumn("__oc", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__oc"))
    val wB = Window.partitionBy(col("__band")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    val ranks = banded.join(broadcast(offsets), "__band")
      .withColumn("__c", col("__oc") + sum(col("t")).over(wB) - col("t"))
      .select(col("v"), (col("__c") * 2 + col("t") + 1).as("__dr"),
        col("n"), col("__ties"))
    val groups = cells.join(ranks, "v")
      .groupBy(col("g"))
      .agg(sum(col("t1") * col("__dr")).as("__r2"),
        sum(col("t1")).as("__ng"),
        max(col("n")).as("n"), max(col("__ties")).as("__ties"))
    groups
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_groups"),
        max(col("__ties")).as("__t"),
        sum(expr("""cast((cast(__r2 as decimal(38,0)) * __r2 * 12000000)
          div (cast(4 as decimal(38,0)) * __ng * n * (n + 1)) as bigint)"""))
          .as("__s"))
      .withColumn("h_micro",
        when(col("n") >= 2 && col("n_groups") >= 2,
          expr("__s - 3 * (n + 1) * 1000000")))
      .select(col("n"), col("n_groups"), col("h_micro"),
        when(col("h_micro").isNotNull &&
            expr("n * n * n - n - __t") > 0,
          expr("""cast(sign(h_micro) as bigint) *
            cast((abs(cast(h_micro as decimal(38,0))) * (n * n * n - n))
              div (n * n * n - n - __t) as bigint)"""))
          .as("h_adj_micro"))
  }

  /** One-way ANOVA F — the PARAMETRIC sibling of [[kruskalWallis]] on
    * the same (value, group) cells: does any group MEAN differ, decided
    * on variances — `F = (SSB/(k−1)) / (SSW/(N−k))` with
    * `SSB = Σ_g S_g²/n_g − S²/N` and `SSW = Σ_g Q_g − Σ_g S_g²/n_g`
    * (the sums-of-squares identity — no mean subtraction, so every
    * term is exact integer arithmetic over cents: `c = ⌊100v+0.5⌋`,
    * `S_g = Σc`, `Q_g = Σc²`).
    *
    * Judged-double discipline: each group's `S_g²·1000 div n_g` is
    * milli-truncated THEN summed (the chi2 pattern), numerators ride
    * DECIMAL(38,0) (the q_gini rule), and
    * `f_micro = sign(ssb)·(|ssb|·(N−k)·10⁶ div (ssw·(k−1)))` routes the
    * signed div rule (truncation can push a null-effect SSB a hair
    * negative). F is NULL when k < 2, N ≤ k, or SSW ≤ 0 (all groups
    * internally constant — F is infinite, not a number).
    *
    * Scale: ONE partial aggregate to config-scale group cells, then
    * 1-row arithmetic — no window, no pair join, corpus scanned once.
    * Overflow bounds: Q_g = Σc² caps rows·max-cents² < 10^18
    * (~10^8 rows at 56k-cent values — document per corpus); S_g² and
    * all downstream products ride DECIMAL(38,0). Judged `q_anova`,
    * fully ORACLED; the 2-group F = t² (pooled) consistency check,
    * hand 3-group values, the SSW = 0 fence and the k = 1 fence pinned
    * in EvalSpec. */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame =
    anovaOnUnits(df.select(
      floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("c"),
      col(groupCol).cast("string").as("g")), "c", "g")

  /** [[anovaF]]'s integer core over an ALREADY-QUANTIZED unit column —
    * shared with [[brownForsythe]], whose deviations are doubled cents
    * rather than cents. Identical arithmetic contract. */
  private[graft] def anovaOnUnits(df: DataFrame, unitCol: String,
      groupCol: String): DataFrame = {
    val cells = df
      .select(col(unitCol).cast("long").as("c"),
        col(groupCol).cast("string").as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("__ng"), sum(col("c")).as("__s"),
        sum(expr("c * c")).as("__q"))
      .withColumn("__a", expr(
        """cast((cast(__s as decimal(38,0)) * __s * 1000) div __ng
           as bigint)"""))
    cells
      .agg(sum(col("__ng")).as("n"), count(lit(1)).as("n_groups"),
        sum(col("__s")).as("__st"), sum(col("__q")).as("__qt"),
        sum(col("__a")).as("__at"))
      .withColumn("ssb_milli", expr(
        """__at - cast((cast(__st as decimal(38,0)) * __st * 1000) div n
           as bigint)"""))
      .withColumn("ssw_milli", expr(
        "cast(cast(__qt as decimal(38,0)) * 1000 - __at as bigint)"))
      .select(col("n"), col("n_groups"), col("ssb_milli"), col("ssw_milli"),
        when(col("n_groups") >= 2 && col("n") > col("n_groups") &&
            col("ssw_milli") > 0,
          expr("""cast(sign(ssb_milli) as bigint) *
            cast((abs(cast(ssb_milli as decimal(38,0))) * (n - n_groups)
              * 1000000)
              div (cast(ssw_milli as decimal(38,0)) * (n_groups - 1))
              as bigint)"""))
          .as("f_micro"))
  }

  /** Brown–Forsythe robust variance-homogeneity test (Brown &
    * Forsythe 1974 — the median-centered Levene 1960 statistic): do
    * the groups have equal SPREAD — the assumption [[anovaF]] makes
    * and nothing else here checks. The statistic is exactly the ANOVA
    * F computed over per-row absolute deviations from the GROUP
    * MEDIAN (median-centering is what makes it robust to heavy
    * tails — Levene's original mean-centering chases outliers).
    *
    * Exact-integer route: deviations are DOUBLED cents
    * `d = |2c − m2_g|`, where `m2_g = round(2·median_g)` is an exact
    * BIGINT for any group (odd n → 2·middle, even n → the sum of the
    * two middle order stats — both engines' 0.5-quantile interpolation
    * lands on .0/.5 exactly, and the doubling clears the half); the F
    * machinery is [[anovaOnUnits]] verbatim, so every downstream
    * number is the shared judged contract (in doubled-cent units).
    *
    * Scale: the exact per-group median is one sort-based percentile
    * aggregate (the robust_agg posture — a group's values buffer in
    * its aggregation; groups are config-scale categories), medians
    * broadcast back, one scan for deviations, then the one-aggregate
    * F. Judged `q_levene`, fully ORACLED; equal-spread vs inflated-
    * spread hand values, outlier robustness vs the mean-centered
    * variant and the constant-group fence pinned in EvalSpec. */
  def brownForsythe(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val cents = df.select(
      floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("c"),
      col(groupCol).cast("string").as("g"))
    val med = cents.groupBy("g")
      .agg(round(expr("percentile(c, 0.5)") * 2).cast("long").as("__m2"))
    anovaOnUnits(
      cents.join(broadcast(med), "g")
        .select(abs(col("c") * 2 - col("__m2")).as("d"), col("g")),
      "d", "g")
  }

  /** Cochran's Q test (Cochran 1950 — public): did the success RATE
    * differ across k paired binary treatments — the k-treatment
    * generalization of [[mcnemar]] (k = 2 collapses to it), the
    * repeated-measures sibling of the chi-square family. Over a
    * balanced subject×treatment 0/1 matrix in LONG form:
    * `Q = (k−1)·Σ_j (k·C_j − N)² / (k·(k·N − Σ_i R_i²))` with
    * `C_j` the treatment totals, `R_i` the subject totals, `N = ΣC =
    * ΣR` — every term an exact BIGINT, `q_milli` one truncated
    * division over DECIMAL(38,0) intermediates (q_gini rule). NULL
    * when the denominator is 0 (every subject constant across
    * treatments — no within-subject variation to test); Q is χ²(k−1)
    * under H₀. The input must be BALANCED (every subject observed
    * under every treatment — encode missing as 0 explicitly);
    * balance is REQUIRED (checked per subject: row count AND
    * count(DISTINCT treatment) both equal k — a duplicated treatment
    * row can't mask a missing cell).
    *
    * Scale: one partial agg to subject rows (R_i), one to treatment
    * totals — both single-pass; subjects at data scale ride a
    * groupBy, treatments are config-scale. Judged `q_cochran_q`,
    * fully ORACLED; the k = 2 ≡ McNemar(uncorrected) identity, hand
    * values, all-constant fence and the balance check pinned in
    * EvalSpec. */
  def cochranQ(df: DataFrame, subjectCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val x = df.select(col(subjectCol).as("s"),
      col(treatmentCol).cast("string").as("t"),
      when(col(valueCol).cast("long") =!= 0L, 1L).otherwise(0L).as("x"))
    val rows = x.groupBy("s").agg(sum(col("x")).as("__r"),
      count(lit(1)).as("__kr"), countDistinct(col("t")).as("__kd"))
    val rAgg = broadcast(rows.agg(count(lit(1)).as("b"),
      sum(expr("__r * __r")).as("__rr"), sum(col("__r")).as("__n"),
      min(col("__kr")).as("__kmin"), max(col("__kr")).as("__kmax"),
      min(col("__kd")).as("__dmin")))
    val cols = x.groupBy("t").agg(sum(col("x")).as("__c"))
    cols.crossJoin(broadcast(cols.groupBy().agg(count(lit(1)).as("k"))
        .select(col("k"))))
      .crossJoin(rAgg)
      .agg(max(col("k")).as("k"), max(col("b")).as("b"),
        max(col("__n")).as("n"), max(col("__rr")).as("__rr"),
        max(col("__kmin")).as("__kmin"), max(col("__kmax")).as("__kmax"),
        max(col("__dmin")).as("__dmin"),
        sum(expr("""cast(k * __c - __n as decimal(38,0))
          * (k * __c - __n)""")).as("__num"))
      .select(col("k"), col("b"), col("n"),
        expr("cast(cast(k as decimal(38,0)) * n - __rr as bigint)")
          .as("den_core"),
        when(col("__kmin") =!= col("k") || col("__kmax") =!= col("k") ||
            col("__dmin") =!= col("k"),
          expr("raise_error('cochranQ: unbalanced subject panel')"))
          .otherwise(
            when(expr("cast(k as decimal(38,0)) * n - __rr") > 0 &&
                col("k") >= 2,
              expr("""cast(((k - 1) * __num * 1000)
                div (cast(k as decimal(38,0))
                  * (cast(k as decimal(38,0)) * n - __rr)) as bigint)""")))
          .as("q_milli"))
  }

  /** Friedman rank test (Friedman 1937 — public): did any treatment
    * shift the distribution, decided on WITHIN-BLOCK ranks — the
    * repeated-measures sibling of [[kruskalWallis]] (blocks absorb
    * between-subject variation) and the ordinal sibling of
    * [[cochranQ]]. Over a balanced block×treatment panel: per block,
    * doubled tie-averaged ranks (`2c + t + 1`, the kruskal identity —
    * exact BIGINTs) from a within-block pair join (k cells per block,
    * k config-scale); with doubled rank sums `R2_j`,
    * `chi2_milli = (3000·ΣR2_j²) div (b·k·(k+1)) − 3000·b·(k+1)`
    * (the 12/(bk(k+1))·ΣR² − 3b(k+1) statistic — doubling turns 12
    * into 3), DECIMAL(38,0) intermediates. The tie correction divides
    * by `1 − ΣΣ(t³−t)/(b·k·(k²−1))`:
    * `chi2_adj_milli = sign·(|chi2|·bkK div (bkK − T))` with
    * `K = k²−1` (signed: milli truncation can push a null-effect χ²
    * one milli negative); NULL when every block is fully tied.
    * χ²(k−1) under H₀. Balance REQUIRED (raise_error in-plan, the
    * [[cochranQ]] convention).
    *
    * Scale: the pair join is block-local (b·k² rows, k config-scale),
    * everything else partial aggregates. Judged `q_friedman`, fully
    * ORACLED; the strict-order hand case (χ² = 8), a ties case, the
    * all-tied fence and the balance check pinned in EvalSpec. */
  def friedmanTest(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val x = graft.engine.Caches.persisted(
      df.select(col(blockCol).as("b"),
        col(treatmentCol).cast("string").as("t"),
        floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("v")))
    val kAgg = broadcast(x.select(col("t")).distinct()
      .agg(count(lit(1)).as("k")))
    val bAgg = broadcast(x.groupBy(col("b"))
      .agg(count(lit(1)).as("__kb"), countDistinct(col("t")).as("__kd"))
      .agg(count(lit(1)).as("nb"), min(col("__kb")).as("__kmin"),
        max(col("__kb")).as("__kmax"), min(col("__kd")).as("__dmin")))
    val tAgg = broadcast(x.groupBy(col("b"), col("v"))
      .agg(count(lit(1)).as("__tv"))
      .agg(coalesce(sum(expr("__tv * __tv * __tv - __tv")), lit(0L))
        .as("__T")))
    val dr = x.as("l").join(x.as("r"), col("l.b") === col("r.b"))
      .groupBy(col("l.b"), col("l.t"))
      .agg((sum(when(col("r.v") < col("l.v"), 2L).otherwise(0L)) +
        sum(when(col("r.v") === col("l.v"), 1L).otherwise(0L)) + 1L)
        .as("__dr"))
    dr.groupBy(col("t")).agg(sum(col("__dr")).as("__r2"))
      .crossJoin(kAgg).crossJoin(bAgg).crossJoin(tAgg)
      .agg(max(col("k")).as("k"), max(col("nb")).as("b_blocks"),
        max(col("__kmin")).as("__kmin"), max(col("__kmax")).as("__kmax"),
        max(col("__dmin")).as("__dmin"), max(col("__T")).as("__T"),
        sum(expr("cast(__r2 as decimal(38,0)) * __r2")).as("__s2"))
      .withColumn("chi2_milli",
        when(col("__kmin") =!= col("k") || col("__kmax") =!= col("k") ||
            col("__dmin") =!= col("k"),
          expr("raise_error('friedmanTest: unbalanced block panel')"))
          .otherwise(expr(
            """cast((3000 * __s2) div (b_blocks * k * (k + 1))
               - 3000 * b_blocks * (k + 1) as bigint)""")))
      .select(col("k"), col("b_blocks"), col("chi2_milli"),
        when(expr("b_blocks * k * (k * k - 1) - __T") > 0,
          expr("""cast(sign(chi2_milli) as bigint) *
            cast((abs(cast(chi2_milli as decimal(38,0)))
                * (b_blocks * k * (k * k - 1)))
              div (b_blocks * k * (k * k - 1) - __T) as bigint)"""))
          .as("chi2_adj_milli"))
  }

  /** Cronbach's alpha internal-consistency coefficient (Cronbach
    * 1951 — public): do k item scores measure one underlying trait —
    * the reliability gate a survey/labeling pipeline runs before
    * averaging rater items into a single score.
    * `α = k/(k−1) · (1 − ΣV_item / V_total)` over a BALANCED
    * subject×item panel, with every variance carried as its exact
    * integer NUMERATOR `V = n·Σx² − (Σx)²` (cents; the n² denominators
    * cancel between numerator and denominator of the ratio).
    * `alpha_milli = sign·(|k·(V_t − ΣV_i)|·1000 div ((k−1)·V_t))` —
    * signed (α < 0 happens on negatively-correlated items), DECIMAL
    * intermediates (q_gini rule), NULL when V_t = 0 or k < 2.
    * Balance REQUIRED (missing cells bias ΣV_i — encode absent
    * observations as explicit zeros upstream; checked like
    * [[cochranQ]]).
    *
    * Scale: one partial agg per item (config-scale), one per subject
    * for the total column, 1-row arithmetic. Judged `q_cronbach`,
    * fully ORACLED; the parallel-items closed form
    * (α = k·ρ/(1+(k−1)ρ) on an exchangeable fixture), independent-
    * items ≈ 0, negative-covariance sign and the V_t = 0 fence pinned
    * in EvalSpec. */
  def cronbachAlpha(df: DataFrame, subjectCol: String, itemCol: String,
      valueCol: String): DataFrame = {
    val x = df.select(col(subjectCol).as("s"),
      col(itemCol).cast("string").as("i"),
      floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("c"))
    val items = x.groupBy("i").agg(count(lit(1)).as("__ni"),
      sum(col("c")).as("__s"), sum(expr("c * c")).as("__q"))
    val subj = x.groupBy("s").agg(sum(col("c")).as("__ts"),
      count(lit(1)).as("__ki"), countDistinct(col("i")).as("__kdi"))
    val iAgg = items.agg(count(lit(1)).as("k"),
      min(col("__ni")).as("__nmin"), max(col("__ni")).as("__nmax"),
      sum(expr("""cast(cast(__ni as decimal(38,0)) * __q -
        cast(__s as decimal(38,0)) * __s as decimal(38,0))"""))
        .as("__vi"))
    val sAgg = subj.agg(count(lit(1)).as("n"),
      min(col("__ki")).as("__kmin"), max(col("__ki")).as("__kmax"),
      min(col("__kdi")).as("__dmin"),
      sum(col("__ts")).as("__st"),
      sum(expr("cast(__ts as decimal(38,0)) * __ts")).as("__qt"))
    broadcast(iAgg).crossJoin(broadcast(sAgg))
      .withColumn("__vt", expr(
        """cast(n as decimal(38,0)) * __qt -
           cast(__st as decimal(38,0)) * __st"""))
      .select(col("k"), col("n"),
        expr("cast(__vi div n as bigint)").as("sum_item_var_n"),
        expr("cast(__vt div n as bigint)").as("total_var_n"),
        when(col("__kmin") =!= col("k") || col("__kmax") =!= col("k") ||
            col("__dmin") =!= col("k") ||
            col("__nmin") =!= col("n") || col("__nmax") =!= col("n"),
          expr("raise_error('cronbachAlpha: unbalanced subject panel')"))
          .otherwise(
            when(col("k") >= 2 && col("__vt") > 0,
              expr("""cast(sign(__vt - __vi) as bigint) *
                cast((abs(cast(k as decimal(38,0)) * (__vt - __vi)) * 1000)
                  div ((k - 1) * __vt) as bigint)""")))
          .as("alpha_milli"))
  }

  /** Quadratic-weighted kappa (Cohen 1968, "Weighted kappa" — public):
    * agreement on an ORDINAL scale — the labeling-QA standard
    * (severity grades, star ratings, rubric scores) where plain kappa
    * ([[mccKappa]]) treats a 1-vs-5 disagreement the same as 1-vs-2.
    * Disagreements weight by `(i−j)²`:
    * `QWK = 1 − n·Σw·O / Σw·(r_i·c_j)` over the confusion matrix O
    * and its marginals — every term an exact BIGINT off one
    * (pred, label) count aggregate, `qwk_milli` one signed truncated
    * division over DECIMAL(38,0) (q_gini rule; QWK < 0 on
    * worse-than-chance raters). NULL when the expected-disagreement
    * denominator is 0 (both raters constant). Classes must be
    * integer ordinals (config-scale by construction).
    *
    * Scale: one partial agg to the K² confusion cells, marginals and
    * the K²-cell expectation as config-scale aggregates/joins. The
    * reported `do_sum`/`de_n` BIGINTs bound n < ~6e8/K (De ≤ K²n²);
    * past that keep the milli only. Judged
    * `q_qwk`, fully ORACLED; perfect 1000, hand off-by-one vs
    * far-miss asymmetry, constant-rater fence and the plain-kappa
    * divergence pinned in EvalSpec. */
  def quadraticKappa(df: DataFrame, predCol: String,
      labelCol: String): DataFrame = {
    val o = graft.engine.Caches.persisted(
      df.select(col(predCol).cast("long").as("i"),
          col(labelCol).cast("long").as("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("c")))
    val r = o.groupBy("i").agg(sum(col("c")).as("ri"))
    val ccol = o.groupBy("j").agg(sum(col("c")).as("cj"))
    val nAgg = broadcast(o.agg(sum(col("c")).as("n"),
      count(lit(1)).as("__cells")))
    val doSum = o.agg(sum(expr(
      "cast((i - j) * (i - j) as decimal(38,0)) * c")).as("__do"))
    val deSum = r.crossJoin(ccol) // K x K config-scale
      .agg(sum(expr(
        "cast((i - j) * (i - j) as decimal(38,0)) * ri * cj")).as("__de"),
        countDistinct(col("i")).as("__ki"),
        countDistinct(col("j")).as("__kj"))
    broadcast(doSum).crossJoin(broadcast(deSum)).crossJoin(nAgg)
      .select(col("n"),
        greatest(col("__ki"), col("__kj")).as("n_classes"),
        expr("cast(__do as bigint)").as("do_sum"),
        expr("cast(__de as bigint)").as("de_n"),
        when(expr("__de") > 0,
          expr("""cast(sign(__de - n * __do) as bigint) *
            cast((abs(__de - n * __do) * 1000) div __de as bigint)"""))
          .as("qwk_milli"))
  }

  /** Jonckheere–Terpstra ordered-alternatives test (Jonckheere 1954;
    * Terpstra 1952 — public): is there a MONOTONE trend across ordered
    * groups — the dose-response question [[kruskalWallis]] cannot ask
    * (KW detects ANY difference; JT gains power by betting on the
    * ordering) and the across-GROUPS sibling of the across-TIME
    * Mann–Kendall. `JT = Σ_{i<j} U_ij` over all ordered group pairs,
    * carried DOUBLED (ties count once, the Mann–Whitney convention):
    * `jt2 = Σ_{v,g} n_g(v)·(2·C_{<g}(<v) + T_{<g}(v))` with
    * `C_{<g}(<v)` the count in earlier groups strictly below v and
    * `T_{<g}(v)` the earlier-group ties at v — all exact BIGINTs.
    * Alongside: the doubled null expectation
    * `e_jt2 = (n² − Σn_g²) div 2` (so `jt2 > e_jt2` reads "increasing
    * trend"); z-scores need the tie-corrected variance and stay with
    * the caller (documented).
    *
    * Group order is the CALLER's: `orderCol` must be a numeric column
    * constant within each group (year, dose level, bucket ordinal).
    *
    * Scale: one partial agg to (value, group) cells, then the groups
    * (a config-scale ordered factor, collected under the `maxGroups`
    * guard — the markovStationary rule) PIVOT to literal columns: one
    * banded pass over the distinct-value relation carries all k ECDFs
    * in a single window, and the earlier-groups prefixes are literal
    * column sums — no global window, no per-value micro-partition
    * window (the first cut's 600k-partition cost), no pair
    * enumeration. Judged
    * `q_jonckheere` (order value cents across order YEARS), fully
    * ORACLED; hand 3-group table, the k = 2 ≡ Mann–Whitney 2U
    * identity, reversed-trend symmetry (jt2 + jt2_rev = 2·e_jt2 on
    * tie-free data) pinned in EvalSpec. */
  def jonckheereTerpstra(df: DataFrame, valueCol: String,
      orderCol: String, bands: Int = 32, maxGroups: Int = 64): DataFrame = {
    val cells = graft.engine.Caches.persisted(
      df.select(floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("v"),
          col(orderCol).cast("long").as("o"))
        .groupBy("v", "o").agg(count(lit(1)).as("n")))
    // groups are a config-scale ordered factor (dose levels, years) —
    // collected once so every per-group quantity becomes a literal
    // COLUMN: one banded pass over distinct values, no per-value
    // window (600k single-value partitions was the first cut's cost)
    val groups: Seq[Long] = cells.select(col("o")).distinct()
      .orderBy(col("o")).collect().map(_.getLong(0)).toSeq
    require(groups.size >= 2 && groups.size <= maxGroups,
      s"ordered groups must number 2..$maxGroups: ${groups.size}")
    val k = groups.size
    val pv = cells.groupBy(col("v"))
      .agg(groups.zipWithIndex.map { case (g, j) =>
        sum(when(col("o") === g, col("n")).otherwise(0L)).as(s"__n$j")
      }.head, groups.zipWithIndex.tail.map { case (g, j) =>
        sum(when(col("o") === g, col("n")).otherwise(0L)).as(s"__n$j")
      }: _*)
    val bounds = broadcast(pv.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi")))
    val banded = pv.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandAsc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(groups.indices.map(j =>
        sum(col(s"__n$j")).as(s"__bn$j")).head,
        groups.indices.tail.map(j =>
          sum(col(s"__n$j")).as(s"__bn$j")): _*)
    val wOff = Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)
    val offCum = groups.indices.foldLeft(offsets) { (d, j) =>
      d.withColumn(s"__ob$j",
        coalesce(sum(col(s"__bn$j")).over(wOff), lit(0L)))
    }.select(col("__band") +: groups.indices.map(j => col(s"__ob$j")): _*)
    val wB = Window.partitionBy(col("__band")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, -1)
    val ecdf = groups.indices.foldLeft(
      banded.join(broadcast(offCum), "__band")) { (d, j) =>
      d.withColumn(s"__blt$j",
        col(s"__ob$j") + coalesce(sum(col(s"__n$j")).over(wB), lit(0L)))
    }
    // earlier-groups prefixes are literal column sums (k config-scale)
    val termExpr = groups.indices.map { j =>
      val clt =
        if (j == 0) "cast(0 as bigint)"
        else (0 until j).map(i => s"__blt$i").mkString(" + ")
      val teq =
        if (j == 0) "cast(0 as bigint)"
        else (0 until j).map(i => s"__n$i").mkString(" + ")
      s"cast(__n$j as decimal(38,0)) * (2 * ($clt) + ($teq))"
    }.mkString(" + ")
    val sizes = broadcast(cells.groupBy("o").agg(sum(col("n")).as("__ng"))
      .agg(count(lit(1)).as("k"), sum(col("__ng")).as("n"),
        sum(expr("cast(__ng as decimal(38,0)) * __ng")).as("__sq")))
    ecdf.agg(sum(expr(termExpr)).as("__jt2"))
      .crossJoin(sizes)
      .select(col("k"), col("n"),
        expr("cast(__jt2 as bigint)").as("jt2"),
        expr("""cast((cast(n as decimal(38,0)) * n - __sq) div 2
          as bigint)""").as("e_jt2"))
  }

  /** Kendall tau-b — the concordant-pair rank correlation next to
    * [[Relational.spearman]]: of all observation pairs, how many order
    * the same way in x and in y (Kendall 1938), with the tau-b tie
    * normalization `(C − D) / √((n₀−Tx)(n₀−Ty))`. Counts are exact
    * integers off one pair join; the √ is the one IEEE-pinned double
    * (micro-floored, the [[mccKappa]] rule).
    *
    * Scale: the operator contract is a SERIES input — a per-period /
    * per-bucket aggregate (calendar-scale, like the lag tables), not
    * raw rows; the O(n²) pair join is over that config-scale relation
    * and broadcasts. A data-scale Kendall needs the O(n log n)
    * inversion-count formulation — out of scope, documented here so
    * nobody points this at a billion raw rows. Judged `q_kendall`
    * (daily activity count vs daily revenue cents), fully ORACLED;
    * perfect/reversed ±1000000, tie bookkeeping against a hand pair
    * table and the n₀ = C+D+ties identity pinned in EvalSpec. */
  def kendallTau(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val s = graft.engine.Caches.persisted(
      df.select(col(keyCol).as("k"), col(xCol).as("x"), col(yCol).as("y")))
    val a = s.select(col("k").as("ka"), col("x").as("xa"), col("y").as("ya"))
    val b = s.select(col("k").as("kb"), col("x").as("xb"), col("y").as("yb"))
    a.join(broadcast(b), col("ka") < col("kb"))
      .agg(
        sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) > 0, 1L)
          .otherwise(0L)).as("nc"),
        sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) < 0, 1L)
          .otherwise(0L)).as("nd"),
        sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("ty"),
        count(lit(1)).as("n0"))
      .select(col("n0"), col("nc"), col("nd"), col("tx"), col("ty"),
        expr("""case when (n0 - tx) * (n0 - ty) <= 0 then null
          else cast(floor(cast(nc - nd as double) * 1000000.0
            / sqrt(cast(n0 - tx as double) * cast(n0 - ty as double)))
            as bigint) end""").as("tau_micro"))
  }

  /** Wilson score intervals per group (Wilson 1927) — the rate-metric
    * CI that behaves at the edges where the naive normal interval
    * fails (k = 0 or n small never yields bounds outside [0, 1]):
    * `(p + z²/2n ± z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n)` from the
    * exact (k, n) pair per group. Every factor is an IEEE-pinned
    * double expression over exact integers in a FIXED operation order
    * (mirrored token-for-token in the oracle — the q_did rule), bounds
    * micro-floored. The conversion-rate / defect-rate readout every
    * A/B and data-quality dashboard shows next to the point estimate.
    *
    * Scale: one partial-aggregated groupBy; everything after is
    * per-group scalar arithmetic. Judged `q_wilson`, fully ORACLED;
    * k=0 / k=n edge bounds inside [0,1], interval nesting in n, and a
    * hand value pinned in EvalSpec. */
  def wilsonIntervals(df: DataFrame, groupCol: String,
      successCol: String, z: Double = 1.96): DataFrame = {
    require(z > 0, s"z > 0: $z")
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(col(successCol).cast("long")).as("k"),
        count(lit(1)).as("n"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / nD
    val center = p + z2 / (lit(2.0) * nD)
    val margin = lit(z) *
      sqrt(p * (lit(1.0) - p) / nD + z2 / (lit(4.0) * nD * nD))
    g.select(col("grp"), col("k"), col("n"),
      floor((center - margin) / denom * lit(1000000.0)).cast("long")
        .as("lo_micro"),
      floor((center + margin) / denom * lit(1000000.0)).cast("long")
        .as("hi_micro"))
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
  /** nDCG@k per ranking group — the graded-relevance ranking metric
    * (Järvelin & Kekäläinen 2002) beside [[averagePrecision]]'s binary
    * one: `DCG = Σ_{i≤k} rel_i / log2(i+1)` over the model ranking,
    * normalized by the ideal (relevance-sorted) DCG.
    *
    * Judged-double discipline: each DCG TERM is micro-quantized
    * independently — `floor(rel·10⁶ / log2(i+1) + 0.5)` — so the sums
    * are order-independent BIGINTs and a cross-engine 1-ulp `log2`
    * difference cannot move a term across a floor boundary (the
    * boundary margins are data-independent constants; worst ≈ 7·10⁻³
    * vs ~10⁻¹⁰ noise). `ndcg_milli = dcg·1000 div idcg`, NULL when the
    * group has no relevant item. Model rank ties break on `tieCol` for
    * determinism; ideal-rank ties need no break (equal rel ⇒ equal
    * term at the k boundary).
    *
    * Scale: two group-partitioned ROW windows over k-filtered rows —
    * never a global window; groups are independent (the per-query eval
    * shape). Judged `q_ndcg`, fully ORACLED; hand rankings, perfect-
    * ranking ≡ 1000, zero-relevance NULL pinned in EvalSpec. */
  def ndcgAtK(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val term = (rn: org.apache.spark.sql.Column) =>
      floor(col("__rel").cast("double") * lit(1000000.0) /
        log2(rn.cast("double") + lit(1.0)) + lit(0.5)).cast("long")
    val base = df.select(col(groupCol).as("__g"), col(scoreCol).as("__s"),
      col(tieCol).as("__t"), col(relCol).cast("long").as("__rel"))
    val model = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__g").orderBy(col("__s").desc, col("__t"))))
      .filter(col("__rn") <= k)
      .groupBy(col("__g")).agg(sum(term(col("__rn"))).as("dcg_micro"))
    val ideal = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__g").orderBy(col("__rel").desc)))
      .filter(col("__rn") <= k)
      .groupBy(col("__g")).agg(sum(term(col("__rn"))).as("idcg_micro"))
    model.join(ideal, "__g")
      .select(col("__g").as(groupCol), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0,
          expr("dcg_micro * 1000 div idcg_micro")) // exact; both sides >= 0
          .as("ndcg_milli"))
  }

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
        // empty-cell guard (ADVICE r11): a design with any empty
        // (treat × post) cell has no defined effect — null, never the
        // NaN/Infinity a 0/0 double division would produce (and whose
        // cross-engine handling diverges); mirrors welchTTest's guard
        expr("CASE WHEN n_tp > 0 AND n_t0 > 0 AND n_cp > 0 AND n_c0 > 0" +
          " THEN (cast(cents_tp as double) / cast(n_tp as double)" +
          " - cast(cents_t0 as double) / cast(n_t0 as double))" +
          " - (cast(cents_cp as double) / cast(n_cp as double)" +
          " - cast(cents_c0 as double) / cast(n_c0 as double))" +
          " ELSE NULL END"))
  }

  /** Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg
    * 1995) over per-key p-values — the multiple-testing correction an
    * experimentation platform applies before reading thousands of
    * per-segment tests: rank the m p-values ascending, reject every
    * hypothesis up to the LARGEST rank k with `p_(k) ≤ k·α/m`, and
    * report the monotone BH-adjusted q-value
    * `q_(i) = min_{j ≥ i} (m·p_(j)/j)` capped at 1.
    *
    * EXACT-INTEGER formulation: p-values arrive as micros
    * (`p_micro ∈ [0, 10⁶]`), the step-up test is the cross-multiplied
    * `p_micro·m ≤ rank·α_micro` (no division), and
    * `q_micro = min suffix of (m·p_micro div rank)` — all BIGINT
    * (`p_micro·m ≤ 10⁶·m`, safe to m ~ 9·10¹²), so the judged compare
    * is bit-exact with zero float ops. Rank ties break on `keyCol` for
    * determinism (standard BH indexes ties distinctly; any tie order
    * rejects the same set because the test depends on p only through
    * the LAST tied index).
    *
    * Scale: the global ascending rank is the [[graft.engine.Banding]]
    * pattern — band by p-value over broadcast bounds, config-scale
    * band-offset relation, in-band ROW window — and the suffix min
    * composes an in-band suffix window with a config-scale suffix over
    * band minima; no single-partition window anywhere. Judged `q_fdr`,
    * fully ORACLED; hand p-sets (all-null uniform, planted signal,
    * monotonicity of q, step-up vs step-down difference) pinned in
    * EvalSpec. */
  def bhAdjust(df: DataFrame, keyCol: String, pMicroCol: String,
      alphaMilli: Long = 50L, bands: Int = 32): DataFrame = {
    require(alphaMilli > 0 && alphaMilli <= 1000, s"alphaMilli in (0,1000]: $alphaMilli")
    val per = graft.engine.Caches.persisted(
      df.select(col(keyCol).as("id"),
        col(pMicroCol).cast("long").as("p_micro")))
    val bounds = broadcast(per.agg(
      min(col("p_micro")).as("__lo"), max(col("p_micro")).as("__hi"),
      count(lit(1)).as("__m")))
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandAsc(
        col("p_micro"), col("__lo"), col("__hi"), bands))
    // config-scale per-band offsets (rows strictly before each band)
    val offsets = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__off"))
    val wAsc = Window.partitionBy(col("__band"))
      .orderBy(col("p_micro"), col("id"))
    val ranked = graft.engine.Caches.persisted(
      banded.join(broadcast(offsets), "__band")
        .withColumn("p_rank", col("__off") + row_number().over(wAsc))
        .withColumn("__raw",
          least(lit(1000000L), expr("__m * p_micro div p_rank"))))
    // suffix min of __raw: in-band suffix window + band-minima suffix
    val wSuf = Window.partitionBy(col("__band"))
      .orderBy(col("p_rank")).rowsBetween(0, Long.MaxValue)
    val bandMins = ranked.groupBy(col("__band"))
      .agg(min(col("__raw")).as("__bmin"))
      .withColumn("__later", min(col("__bmin")).over(
        Window.orderBy(col("__band")).rowsBetween(1, Long.MaxValue)))
      .select(col("__band"), col("__later"))
    // step-up cutoff: the LARGEST rank passing the cross-multiplied test
    val kstar = broadcast(ranked.agg(coalesce(max(when(
      col("p_micro") * col("__m") <=
        col("p_rank") * lit(alphaMilli * 1000L), col("p_rank"))),
      lit(0L)).as("__kstar")))
    ranked.join(broadcast(bandMins), "__band")
      .withColumn("q_micro",
        least(min(col("__raw")).over(wSuf),
          coalesce(col("__later"), lit(1000000L))))
      .crossJoin(kstar)
      .select(col("id"), col("p_micro"), col("p_rank"), col("q_micro"),
        (col("p_rank") <= col("__kstar")).as("rejected"))
  }

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among a
    * FIXED number r of categorical ratings per item (raters may differ
    * across items, the classic crowd-labeling audit): with per-item
    * category counts `n_ic` (Σ_c n_ic = r over N items) and category
    * totals `T_c = Σ_i n_ic`,
    * `P̄ = (Σ n_ic² − N·r) / (N·r·(r−1))`, `P̄e = Σ T_c² / (N·r)²`,
    * `κ = (P̄ − P̄e) / (1 − P̄e)`. Items contribute their FIRST r
    * ratings in `orderCol` order (unique within item for determinism);
    * items with fewer than r ratings drop.
    *
    * EXACT-INTEGER formulation: κ as one rational —
    * `num = (S2 − N·r)·(N·r)² − N·r·(r−1)·ΣT_c²`,
    * `den = N·r·(r−1)·((N·r)² − ΣT_c²)` — with the signed-milli
    * readout `sign(num)·(|num|·1000 div den)` (Spark div truncates,
    * DuckDB // floors; identical only on non-negatives — the
    * assortativity rule, κ < 0 is real disagreement). Zero-guards test
    * FACTORS (`N > 0`, `r > 1`, `(N·r)² > ΣT_c²`), never the product.
    * BIGINT-safe while `N·r ≲ 10⁶` (judged fixture caps items by
    * modulus); a larger deployment widens to DECIMAL(38,0).
    *
    * Scale: one keyed ROW window (first-r), two partial aggregates to
    * item- then category-scale, config-scale finish. Judged `q_fleiss`,
    * fully ORACLED; perfect agreement ≡ 1000, symmetric-disagreement
    * negative κ, and the Fleiss 1971 worked example pinned in
    * EvalSpec. */
  def fleissKappa(df: DataFrame, itemCol: String, orderCol: String,
      catCol: String, r: Int): DataFrame = {
    require(r >= 2, s"r >= 2: $r")
    val first = df.select(col(itemCol).as("__i"), col(orderCol).as("__o"),
        col(catCol).as("__c"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__i").orderBy("__o")))
      .filter(col("__rn") <= r)
    val full = first.groupBy(col("__i"))
      .agg(count(lit(1)).as("__tot"))
      .filter(col("__tot") === r).select("__i")
    val cells = graft.engine.Caches.persisted(
      first.join(full, "__i")
        .groupBy(col("__i"), col("__c")).agg(count(lit(1)).as("__n")))
    val s = cells.agg(
      sum(expr("__n * __n")).as("s2"),
      countDistinct(col("__i")).as("n_items"))
    val tc2 = cells.groupBy(col("__c")).agg(sum(col("__n")).as("__t"))
      .agg(sum(expr("__t * __t")).as("sum_tc2"))
    s.crossJoin(broadcast(tc2))
      .select(col("n_items"), lit(r.toLong).as("raters"),
        col("s2"), col("sum_tc2"))
      .withColumn("pbar_micro", expr(
        s"CASE WHEN n_items > 0 THEN (s2 - n_items * raters) * 1000000" +
          " div (n_items * raters * (raters - 1)) ELSE NULL END"))
      .withColumn("pe_micro", expr(
        "CASE WHEN n_items > 0 THEN sum_tc2 * 1000000" +
          " div ((n_items * raters) * (n_items * raters)) ELSE NULL END"))
      .withColumn("kappa_milli", expr(
        "CASE WHEN n_items > 0 AND" +
          " (n_items * raters) * (n_items * raters) > sum_tc2" +
          " THEN cast(sign((s2 - n_items * raters) * (n_items * raters)" +
          "       * (n_items * raters)" +
          "       - n_items * raters * (raters - 1) * sum_tc2) as bigint)" +
          " * (abs((s2 - n_items * raters) * (n_items * raters)" +
          "       * (n_items * raters)" +
          "       - n_items * raters * (raters - 1) * sum_tc2) * 1000" +
          "    div (n_items * raters * (raters - 1)" +
          "       * ((n_items * raters) * (n_items * raters) - sum_tc2)))" +
          " ELSE NULL END"))
  }

  /** Brier score with the Murphy (1973) three-way decomposition —
    * calibration diagnostics beyond [[calibrationBins]]: over milli-
    * probabilities `p ∈ [0, 1000]` and binary outcomes,
    * `brier = mean (p − y)²` splits into `reliability − resolution +
    * uncertainty` across `bins` probability bins (`REL = Σ n_k(p̄_k −
    * ȳ_k)²/N`, `RES = Σ n_k(ȳ_k − ȳ)²/N`, `UNC = ȳ(1 − ȳ)`).
    *
    * Judged-double discipline: the Brier sum `Σ (p_milli − 1000y)²` is
    * EXACT BIGINT (micro units); REL and RES micro-quantize each
    * per-bin term independently — `floor(d²/n_k + 0.5)` with exact
    * BIGINT `d` cast to double (the chi2 pattern: identical IEEE ops
    * both engines, order-independent BIGINT sum) — and UNC is one
    * pinned `p̄(1−p̄)` double expression. The identity
    * `brier = REL − RES + UNC` holds (to per-bin quantization) only
    * when forecasts are CONSTANT within bins — heterogeneous bins add
    * the standard within-bin variance terms; asserted loose in spec on
    * a bin-constant fixture, never judged.
    *
    * Scale: one partial aggregate to `bins` rows, config-scale finish
    * under a 1-row broadcast — no window, no join. Judged `q_brier`,
    * fully ORACLED; hand forecasts (perfect, constant-base-rate,
    * anti-calibrated) pinned in EvalSpec. */
  def brierDecomposition(df: DataFrame, pMilliCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins >= 2: $bins")
    val cells = df.select(col(pMilliCol).cast("long").as("__p"),
        col(labelCol).cast("long").as("__y"))
      .withColumn("__bin",
        least(expr(s"__p * $bins div 1000"), lit(bins - 1L)))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("n_k"), sum(col("__p")).as("sp"),
        sum(col("__y")).as("pos"),
        sum(expr("(__p - 1000 * __y) * (__p - 1000 * __y)")).as("sq"))
    val totals = broadcast(cells.agg(
      sum(col("n_k")).as("n"), sum(col("pos")).as("n_pos"),
      sum(col("sq")).as("sq_sum"), count(lit(1)).as("n_bins")))
    cells.crossJoin(totals)
      .select(col("n"), col("n_pos"), col("n_bins"), col("sq_sum"),
        // REL term: d = sp − 1000·pos exact; n_k·Δ²·10⁶ = d²/n_k
        floor(expr("cast(sp - 1000 * pos as double)") *
          expr("cast(sp - 1000 * pos as double)") /
          col("n_k").cast("double") + lit(0.5)).cast("long").as("__rel"),
        // RES term: dr = pos·N − P·n_k exact; n_k·Δ²·10⁶ = 10⁶·dr²/(n_k·N²)
        floor(lit(1000000.0) *
          expr("cast(pos * n - n_pos * n_k as double)") *
          expr("cast(pos * n - n_pos * n_k as double)") /
          (col("n_k").cast("double") * col("n").cast("double") *
            col("n").cast("double")) + lit(0.5)).cast("long").as("__res"))
      .groupBy(col("n"), col("n_pos"), col("n_bins"), col("sq_sum"))
      .agg(sum(col("__rel")).as("__rels"), sum(col("__res")).as("__ress"))
      .select(col("n"), col("n_pos"), col("n_bins"),
        expr("sq_sum div n").as("brier_micro"),
        expr("__rels div n").as("rel_micro"),
        expr("__ress div n").as("res_micro"),
        floor((col("n_pos").cast("double") / col("n").cast("double")) *
          (lit(1.0) - col("n_pos").cast("double") /
            col("n").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("unc_micro"))
  }

  /** Isotonic (monotone non-decreasing) calibration of a milli-score →
    * hit-rate curve — the PAV (pool-adjacent-violators) fit expressed
    * through the minimax identity
    * `fit(i) = max_{j≤i} min_{k≥i} rate(j..k)` over per-distinct-score
    * bins, which needs NO sequential pooling loop: every quantity is a
    * windowed min / grouped max over the bin-pair triangle, so the fit
    * is exactly the PAV block-mean solution while staying declarative.
    *
    * Judged-double discipline: bin rates are EXACT-INTEGER micros —
    * `rate(j..k) = ΔH·10⁶ div ΔN` on prefix sums of hit/total counts
    * (sign-abs routed; min/max over identically-quantized BIGINTs are
    * engine-exact, and the minimax of ANY fixed score table is monotone
    * by construction). Overflow-safe while `hits·10⁶ < 2^63` (~9e12
    * labeled rows).
    *
    * Scale: rows partial-aggregate to per-distinct-score (n, hits)
    * bins FIRST — the pair triangle is `bins²/2` (score domain, e.g.
    * 1001 milli-scores ⇒ ~500k pairs, CONSTANT in corpus size); one
    * window min over suffix-k per j and one grouped max per i. Judged
    * `q_isotonic`, fully ORACLED; monotonicity, exact PAV block means
    * on a hand violator case, and the already-monotone identity fit
    * pinned in EvalSpec. */
  /** CUPED variance reduction (Deng et al. 2013) — the A/B-test
    * sensitivity lift every experimentation platform ships: adjust each
    * unit's outcome `y` by its PRE-period covariate `x`,
    * `ŷ = y − θ(x − x̄)` with `θ = cov(x,y)/var(x)` POOLED across arms
    * (the standard, assignment-independent estimator), reporting per
    * arm the raw and adjusted means plus the variance-reduction
    * fraction `ρ²`.
    *
    * Judged-double discipline: moments are EXACT integer sums over
    * cents (`Sx Sy Sxx Sxy Syy` in BIGINT, widened to DECIMAL(38,0) /
    * HUGEINT for the 3-magnitude products `n·Sxx − Sx²` — the q_gini
    * overflow rule); θ, the adjustment term and ρ² each take ONE
    * `floor(·+0.5)` micro-quantization over pinned IEEE expressions on
    * those exact factors (the chi2 pattern — identical both engines).
    *
    * Scale: one partial aggregate to the 1-row pooled moments
    * (broadcast) + one to the per-arm readout — the input is already
    * per-unit (config-scale after the caller's per-unit rollup); no
    * window, no join wider than a 1-row cross. Judged `q_cuped`, fully
    * ORACLED; perfect-covariate collapse, zero-covariance identity and
    * a hand θ pinned in EvalSpec. */
  def cuped(df: DataFrame, treatCol: String, xCol: String,
      yCol: String): DataFrame = {
    val per = df.select(col(treatCol).cast("boolean").as("treat"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val tot = broadcast(per.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(expr("cast(__x as decimal(38,0)) * __x")).as("__sxx"),
      sum(expr("cast(__x as decimal(38,0)) * __y")).as("__sxy"),
      sum(expr("cast(__y as decimal(38,0)) * __y")).as("__syy")))
    val arms = per.groupBy(col("treat"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__gx"),
        sum(col("__y")).as("sum_y_cents"))
    arms.crossJoin(tot)
      .withColumn("__d", expr(
        "cast(__n as decimal(38,0)) * __sxx" +
          " - cast(__sx as decimal(38,0)) * __sx"))
      .withColumn("__nm", expr(
        "cast(__n as decimal(38,0)) * __sxy" +
          " - cast(__sx as decimal(38,0)) * __sy"))
      .withColumn("__dy", expr(
        "cast(__n as decimal(38,0)) * __syy" +
          " - cast(__sy as decimal(38,0)) * __sy"))
      .withColumn("theta_micro", when(expr("__d > 0"),
        floor(expr("cast(__nm as double)") * lit(1000000.0) /
          expr("cast(__d as double)") + lit(0.5)).cast("long")))
      .withColumn("mean_y_micro",
        expr("cast(sign(sum_y_cents) as bigint)" +
          " * (abs(sum_y_cents) * 1000000 div n)"))
      .withColumn("adj_mean_micro", when(expr("__d > 0"),
        col("mean_y_micro") -
          floor(col("theta_micro").cast("double") *
            expr("cast(__gx * __n - __sx * n as double)") /
            (col("n").cast("double") * col("__n").cast("double")) +
            lit(0.5)).cast("long"))
        .otherwise(col("mean_y_micro")))
      .withColumn("varred_micro", when(expr("__d > 0 and __dy > 0"),
        floor(expr("cast(__nm as double)") * expr("cast(__nm as double)") *
          lit(1000000.0) /
          (expr("cast(__d as double)") * expr("cast(__dy as double)")) +
          lit(0.5)).cast("long")).otherwise(lit(0L)))
      .select(col("treat"), col("n"), col("sum_y_cents"),
        col("mean_y_micro"), col("theta_micro"), col("adj_mean_micro"),
        col("varred_micro"))
  }

  /** Sample-ratio-mismatch (SRM) check — the first experiment-health
    * gate: do the arms' DISTINCT-unit counts match the design ratios?
    * A chi-square goodness-of-fit against expected milli-weights;
    * SRM firing means randomization or logging is broken and every
    * downstream metric is suspect. Emits one row per arm (observed,
    * expected in milli-units, the arm's chi² term) with the total
    * chi² repeated — threshold against the 95th percentile of
    * `χ²(arms−1)` downstream.
    *
    * Judged-double discipline: `(1000·o − n·m)` is exact BIGINT; each
    * arm term micro-quantizes `Δ²·10⁶ / (1000·n·m)` independently
    * (chi2 pattern), the sum is order-independent. Overflow-safe while
    * `(1000·o)² < 2^63 in double` — unit counts to ~9e14.
    *
    * Scale: one distinct + partial agg to per-arm unit counts
    * (arm-cardinality output), design weights broadcast from a
    * config-scale literal list. Judged `q_srm`, fully ORACLED;
    * perfect-ratio zero, a hand 2-arm imbalance and the
    * missing-arm-counts-as-zero edge pinned in EvalSpec. */
  def srmCheck(df: DataFrame, unitCol: String, armCol: String,
      expectedMilli: Seq[(String, Long)]): DataFrame = {
    require(expectedMilli.nonEmpty && expectedMilli.map(_._2).sum == 1000L,
      s"expected milli-weights must sum to 1000: $expectedMilli")
    val spark = df.sparkSession
    import spark.implicits._
    val design = broadcast(expectedMilli.toDF("arm", "expect_milli"))
    val obs = df.select(col(armCol).cast("string").as("arm"),
        col(unitCol).as("__u")).distinct()
      .groupBy(col("arm")).agg(count(lit(1)).as("__o"))
    val cells = design.join(obs, Seq("arm"), "left")
      .select(col("arm"), col("expect_milli"),
        coalesce(col("__o"), lit(0L)).as("n_units"))
    val tot = broadcast(cells.agg(sum(col("n_units")).as("__n")))
    val terms = cells.crossJoin(tot)
      .select(col("arm"), col("n_units"),
        (col("__n") * col("expect_milli")).as("expected_milliunits"),
        floor(expr(
          "cast(1000 * n_units - __n * expect_milli as double)") *
          expr("cast(1000 * n_units - __n * expect_milli as double)") *
          lit(1000000.0) /
          expr("cast(1000 * __n * expect_milli as double)") + lit(0.5))
          .cast("long").as("term_micro"))
    val chi = broadcast(terms.agg(sum(col("term_micro")).as("chi2_micro")))
    terms.crossJoin(chi)
      .select(col("arm"), col("n_units"), col("expected_milliunits"),
        col("term_micro"), col("chi2_micro"))
  }

  /** Minimum detectable effect — the pre-experiment power readout
    * CUPED and [[Eval.srmCheck]] bracket: given the two arms' realized
    * sizes and the pooled outcome variance, the smallest true
    * difference a two-sample test would flag at α = .05 two-sided with
    * 80% power: `MDE = (z_{α/2} + z_β)·√(s²·(1/n₀ + 1/n₁))` with the
    * pinned constants 1.96 and 0.8416 (their sum spelled 2.8016).
    *
    * Judged-double discipline: per-arm sums-of-squares widen to
    * DECIMAL(38,0)/HUGEINT (`D_g = n_g·Syy_g − Sy_g²`, the q_gini
    * rule); the s² assembly and the ONE sqrt happen in a single pinned
    * IEEE expression micro-floored once (mannWhitney rule). Output is
    * one row: arm sizes, pooled variance (micro), MDE (micro-cents).
    *
    * Scale: one partial aggregate to the 2-arm moment rows, one 1-row
    * readout; nothing else. Judged `q_mde`, fully ORACLED; hand
    * variance, n-asymmetry direction and the zero-variance degenerate
    * pinned in EvalSpec. */
  def minDetectableEffect(df: DataFrame, treatCol: String,
      yCol: String): DataFrame = {
    val arms = df.select(col(treatCol).cast("boolean").as("__t"),
        col(yCol).cast("long").as("__y"))
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__sy"),
        sum(expr("cast(__y as decimal(38,0)) * __y")).as("__syy"))
      .withColumn("__d", expr(
        "cast(__n as decimal(38,0)) * __syy" +
          " - cast(__sy as decimal(38,0)) * __sy"))
    arms.agg(
        sum(when(!col("__t"), col("__n"))).as("n0"),
        sum(when(col("__t"), col("__n"))).as("n1"),
        sum(when(!col("__t"), col("__d"))).as("__d0"),
        sum(when(col("__t"), col("__d"))).as("__d1"))
      .select(col("n0"), col("n1"),
        // variance stays in whole cents² (micro-scaling a ~1e13
        // variance would overflow the BIGINT cast — the q_gini rule)
        when(expr("n0 + n1 > 2 and n0 > 0 and n1 > 0"),
          floor((expr("cast(__d0 as double)") /
            expr("cast(n0 as double)") +
            expr("cast(__d1 as double)") / expr("cast(n1 as double)")) /
            expr("cast(n0 + n1 - 2 as double)") +
            lit(0.5)).cast("long")).as("pooled_var_cents2"),
        when(expr("n0 + n1 > 2 and n0 > 0 and n1 > 0"),
          floor(lit(2.8016) *
            sqrt((expr("cast(__d0 as double)") /
              expr("cast(n0 as double)") +
              expr("cast(__d1 as double)") /
              expr("cast(n1 as double)")) /
              expr("cast(n0 + n1 - 2 as double)") *
              (lit(1.0) / expr("cast(n0 as double)") +
                lit(1.0) / expr("cast(n1 as double)"))) *
            lit(1000000.0) + lit(0.5)).cast("long")).as("mde_micro"))
  }

  def isotonicCalibrate(df: DataFrame, scoreMilliCol: String,
      labelCol: String): DataFrame = {
    val bins = graft.engine.Caches.persisted(
      df.select(col(scoreMilliCol).cast("long").as("score_milli"),
          col(labelCol).cast("long").as("__y"))
        .groupBy(col("score_milli"))
        .agg(count(lit(1)).as("n"), sum(col("__y")).as("hits")))
    val wPfx = Window.orderBy("score_milli")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = graft.engine.Caches.persisted(bins
      .withColumn("__i", row_number().over(Window.orderBy("score_milli")))
      .withColumn("__cn", sum(col("n")).over(wPfx))
      .withColumn("__ch", sum(col("hits")).over(wPfx)))
    val pairs = idx.as("j").join(idx.as("k"), col("j.__i") <= col("k.__i"))
      .select(col("j.__i").as("__j"), col("k.__i").as("__k"),
        (col("k.__ch") - col("j.__ch") + col("j.hits")).as("__dh"),
        (col("k.__cn") - col("j.__cn") + col("j.n")).as("__dn"))
      .select(col("__j"), col("__k"),
        expr("cast(sign(__dh) as bigint) * (abs(__dh) * 1000000 div __dn)")
          .as("__rate"))
    val wSuf = Window.partitionBy("__j").orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = pairs
      .withColumn("__sufmin", min(col("__rate")).over(wSuf))
      .groupBy(col("__k").as("__i"))
      .agg(max(col("__sufmin")).as("fit_micro"))
    idx.join(fit, Seq("__i"))
      .select(col("score_milli"), col("n"), col("hits"),
        expr("cast(sign(hits) as bigint) * (abs(hits) * 1000000 div n)")
          .as("raw_micro"),
        col("fit_micro"))
  }

  /** McNemar's test for PAIRED binary classifiers — the A/B readout
    * when both models score the SAME rows (accuracy deltas double-count
    * the rows both get right/wrong; only the DISCORDANT cells carry
    * information): `b` = rows model-1 gets right and model-2 wrong,
    * `c` = the reverse, `chi2_milli = (b−c)²·1000 div (b+c)` and the
    * continuity-corrected `chi2_cc_milli = max(|b−c|−1, 0)²·1000 div
    * (b+c)`, both NULL when b+c = 0 (no disagreement — no test).
    * EXACT integer end to end (~3.9 above the 3.84 1-df 5% line means
    * reject).
    *
    * Scale: one partial aggregate to 4 cells, one 1-row readout;
    * overflow-safe while `(b−c)²·1000 < 2^63` (~1.5e9 discordant rows
    * — the q_gini DECIMAL rule beyond). Judged `q_mcnemar`, fully
    * ORACLED; hand 2×2, symmetry null, zero-discordance fence and the
    * continuity floor pinned in EvalSpec. */
  def mcnemar(df: DataFrame, pred1Col: String, pred2Col: String,
      labelCol: String): DataFrame = {
    df.select(
        (col(pred1Col).cast("boolean") === col(labelCol).cast("boolean"))
          .as("__r1"),
        (col(pred2Col).cast("boolean") === col(labelCol).cast("boolean"))
          .as("__r2"))
      .agg(
        sum(when(col("__r1") && col("__r2"), 1L).otherwise(0L))
          .as("both_right"),
        sum(when(col("__r1") && !col("__r2"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__r1") && col("__r2"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__r1") && !col("__r2"), 1L).otherwise(0L))
          .as("both_wrong"))
      .select(col("both_right"), col("b"), col("c"), col("both_wrong"),
        when(col("b") + col("c") > 0,
          expr("(b - c) * (b - c) * 1000 div (b + c)")).as("chi2_milli"),
        when(col("b") + col("c") > 0,
          expr("""greatest(abs(b - c) - 1, 0L) * greatest(abs(b - c) - 1, 0L)
            * 1000 div (b + c)""")).as("chi2_cc_milli"))
  }

  /** Cochran–Armitage trend test — does a binary outcome rate move
    * MONOTONICALLY across ordered dose groups (rollout rings, spend
    * tiers, model-size ladders)? Plain chi² ignores the ordering; this
    * puts all its power on the linear trend. With integer scores `s`
    * per group, `nᵢ` trials and `rᵢ` hits: the exact-BIGINT numerator
    * `A = N·Σsᵢrᵢ − R·Σsᵢnᵢ` and denominator-squared
    * `R(N−R)(N·Σsᵢ²nᵢ − (Σsᵢnᵢ)²)/N`, so
    * `z = A / √(…)` — every sum exact, ONE pinned IEEE
    * multiply/divide/√ chain micro-floored at the end (the
    * [[mannWhitney]] judged-double convention; |z| > 1.96 rejects).
    * NULL when R ∈ {0, N} or all rows share one dose (no variance).
    *
    * Scale: one partial aggregate to per-dose (n, r) rows, one 1-row
    * readout. The double chain is exact-input while `N·Σs²n < 2^53`
    * (~1e11 rows at single-digit scores). Judged `q_cochran`, fully
    * ORACLED; hand trend, flat-rate z≈0, degenerate fences and sign
    * direction pinned in EvalSpec. */
  def cochranArmitage(df: DataFrame, doseCol: String,
      outcomeCol: String): DataFrame = {
    df.select(col(doseCol).cast("long").as("__s"),
        col(outcomeCol).cast("boolean").cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__r"))
      .agg(sum(col("__n")).as("n"), sum(col("__r")).as("r"),
        sum(expr("__s * __n")).as("__sn"),
        sum(expr("__s * __r")).as("__sr"),
        sum(expr("__s * __s * __n")).as("__s2n"),
        count(lit(1)).as("n_doses"))
      .select(col("n"), col("r"), col("n_doses"),
        expr("n * __sr - r * __sn").as("trend_num"),
        when(col("r") > 0 && col("r") < col("n") &&
            expr("n * __s2n - __sn * __sn") > 0,
          expr("""cast(floor(cast(n * __sr - r * __sn as double) * 1000000.0
            / sqrt(cast(r as double) * cast(n - r as double)
              * (cast(n as double) * cast(__s2n as double)
                 - cast(__sn as double) * cast(__sn as double))
              / cast(n as double))) as bigint)""")).as("z_micro"))
  }

  /** Coarsened exact matching (CEM) + the matched ATT — the
    * causal-adjustment step between raw diff-in-means and a model:
    * units match exactly on a caller-coarsened stratum key (binned
    * covariates concatenated to one string), strata missing either
    * arm are PRUNED (the CEM common-support guarantee), and the
    * average treatment effect on the treated reweights control means
    * to the treated stratum mix: `ATT = Σ_s n_t,s·(μ_t,s − μ_c,s) /
    * Σ_s n_t,s`. Judged-double discipline: outcomes to cents, stratum
    * means micro-floored via signed division (`sign·(abs div n)`, the
    * q_assortativity rule, so negative outcome sums divide identically
    * in Spark and DuckDB) over a DECIMAL(38,0) intermediate (cent-sum
    * × 1e6 is three data-scale magnitudes — the q_gini overflow rule),
    * the per-stratum diff and its n_t-weighted sum exact BIGINT, the
    * final ATT one more signed division. Output = matched per-stratum
    * rows (with the control weight `w_milli = n_t·1000 div n_c` CEM
    * would hand a downstream model) plus one 'TOTAL' row carrying the
    * ATT.
    *
    * Scale: one partial aggregate to strata cells (config-scale), one
    * 1-row total joined back — the corpus never shuffles twice.
    * Judged `q_cem`, fully ORACLED; hand two-stratum ATT vs the
    * confounded crude diff, common-support pruning, the weight
    * identity and negative outcomes pinned in EvalSpec. */
  def cemAtt(df: DataFrame, stratumCol: String, treatCol: String,
      outcomeCol: String): DataFrame = {
    val cells = df.select(col(stratumCol).cast("string").as("stratum"),
        col(treatCol).cast("boolean").as("__t"),
        floor(col(outcomeCol) * 100 + lit(0.5)).cast("long").as("__c"))
      .groupBy(col("stratum"))
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_treat"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_control"),
        sum(when(col("__t"), col("__c")).otherwise(0L)).as("__st"),
        sum(when(!col("__t"), col("__c")).otherwise(0L)).as("__sc"))
      .filter(col("n_treat") > 0 && col("n_control") > 0)
      .select(col("stratum"), col("n_treat"), col("n_control"),
        expr("n_treat * 1000 div n_control").as("w_milli"),
        expr("""cast(sign(__st) as bigint) *
          cast((abs(cast(__st as decimal(38,0))) * 1000000)
            div n_treat as bigint)""").as("mt_micro"),
        expr("""cast(sign(__sc) as bigint) *
          cast((abs(cast(__sc as decimal(38,0))) * 1000000)
            div n_control as bigint)""").as("mc_micro"))
      .withColumn("diff_micro", col("mt_micro") - col("mc_micro"))
    val per = graft.engine.Caches.persisted(cells)
    val total = per.agg(sum(col("n_treat")).as("n_treat"),
        sum(col("n_control")).as("n_control"),
        sum(expr("cast(n_treat as decimal(38,0)) * diff_micro"))
          .as("__num"))
      .select(lit("TOTAL").as("stratum"), col("n_treat"),
        col("n_control"), lit(null).cast("long").as("w_milli"),
        lit(null).cast("long").as("mt_micro"),
        lit(null).cast("long").as("mc_micro"),
        expr("""cast(sign(__num) as bigint)
          * cast(abs(__num) div n_treat as bigint)""").as("diff_micro"))
    per.unionByName(total)
  }

  /** Kendall's W — concordance of m COMPLETE rankings of n items (do
    * independent rankers/models/metrics order the catalog the same
    * way?): ranks are `row_number` per rater over (value desc, item
    * asc) so ties break deterministically and every rank is an exact
    * integer; with `Rᵢ` the per-item rank sums,
    * `S4 = Σᵢ(2Rᵢ − m(n+1))² = 4·Σ(Rᵢ − R̄)²` stays in BIGINT and
    * `w_milli = 3·S4·1000 div (m²·(n³−n))` is exact (1000 = perfect
    * agreement, 0 = no association). Requires a complete block design
    * — every rater ranks every item (the fixture guarantees it; rows
    * per (rater, item) are pre-aggregated by max so duplicates
    * collapse deterministically).
    *
    * Scale: one partial aggregate to (rater, item) cells (m·n rows —
    * config-scale), per-rater windows over n items, one 1-row readout;
    * overflow-safe while `m²n³ < 2^63/3000` (~1e5 items at 100
    * raters). Judged `q_kendall_w`, fully ORACLED; perfect/reversed
    * agreement, the 3-rater hand value and the complete-design
    * collapse pinned in EvalSpec. */
  def kendallW(df: DataFrame, itemCol: String, raterCol: String,
      valueCol: String): DataFrame = {
    val cells = df.groupBy(col(raterCol).as("__rater"),
        col(itemCol).as("__item"))
      .agg(max(col(valueCol)).as("__v"))
    val ranked = cells.withColumn("__rk",
      row_number().over(Window.partitionBy("__rater")
        .orderBy(col("__v").desc, col("__item"))))
    val sums = ranked.groupBy(col("__item"))
      .agg(sum(col("__rk")).as("__rsum"))
    val dims = cells.agg(
      countDistinct(col("__rater")).as("__m"),
      countDistinct(col("__item")).as("__n"))
    sums.crossJoin(broadcast(dims))
      .select(col("__item"), col("__rsum"), col("__m"), col("__n"))
      .agg(max(col("__m")).as("m_raters"), max(col("__n")).as("n_items"),
        sum(expr("""(2 * __rsum - __m * (__n + 1))
          * (2 * __rsum - __m * (__n + 1))""")).as("__s4"))
      .select(col("m_raters"), col("n_items"),
        when(col("n_items") > 1,
          expr("""3 * __s4 * 1000 div (m_raters * m_raters
            * (n_items * n_items * n_items - n_items))"""))
          .as("w_milli"))
  }
}
