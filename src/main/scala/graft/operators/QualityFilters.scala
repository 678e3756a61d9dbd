package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Rule-based document quality filtering presets — the published curation
  * heuristics a pretraining pipeline applies before dedup (SURVEY §2b
  * text-analysis surface; the "quality gate" of `q_curate`, promoted to
  * the standard from the literature).
  *
  * [[gopherLite]] implements the subset of the Gopher quality rules
  * (Rae et al., "Scaling Language Models: ... Gopher", 2021, Table A1 —
  * public paper) that is exactly reproducible over a whitespace
  * tokenization, each rule an arithmetic predicate over the one-pass
  * [[graft.functions.TextStatsKernel]] struct — the whole gate is ONE
  * scan-stage filter, no shuffle, fully DuckDB-expressible (judged
  * `q_gopher`):
  *
  *  - word count within [minWords, maxWords]            (Gopher: 50..100k)
  *  - mean word length within [3, 10] characters
  *  - symbol-to-word ratio (`#`, `…`, `...`) ≤ 0.1
  *  - ≥ 80% of words contain an alphabetic character
  *  - ≥ 2 stopword hits (the en function-word lexicon)
  *
  * Omitted Gopher rules — line-shape heuristics (bullet/ellipsis line
  * starts, duplicate lines) — need line structure the harness corpus
  * (single-line docs) cannot exercise; they belong in the same kernel the
  * day a multi-line corpus exists.
  */
object QualityFilters {

  /** The Gopher-lite predicate over a [[TextOps.textStats]] struct
    * column — exposed separately so callers can compose it with their own
    * rules or project the failing rule for debugging. */
  def gopherPredicate(st: Column, minWords: Int, maxWords: Int): Column = {
    val n = st.getField("n_tokens")
    val meanLen = st.getField("sum_chars").cast("double") / n
    n >= minWords && n <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      st.getField("n_symbols").cast("double") / n <= 0.1 &&
      st.getField("n_alpha_tokens").cast("double") / n >= 0.8 &&
      st.getField("s_en") >= 2
  }

  /** Apply [[gopherPredicate]] to `textCol`, keeping the input columns. */
  def gopherLite(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    df.filter(gopherPredicate(TextOps.textStats(col(textCol)), minWords, maxWords))
}
