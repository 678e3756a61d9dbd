package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (SURVEY.md §2b: tokenize/count/score over `documents.text`).
  *
  * Everything here is a pure `Column` expression — no UDFs, no shuffles
  * of its own — and DuckDB can express each one with
  * `string_split`/`list_*` lambdas, which is what makes the judged
  * queries oracle-checkable. Honesty note on cost: Spark higher-order
  * functions (`transform`/`filter`/`aggregate`) evaluate their lambdas
  * INTERPRETED, not in whole-stage codegen (measured ~60 µs/element on
  * this box). That is acceptable for the bounded per-token scoring
  * below (a few ops per token, no combinatorial blowup) but NOT for
  * per-shingle hot paths — those use the exploded codegen formulation
  * ([[shingleRows]] / [[minShingleFingerprints]]); see Dedup.scala for
  * the measured rationale.
  */
object TextOps {

  /** Whitespace tokenizer. Single-space split, matching DuckDB's
    * `string_split(text, ' ')` exactly (no regex collapsing — the judged
    * corpus is single-spaced; see [[normalized]] for the cleanup path). */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical whitespace-normalized form: trim + collapse runs of
    * whitespace — the normalization applied before fingerprinting. */
  def normalized(text: Column): Column =
    regexp_replace(trim(text), "\\s+", " ")

  /** Sliding-window document chunking: one row per (doc, chunk) where
    * chunk c covers tokens `[c·stride + 1, c·stride + chunkTokens]`
    * (1-based, final chunk truncated at the doc end) — the
    * chunk-for-embedding step of every RAG/embedding pipeline, sized in
    * tokens so downstream encoders see bounded inputs, with
    * `stride < chunkTokens` giving overlap so no span straddles a chunk
    * boundary unseen. Chunk count = `ceil(max(n − chunk, 0)/stride) + 1`:
    * always ≥1 per doc (a short doc is its own single chunk), last chunk
    * starts at or before the last token, never fully inside its
    * predecessor.
    *
    * Built from non-lambda collection functions only (`sequence` +
    * `explode` + `slice` + `array_join` — all whole-stage codegen; the
    * interpreted-HOF trap does not apply because no lambda is involved),
    * entirely scan-stage: no shuffle, output fan-out bounded by
    * n/stride per doc. Judged `q_chunk` with chunks compared by md5 —
    * DuckDB reproduces the windows with list slicing. */
  def chunkByTokens(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      "need 0 < stride <= chunk")
    val nChunksMinus1 = ceil(
      greatest(size(col("__toks")) - chunkTokens, lit(0)) / lit(strideTokens.toDouble))
      .cast("int")
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunksMinus1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"), col("chunk_idx") * strideTokens + 1,
          lit(chunkTokens)), " ").as("chunk_text"),
        least(size(col("__toks")) - col("chunk_idx") * strideTokens,
          lit(chunkTokens)).as("n_tokens"))
  }

  /** Word n-gram shingles (contiguous token windows joined by a space).
    * Documents with fewer than `n` tokens yield an empty array — the same
    * contract as the oracle's `generate_series(1, len-n+1)` (empty when
    * len < n), so short docs simply never pair in similarity joins. */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - lit(n - 1))
    val mk = (i: Column) =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)
    when(size(toks) >= n, transform(idx, mk))
      .otherwise(typedLit(Seq.empty[String]).cast(ArrayType(StringType)))
  }

  /** Token count (the "token counting" scale primitive — whitespace
    * tokens; a BPE-ish subword count is [[subwordCount]]). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: number of matches of a word/number/punct
    * regex — the standard pre-tokenizer shape (letters run | digits run |
    * single punct). Deterministic and cheap; a real BPE vocab lookup would
    * sit behind the same column seam. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Mean token length in characters, as double. */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(toks)

  /** Fraction of tokens that appear in `markers`. */
  def markerRatio(toks: Column, markers: Seq[String]): Column =
    markerCount(toks, markers).cast("double") / size(toks)

  /** Count of tokens that appear in `markers` (with multiplicity). */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(_.asInstanceOf[Any]): _*)))

  /** Language marker lexicons for the stopword language-ID heuristic:
    * tiny per-language function-word sets (public knowledge; the standard
    * cheap lang-ID baseline alongside char n-grams). Scores are marker
    * hit counts; prediction is argmax with a fixed tie order and "und"
    * (undetermined) when every score is zero. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es")
  )

  /** Per-language marker-count score columns, aliased `s_<lang>`. */
  def langScores(toks: Column): Seq[Column] =
    langMarkers.map { case (lang, ms) => markerCount(toks, ms).as(s"s_$lang") }

  /** Argmax language prediction over [[langScores]] columns (by name).
    * Ties resolve in [[langMarkers]] order; all-zero → "und". */
  def langPredict(scores: Map[String, Column]): Column = {
    val m = greatest(langMarkers.map { case (l, _) => scores(l) }: _*)
    langMarkers.foldLeft(when(m === 0, lit("und"))) { case (acc, (l, _)) =>
      acc.when(scores(l) === m, lit(l))
    }
  }

  /** One-pass native text-statistics struct (n_tokens, n_uniq, sum_chars,
    * per-language marker scores, n_subwords) — the corpus-scale form of
    * the scoring functions above; see
    * [[graft.functions.TextStatsKernel]] for field semantics and
    * TextStatsSpec for the per-field equivalence to the HOF forms. */
  def textStats(text: Column): Column = call_function("graft_text_stats", text)

  /** Full-document fingerprint: md5 of the raw text. Matches DuckDB's
    * `md5(text)` byte-for-byte (lowercase hex of UTF-8). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Shingle fingerprint: lexicographic min of per-shingle md5 digests —
    * a 1-permutation MinHash / winnowing-style document sketch. Equal for
    * exact dups, stable under small reorderings far from the min shingle.
    * Null for docs shorter than the shingle width (empty array → null).
    *
    * Column form for literals/one-offs: the higher-order functions here
    * evaluate INTERPRETED (~60 µs/shingle). Corpus-scale callers must use
    * [[minShingleFingerprints]], the whole-stage-codegen formulation;
    * TextOpsSpec asserts the two agree. */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(tokens(text), n), s => md5(s.cast("binary"))))

  /** One row per (doc, shingle string): word `width`-grams emitted by the
    * native [[graft.functions.ShingleKernel]] expression in the SCAN stage
    * and exploded — ZERO shuffles (r3 VERDICT item 1: the previous
    * explode + window-lead formulation exchanged a (doc, pos, token-string)
    * row for every token in the corpus; a doc's tokens are coresident in
    * its row, so no exchange is semantically needed). Docs shorter than
    * `width` yield no rows (empty array under explode). */
  def shingleRows(docs: DataFrame, textCol: String, idCol: String,
      width: Int): DataFrame =
    docs.select(col(idCol),
      explode(call_function("graft_shingles", col(textCol), lit(width))).as("__s"))

  /** Corpus-scale [[minShingleFingerprint]]: (idCol, fp_shingle) with the
    * min-md5 computed as a codegen'd hash-aggregate over exploded
    * shingles (partial min per task, then one row per doc through the
    * shuffle). Docs shorter than `width` are absent — left-join and keep
    * the null to match the Column form's contract. */
  def minShingleFingerprints(docs: DataFrame, textCol: String, idCol: String,
      width: Int = 3): DataFrame =
    shingleRows(docs, textCol, idCol, width)
      .groupBy(col(idCol))
      .agg(min(md5(col("__s").cast("binary"))).as("fp_shingle"))

  /** URL pattern for [[cleanText]] — `https?://` followed by non-space.
    * Kept to constructs with identical semantics in Java regex and
    * DuckDB's RE2 (no lookarounds, no backrefs) so the oracle can run
    * the same pattern. */
  val URL_RE = "https?://[^ ]+"

  /** Email pattern for [[cleanText]] — local@domain.tld over the usual
    * character classes; applied AFTER lowercasing so one case suffices. */
  val EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Text normalization for pretraining ingest: lowercase, then mask
    * URLs as `<url>` and emails as `<email>` (URL first — a URL may
    * contain `@`, an email never contains `://`). Pure scan-stage
    * `regexp_replace` chain — codegen'd, no shuffle, and expressible
    * verbatim in DuckDB (`regexp_replace(..., 'g')`), so the judged
    * `q_text_clean` is fully oracled on a fixture that derives real
    * URLs/emails from the corpus. PII masking beyond this (names,
    * addresses) needs NER models out of scope for a relational engine —
    * the seam is this function. */
  def cleanText(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(c), URL_RE, "<url>"),
      EMAIL_RE, "<email>")

  /** IPv4 pattern for [[redactPii]] — four dot-separated 1-3 digit
    * groups. Deliberately permissive (no 0-255 range check: a leaked
    * address redacted twice is cheaper than one missed); same
    * Java-regex/RE2 compatibility rule as [[URL_RE]]. */
  val IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone pattern for [[redactPii]] — 3-3-4 digit groups separated by
    * `-` or space, with a TRULY optional `+CC ` prefix (the prefix is
    * one optional group — r7 review: the first cut made the CC digits
    * mandatory, so plain `555-867-5309` leaked through unredacted; the
    * NANP shape the fixture derives; real deployments swap in a locale
    * pattern set here). */
  val PHONE_RE = "(\\+?\\d{1,2}[- ])?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** PII audit + redaction for pretraining ingest (beyond [[cleanText]]'s
    * URL/email masking): masks emails, IPv4 addresses and phone numbers
    * and COUNTS each category — the per-doc evidence a compliance pass
    * reports before the redacted text ships. Counts are taken on the
    * input text per category (order-independent); masking applies
    * email → ip → phone, each pattern chosen so no mask token matches a
    * later pattern. Pure scan-stage `regexp_extract_all`/`regexp_replace`
    * chain — codegen'd, zero shuffle, and RE2-expressible so the judged
    * `q_pii_redact` is fully oracled on a fixture deriving all three PII
    * kinds from `doc_id`. Returns a struct (n_email, n_ip, n_phone,
    * clean). */
  def redactPii(c: Column): Column = {
    val lc = lower(c)
    struct(
      size(regexp_extract_all(lc, lit(EMAIL_RE), lit(0))).as("n_email"),
      size(regexp_extract_all(lc, lit(IPV4_RE), lit(0))).as("n_ip"),
      size(regexp_extract_all(lc, lit(PHONE_RE), lit(0))).as("n_phone"),
      regexp_replace(
        regexp_replace(
          regexp_replace(lc, EMAIL_RE, "<email>"),
          IPV4_RE, "<ip>"),
        PHONE_RE, "<phone>").as("clean"))
  }

  /** Luhn checksum validation over a digit-string Column (Luhn 1960,
    * US patent 2,950,048 — public domain): the checksum every payment
    * card number satisfies — from the RIGHT, double every second
    * digit, take its digit sum, total ≡ 0 mod 10. The digit sum of a
    * doubled digit is `2d div 10 + 2d mod 10` (one uniform formula,
    * no branch — both engines spell it identically). Evaluates with
    * interpreted HOFs — acceptable per CANDIDATE (rare spans), the
    * sftAssemble escalation, never per token. */
  def luhnValid(c: Column): Column = {
    val n = length(c)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0L),
      (acc, i) => {
        val d = substring(c, (n - i + lit(1)).cast("int"), lit(1))
          .cast("long")
        acc + when(i % 2 === 1, d)
          .otherwise(floor(d * 2 / 10).cast("long") + (d * 2) % 10)
      })
    n > 0 && total % 10 === 0
  }

  /** Card-number audit — the VALIDATION pass behind [[redactPii]]'s
    * pattern matching (a 16-digit run is only payment-card PII if the
    * Luhn checksum holds — validation is what keeps order ids and
    * timestamps out of the redaction counts): per document, extract
    * contiguous digit runs, keep the card-length ones (13..19 digits,
    * PAN range), and split them by [[luhnValid]]. Returns
    * (id, n_candidates, n_luhn_valid). Scan-stage
    * `regexp_extract_all` + per-candidate checksum (candidates are
    * rare by construction); fully RE2/DuckDB-expressible. Judged
    * `q_luhn` (fixture plants a valid/invalid pair per doc — the
    * check digit computed by the same arithmetic on both sides), fully
    * ORACLED; known-card vectors, the off-by-one rejection and length
    * gates pinned in TextOpsSpec. */
  def luhnAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val runs = filter(
      regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0)),
      r => length(r) >= 13 && length(r) <= 19)
    docs.select(col(idCol), explode_outer(runs).as("__r"))
      .groupBy(col(idCol))
      .agg(count(col("__r")).as("n_candidates"),
        count(when(luhnValid(col("__r")), 1)).as("n_luhn_valid"))
  }

  /** IBAN mod-97 validation (ISO 13616 / ISO 7064 — public): rearrange
    * (body after position 4, then the first 4 chars), map letters to
    * two digits (A=10..Z=35), and the resulting integer must be
    * ≡ 1 (mod 97). The number runs to 68 digits, so the remainder is
    * FOLDED char by char (`acc·10+d` / `acc·100+v`, mod 97 each step —
    * exact integers, and DuckDB's `list_reduce` replays the fold
    * token-identically). Interpreted HOF on rare candidate spans — the
    * [[luhnValid]] escalation. */
  def ibanValid(c: Column): Column = {
    val re = concat(c.substr(lit(5), length(c)), c.substr(lit(1), lit(4)))
    val total = aggregate(
      sequence(lit(1), length(re)),
      lit(0L),
      (acc, i) => {
        val a = ascii(re.substr(i.cast("int"), lit(1))).cast("long")
        when(a >= 48 && a <= 57, (acc * 10 + a - 48) % 97)
          .otherwise((acc * 100 + a - 55) % 97)
      })
    total === 1
  }

  /** IBAN audit — [[luhnAudit]]'s bank-account sibling (the other
    * checksum-validated PII class a redaction pipeline must verify
    * before counting): per document, extract standalone uppercase
    * alphanumeric runs shaped like an IBAN (2 letters + 2 check digits
    * + 11..30 alphanumerics — the ISO length envelope), and split them
    * by [[ibanValid]]. Returns (id, n_candidates, n_iban_valid).
    * Scan-stage `regexp_extract_all` + shape filter + per-candidate
    * fold (candidates rare by construction); fully DuckDB-expressible
    * (`regexp_full_match` + `list_reduce`). Judged `q_iban` (fixture
    * plants a doc_id-derived candidate whose validity BOTH engines
    * decide by the same fold, plus a known-valid vector on every 5th
    * doc and a too-short run the shape gate drops), fully ORACLED;
    * known vectors, check-digit off-by-one and length gates pinned in
    * TextOpsSpec. */
  def ibanAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val runs = filter(
      regexp_extract_all(col(textCol), lit("[A-Z0-9]+"), lit(0)),
      r => r.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$"))
    docs.select(col(idCol), explode_outer(runs).as("__r"))
      .groupBy(col(idCol))
      .agg(count(col("__r")).as("n_candidates"),
        count(when(ibanValid(col("__r")), 1)).as("n_iban_valid"))
  }

  /** Inter-document boilerplate removal (the CCNet/RefinedWeb line-level
    * pass, public): drop every LINE that occurs in at least `minDf`
    * distinct docs — headers, footers, cookie banners — and reassemble
    * each doc from its surviving lines in original order. Returns
    * (idCol, clean) with one row per input doc (a doc whose every line
    * is boilerplate yields the empty string, not a dropped row — the
    * downstream length gate decides its fate, not this pass).
    *
    * Scale shape: the document-frequency aggregate and the drop-list
    * join run on `xxhash64(line)` — 8-byte keys, the full line string
    * never crosses a shuffle (CLAUDE.md rule). The drop list (lines with
    * df ≥ minDf) is a tiny relation by construction — boilerplate is
    * boilerplate BECAUSE few distinct strings repeat across many docs —
    * and broadcasts to an anti-join at the scan. Reassembly shuffles
    * each doc's surviving (pos, line) rows once; the per-doc sort runs
    * inside the aggregate's collected array (docs are KB-scale). */
  /** Reassemble per-doc lines in position order: `sort_array` over the
    * collected (pos, line) structs sorts by the FIRST field with no
    * lambda, and `.getField` on the sorted array projects the line field
    * array-wise (`GetArrayStructFields`, codegen'd) — zero interpreted
    * higher-order functions on the reassembly path (r7 review; the first
    * cut used a `transform` lambda, the CLAUDE.md HOF trap). */
  private def linesInOrder: Column =
    array_join(
      array_sort(collect_list(struct(col("__pos"), col("__line"))))
        .getField("__line"), "\n")

  /** Intra-document duplicate-line removal: keep each line's FIRST
    * occurrence within its doc, preserving order — the removal
    * counterpart of the Gopher duplicate-line FILTER (which rejects the
    * whole doc) and the intra-doc complement of [[stripBoilerplate]]'s
    * cross-doc pass. Every doc keeps at least one line, so row count is
    * stable by construction.
    *
    * The first-occurrence aggregate shuffles on (id, xxhash64(line)) —
    * 16-byte keys, with the line string riding as the payload each group
    * resolves by `min_by` position (all rows of a group carry the
    * IDENTICAL string, the usual 64-bit hash-equality contract) — then
    * one per-doc reassembly aggregate. Judged `q_line_dedup`,
    * md5-compared, fully oracled. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .groupBy(col(idCol), xxhash64(col("__line")).as("__lh"))
      .agg(min(col("__pos")).as("__pos"), min(col("__line")).as("__line"))
      .groupBy(col(idCol))
      .agg(linesInOrder.as("clean"))

  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long): DataFrame = {
    // the exploded relation feeds BOTH the df aggregate and the
    // anti-join — persist via the registry or the corpus is scanned and
    // re-split twice (r7 review; the jaccardJoin precedent)
    val lines = graft.engine.Caches.persisted(
      docs.select(col(idCol),
          posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
        .withColumn("__lh", xxhash64(col("__line"))))
    val dropList = lines.groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__lh"))
    val rebuilt = lines
      .join(broadcast(dropList), Seq("__lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(linesInOrder.as("clean"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .na.fill("", Seq("clean"))
  }

  /** Capture group 1 = the host of each http(s) URL. Both Java regex and
    * RE2 compatible (no backtracking constructs), lowercased input so the
    * DuckDB oracle matches byte-for-byte. */
  val URL_DOMAIN_RE = "https?://([a-z0-9.-]+)"

  /** All URL domains mentioned in `c`, in document order (with
    * multiplicity) — the unit of web-corpus curation policy: domain-level
    * quality priors, blocklists, and mixing weights all key on this.
    * Scan-stage `regexp_extract_all`; aggregation composes on top
    * (`q_domain_stats` counts docs and refs per domain). */
  def urlDomains(c: Column): Column =
    regexp_extract_all(lower(c), lit(URL_DOMAIN_RE), lit(1))

  /** HTML → text normalization — the markup-removal step between "crawl
    * HTML" and every text operator in this file (quality gates, shingles,
    * LM scores all assume prose, and tag soup wrecks each of them).
    * Three stages, all codegen'd `regexp_replace`/`replace` (no UDF, no
    * parse tree — a real DOM-aware extractor is a boilerplate-quality
    * tradeoff; this is the deterministic baseline every pipeline runs
    * first): (1) tags `<[^>]*>` → space (space, not empty: `a</p><p>b`
    * must not fuse into `ab`); (2) the five standard named entities +
    * `&#39;` decoded INNERMOST-FIRST with `&amp;` last, so double-escaped
    * text (`&amp;lt;`) decodes one level per the HTML spec, not two;
    * (3) whitespace collapsed + trimmed. Judged `q_html_strip` against
    * the identical chain in DuckDB. */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Unicode NFC normalization via the [[graft.functions.NfcNormalize]]
    * codegen kernel (ASCII fast path, zero-copy for already-normalized
    * input) — run it BEFORE any hash-keyed operator when the corpus may
    * mix composed and decomposed spellings; judged `q_text_nfc` against
    * DuckDB's utf8proc `nfc_normalize`. */
  def nfcNormalize(c: Column): Column = call_function("graft_nfc", c)

  /** Canonical page key for an http(s) URL via the
    * [[graft.functions.UrlCanon]] codegen kernel (scheme/host lowercase,
    * `www.` + default-port strip, fragment drop, tracking-param removal,
    * query-param sort, trailing-slash strip; null for non-web input) —
    * the normalization under URL-level dedup and per-page frequency.
    * Scan-stage, one pass per row; judged `q_url_canon`. */
  def canonicalUrl(c: Column): Column = call_function("graft_url_canon", c)

  /** Compression-ratio quality signal: raw-deflate length over raw UTF-8
    * length, via the [[graft.functions.DeflateLen]] codegen kernel.
    * Repetitive/templated junk lands well below prose (~0.3); ratios
    * near or above 1 mean high-entropy noise. Empty text → ratio over a
    * floor of 1 byte (deflate of empty input is a 2-byte block, ratio 2
    * — harmlessly "incompressible"). Not DuckDB-expressible: judged
    * rows-only, contracts pinned in TextOpsSpec. */
  def compressionRatio(c: Column): Column =
    call_function("graft_deflate_len", c).cast("double") /
      greatest(octet_length(c), lit(1)).cast("double")

  /** Byte-distribution Shannon entropy (nats) via the
    * [[graft.functions.CharEntropy]] codegen kernel — the cheap
    * gibberish/spam detector: ~0 for repeated-character junk, high for
    * random noise, a stable mid band for prose. Scan-stage, no shuffle;
    * judged `q_char_entropy`, fully oracled. */
  def charEntropy(c: Column): Column = call_function("graft_char_entropy", c)

  /** Unigram language-model scoring (the CCNet/Wenzek et al. 2020 LM
    * quality filter, with the n=1 model the corpus itself can train in
    * one pass): per document, the mean negative log-likelihood of its
    * tokens under the corpus-wide unigram distribution. Templated /
    * common-token documents score LOW (well-modeled), rare-token noise
    * scores HIGH — rank and cut at a percentile, as with
    * [[compressionRatio]].
    *
    * Plan shape for 100 TB: the exploded token relation feeds (a) the
    * vocabulary aggregate — map-side partials compress each partition to
    * its distinct tokens, so the token shuffle carries vocabulary-scale
    * rows, not corpus-scale — and (b) the per-doc score join, where the
    * finished vocabulary (vocabulary-scale, with the 1-row token total
    * already folded in) is BROADCAST back, so the only corpus-scale
    * shuffle is the final groupBy(doc). The token relation is persisted
    * via the cache registry because both legs consume it. Judged
    * `q_unigram_lm`, fully oracled within float tolerance. */
  def unigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.engine.Caches.persisted(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("token")))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("__cnt"))
    val total = vocab.agg(sum(col("__cnt")).as("__n"))
    val probs = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        (-log(col("__cnt").cast("double") / col("__n"))).as("__nll"))
    toks.join(broadcast(probs), "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("__nll")).as("nll"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per document, the
    * log-likelihood ratio of its hashed bag-of-tokens under a TARGET
    * distribution (the domain you want more of — a quality corpus, an
    * eval-adjacent sample) vs the SOURCE distribution (the corpus
    * itself), with add-α smoothing over `buckets` hash buckets:
    * `w(d) = Σ_tok ln p̂_target(b(tok)) − ln p̂_source(b(tok))`,
    * `p̂(b) = (count(b)+α)/(total+α·B)`. Select `weight > 0` (or top-k
    * by weight) to shift the corpus toward the target domain — the
    * importance-resampling step that beat heuristic filters for
    * domain-targeted pretraining selection in the paper.
    *
    * Plan shape for 100 TB: tokens hash to ≤`buckets` 8-byte keys in
    * the scan stage (text never shuffles); per-doc bucket counts
    * partial-aggregate map-side, so the one corpus-scale shuffle
    * carries (doc, bucket, count) rows bounded by per-doc DISTINCT
    * buckets. Both distributions reduce to ≤`buckets`-row aggregates,
    * and their log-ratio table broadcasts back (≤ buckets × 16 B —
    * size the `buckets` knob accordingly; 2^20 ≈ 16 MB); the final
    * weight is one more partial-aggregated groupBy(doc). Nothing
    * data-scale ever reaches the driver. Hash collisions fold rare
    * buckets together — the accepted DSIR trade (the paper uses 10k
    * buckets) — so weights are approximate by construction: judged
    * `q_dsir_select` selects on a fixture whose ±20 margins dwarf any
    * collision shift; exact weight arithmetic pinned in TextOpsSpec. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1 << 20, smoothing: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(smoothing > 0, s"smoothing must be > 0: $smoothing")
    val b = lit(buckets.toDouble)
    val a = lit(smoothing)
    def bucket(tok: Column): Column = pmod(xxhash64(tok), lit(buckets.toLong))
    // consumed twice (source distribution + per-doc weights) — registry
    // persist, released by the published cache contract
    val perDoc = graft.engine.Caches.persisted(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
        .select(col(idCol), bucket(col("__tok")).as("__b"))
        .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c")))
    val srcCounts = perDoc.groupBy(col("__b")).agg(sum(col("__c")).as("__cs"))
    val tgtCounts = target
      .select(explode(tokens(col(targetTextCol))).as("__tok"))
      .select(bucket(col("__tok")).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val srcTot = srcCounts.agg(
      coalesce(sum(col("__cs")), lit(0L)).cast("double").as("__ts"))
    val tgtTot = tgtCounts.agg(
      coalesce(sum(col("__ct")), lit(0L)).cast("double").as("__tt"))
    val ratio = srcCounts.join(tgtCounts, Seq("__b"), "full_outer")
      .crossJoin(broadcast(srcTot)).crossJoin(broadcast(tgtTot))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + a) /
            (col("__tt") + a * b)) -
         log((coalesce(col("__cs"), lit(0L)).cast("double") + a) /
            (col("__ts") + a * b))).as("__lr"))
    perDoc.join(broadcast(ratio), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c").cast("double") * col("__lr")).as("weight"))
  }

  /** BM25 keyword retrieval scoring (Robertson & Walker 1994; the
    * Okapi BM25 formula with the standard +1-smoothed IDF) — full-text
    * search over the corpus as a relational plan:
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))`
    * over the query terms `t` matched in `d`.
    *
    * Plan shape: the exploded token relation filters to the query
    * terms IN THE SCAN STAGE (an IN over a literal handful — the
    * corpus's non-matching tokens never leave the scan), so the tf
    * aggregate shuffles only matching (doc, term) pairs; doc length is
    * a kernel column; N/avgdl is a broadcast 1-row aggregate and the
    * per-term document frequencies a broadcast |query|-row one.
    * Returns ALL matching docs keyed by id — deterministic row set;
    * ranking is `ORDER BY score` at the caller, kept out of the judged
    * projection because a top-k cut on float scores is exactly where
    * cross-engine ulp drift could flip membership. Judged `q_search`,
    * fully oracled. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty)
    val lens = docs.select(col(idCol),
      textStats(col(textCol)).getField("n_tokens").cast("double").as("__dl"))
    val corpus = lens.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val matches = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isin(query: _*))
    val tf = matches.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).cast("double").as("__df"))
    tf.join(broadcast(dfT), "token")
      .join(lens, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * (col("__tf") * lit(k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("__s")).as("score"))
  }

  /** Top-k TF-IDF keywords per document — the per-doc summarization /
    * topic-tag primitive over the same tf·idf weighting as the corpus
    * report. `docFilter` bounds WHICH documents get keyword rows (the
    * typical call tags a slice); document frequency is computed over
    * the WHOLE corpus either way, so a slice's keywords are scored
    * against global rarity.
    *
    * Ranking is by `score_milli` = round(1000·tf·ln(N/df)) — the
    * repo's judged-double rule applied to ORDERING: a raw-double sort
    * key is exactly where a 1-ulp cross-engine `ln` difference could
    * flip a rank boundary, while the milli-scaled integer is stable
    * (and ties break on the token itself, a total order). Plan shape:
    * one corpus scan + explode persisted and shared by tf and df
    * (the q_tfidf contract), both aggregates partial-combined, idf in
    * via a 1-row broadcast, and the only per-doc work is a
    * row_number window over each doc's own candidate terms. Judged
    * `q_keywords`, fully oracled. */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
      docFilter: Column, k: Int): DataFrame = {
    require(k >= 1)
    val toks = graft.engine.Caches.persisted(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("token")))
    toks.count() // materialize before tf/df fan out
    val tf = toks.filter(docFilter)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(org.apache.spark.sql.functions.broadcast(nDocs))
      .withColumn("score_milli",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) *
          lit(1000.0) + lit(0.5)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("score_milli").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        col("score_milli"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * merge the ranklists of several retrieval legs into one score,
    * `rrf(d) = Σ_legs 1/(k + rank_leg(d))`. RRF is the standard
    * hybrid-search combiner ([[bm25Search]] + a vector top-k being the
    * classic pair) because only RANKS enter: a log-scaled BM25 and a
    * cosine in [−1,1] fuse with no score calibration, and a doc missing
    * from a leg simply contributes no term (the RRF convention).
    *
    * Each leg arrives as a (`idCol`, `rank`) relation — the leg's own
    * top-k cut having happened upstream where its index lives — so the
    * union carries legs·k 16-byte rows, the groupBy is the only
    * shuffle, and nothing corpus-scale moves. Judged `q_hybrid_search`,
    * fully oracled: with integer ranks each term is a single IEEE
    * division and a doc in ≤ 2 legs sums with ONE commutative addition,
    * so the fused floats are bit-stable across engines (3+ legs could
    * in principle ulp-drift with aggregation order; the judged query
    * uses two). */
  def rrfFuse(legs: Seq[DataFrame], idCol: String,
      k: Int = 60): DataFrame = {
    require(legs.nonEmpty && k >= 0)
    legs.map(df => df.select(col(idCol), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(lit(1.0) / (lit(k.toLong) + col("rank"))).as("rrf"),
        count(lit(1)).as("n_legs"))
  }

  /** Out-of-vocabulary coverage report: per document, how many tokens
    * fall outside a fixed vocabulary — the tokenizer-fit signal a
    * training-data pipeline checks before committing a corpus to a
    * tokenizer (high OOV → byte-fallback blowup in sequence length, or
    * the wrong corpus for the vocab). `vocab` is a one-column relation
    * of in-vocabulary tokens (e.g. the [[graft.operators.Sampling]]
    * vocabulary build, or a tokenizer's token list ingested as a table).
    *
    * Plan shape: tokens explode in the scan stage, the vocabulary —
    * config-scale next to the corpus — BROADCASTS into a left join
    * whose null-ness is the OOV flag, and the per-doc aggregate is the
    * only shuffle. `oov_rate` is one IEEE division per row — exact
    * cross-engine. Judged `q_oov`, fully oracled. */
  def oovReport(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    oovReportTokens(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("__t")),
      idCol, "__t", vocab)

  /** [[oovReport]] over a pre-exploded (id, token) relation — the form
    * to use when the token relation already exists (or is shared with
    * the vocabulary build, as `q_oov` does: one corpus scan serves both
    * the vocab aggregate and the report). */
  def oovReportTokens(tokenRows: DataFrame, idCol: String, tokenCol: String,
      vocab: DataFrame): DataFrame = {
    val vocabCol = vocab.columns.head
    val v = vocab.select(col(vocabCol).as("__v")).distinct()
    tokenRows.select(col(idCol), col(tokenCol).as("__t"))
      .join(broadcast(v), col("__t") === col("__v"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__v").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Bigram conditional-LM scoring — [[unigramLmScore]] with one order
    * of context: per document, the mean of `−ln p(w_i | w_{i−1})` under
    * the corpus MLE `count(w_{i−1} w_i) / count(w_{i−1} ·)`. Catches
    * scrambled/concatenated text that unigram statistics can't (every
    * token common, every transition rare).
    *
    * Bigrams come straight from the scan-stage `graft_shingles` kernel
    * (width 2) — no window, no per-position self-join; the denominator
    * reuses the SAME bigram relation (count of bigrams starting with
    * w₁ = count of w₁ in non-final position, the standard MLE
    * denominator). Both count tables are vocabulary²-bounded and
    * broadcast at harness scale; at a scale where the bigram vocabulary
    * outgrows broadcast, drop the hint and the same plan shuffle-joins
    * on the bigram key. Docs with < 2 tokens have no bigrams and no
    * row. Judged `q_bigram_lm`, fully oracled. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = graft.engine.Caches.persisted(
      docs.select(col(idCol),
          explode(call_function("graft_shingles", col(textCol), lit(2))).as("b"))
        .withColumn("w1", substring_index(col("b"), " ", 1)))
    val cb = bg.groupBy("b").agg(count(lit(1)).as("__cb"))
    val cw = bg.groupBy("w1").agg(count(lit(1)).as("__cw"))
    bg.join(broadcast(cb), "b").join(broadcast(cw), "w1")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log(col("__cb").cast("double") / col("__cw"))).as("nll2"))
  }

  /** Greedy non-overlapping merge application — the BPE apply step,
    * shared by [[learnBpeMerges]]'s per-round rewrite and
    * [[bpeEncode]]. Left-to-right: at each position, merge `(lhs,rhs)`
    * if adjacent, else advance one symbol (the standard BPE convention,
    * so `aaaa` under `(a,a)` becomes `[aa,aa]`, never `[a,aa,a]`). */
  private[graft] def bpeApply(syms: IndexedSeq[String], lhs: String,
      rhs: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        out += lhs + rhs; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Distributed BPE vocabulary learning (Sennrich et al. 2016, "Neural
    * Machine Translation of Rare Words with Subword Units"): `numMerges`
    * rounds of "count adjacent symbol pairs, merge the most frequent",
    * starting from characters. Returns the merge table
    * `(merge_rank, lhs, rhs)` in learned order — the artifact a
    * tokenizer trainer ships.
    *
    * Scale shape, the part that matters at 100 TB: the corpus is
    * scanned ONCE, into a (word, count) relation — all K merge rounds
    * run over that VOCABULARY-scale table (exactly how production BPE
    * trainers factor the problem), so per-round cost is a pair-count
    * shuffle of vocab × word-length partial rows plus a vocab-scale
    * rewrite, never a corpus rescan. Per round the driver receives ONE
    * (pair, count) row (config-scale, like the k-means centroids); the
    * word rewrite is a typed map (the documented mapPartitions-class
    * escalation — inherently sequential per-word merge application),
    * and `barrierCut` caps the K-round lineage exactly as the CC/LPA
    * loops do. Ties break deterministically: count desc, then (lhs,
    * rhs) ascending. Rounds stop early if no pair remains.
    *
    * Judged `q_bpe_merges` on a forced-ladder fixture (the power-of-two
    * run corpus, ~10x count margins per round — see the query comment);
    * multi-character and tie cases pinned in TextOpsSpec. */
  def learnBpeMerges(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame =
    learnBpeCore(docs, textCol, numMerges, charSyms)

  /** BYTE-level BPE vocabulary learning — the GPT-2/LLaMA tokenizer
    * form of [[learnBpeMerges]] (Radford et al. 2019 — public): the
    * seed alphabet is the 256 BYTES of each word's UTF-8 encoding
    * (each byte carried as its one-char latin-1 string, so merged
    * symbols are plain string concatenations), which removes UNK by
    * construction — any text is coverable from the byte alphabet,
    * where a char-level trainer meets unseen characters. On pure-ASCII
    * text the byte and char ladders are IDENTICAL (every ASCII char is
    * its own byte — pinned as a property in TextOpsSpec); a multi-byte
    * character seeds as its 2-4 bytes and merges back together only if
    * frequent enough to earn it. Trainer factoring, tie rules and
    * scale shape are [[learnBpeMerges]]'s verbatim (shared core).
    * Judged `q_bpe_bytes`; non-ASCII hand ladder pinned in
    * TextOpsSpec. */
  def learnBpeMergesBytes(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame =
    learnBpeCore(docs, textCol, numMerges, byteSyms)

  private def charSyms(w: String): IndexedSeq[String] =
    w.map(_.toString).toIndexedSeq

  /** UTF-8 bytes as one-char latin-1 strings (codepoint = byte value):
    * concatenation-closed, so merges stay plain strings. */
  private def byteSyms(w: String): IndexedSeq[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => String.valueOf((b & 0xFF).toChar)).toIndexedSeq

  private def learnBpeCore(docs: DataFrame, textCol: String,
      numMerges: Int, split: String => IndexedSeq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.engine.Barriers.BarrierOps
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var words = docs
      .select(explode(tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      .as[(String, Long)]
      .map { case (w, n) => (split(w): Seq[String], n) }
      .toDF("syms", "n")
      .barrierCut
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    for (_ <- 0 until numMerges if !exhausted) {
      val top = words.as[(Seq[String], Long)]
        .flatMap { case (s, n) =>
          (0 until s.length - 1).map(i => (s(i), s(i + 1), n)) }
        .toDF("lhs", "rhs", "n")
        .groupBy(col("lhs"), col("rhs")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        words = words.as[(Seq[String], Long)]
          .map { case (s, n) => (bpeApply(s.toIndexedSeq, l, r): Seq[String], n) }
          .toDF("syms", "n")
          .barrierCut
      }
    }
    merges.zipWithIndex
      .map { case ((l, r), k) => (k, l, r) }.toSeq
      .toDF("merge_rank", "lhs", "rhs")
  }

  /** Encode one word under a rank-indexed merge table: repeatedly merge
    * the LOWEST-RANK pair present (left-to-right, non-overlapping —
    * [[bpeApply]]) until no adjacent pair is in the table. This is the
    * standard production BPE encoder (rank-priority adjacent-pair
    * merging) and is output-equivalent to replaying the full table in
    * rank order for any LEARNED table ([[learnBpeMerges]]'s invariant:
    * a rank-r pair's sides are symbols built by strictly earlier
    * merges, so merging can never create a new occurrence of a
    * lower-rank pair — the lowest rank present is always exactly the
    * next merge the naive replay would apply). On a hand-made table
    * violating that invariant, rank-priority is the side production
    * tokenizers take. Cost is O(pairs-present · |word|) instead of
    * O(|merges| · |word|) — at a real 32k-merge vocabulary the naive
    * replay scans the whole table per word; this touches only the
    * ranks that fire. Equivalence vs the naive replay is
    * property-pinned in TextOpsSpec. */
  private[graft] def bpeEncodeWord(w: String,
      ranks: Map[(String, String), Int]): IndexedSeq[String] =
    bpeEncodeSyms(charSyms(w), ranks)

  private[graft] def bpeEncodeSyms(syms0: IndexedSeq[String],
      ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = syms0
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        syms = bpeApply(syms, bl, br)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Apply a learned merge table to the corpus: per document, tokenize
    * on whitespace, split each word to characters, and merge adjacent
    * pairs in rank-priority order ([[bpeEncodeWord]] — the standard
    * production encoder, equivalent to replaying the merges in rank
    * order but touching only the ranks that fire). The merge table is
    * collected once (config-scale — it IS the trained vocabulary,
    * kilobytes), indexed to a `(lhs, rhs) → rank` hash map, and rides
    * the closure; the per-doc rewrite is a typed map over the corpus —
    * the mapPartitions-class escalation, inherently sequential per
    * word, exactly the shape of a production tokenizer's encode pass.
    * Judged `q_bpe_encode` (token counts = binary decomposition on the
    * ladder fixture), fully ORACLED; rank-priority ≡ naive-replay
    * equivalence property-pinned in TextOpsSpec. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame =
    bpeEncodeCore(docs, idCol, textCol, merges, charSyms)

  /** Byte-level encode under a [[learnBpeMergesBytes]] table: words
    * split to UTF-8 bytes (latin-1 one-char strings), then the same
    * rank-priority merge as [[bpeEncode]] — no UNK is possible (every
    * byte is in the seed alphabet). Token strings are latin-1 byte
    * sequences: exactly ASCII on ASCII input, raw-byte carriers
    * otherwise (the GPT-2 representation minus its cosmetic unicode
    * remap). Judged `q_bpe_bytes` (encode counts over a fixture whose
    * every-5th doc carries a 2-byte char — the +2-token byte
    * signature); ASCII equivalence + the non-ASCII hand case pinned in
    * TextOpsSpec. */
  def bpeEncodeBytes(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame =
    bpeEncodeCore(docs, idCol, textCol, merges, byteSyms)

  private def bpeEncodeCore(docs: DataFrame, idCol: String,
      textCol: String, merges: DataFrame,
      split: String => IndexedSeq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val collected = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        r.getAs[Number]("merge_rank").intValue)
    val ranks = collected.toMap
    require(ranks.size == collected.length,
      "bpeEncode: duplicate (lhs, rhs) pairs in the merge table")
    // Broadcast the merge table instead of riding the task closure:
    // one copy per executor, not one per task (scale hygiene — the
    // table is config-scale but closures reserialize per task).
    val bcRanks = spark.sparkContext.broadcast(ranks)
    docs.select(col(idCol), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ", -1).iterator.filter(_.nonEmpty)
          .flatMap(w => bpeEncodeSyms(split(w), bcRanks.value)).toSeq
        (id, toks)
      }
      .toDF(idCol, "tokens")
  }

  /** Tokenizer fertility report (the standard tokenizer-eval summary —
    * Rust et al. 2021 "How Good is Your Tokenizer?" — public): over an
    * ENCODED corpus (any encoder's (text, tokens) output —
    * [[bpeEncode]], [[bpeEncodeBytes]], [[unigramEncode]]), ONE row of
    * exact integers: `n_docs`, `n_words` (whitespace tokens),
    * `n_tokens`, `n_chars`, `fertility_milli = tokens·1000 div words`
    * (tokens per word — the headline number; ~1.1-1.3 is healthy for
    * English, high values flag a vocabulary mismatched to the corpus)
    * and `chars_per_token_milli = chars·1000 div tokens` (compression —
    * the context-budget number). Encoder-agnostic on purpose: compare
    * two candidate vocabularies by running it twice. One partial
    * aggregate over native size/length columns — zero HOFs, zero
    * shuffle beyond the 1-row agg. Judged `q_fertility` (the BPE byte
    * ladder — words/chars/tokens all closed-form), fully ORACLED;
    * div-by-zero fences pinned in TextOpsSpec. */
  def fertilityReport(encoded: DataFrame, textCol: String,
      tokensCol: String): DataFrame =
    encoded.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(split(col(textCol), " "))), lit(0L)).as("n_words"),
      coalesce(sum(size(col(tokensCol))), lit(0L)).as("n_tokens"),
      coalesce(sum(length(col(textCol))), lit(0L)).as("n_chars"))
      .select(col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        when(col("n_words") > 0,
          expr("n_tokens * 1000 div n_words")).as("fertility_milli"),
        when(col("n_tokens") > 0,
          expr("n_chars * 1000 div n_tokens")).as("chars_per_token_milli"))

  /** Unigram-LM piece costs from counts — the shared quantization both
    * the trainer's E-step and [[unigramEncode]] use:
    * `cost_micro(p) = ⌊(ln T − ln c_p)·10⁶ + 0.5⌋`, i.e. −ln p(piece)
    * micro-quantized ONCE per piece over exact integer counts (the
    * q_bursts Viterbi recipe — one IEEE ln per factor, spelled
    * token-identically in the oracle), so every downstream
    * segmentation decision is pure BIGINT min/plus. */
  private[graft] def unigramCosts(vocab: Map[String, Long]): Map[String, Long] = {
    val lnT = math.log(vocab.valuesIterator.sum.toDouble)
    vocab.map { case (p, c) =>
      p -> math.floor((lnT - math.log(c.toDouble)) * 1e6 + 0.5).toLong }
  }

  /** Viterbi segmentation of one word under micro-quantized piece
    * costs: minimize (Σ cost, then piece count, then prefer the LONGER
    * last piece — i.e. smallest last-piece start, recursively), a total
    * deterministic order both engines can replay. A single character
    * absent from the vocabulary segments as itself at `unkCost` (the
    * char-fallback an encoder needs on unseen text; training corpora
    * always carry their own alphabet so it never fires there). */
  private[graft] def unigramSegment(w: String, costs: Map[String, Long],
      maxLen: Int, unkCost: Long): IndexedSeq[String] = {
    val m = w.length
    val INF = Long.MaxValue
    val cost = Array.fill(m + 1)(INF)
    val np = Array.fill(m + 1)(Int.MaxValue)
    val back = Array.fill(m + 1)(-1)
    cost(0) = 0L
    np(0) = 0
    var i = 1
    while (i <= m) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (cost(j) != INF) {
          val pc = costs.get(w.substring(j, i)) match {
            case Some(c) => c
            case None => if (i - j == 1) unkCost else -1L
          }
          if (pc >= 0L) {
            val cc = cost(j) + pc
            val nn = np(j) + 1
            // ascending j: the FIRST (cost, npieces) winner keeps the
            // smallest last-piece start = the longest last piece
            if (cc < cost(i) || (cc == cost(i) && nn < np(i))) {
              cost(i) = cc; np(i) = nn; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    require(cost(m) != INF, s"unigramSegment: unreachable word '$w'")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var k = m
    while (k > 0) { val j = back(k); out += w.substring(j, k); k = j }
    out.reverse.toIndexedSeq
  }

  /** Unigram-LM (SentencePiece) vocabulary training (Kudo 2018,
    * "Subword Regularization" — public), the OTHER production tokenizer
    * trainer beside [[learnBpeMerges]]: where BPE grows pieces
    * bottom-up by merging, unigram starts from a substring seed and
    * PRUNES — each round segments every word by Viterbi under the
    * current piece probabilities (hard-EM: the deterministic,
    * oracle-replayable variant of Kudo's forward-backward E-step),
    * re-estimates counts from usage, and keeps the `vocabSize` most
    * used pieces. Single characters of the corpus alphabet are ALWAYS
    * retained (Kudo's coverage guarantee; an unused char keeps a floor
    * count of 1), so every word stays encodable. Ties: usage desc then
    * piece ascending (prune), and the [[unigramSegment]] order
    * (segmentation). Returns `(piece, count, logp_micro)` with
    * `logp_micro = −cost_micro` under the final counts.
    *
    * Scale — the [[learnBpeMerges]] factoring exactly: the corpus is
    * scanned ONCE into a vocabulary-scale (word, count) relation; the
    * substring seed explodes ≤ len·maxPieceLen pieces per distinct
    * word (capped to the top `seedSize` multi-char pieces + the
    * alphabet); every EM round is one distributed Viterbi flatMap over
    * the word relation (the documented mapPartitions-class escalation,
    * as in [[bpeEncode]]) + one vocab-scale partial-agg, with the
    * current vocab riding the closure (bounded by `seedSize` ≤ 2²⁰ —
    * the markovStationary-style guard; it IS the trained artifact,
    * like the collected BPE merge table). Judged `q_unigram_tok` on
    * the capped two-char syllable corpus (closed-form survivors —
    * the q_bpe_merges recipe); subword sharing, prune tie, char
    * floor and segmentation ties pinned in TextOpsSpec. */
  def learnUnigramVocab(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, emRounds: Int = 2,
      seedSize: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    require(emRounds >= 1, s"emRounds must be >= 1: $emRounds")
    require(seedSize >= 1 && seedSize <= (1 << 20),
      s"seedSize must be in [1, 2^20] (the vocab rides the closure): " +
        s"$seedSize")
    val words = graft.engine.Caches.persisted(
      docs.select(explode(tokens(col(textCol))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].toDF("w", "n"))
    val chars: Seq[String] = words.as[(String, Long)]
      .flatMap { case (w, _) => w.map(_.toString) }
      .distinct().collect().toSeq.sorted
    val mpl = maxPieceLen
    val seedAll = words.as[(String, Long)]
      .flatMap { case (w, n) =>
        for {
          i <- 0 until w.length
          k <- 1 to math.min(mpl, w.length - i)
        } yield (w.substring(i, i + k), n)
      }
      .toDF("p", "c")
      .groupBy(col("p")).agg(sum(col("c")).as("c"))
    val seedMulti = seedAll.filter(length(col("p")) > 1)
      .orderBy(col("c").desc, col("p")).limit(seedSize)
    var vocab: Map[String, Long] = seedAll
      .filter(length(col("p")) === 1).unionByName(seedMulti)
      .as[(String, Long)].collect().toMap
    for (_ <- 1 to emRounds) {
      val costs = unigramCosts(vocab)
      val usage: Map[String, Long] = words.as[(String, Long)]
        .flatMap { case (w, n) =>
          unigramSegment(w, costs, mpl, -1L).map(p => (p, n)) }
        .toDF("p", "c")
        .groupBy(col("p")).agg(sum(col("c")).as("c"))
        .as[(String, Long)].collect().toMap
      val kept = chars.map(c => c -> math.max(usage.getOrElse(c, 0L), 1L))
      val multi = usage.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - chars.size))
      vocab = (kept ++ multi).toMap
    }
    val finalCosts = unigramCosts(vocab)
    vocab.toSeq.sortBy(_._1)
      .map { case (p, c) => (p, c, -finalCosts(p)) }
      .toDF("piece", "count", "logp_micro")
  }

  /** Apply a trained unigram vocabulary to the corpus: per document,
    * whitespace tokens segment by [[unigramSegment]] Viterbi under the
    * vocabulary's micro-quantized costs; characters the vocabulary
    * never saw emit as single-char tokens at a defined penalty cost
    * (`⌊ln T·10⁶ + 0.5⌋ + 10⁶` — a count-below-1 piece, so any in-vocab
    * segmentation wins when one exists). The vocabulary is collected
    * once (config-scale — it IS the trained artifact, the [[bpeEncode]]
    * convention) and broadcast to the typed map over the corpus.
    * Judged `q_unigram_encode` (token counts AND the joined token
    * string are closed-form on the syllable ladder), fully ORACLED;
    * the unknown-char fallback pinned in TextOpsSpec. */
  def unigramEncode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val collected = vocab.select(col("piece"), col("count"))
      .as[(String, Long)].collect()
    require(collected.nonEmpty, "unigramEncode: empty vocabulary")
    val counts = collected.toMap
    require(counts.size == collected.length,
      "unigramEncode: duplicate pieces in the vocabulary")
    val costs = unigramCosts(counts)
    val maxLen = counts.keysIterator.map(_.length).max
    val unk = math.floor(
      math.log(counts.valuesIterator.sum.toDouble) * 1e6 + 0.5).toLong +
      1000000L
    val bcCosts = spark.sparkContext.broadcast(costs)
    docs.select(col(idCol), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ", -1).iterator.filter(_.nonEmpty)
          .flatMap(w => unigramSegment(w, bcCosts.value, maxLen, unk)).toSeq
        (id, toks)
      }
      .toDF(idCol, "tokens")
  }

  /** Per-document unigram-LM cost under a trained vocabulary — the
    * perplexity-style QUALITY SIGNAL the tokenizer family feeds back
    * into curation (a doc whose Viterbi segmentation is expensive per
    * piece is out-of-domain for the vocab — the [[unigramLmScore]]
    * idea at the subword level, and exact-integer judged where that
    * one floats): `cost_micro_sum = Σ cost_micro(piece)` over the
    * [[unigramSegment]] segmentation (unknown chars at the
    * [[unigramEncode]] penalty), `mean_cost_micro = sum div n_pieces`.
    * Same collected-vocab typed-map shape as the encoder. Judged
    * `q_unigram_score` (ladder arithmetic over the capped-trained
    * vocab), fully ORACLED; monotonicity vs an in-vocab doc pinned in
    * TextOpsSpec. */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val collected = vocab.select(col("piece"), col("count"))
      .as[(String, Long)].collect()
    require(collected.nonEmpty, "unigramScore: empty vocabulary")
    val counts = collected.toMap
    val costs = unigramCosts(counts)
    val maxLen = counts.keysIterator.map(_.length).max
    val unk = math.floor(
      math.log(counts.valuesIterator.sum.toDouble) * 1e6 + 0.5).toLong +
      1000000L
    val bcCosts = spark.sparkContext.broadcast(costs)
    docs.select(col(idCol), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val costs = bcCosts.value
        val pieces = text.split(" ", -1).iterator.filter(_.nonEmpty)
          .flatMap(w => unigramSegment(w, costs, maxLen, unk)).toSeq
        val total = pieces.iterator.map(p => costs.getOrElse(p, unk)).sum
        (id, pieces.length.toLong, total,
          if (pieces.isEmpty) -1L else total / pieces.length)
      }
      .toDF(idCol, "n_pieces", "cost_micro_sum", "mean_cost_micro")
      .withColumn("mean_cost_micro",
        when(col("n_pieces") === 0L, lit(null).cast("long"))
          .otherwise(col("mean_cost_micro")))
  }

  /** Fill-in-the-middle training transform (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle" —
    * public): rearrange each document into PSM order —
    * `<PRE>prefix<SUF>suffix<MID>middle` — so a causal LM learns to
    * infill: it sees the surrounding context first and produces the
    * excised middle at the end, where the loss lives. Split positions
    * come from caller-supplied COLUMNS (character offsets — a
    * deterministic policy like fractional offsets or fibHash jitter
    * stays replayable; this operator is the assembly + hygiene step):
    * both clamp into [0, len] and order as s ≤ e (`least`/`greatest` —
    * defined clamping, not an error, so a policy computed on a
    * different column's length can't crash the pipeline). Output
    * carries the three span lengths for budget accounting. Pure
    * scan-stage substring arithmetic — zero shuffle, fully
    * DuckDB-expressible. Judged `q_fim`, fully ORACLED; reassembly
    * identity (prefix+middle+suffix = original), clamping and empty
    * spans pinned in TextOpsSpec. */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      startCol: String, endCol: String,
      preTok: String = "<PRE>", sufTok: String = "<SUF>",
      midTok: String = "<MID>"): DataFrame = {
    val len = length(col(textCol)).cast("long")
    val s0 = greatest(lit(0L), least(col(startCol).cast("long"), len))
    val e0 = greatest(lit(0L), least(col(endCol).cast("long"), len))
    docs.withColumn("__s", least(s0, e0))
      .withColumn("__e", greatest(s0, e0))
      .select(col(idCol),
        concat(lit(preTok),
          expr(s"substring($textCol, 1, cast(__s as int))"),
          lit(sufTok),
          expr(s"""substring($textCol, cast(__e + 1 as int),
            cast(length($textCol) as int))"""),
          lit(midTok),
          expr(s"substring($textCol, cast(__s + 1 as int), " +
            "cast(__e - __s as int))")).as("fim_text"),
        col("__s").as("n_prefix"),
        (col("__e") - col("__s")).as("n_middle"),
        (len - col("__e")).as("n_suffix"))
  }

  /** SFT chat-template assembly with loss-mask spans — the
    * supervised-fine-tuning data-prep step between curation and
    * tokenization: each conversation's turns render as
    * `<|role|>text<|end|>` in sequence order and concatenate into ONE
    * training string, alongside the exact character spans of the
    * ASSISTANT turns' content — the spans a trainer unmasks for loss
    * (everything else is context). Offsets are pure integer arithmetic
    * over rendered lengths (one per-conversation ordered window), so
    * the judged compare is exact; `substring(text, start+1, end−start)`
    * recovers each assistant message verbatim (pinned). Conversations
    * without assistant turns emit an empty span list.
    *
    * Scale: the offset window is the sessionize exchange; assembly is
    * a per-conversation `collect_list` + in-array sort/join — the
    * [[journeys]] escalation (a conversation's turns fit in memory by
    * construction; the HOFs run per CONVERSATION row, not per turn at
    * corpus scale). Judged `q_sft` (spans exploded flat), fully
    * ORACLED; span/substring identity and empty-assistant edge pinned
    * in TextOpsSpec. */
  def sftAssemble(turns: DataFrame, convCol: String, seqCol: String,
      roleCol: String, textCol: String,
      assistantRole: String = "assistant"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convCol)).orderBy(col(seqCol))
      .rowsBetween(Long.MinValue, 0)
    turns
      .withColumn("__r", concat(lit("<|"), col(roleCol), lit("|>"),
        col(textCol), lit("<|end|>")))
      .withColumn("__len", length(col("__r")).cast("long"))
      .withColumn("__off", sum(col("__len")).over(w) - col("__len"))
      .withColumn("__s",
        col("__off") + length(col(roleCol)).cast("long") + 4L)
      .withColumn("__e", col("__s") + length(col(textCol)).cast("long"))
      .groupBy(col(convCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col(seqCol).as("q"),
            col("__r").as("r")))), x => x.getField("r")), "").as("text"),
        sort_array(collect_list(when(col(roleCol) === assistantRole,
          struct(col("__s").as("start"), col("__e").as("end")))))
          .as("assistant_spans"))
  }

  /** Per-assistant-turn SFT EXAMPLE extraction — the other consumer
    * view of [[sftAssemble]]'s rendering (assemble emits one sequence
    * + loss-mask spans for packed training; this emits one
    * (context, target) PAIR per assistant turn — the view preference
    * scorers, rejection samplers and eval harnesses consume): for each
    * assistant turn, `context` = the rendered conversation UP TO AND
    * INCLUDING its `<|assistant|>` header, `target` = the turn's text,
    * `example_idx` = its 0-based position among the conversation's
    * assistant turns. Pure substring arithmetic over the assembled
    * text and its exact spans — `context || target` is a prefix of the
    * full rendering by construction (pinned), so nothing is ever
    * re-tokenized inconsistently between the two views.
    *
    * Scale: [[sftAssemble]]'s economics plus one posexplode —
    * conversations are KB-scale by the same contract. Judged
    * `q_sft_examples` (the q_sft fixture; oracle = the shared
    * assembly CTE + substrings), fully ORACLED; multi-turn contexts,
    * the prefix identity and no-assistant conversations pinned in
    * TextOpsSpec. */
  def sftExamples(turns: DataFrame, convCol: String, seqCol: String,
      roleCol: String, textCol: String,
      assistantRole: String = "assistant"): DataFrame =
    sftAssemble(turns, convCol, seqCol, roleCol, textCol, assistantRole)
      .select(col(convCol), col("text"),
        posexplode(col("assistant_spans")).as(Seq("__i", "__sp")))
      .select(col(convCol), col("__i").cast("long").as("example_idx"),
        expr("substring(text, 1, cast(__sp.start as int))").as("context"),
        expr("""substring(text, cast(__sp.start + 1 as int),
          cast(__sp.end - __sp.start as int))""").as("target"))

  /** SFT chat-template lint — the validation gate in front of
    * [[sftAssemble]] (assemble renders whatever it gets; lint says
    * which conversations are SHAPED like training data): per
    * conversation, does it open with system-or-user, end on an
    * assistant turn, strictly alternate roles among non-system turns
    * starting from user, and carry no blank contents. Reported as
    * counts + one verdict so a pipeline can quarantine by reason
    * (the [[graft.operators.Relational.expectations]] posture applied
    * to dialogue shape). Exact counting/boolean logic — nothing
    * floats.
    *
    * Scale: one conv-partitioned window for adjacency, two partial
    * aggregates; seq must be unique per conversation (the sftAssemble
    * contract). Judged `q_sft_lint` (the q_sft fixture — events-shaped
    * dialogs, mostly invalid by construction, which is the point of a
    * lint), fully ORACLED; the valid hand conversation, each broken
    * invariant isolated, and the system-prefix allowance pinned in
    * TextOpsSpec. */
  def sftLint(turns: DataFrame, convCol: String, seqCol: String,
      roleCol: String, textCol: String,
      assistantRole: String = "assistant", userRole: String = "user",
      systemRole: String = "system"): DataFrame = {
    val all = turns.select(col(convCol).as("conv"),
      col(seqCol).cast("long").as("__q"), col(roleCol).as("__role"),
      col(textCol).as("__t"))
    val fl = all.groupBy(col("conv")).agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("__t").isNull || trim(col("__t")) === "", 1L)
        .otherwise(0L)).as("n_blank"),
      min_by(col("__role"), col("__q")).as("__first"),
      max_by(col("__role"), col("__q")).as("__last"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv")).orderBy(col("__q"))
    val alt = all.filter(col("__role") =!= systemRole)
      .withColumn("__prev", lag(col("__role"), 1).over(w))
      .groupBy(col("conv")).agg(
        sum(when(col("__prev").isNotNull &&
          col("__prev") === col("__role"), 1L).otherwise(0L))
          .as("__same"),
        min_by(col("__role"), col("__q")).as("__fns"))
    fl.join(alt, Seq("conv"), "left")
      .select(col("conv"), col("n_turns"), col("n_blank"),
        coalesce(col("__same"), lit(0L)).as("n_adjacent_same"),
        (col("__first").isin(systemRole, userRole) &&
          col("__last") === assistantRole &&
          coalesce(col("__fns") === userRole, lit(false)) &&
          coalesce(col("__same"), lit(0L)) === 0 &&
          col("n_blank") === 0).as("valid"))
  }

  /** Preference-pair (DPO/RLHF) assembly — the post-training artifact
    * next to [[sftAssemble]]'s SFT sequences (Rafailov et al. 2023 —
    * public): from rated responses `(prompt, response, rating, tie)`,
    * one `(chosen, rejected)` pair per prompt — chosen = the highest-
    * rated response, rejected = the lowest-rated; prompts with no
    * STRICT preference (all responses equally rated, or a single
    * response) are dropped — a pair that doesn't separate teaches
    * nothing. Ties within the max (or min) rating break
    * DETERMINISTICALLY to the smallest `tie` key; the tie key must be
    * unique within each prompt (checked in-plan — the
    * [[graft.tables.VersionedTable.appendWithIdentity]] order-key
    * contract: duplicate keys would make the pair nondeterministic).
    * Compose with [[graft.operators.Sampling.leakFreeSplit]] KEYED ON
    * THE PROMPT so a prompt's pair can never straddle a train/eval
    * boundary (judged that way).
    *
    * Scale: ONE partial aggregate — both extremes ride
    * `max/min(struct(rating, tie, response))` (map-side combine; no
    * window, no self-join), so the shuffle carries one row per prompt
    * however many responses each has. Judged `q_pref_pairs`, fully
    * ORACLED (the oracle replays the same argmax/argmin as window
    * ranks); rating ties, all-tied and single-response drops pinned in
    * TextOpsSpec. */
  def prefPairs(responses: DataFrame, promptCol: String,
      responseCol: String, ratingCol: String,
      tieCol: String): DataFrame = {
    val x = responses.select(col(promptCol).as("prompt_id"),
      col(responseCol).cast("string").as("__resp"),
      col(ratingCol).cast("long").as("__rating"),
      col(tieCol).cast("long").as("__tie"))
    x.groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_responses"),
        countDistinct(col("__tie")).as("__ntie"),
        max(struct(col("__rating").as("r"), (-col("__tie")).as("nt"),
          col("__resp").as("resp"))).as("__c"),
        min(struct(col("__rating").as("r"), col("__tie").as("t"),
          col("__resp").as("resp"))).as("__r"))
      .filter(col("__c.r") > col("__r.r"))
      .select(col("prompt_id"),
        when(col("__ntie") =!= col("n_responses"),
          expr("raise_error('prefPairs: duplicate tie key in a prompt')"))
          .otherwise(col("__c.resp")).as("chosen"),
        col("__r.resp").as("rejected"),
        col("__c.r").as("chosen_rating"),
        col("__r.r").as("rejected_rating"),
        col("n_responses"))
  }

  /** Zipf-law fit over the corpus vocabulary — the distributional
    * health check next to [[oovReport]]'s coverage view: natural text
    * follows `freq ∝ rank^s` with s ≈ −1 in log-log space; a corpus
    * whose fitted slope sits far off (template spam: flat head;
    * boilerplate dedup failure: cliff) or whose r² is low (mixed
    * registers) earns a closer look before training. One aggregated
    * row: top-`topK` tokens by (freq desc, token) — exact integer
    * ranks, the q_keywords sort-key rule — then OLS of ln(freq) on
    * ln(rank) via `regr_slope`/`regr_intercept`/`regr_r2` (the q_trend
    * FP-tolerance precedent: sums over ≤ topK log terms agree across
    * engines well under the harness float tolerance).
    *
    * Scale: token counts partial-aggregate; the top-K cut is
    * TakeOrdered (no full sort), and the regression runs over K rows.
    * Judged `q_zipf`, fully ORACLED; closed-form fits (exact power law
    * → slope recovered, r² = 1) pinned in TextOpsSpec. */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 2 && topK <= 10000, s"topK must be in 2..10000: $topK")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topK)
      .withColumn("rank", row_number().over(w))
      .agg(count(lit(1)).as("k"),
        regr_slope(log(col("n").cast("double")),
          log(col("rank").cast("double"))).as("slope"),
        regr_intercept(log(col("n").cast("double")),
          log(col("rank").cast("double"))).as("intercept"),
        regr_r2(log(col("n").cast("double")),
          log(col("rank").cast("double"))).as("r2"))
  }

  /** Heaps'-law vocabulary growth curve — [[zipfFit]]'s corpus-size
    * sibling (Heaps 1978: V(n) ≈ K·n^β, β ≈ 0.4–0.6 for natural
    * text): at `k` exact equal-count checkpoints along the doc-id
    * order, the cumulative doc count and the EXACT vocabulary size —
    * distinct tokens whose FIRST-occurrence doc id falls at or before
    * the checkpoint threshold. A flattening curve means the corpus
    * stopped bringing new words (template spam, a dedup pass that
    * worked); a linear one screams unbounded noise (random ids,
    * boilerplate hashes). All-integer — the β fit is left to the
    * caller (ln/ln OLS is the zipfFit shape) so the judged frame
    * stays exact.
    *
    * Scale: checkpoints come from [[Relational.equiDepthHistogram]]'s
    * sharded rank (no global window); first-occurrences are one
    * vocabulary-scale min-aggregate; the curve is vocab × k crossed
    * against the k-row broadcast, partial-aggregating to k rows.
    * Judged `q_heaps`, fully ORACLED; monotone growth, full-vocab
    * last point and first-occurrence semantics pinned in
    * TextOpsSpec. */
  def heapsCurve(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in 2..64: $k")
    val W = org.apache.spark.sql.expressions.Window
    val ids = docs.select(col(idCol).as("__id")).distinct()
    val buckets = graft.operators.Relational
      .equiDepthHistogram(ids, col("__id"), Seq(col("__id")), k)
      .select(col("bucket"), col("hi").as("__thr"), col("n_rows"))
    val wC = W.orderBy("bucket")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val cps = broadcast(
      buckets.withColumn("n_docs", sum(col("n_rows")).over(wC))
        .select(col("bucket").cast("int").as("checkpoint"),
          col("__thr"), col("n_docs")))
    val firsts = docs
      .select(col(idCol).as("__id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(min(col("__id")).as("__first"))
    firsts.crossJoin(cps)
      .filter(col("__first") <= col("__thr"))
      .groupBy(col("checkpoint"), col("n_docs"))
      .agg(count(lit(1)).as("vocab"))
      .select(col("checkpoint"), col("n_docs"), col("vocab"))
  }

  /** Lexical-richness census of a token stream — the vocabulary-health
    * readout next to [[heapsCurve]]/[[zipfFit]] (Heaps says how vocab
    * GROWS, Zipf how it DECAYS; this is the one-row state): token and
    * type counts, hapax/dis legomena (freq-1/freq-2 types — the
    * long-tail share every tokenizer-budget decision reads),
    * `ttr_micro = types·10⁶ div tokens`, and Yule's K — the
    * length-invariant repeat-rate characteristic
    * `K_milli = 10⁷·(Σf² − N) div N²` (higher = more repetitive; a
    * pure rational, no ln anywhere). All EXACT integer.
    *
    * Scale: one partial aggregate to per-type frequencies, one 1-row
    * readout; overflow-safe while `Σf²·10⁷ < 2^63` (~30M-row top type
    * — the q_gini DECIMAL rule beyond). Judged `q_lexical` (injected
    * sqrt-bucket vocabulary — the harness corpus has ~24 types, CLAUDE
    * fixture rule), fully ORACLED; hand hapax/Yule values, monoculture
    * and empty fences pinned in TextOpsSpec. */
  def lexicalRichness(toks: DataFrame, tokenCol: String): DataFrame = {
    toks.groupBy(col(tokenCol).as("__t"))
      .agg(count(lit(1)).as("__f"))
      .agg(sum(col("__f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__f") === 1L, 1L).otherwise(0L)).as("hapax_types"),
        sum(when(col("__f") === 2L, 1L).otherwise(0L)).as("dis_types"),
        sum(expr("__f * __f")).as("__s2"))
      .select(
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("n_types"),
        // empty input: the conditional sums come back NULL from the
        // zero-row aggregate — the census reads 0, like n_tokens
        coalesce(col("hapax_types"), lit(0L)).as("hapax_types"),
        coalesce(col("dis_types"), lit(0L)).as("dis_types"),
        when(col("n_tokens") > 0,
          expr("n_types * 1000000 div n_tokens")).as("ttr_micro"),
        when(col("n_types") > 0,
          expr("hapax_types * 1000 div n_types")).as("hapax_milli"),
        when(col("n_tokens") > 0,
          expr("(__s2 - n_tokens) * 10000000 div (n_tokens * n_tokens)"))
          .as("yule_k_milli"))
  }

  /** Flesch/Flesch–Kincaid readability per document — the classic
    * surface-form difficulty scores a curation pipeline bins on
    * (CCNet buckets by perplexity; readability is the zero-model
    * sibling): words = single-space tokens (the [[tokens]] contract),
    * sentences = `[.!?]+` runs (floored at 1 — headlines score as one
    * sentence), syllables = `[aeiouy]+` vowel runs over the lowercased
    * text (the standard heuristic). Runs are counted by the
    * replace-length identity `len(sub(r,'#')) − len(sub(r,''))` so
    * both engines count with plain regexp_replace. The two scores are
    * exact-integer milli readouts (truncating divisions on
    * non-negative operands): `flesch_milli = 206835 − 1015·w div s −
    * 84600·syl div w`, `fk_grade_milli = 390·w div s + 11800·syl div w
    * − 15590`.
    *
    * Scale: pure per-row scan-stage expressions, zero shuffle. Judged
    * `q_readability`, fully ORACLED; hand sentence/syllable counts,
    * the headline floor and the monosyllabic-vs-polysyllabic ordering
    * pinned in TextOpsSpec. */
  def readability(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val txt = col(textCol)
    def runs(src: Column, pattern: String): Column =
      (length(regexp_replace(src, pattern, "#")) -
        length(regexp_replace(src, pattern, ""))).cast("long")
    docs.select(col(idCol).as("doc_id"),
        size(split(txt, " ")).cast("long").as("words"),
        greatest(runs(txt, "[.!?]+"), lit(1L)).as("sentences"),
        runs(lower(txt), "[aeiouy]+").as("syllables"))
      .select(col("doc_id"), col("words"), col("sentences"),
        col("syllables"),
        when(col("words") > 0,
          expr("""206835 - 1015 * words div sentences
            - 84600 * syllables div words""")).as("flesch_milli"),
        when(col("words") > 0,
          expr("""390 * words div sentences
            + 11800 * syllables div words - 15590""")).as("fk_grade_milli"))
  }

  /** PMI collocations — which adjacent token pairs co-occur FAR more
    * than their marginals predict (multiword expressions, templated
    * boilerplate, entity names): over the corpus bigram stream,
    * `pmi_micro = ⌊ln(c_xy·N / (c_x·c_y))·10⁶⌋` with c_x/c_y the
    * LEFT/RIGHT marginals of the bigram table (so the distribution
    * sums to 1 exactly) — integer products cast exact-to-double, ONE
    * ln, micro-floored (the q_mi judged-double idiom). Pairs below
    * `minCount` are dropped (PMI's low-count pathology); rank key is
    * the BIGINT micro value (the q_keywords float-rank rule).
    *
    * Scale: bigrams form per-doc (lead over (doc, pos) — no global
    * window), partial-agg to vocab² cells; marginals are windows over
    * the config-scale cell table. Judged `q_collocations`, fully
    * ORACLED; hand PMI signs (attracted/repelled pairs), the marginal
    * identity and min-count drop pinned in TextOpsSpec. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("__d"),
      posexplode(tokens(col(textCol))).as(Seq("__p", "__w")))
    val big = toks
      .withColumn("__w2",
        lead(col("__w"), 1).over(W.partitionBy("__d").orderBy("__p")))
      .filter(col("__w2").isNotNull)
    val cells = big.groupBy(col("__w").as("w1"), col("__w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val total = broadcast(cells.agg(sum(col("n_pair")).as("n_total")))
    cells
      .withColumn("n_left", sum(col("n_pair")).over(W.partitionBy("w1")))
      .withColumn("n_right", sum(col("n_pair")).over(W.partitionBy("w2")))
      .crossJoin(total)
      .filter(col("n_pair") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_left"),
        col("n_right"),
        expr("""cast(floor(ln(cast(n_pair * n_total as double)
          / cast(n_left * n_right as double)) * 1000000.0) as bigint)""")
          .as("pmi_micro"))
  }
}
