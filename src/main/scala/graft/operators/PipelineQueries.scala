package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** [Q] registry for the training-data pipeline operators (builder brief):
  * text analysis, dedup, similarity search, multimodal metadata — over the
  * documents/embeddings tables. SQL-expressible ops carry DuckDB oracles;
  * signature-based ops (minhash/simhash/fingerprint/lang-id) carry
  * cross-implementation VALUES oracles ([[SignatureVectors]], the p19
  * murmur3 recipe) — and a09's engine-specific HLL++ sketch is gated by a
  * tolerance oracle (its within-3-sigma claim hash-matches DuckDB's
  * literal TRUE; error bound additionally pinned in PipelineOpsSpec).
  */
object PipelineQueries {

  /** PII regex classes, shared verbatim by the t14/t15 engine queries and
    * their DuckDB oracles (interpolated into the SQL below — ONE
    * definition, so the two engines cannot drift). Restricted to syntax
    * Java regex and RE2 interpret identically: character classes, bounded
    * quantifiers, `\b`, optional literals — no lookaround, no
    * backreferences. Replacement order (t15) is email → ipv4 → phone →
    * id-run, most-specific first, identical on both engines.
    */
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiIpv4 =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val PiiPhone = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
  private[graft] val PiiIdRun = "[0-9]{8,}"

  /** t17's Gopher-style stopword list (the eight-word presence check from
    * the Gopher/MassiveText filtering rules), shared by the engine's
    * token filter and the oracle's list literal.
    */
  private[graft] val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** t20's domain blocklist (the UT1/RefinedWeb URL-filtering shape) —
    * ONE list interpolated into both the engine query and its DuckDB
    * oracle (the PackBudget rule). An entry blocks a host when it equals
    * the host or is a whole-label dot-suffix of it (subdomains inherit
    * their parent's block, `notbad.example.net` does NOT match
    * `bad.example.net`).
    */
  private[graft] val DomainBlocklist =
    Seq("host3.example.org", "host17.example.org", "bad.example.net")

  /** t20's match rule as a column expression — ONE definition shared by
    * the batch query and the streaming at-ingest leg
    * ([[graft.streaming.PipelineStreams.blocklistGate]]), the
    * piiRedact/gopherKeep discipline. Returns the minimal blocklist
    * entry that equals the host or is a whole-label dot-suffix of it
    * (`host == e || host.endsWith("." + e)` — the dot keeps
    * notbad.example.net from matching bad.example.net); null = not
    * blocked. Compiled as a STATIC when-chain over the sorted literal
    * list — first match in sorted order IS the minimum — because plain
    * string equals/endsWith stay inside whole-stage codegen, while the
    * earlier suffix-chain array form (transform/filter/array_min
    * higher-order functions, interpreted per row) measured 2.17 s vs
    * 0.5 s at sf0.1. This per-row form is for literal-sized lists; a
    * UT1-scale list (millions of entries) instead explodes the host's
    * bounded dot-suffix chain and LEFT SEMI joins a broadcast blocklist
    * table on the suffix — same whole-label semantics, no per-row scan
    * of the list.
    */
  private[graft] def blockedBy(host: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    DomainBlocklist.sorted.foldRight(
      lit(null).cast(org.apache.spark.sql.types.StringType)) { (dm, rest) =>
      when(host === dm || host.endsWith("." + dm), lit(dm)).otherwise(rest)
    }

  /** The Gopher rule set as an ORDERED (violation_name, pass_condition)
    * list over the nine per-doc counts — the single source of truth for
    * the t17 keep conjunction, the t18 first-failing-rule attribution,
    * and the t19 funnel stage. Every ratio rule is cross-multiplied to
    * an exact integer comparison (the t11 micro-unit discipline applied
    * to predicates): mean word length in [3, 10] ⇔ 3·n_words ≤
    * n_word_chars ≤ 10·n_words; symbol ratio ≤ 1/10; bullet-line
    * fraction ≤ 9/10; ellipsis-line fraction ≤ 3/10; alpha-word
    * fraction ≥ 4/5 — no float ever decides a gate. The order is the
    * attribution order for t18: a doc violating several rules is
    * counted under the FIRST (both engines evaluate the same CASE).
    */
  private[graft] val GopherRules: Seq[(String, String)] = Seq(
    "too_few_words" -> "n_words >= 50",
    "too_many_words" -> "n_words <= 100000",
    "short_words" -> "n_word_chars >= 3 * n_words",
    "long_words" -> "n_word_chars <= 10 * n_words",
    "symbol_heavy" -> "10 * n_sym <= n_words",
    "bullet_heavy" -> "(n_lines = 0 OR 10 * n_bullet <= 9 * n_lines)",
    "ellipsis_heavy" -> "(n_lines = 0 OR 10 * n_ellipsis <= 3 * n_lines)",
    "low_alpha" -> "5 * n_alpha_words >= 4 * n_words",
    "few_stopwords" -> "n_stop >= 2")

  /** t17's keep predicate — ONE SQL string evaluated by BOTH engines
    * (`expr` on the Spark side, interpolated into the DuckDB oracle),
    * derived from [[GopherRules]] so the rule set cannot drift.
    */
  private[graft] val GopherKeepSql: String =
    GopherRules.map(_._2).mkString("(", " AND ", ")")

  /** t18's first-failing-rule label — the same shared-string discipline
    * as [[GopherKeepSql]]: one CASE, both engines.
    */
  private[graft] val GopherReasonSql: String =
    "CASE " +
      GopherRules.map { case (n, r) => s"WHEN NOT $r THEN '$n'" }
        .mkString(" ") + " ELSE 'keep' END"

  /** The nine Gopher per-doc count columns over `text` — shared by
    * t17 (counts + keep), t18 (first-failing-rule histogram), and t19
    * (funnel stage), so the count definitions exist once. All per-row
    * array algebra: shuffle-free, codegen'd, text never leaves the
    * projection.
    */
  /** The DuckDB twin of [[gopherCountCols]]: a `base`/`c` CTE pair
    * computing the nine counts per doc (plus `source`, which t19's
    * funnel groups by; t17/t18 simply don't select it). Interpolated
    * into every Gopher-family oracle so the count SQL exists once.
    * NOTE: this literal is itself s-interpolated, so `\\s` collapses to
    * `\s` HERE; downstream interpolation of this val splices the finished value
    * with no further escape processing (the NOTES s-interpolator trap).
    */
  private val gopherCountsCte: String =
    s"""base AS (
       |  SELECT doc_id, source,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts,
       |    list_filter(list_transform(string_split(text, chr(10)),
       |                               l -> trim(l)),
       |                l -> len(l) > 0) AS ls,
       |    CAST(len(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
       |      AS n_word_chars,
       |    CAST(len(text) - len(regexp_replace(text, '[#…]', '', 'g'))
       |      AS BIGINT) AS n_sym
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |    CAST(len(ts) AS BIGINT) AS n_words, n_word_chars,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ls, l -> starts_with(l, '-')
       |      OR starts_with(l, '*') OR starts_with(l, '•'))) AS BIGINT)
       |      AS n_bullet,
       |    CAST(len(list_filter(ls, l -> ends_with(l, '...')
       |      OR ends_with(l, '…'))) AS BIGINT) AS n_ellipsis,
       |    CAST(len(list_filter(ts, t -> list_contains(
       |      ${GopherStopwords.map(w => s"'$w'").mkString("[", ", ", "]")},
       |      lower(t)))) AS BIGINT) AS n_stop,
       |    CAST(len(list_filter(ts, t -> regexp_matches(t, '[a-zA-Z]')))
       |      AS BIGINT) AS n_alpha_words,
       |    n_sym
       |  FROM base)""".stripMargin

  private[graft] def gopherCountCols(text: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val ts = TextFns.tokens(text)
    val ls = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    Seq(
      size(ts).cast("long").as("n_words"),
      length(regexp_replace(text, "\\s", "")).cast("long")
        .as("n_word_chars"),
      size(ls).cast("long").as("n_lines"),
      size(filter(ls, l => l.startsWith("-") || l.startsWith("*") ||
        l.startsWith("•"))).cast("long").as("n_bullet"),
      size(filter(ls, l => l.endsWith("...") || l.endsWith("…")))
        .cast("long").as("n_ellipsis"),
      size(filter(ts, t => lower(t).isin(GopherStopwords: _*)))
        .cast("long").as("n_stop"),
      size(filter(ts, t => t.rlike("[a-zA-Z]"))).cast("long")
        .as("n_alpha_words"),
      (length(text) -
        length(regexp_replace(text, "[#…]", ""))).cast("long")
        .as("n_sym"))
  }

  /** The nine Gopher count column NAMES, in [[gopherCountCols]] order —
    * the reserved working-column set [[gopherKeep]] adds and drops.
    */
  private[graft] val GopherCountNames: Seq[String] = Seq(
    "n_words", "n_word_chars", "n_lines", "n_bullet", "n_ellipsis",
    "n_stop", "n_alpha_words", "n_sym")

  /** Apply the t17 Gopher gate as a schema-preserving FILTER: compute
    * the nine counts, evaluate [[GopherKeepSql]], keep survivors, drop
    * the working columns. Stateless (select/filter/drop only), so it is
    * equally a batch transform and a streaming at-ingest leg
    * ([[graft.streaming.PipelineStreams.gopherGate]] delegates here —
    * ONE definition, the piiRedact discipline). Input columns named like
    * [[GopherCountNames]] are reserved and would be clobbered.
    */
  private[graft] def gopherKeep(docs: DataFrame, textCol: String): DataFrame =
    gopherKeepCol(docs, textCol, "__gopher_keep")
      .filter(col("__gopher_keep"))
      .drop("__gopher_keep")

  /** The t17 keep bit as a named COLUMN (rather than a filter) — what an
    * observability consumer needs (the streaming funnel counts drops, it
    * doesn't drop rows). Same one-definition discipline: [[gopherKeep]]
    * is now filter-on-this-flag, so the two can never diverge.
    */
  private[graft] def gopherKeepCol(docs: DataFrame, textCol: String,
      flag: String): DataFrame =
    docs.select(col("*") +: gopherCountCols(col(textCol)): _*)
      .withColumn(flag, expr(GopherKeepSql))
      .drop(GopherCountNames: _*)

  /** The t15 redaction chain as a column expression — ONE definition used
    * by the batch query and the streaming at-ingest leg
    * ([[graft.streaming.PipelineStreams.redactPii]]), so the two paths
    * can never redact differently.
    */
  private[graft] def piiRedact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      text,
      PiiEmail, "<EMAIL>"), PiiIpv4, "<IP>"),
      PiiPhone, "<PHONE>"), PiiIdRun, "<ID>")

  /** [[piiRedact]]'s DuckDB twin, shared by the t15 and t16 oracles. */
  private def piiRedactSql(expr: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(regexp_replace($expr, " +
      s"'$PiiEmail', '<EMAIL>', 'g'), '$PiiIpv4', '<IP>', 'g'), " +
      s"'$PiiPhone', '<PHONE>', 'g'), '$PiiIdRun', '<ID>', 'g')"

  /** The t02 keep predicate as oracle SQL over an arbitrary expression —
    * shared by the t02/t07 oracles' hand-written copies' semantics and
    * t16's raw/clean re-score so the gate formula exists once here.
    */
  private def qualityKeepSql(expr: String): String =
    s"(len($expr) >= 20 AND len($expr) <= 100000 AND " +
      s"(len($expr) - len(regexp_replace($expr, '[a-zA-Z]', '', 'g'))) " +
      s"/ greatest(CAST(len($expr) AS DOUBLE), 1.0) > 0.5)"

  /** t13's context-window token budget — ONE value, interpolated into both
    * the engine query and its DuckDB oracle (VERDICT r6 #6: previously a
    * literal 256 hardcoded on each side independently).
    */
  val PackBudget = 256

  /** THE 24-bit md5 sampling draw on an id — the deterministic,
    * layout-independent, oracle-recomputable coin t21/d21/d16s toss
    * (hex chars 1–6 of md5(id-as-string) → [0, 2²⁴)). One definition so
    * a batch rate and a streaming gate applying it can never disagree on
    * which rows a threshold keeps.
    */
  def draw24(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long")

  /** t21's UniMax/mT5 temperature-rate derivation (τ = 0.5, cap 1):
    * per-source keep threshold floor(min(1, √(N/nᵢ)/8)·2²⁴) against
    * [[draw24]]. Returns (source, n_docs, thresh) — source-cardinality
    * rows, the shape a broadcast wants. The capped form's float chain
    * (divide → sqrt → least → ×2²⁴ → floor) never reduces floats across
    * rows, so it is IEEE-identical engine↔oracle (the t21 lesson: a
    * normalized-weights form would need a cross-source float sum whose
    * accumulation order is engine-dependent).
    */
  def temperatureRates(docs: DataFrame, sourceCol: String): DataFrame = {
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_docs")).as("n_total"))))
      .withColumn("thresh",
        floor(least(lit(1.0),
          sqrt(col("n_total").cast("double") / col("n_docs").cast("double"))
            / 8) * 16777216.0).cast("long"))
      .select(col(sourceCol), col("n_docs"), col("thresh"))
  }

  /** t29's C4-style LINE filter (Raffel et al. 2020 §2.2, the famous
    * clean-crawled-corpus line rules): a line keeps only if it has at
    * least [[C4MinLineWords]] words, no curly brace (code markers), no
    * "javascript" / "lorem ipsum" (case-insensitive — cookie banners and
    * template filler), and ends in terminal punctuation (. ! ? ").
    * First-failing-rule attribution in this FIXED cheap-to-expensive
    * order (the t17/t18 gopher discipline); null = keep. ONE column
    * definition feeding the batch stats, the rebuild, and the streaming
    * gate, so verdicts can never drift between paths.
    */
  val C4MinLineWords = 4

  def c4LineReason(line: Column): Column =
    when(size(split(line, "\\s+")) < C4MinLineWords, "short")
      .when(line.contains("{"), "brace")
      .when(lower(line).contains("javascript"), "javascript")
      .when(lower(line).contains("lorem ipsum"), "lorem")
      .when(!line.rlike("[.!?\"]$"), "no_punct")
      .otherwise(lit(null).cast("string"))

  /** t29: per-doc C4 line-filter accounting + the cleaned document —
    * n_lines, n_kept, one count per drop reason, and the doc rebuilt
    * from its kept lines in original order (the d14 rebuild aggregate,
    * filtered in-aggregate — [[DedupOps.lineRebuildWhen]]).
    *
    * Scale shape: line explode + per-line rules are scan-side
    * (digestedLines, the shared line canonicalization); ONE doc-keyed
    * exchange carries each kept line once into the rollup — the d14
    * irreducible cost of materializing a cleaned corpus; the accounting
    * columns ride the same aggregate for free. Docs with no non-blank
    * lines keep a row ((0, 0, …, ""), the d11 left-join convention).
    * The driver's newline-free, punctuation-free text exercises only
    * the no_punct path (every doc = one unpunctuated line — the t14
    * degeneracy note); the structured-text fixture gate carries the
    * real per-rule coverage.
    */
  /** t34: model-scored quality filtering — the FineWeb-Edu / DCLM stage
    * where a trained probe, not a rule list, decides a document's
    * training value. The probe here is a LINEAR scorer over the shared
    * t02 feature struct ([[TextFns.qualityFeatures]]) plus a log-length
    * term — deliberately transparent (the Spark-side plumbing of a
    * classifier gate is identical whatever produces the weights: per-row
    * featurize → dot with broadcast/constant weights → threshold
    * buckets), and deliberately NOT another rule filter: unlike
    * t17/t02's hard gates a scored doc carries a graded value the mix
    * stage can stratify on.
    *
    * Cross-engine exactness is the t-family micro-unit discipline: each
    * weighted term rounds to integer micro-units BEFORE the sum (the
    * weights are engine-constant rationals with small power-of-two
    * denominators, the feature ratios are t02's 6-dp-rounded doubles,
    * and both engines round half away from zero on non-negatives — the
    * one ln term carries the t09/t11 ≤1-ulp caveat). Buckets compare
    * INTEGERS against integer thresholds. Per-row scan-side everywhere;
    * the only exchange is the caller's presentation sort.
    */
  /** THE probe-score expression (integer micro-units) — shared by batch
    * [[eduScore]] and the streaming at-ingest gate
    * ([[graft.streaming.PipelineStreams.eduGate]]), so the two surfaces
    * grade a document identically by construction. */
  private[graft] def eduScoreMicro(text: Column): Column = {
    val q = TextFns.qualityFeatures(text)
    def micro(x: Column, perUnit: Int): Column =
      round(x * perUnit, 0).cast("long")
    micro(q.getField("alpha_ratio"), 4000000) +
      micro(q.getField("space_ratio"), 2000000) -
      micro(q.getField("mean_token_len"), 250000) +
      micro(log(lit(1.0) + q.getField("n_tokens")), 500000)
  }

  def eduScore(docs: DataFrame, idCol: String, textCol: String,
      hiMicro: Long, midMicro: Long): DataFrame =
    docs.select(col(idCol), col("source"),
      eduScoreMicro(col(textCol)).as("score_micro"))
      .withColumn("edu_bucket",
        when(col("score_micro") >= hiMicro, lit("high"))
          .when(col("score_micro") >= midMicro, lit("medium"))
          .otherwise(lit("low")))

  /** DuckDB twin of [[eduScoreMicro]] as a reusable CTE chain producing
    * t(doc_id, source, n_tokens, score_micro) — ONE definition shared by
    * the t34 and t39 oracles so probe scoring cannot drift between the
    * grading and the selection it drives. */
  private val eduScoreCtes: String =
    """f AS (
      |  SELECT doc_id, source,
      |    round((len(text) - len(regexp_replace(text, '[a-zA-Z]', '', 'g')))
      |          / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS alpha_ratio,
      |    round((len(text) - len(replace(text, ' ', '')))
      |          / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS space_ratio,
      |    round(len(replace(text, ' ', ''))
      |          / greatest(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
      |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |            AS DOUBLE), 1.0), 6) AS mean_token_len,
      |    CASE WHEN len(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |      AS n_tokens
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(round(alpha_ratio * 4000000, 0) AS BIGINT)
      |    + CAST(round(space_ratio * 2000000, 0) AS BIGINT)
      |    - CAST(round(mean_token_len * 250000, 0) AS BIGINT)
      |    + CAST(round(ln(1.0 + n_tokens) * 500000, 0) AS BIGINT)
      |      AS score_micro
      |  FROM f)""".stripMargin

  /** THE t06 split assignment (first 4 md5-hex chars of the id, mod 10) —
    * one definition shared by the split query and the t38 leakage audit,
    * so audit and assignment cannot drift. */
  private[graft] def splitBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 4),
      16, 10).cast("int") % 10

  /** t38: cross-split contamination audit — the check a t06-style split
    * needs before anyone trains on it: a duplicated document whose copies
    * hash (by id) into DIFFERENT buckets puts eval text in the training
    * split. Rolls the corpus up per content digest (how many distinct
    * buckets does this content appear in?), then to the bounded datasheet
    * by bucket-span: n_buckets=1 is the clean mass, every row above it is
    * leaked content. Scale shape: text never shuffles (digest + bucket
    * only), both levels partial-aggregate; output ≤ 10 rows.
    */
  private[graft] def splitLeakage(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(splitBucket(col(idCol)).as("bucket"),
        DedupOps.contentDigest(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(countDistinct(col("bucket")).as("n_buckets"),
        count(lit(1)).as("n_docs"))
      .groupBy(col("n_buckets"))
      .agg(count(lit(1)).as("n_digests"), sum(col("n_docs")).as("n_docs"))
      .orderBy(col("n_buckets"))

  /** t39's token budget — ONE value, interpolated into both engines.
    * 10k tokens keeps a strict subset of the driver corpus at every
    * tested sf (27k corpus tokens at sf0.01, ~10× that at sf0.1), so
    * the selection boundary is genuinely exercised. */
  val SelectBudgetTokens = 10000L

  /** t39: token-budget subset selection — the "take the best N tokens"
    * release cut (FineWeb-style): order the corpus by the t34 probe
    * score (rounded-integer key, doc_id tiebreak — no raw double ever
    * decides a row), accumulate token counts along that order, keep
    * docs while the running total stays inside the budget. A doc that
    * would cross the line is dropped, as is everything after it.
    *
    * Scale shape: the global ordered prefix sum is the t13 two-level
    * recipe applied along the SELECTION order instead of doc_id —
    * chunk by score band (monotone in the sort key, so bands are
    * contiguous slices of the order), per-band sums prefix over a
    * band-cardinality offset table (one tiny single-partition window),
    * then a per-band window for the in-band running sum. No
    * whole-corpus single-partition window anywhere; `bandMicro` bounds
    * the hot window at (docs in one score band) rows, the knob to
    * shrink when a probe concentrates scores.
    */
  private[graft] def budgetSelect(docs: DataFrame, budgetTokens: Long,
      bandMicro: Long = 100000L): DataFrame = {
    require(budgetTokens > 0 && bandMicro > 0,
      s"budgetTokens=$budgetTokens bandMicro=$bandMicro")
    val base = docs
      .select(col("doc_id"),
        eduScoreMicro(col("text")).as("score_micro"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      // trunc-vs-floor at negative scores is harmless: chunk only needs
      // to be MONOTONE in (-score) for bands to slice the order
      .withColumn("chunk", expr(s"(- score_micro) div $bandMicro"))
    val wc = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_sum"))
      .withColumn("chunk_before",
        coalesce(sum(col("chunk_sum")).over(wc), lit(0L)))
      .select(col("chunk"), col("chunk_before"))
    val wr = Window.partitionBy(col("chunk"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(offsets, Seq("chunk"))
      .withColumn("cum_tokens",
        col("chunk_before") + sum(col("n_tokens")).over(wr))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("score_micro"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("score_micro").desc, col("doc_id"))
  }

  /** t35: signal-correlation datasheet — per source, the Pearson
    * correlation between the cheap probe score (t34's [[eduScoreMicro]])
    * and the expensive LM cross-entropy (t23's interpolated bigram
    * xent): the DataComp-style analysis that decides whether a cheap
    * signal can stand in for an LM pass at selection time, and the
    * first sanity check on any new quality probe.
    *
    * Exactness: both signals are the integer units their source queries
    * already pin (score micro-units; xent in 1e-4 nats). Every moment
    * accumulates as DECIMAL(38,0) (DuckDB: HUGEINT) — int64 sums of
    * x·y products overflow around 1e5 docs, the a09 ANSI-overflow trap
    * one level up — so n·Σxy − Σx·Σy is EXACT integer arithmetic on both
    * engines; only the final r takes one exact→double cast per operand
    * in a fixed parenthesization (value-nearest on both engines, then
    * identical IEEE ops and correctly-rounded sqrt). Zero-variance
    * sources report NULL, not an IEEE infinity. Docs without bigrams
    * (< 2 tokens) have no xent and drop from the join — the t23
    * convention, documented.
    *
    * Scale shape: two per-doc scans (probe is scan-side; the xent
    * subtree is t23's — at 100 TB both are materialized per-doc
    * artifacts read back as parquet), one doc-keyed join, and a
    * per-source rollup whose partials are six decimals per source.
    */
  def signalCorrelation(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val scores = docs.select(col(idCol), col("source"),
      eduScoreMicro(col(textCol)).as("x"))
    val xents = RelevanceOps.interpolatedBigramXent(docs, idCol, textCol)
      .select(col(idCol), round(col("xent") * 10000, 0).cast("long").as("y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val g = scores.join(xents, Seq(idCol))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val n = dec(col("n_docs"))
    val num = n * col("sxy") - col("sx") * col("sy")
    val d1 = n * col("sxx") - col("sx") * col("sx")
    val d2 = n * col("syy") - col("sy") * col("sy")
    g.select(col("source"), col("n_docs"),
      expr("CAST(sx AS BIGINT) div n_docs").as("mean_score_micro"),
      expr("CAST(sy AS BIGINT) div n_docs").as("mean_xent_e4"),
      when(d1 > 0 && d2 > 0,
        round(num.cast("double") /
          (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))), 6))
        .as("corr"))
  }

  def c4LineStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = DedupOps
      .digestedLines(docs, Seq(idCol), textCol, "\n")
      .withColumn("reason", c4LineReason(col("line")))
    def reasonCount(r: String) =
      count(when(col("reason") === r, 1)).as(s"n_$r")
    val perDoc = lines.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines"),
      count(when(col("reason").isNull, 1)).as("n_kept"),
      reasonCount("short"), reasonCount("brace"),
      reasonCount("javascript"), reasonCount("lorem"),
      reasonCount("no_punct"),
      DedupOps.lineRebuildWhen(col("reason").isNull, "\n").as("clean_text"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_short"), lit(0L)).as("n_short"),
        coalesce(col("n_brace"), lit(0L)).as("n_brace"),
        coalesce(col("n_javascript"), lit(0L)).as("n_javascript"),
        coalesce(col("n_lorem"), lit(0L)).as("n_lorem"),
        coalesce(col("n_no_punct"), lit(0L)).as("n_no_punct"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** t23's Jelinek–Mercer interpolation weight λ = num/den — ONE rational,
    * interpolated into both engines (the PackBudget rule). Den MUST stay a
    * power of two: λ and 1−λ are then exact binary doubles, so the
    * per-row float chain is IEEE-identical engine↔oracle (t21's lesson —
    * an inexact weight would fork in the last bit before the micro-nat
    * round).
    */
  val LmInterpNum = 3
  val LmInterpDen = 4

  /** t24's trigram interpolation weights λ₁ = 1/2, λ₂ = 1/4 (λ₃ = 1−λ₁−λ₂
    * derived, exact) — same exact-binary-rational rule as [[LmInterpNum]].
    */
  val TriL1Num = 1
  val TriL1Den = 2
  val TriL2Num = 1
  val TriL2Den = 4

  /** t37's 4-gram interpolation weights λ₁ = 1/2, λ₂ = 1/4, λ₃ = 1/8
    * (λ₄ = 1−λ₁−λ₂−λ₃ = 1/8 derived, exact) — same exact-binary-rational
    * rule as [[LmInterpNum]]/[[TriL1Num]].
    */
  val QuadL1Num = 1
  val QuadL1Den = 2
  val QuadL2Num = 1
  val QuadL2Den = 4
  val QuadL3Num = 1
  val QuadL3Den = 8

  /** t40's pinned merge-table size: the fixed round count keeps the
    * training loop plan-pinned and the oracle a chain of per-round CTE
    * blocks (the g01 fixed-iteration trade). Deep enough that merges
    * built FROM earlier merges appear (multi-char symbols re-pair), small
    * enough that the oracle's unrolled SQL stays tractable.
    */
  val BpeTrainRounds = 8

  /** t44's deeper cut of the same trainer: enough rounds that the
    * incremental pair-recount's cost story is visible in the bench
    * (per-round work must NOT grow 4× when rounds do — a real tokenizer
    * is thousands of merges), while keeping the unrolled 32-block
    * oracle inside the sf0.01 gate's budget. */
  val BpeTrainRoundsDeep = 32

  /** t42's winnowing parameters: token-3-gram hashes, window 4 — guarantee
    * threshold w + k − 1 = 6 shared tokens, fingerprint density ~2/(w+1).
    * ONE pair of values interpolated into engine and oracle (PackBudget
    * rule).
    */
  val WinnowK = 3
  val WinnowW = 4

  /** d30's copy-pair thresholds: fingerprints carried by more than
    * `WinnowMaxDocsPerFp` docs are template noise and are dropped — the
    * cap is also the structural bound on the fp-keyed pair join
    * (C(cap,2) pairs per fingerprint, the g03 maxSources discipline);
    * pairs survive at ≥ `WinnowMinShared` shared fingerprints. ONE pair
    * of values on both sides (PackBudget rule).
    */
  val WinnowMaxDocsPerFp = 8
  val WinnowMinShared = 2L

  /** t43's chunk geometry: 64-token windows, stride 48 (16-token overlap) —
    * small enough that sf0.01's synthetic docs produce multi-chunk tails,
    * shaped like the 512/384 production cut. ONE pair of values on both
    * sides (PackBudget rule).
    */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** s28's retrieval geometry: 16-bucket hashing-trick embeddings, every
    * 97th doc queries, top-3 chunks. ONE set of values on both sides
    * (PackBudget rule).
    */
  val BowDim = 16
  val ChunkQueryMod = 97
  val ChunkTopK = 3

  /** s37's wider key: the INDEX-WIDTH dial the r13 100× rehearsal
    * showed is what actually controls candidate volume (a fixed 2^dim
    * key space saturates as the corpus grows and collisions go
    * quadratic). 2× BowDim — a different hashed-BoW projection end to
    * end, not a re-keying, so both engines re-derive the whole chain at
    * this width. ONE value on both sides (PackBudget rule).
    */
  val BowDimWide = 32

  /** s38's band count at [[BowDimWide]]: 2 bands of 32/2 = 16 sign
    * bits — the geometry the s36 bits-per-band sweep and the s37 wide
    * recall audit price as the one that SURVIVES corpus growth: a
    * 16-bit band's random-collision term is 2⁻¹⁶ per (query, chunk)
    * pair, vs 2⁻⁴ per 4-bit band, so the candidate volume that made
    * the 4×4-bit geometry unusable at the r13 100× probe (~25% of the
    * corpus per query, NOTES r13) collapses by three orders of
    * magnitude while pigeonhole still spans the Hamming≤1 ball. ONE
    * value on both sides (PackBudget rule).
    */
  val ChunkBandsWide = 2

  /** s34's band count: 4 bands of BowDim/4 = 4 sign bits. By pigeonhole
    * the OR-construction over 4 bands reaches every chunk within Hamming
    * distance 3 of the query's sign pattern — a strict superset of s31's
    * flip-2 ball — at a query-side fan-out of ×4 keyed rows instead of
    * s31's ×137 probe table. ONE value on both sides (PackBudget rule).
    */
  val ChunkBands = 4

  /** s44's serving-dedup policy knob — the verify threshold the
    * canonical-corpus selection uses before indexing (ONE value on both
    * sides, PackBudget rule). Looser than d10's 0.9 dedup gate on
    * purpose: a retrieval release collapses REWORDED near-copies too
    * (the ~0.7-Jaccard re-crawls that drive the structural candidate
    * mass CHUNKDIAL_100x_r17 measured), where the dedup LEDGER's 0.9
    * answers "is this the same document".
    */
  val ServeDedupThreshold = 0.6

  /** d16's exact-Jaccard verify threshold — ONE value interpolated into
    * both the engine call and the DuckDB oracle (the PackBudget rule).
    * Lower than d10's 0.9 dedup gate on purpose: a tuning curve wants to
    * see the borderline pairs each banding config trades away.
    */
  val LshSweepThreshold = 0.5

  /** d16s' deterministic audit-slice fraction and its integer 24-bit
    * threshold — the SAME floor computation `lshTuningCurve` performs
    * internally, precomputed once here so the DuckDB oracle compares the
    * identical integer (the t12/t21 threshold discipline).
    */
  val LshSampleFrac = 0.5
  val LshSampleThresh: Long = math.floor(LshSampleFrac * (1L << 24)).toLong

  /** Sequence packing (context-window construction): assign each doc a
    * (bin, offset) inside its source shard by exclusive prefix-sum of
    * token counts — bin = cum_before DIV budget, offset = cum_before MOD
    * budget. The window partitions BY SOURCE: packing is per-shard (as
    * production packers are), so state per partition is one running sum
    * and shards pack in parallel — no global single-partition window. A
    * doc straddling a boundary starts in its computed bin (greedy
    * fill-then-spill, deterministic given the (source, doc_id) order).
    * Invariants (PackBinsPropertySpec, two budgets): offset ∈ [0,budget),
    * bin ids nondecreasing per source, tokens conserved, and the
    * (bin,offset) pair reconstructs the exclusive prefix sum exactly.
    */
  /** Greedy sequence packing as a TWO-LEVEL prefix sum (r8). The direct
    * form — `sum(n_tokens).over(Window.partitionBy(source).orderBy
    * (doc_id))` — serializes each source through ONE sorted window task,
    * and a training mix routinely has one source holding a double-digit
    * share of the corpus (measured in NOTES r8: the hot source's task
    * carries its entire row count; AQE cannot split a window). Instead:
    *
    *   1. chunk = doc_id DIV chunkSize — contiguous in the doc_id order
    *      the packing is defined over, so per-chunk sums compose;
    *   2. per-(source, chunk) token sums — partial-aggregated, uniform
    *      keys — then the per-source running offset over the SMALL chunk
    *      table (a window over #chunks rows, trivially serial);
    *   3. per-row prefix within the chunk (window over ≤ chunkSize-ish
    *      rows, parallel across chunks) + the chunk's offset.
    *
    * Identical output to the direct form at every (budget, chunkSize) —
    * pinned by PackBinsPropertySpec's conservation invariants and a
    * direct-vs-chunked equality property. Costs one extra scan of the
    * doc stream (the chunk-sum and row sides partial-aggregate BEFORE
    * their exchanges, so ReusedExchange cannot bridge them) — at scale a
    * parallel second scan beats an unsplittable serial window by the hot
    * source's full row count. Chunks are doc_id VALUE ranges, not row
    * ranks: sparse ids make chunks uneven, which only shifts work between
    * parallel tasks, never changes the sum.
    */
  private[graft] def packBins(docs: DataFrame, budget: Int,
      chunkSize: Int = 1 << 20): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    require(chunkSize > 0, s"chunk size must be positive, got $chunkSize")
    val base = docs
      .withColumn("n_tokens", TextFns.tokenCount(col("text")).cast("long"))
      .withColumn("chunk", expr(s"doc_id DIV $chunkSize"))
      .select(col("source"), col("doc_id"), col("chunk"), col("n_tokens"))
    val wc = Window.partitionBy(col("source")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("source"), col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_sum"))
      .withColumn("chunk_before",
        coalesce(sum(col("chunk_sum")).over(wc), lit(0L)))
      .select(col("source"), col("chunk"), col("chunk_before"))
    val wr = Window.partitionBy(col("source"), col("chunk"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(offsets, Seq("source", "chunk"))
      .withColumn("cum_before", col("chunk_before") +
        coalesce(sum(col("n_tokens")).over(wr), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"cum_before DIV $budget").as("bin_id"),
        (col("cum_before") % budget).as("bin_offset"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ----------------------------------------------------
    // Per-doc scoring queries sort the NARROW (doc_id, text) projection
    // first and compute the heavy per-row expressions ABOVE the sort
    // (order-preserving): a global orderBy executes its child twice
    // (range-sampling pass + sort), so scoring below it runs every
    // expression 2× (the f07 lesson, applied across this file).
    "t01_token_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), TextFns.tokenStats(col("text")).as("t"))
        .select(col("doc_id"),
          col("t.n_tokens").as("n_tokens"),
          col("t.n_distinct").as("n_distinct"),
          col("t.n_subwords").as("n_subwords"))),

    // Model-scored quality filtering (the FineWeb-Edu/DCLM stage) with a
    // transparent linear probe over the shared t02 features; integer
    // micro-unit terms, integer bucket thresholds (chosen at the driver
    // corpus's observed terciles so all three buckets arise). See
    // eduScore above.
    "t34_edu_score" -> ((s, d) =>
      eduScore(Tables.documents(s, d), "doc_id", "text",
        hiMicro = 4630000L, midMicro = 4370000L)
        .orderBy(col("doc_id"))),

    // Cross-split contamination audit over a t06 id-hash split. Driver
    // docs are all-unique (the d28 lesson: a naive registration would
    // report one clean row forever), so the registration unions
    // deterministic re-keyed slices — copies whose new ids hash into
    // other buckets, making the leak rows genuinely arise.
    "t38_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def slice(m: Int, off: Long) = docs.filter(col("doc_id") % m === 0)
        .withColumn("doc_id", col("doc_id") + off)
      splitLeakage(
        docs.unionByName(slice(10, 1000000L)).unionByName(slice(100, 2000000L)),
        "doc_id", "text")
    }),

    // Token-budget release cut: best-scored docs until the token budget
    // fills. See [[budgetSelect]] for the two-level ordered prefix sum.
    "t39_budget_select" -> ((s, d) =>
      budgetSelect(Tables.documents(s, d), SelectBudgetTokens)),

    // Per-source probe-vs-LM correlation datasheet — decimal-exact
    // moments, one final fixed-parenthesization double step. See
    // signalCorrelation above.
    "t35_signal_corr" -> ((s, d) =>
      signalCorrelation(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("source"))),

    "t02_quality_features" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), TextFns.qualityFeatures(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"),
          col("q.n_tokens").as("n_tokens"),
          col("q.alpha_ratio").as("alpha_ratio"),
          col("q.space_ratio").as("space_ratio"),
          col("q.mean_token_len").as("mean_token_len"),
          col("q.keep").as("keep"))),

    "t03_source_lang_rollup" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          round(avg(TextFns.tokenCount(col("text"))), 4).as("avg_tokens"))
        .orderBy(col("source"), col("lang"))),

    // Lang-ID heuristic: cross-implementation oracle (independent Python
    // regex scorer over the same corpus → expected per-language counts);
    // real-language markers additionally pinned in TextFnsSpec.
    "t04_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(TextFns.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))),

    // Rolling-hash fingerprint: cross-implementation oracle (independent
    // Python xxHash64 + polynomial fold → per-doc expected values).
    "t05_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below, hash above (see t01)
        .select(col("doc_id"),
          TextFns.rollingFingerprint(col("text")).as("fingerprint"))),

    // Deterministic corpus sampling / split assignment: bucket = first 4
    // md5-hex chars of the key, mod 10 — reproducible across engines, runs
    // and partitionings (unlike rand()-based sample()), shuffle-free, and
    // stable under corpus growth: a doc's split never changes when other
    // docs arrive. The 10% sample keeps bucket 0.
    "t06_hash_split" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", splitBucket(col("doc_id")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("bucket"))),

    // Training-mix construction (stratified source sampling): every doc
    // draws a deterministic 24-bit md5 value (the t06 recipe) and keeps iff
    // it falls under its source's integer threshold — target rate
    // (idx%4 + 1)/4 per source here; production passes the rate table.
    // All-integer compares: exact cross-engine, reproducible across runs
    // and partitionings (a doc's fate never changes as the corpus grows),
    // and per-source kept-token accounting for budget tracking. One
    // source-keyed aggregate with map-side partials — the only shuffle is
    // nSources rows per partition; text never moves.
    // Digitless-source guard (ADVICE r6): regexp_extract yields '' when
    // the source name carries no digits, and CAST('' AS INT) throws under
    // ANSI (Spark) / CAST errors (DuckDB); an int-OVERFLOWING digit run
    // (e.g. a timestamp embedded in the source name) throws the same way.
    // try_cast on BOTH engines pins both cases to NULL → rate index 0
    // (rate 1/4) instead of a crash-vs-answer divergence (review r7).
    "t12_source_mix" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("v",
          conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 6),
            16, 10).cast("long"))
        .withColumn("thresh",
          (coalesce(
            expr("try_cast(regexp_extract(source, '([0-9]+)', 1) AS INT)"),
            lit(0)) % 4 + 1)
            .cast("long") * 4194304L) // rate quarters of 2^24
        .withColumn("keep", col("v") < col("thresh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("keep"), 1)).as("n_kept"),
          coalesce(sum(when(col("keep"),
            TextFns.tokenCount(col("text")).cast("long"))), lit(0L))
            .as("kept_tokens"))
        .orderBy(col("source"))),

    // Temperature-flattened source mixing (the UniMax/mT5 balancing
    // recipe) — unlike t12 the per-source rates are DERIVED from corpus
    // statistics, not given: rate_i = min(1, sqrt(N / n_i) / 8), τ = 0.5
    // flattening up to a global constant — small sources ride toward
    // keep-all, hot sources are downsampled ∝ n^-1/2. Every float step
    // is cross-engine exact: integer counts, ONE double division (same
    // operands → same IEEE double), sqrt (correctly rounded), one
    // multiply by 2^24 and a floor into the integer threshold the
    // shared md5 bucket compares against (the t12 discipline). There is
    // deliberately NO normalized-weights form: normalizing requires a
    // cross-source float SUM whose accumulation order is
    // engine-dependent; the capped form needs no normalization, so no
    // float reduction ever crosses engines.
    // Scale shape: one corpus pass for the per-source counts (tiny
    // rollup with map-side partials), the total via a 1-row aggregate
    // broadcast-crossed onto the ≤#sources-row rate table (no global
    // window anywhere), a broadcast join back, and a per-row keep.
    "t21_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("v", draw24(col("doc_id")))
      val rates = temperatureRates(docs, "source")
      docs.join(broadcast(rates), Seq("source"))
        .withColumn("keep", col("v") < col("thresh"))
        .groupBy(col("source"))
        .agg(first(col("n_docs")).as("n_docs"),
          first(col("thresh")).as("thresh"),
          count(when(col("keep"), 1)).as("n_kept"),
          coalesce(sum(when(col("keep"),
            TextFns.tokenCount(col("text")).cast("long"))), lit(0L))
            .as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // Sequence packing: see [[packBins]]. The registry pins budget 256;
    // PackBinsPropertySpec holds the packing invariants at TWO budgets so
    // a budget change can't silently skew the layout.
    "t13_pack_bins" -> ((s, d) =>
      packBins(Tables.documents(s, d), PackBudget)
        .orderBy(col("source"), col("doc_id"))),

    // PII counts per class (emails / IPv4 / phones / 8+-digit id runs)
    // over the raw text — the audit signal a redaction rollout is sized
    // from. Built-in regexp_count (codegen'd, literal pattern compiled
    // once) — a custom one-pass expression buys nothing over the builtin
    // here, unlike t01 where it replaced two split machines + an array
    // alloc. Driver-synthetic text has no digits (counts are legitimately
    // zero there); non-degenerate counts are pinned by the
    // structured-text fixture gate + StructuredTextParitySpec.
    "t14_pii_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below, regex above (see t01)
        .select(col("doc_id"),
          regexp_count(col("text"), lit(PiiEmail)).as("n_emails"),
          regexp_count(col("text"), lit(PiiIpv4)).as("n_ipv4"),
          regexp_count(col("text"), lit(PiiPhone)).as("n_phones"),
          regexp_count(col("text"), lit(PiiIdRun)).as("n_id_runs"))),

    // Composed redact → re-score pass: does redaction flip a doc's t02
    // quality gate? (Replacing a long digit id with "<ID>" adds alpha
    // chars and shortens the doc — both gate inputs.) The production
    // ordering question this answers: gate before or after redaction.
    // Per-row, shuffle-free above the narrow sort.
    "t16_redact_rescore" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below, regex above (see t01)
        .select(col("doc_id"),
          TextFns.qualityFeatures(col("text")).getField("keep")
            .as("keep_raw"),
          TextFns.qualityFeatures(piiRedact(col("text"))).getField("keep")
            .as("keep_clean"))
        .withColumn("flipped", col("keep_raw") =!= col("keep_clean"))),

    // PII redaction — the transform t14 audits for: sequential
    // class-tagged replacement (email → ipv4 → phone → id-run,
    // most-specific first so an IP is never half-eaten as a phone). The
    // redacted TEXT itself is oracled, not just counts: regexp_replace
    // parity is the load-bearing claim. Per-row, shuffle-free above the
    // narrow sort.
    "t15_pii_redact" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below, regex above (see t01)
        .select(col("doc_id"),
          length(col("text")).as("n_chars_raw"),
          piiRedact(col("text")).as("clean_text"))
        .withColumn("n_chars_clean", length(col("clean_text")))),

    // Gopher/MassiveText-style rule filter: nine per-doc structural
    // counts (words, word chars, lines, bullet/ellipsis lines, stop and
    // alpha words, #/… symbols) plus the conjunction keep bit. All
    // per-row array algebra, shuffle-free; the gate is GopherKeepSql —
    // the SAME string `expr`'d here and interpolated into the oracle —
    // and every rule compares integers, so no float rounds a verdict.
    // Counts that scale with characters are long: 10·n_sym must not
    // overflow int under ANSI on a 100 MB document.
    "t17_gopher_rules" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below the wide scans (t01)
        .select(col("doc_id") +: gopherCountCols(col("text")): _*)
        .withColumn("keep", expr(GopherKeepSql))),

    // First-failing-rule drop histogram over the same nine counts — the
    // observability twin of t17 (which rule is actually killing docs in
    // THIS corpus decides which threshold to tune first). Attribution
    // order is GopherRules order via GopherReasonSql — the identical
    // CASE string on both engines. Per-row scalars into a ≤10-key
    // groupBy with map-side partials: the only shuffle is the tiny
    // (reason, partial_count) exchange.
    "t18_gopher_reasons" -> ((s, d) =>
      Tables.documents(s, d)
        .select(gopherCountCols(col("text")): _*)
        .select(expr(GopherReasonSql).as("reason"))
        .groupBy(col("reason")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("reason"))),

    // The curation FUNNEL a corpus report leads with: per source, how
    // many docs survive each successive stage — raw → t02 quality gate →
    // t17 Gopher rules → corpus-wide exact-dup collapse (min-id
    // canonical among full survivors, attributed to the canonical's
    // source). Same scale shape as t07: every flag is a per-row scalar,
    // the dedup stage is a partial-aggregated min-struct rollup keyed on
    // digest (no window, no doc-stream join-back — the measured NOTES r8
    // result), and the final join glues two source-cardinality
    // aggregates. Text never shuffles.
    "t19_filter_funnel" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("keep_q",
          TextFns.qualityFeatures(col("text")).getField("keep"))
        .withColumn("digest", DedupOps.contentDigest(col("text")))
        .select(Seq(col("doc_id"), col("source"), col("keep_q"),
          col("digest")) ++ gopherCountCols(col("text")): _*)
        .withColumn("keep_g", expr(GopherKeepSql))
      // ONE corpus pass, ONE tree (the r7 s14/probeTopK lesson: a
      // funnel branch and a canonical branch over the same base get
      // pruned into DIFFERENT subtrees, ReusedExchange can't bridge
      // them, and the corpus scans twice — measured here before this
      // shape). Partial min/count collapse each partition to one row
      // per (digest, source), so a hot digest costs O(partitions) —
      // the t07 rollup discipline. The canonical marker is a window
      // over the ALREADY-COLLAPSED table: a digest holds at most
      // #sources rows there, so the digest-keyed window that was this
      // round's de-skew target is skew-free at this level.
      val lvl1 = base.groupBy(col("digest"), col("source"))
        .agg(count(lit(1)).as("n"),
          count(when(col("keep_q"), 1)).as("nq"),
          count(when(col("keep_q") && col("keep_g"), 1)).as("ng"),
          // min over (doc_id, source): doc_id leads, so this IS the
          // min-id canonical survivor with its source along for free
          min(when(col("keep_q") && col("keep_g"),
            struct(col("doc_id"), col("source")))).as("surv"))
      val perDigestMin = org.apache.spark.sql.expressions.Window
        .partitionBy(col("digest"))
      lvl1
        .withColumn("c", min(col("surv")).over(perDigestMin))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_raw"),
          sum(col("nq")).as("n_quality"),
          sum(col("ng")).as("n_gopher"),
          // doc_id is unique, so surv == c exactly on the one row whose
          // source holds the digest's canonical survivor (null-excluded)
          count(when(col("surv") === col("c"), 1)).as("n_canonical"))
        .orderBy(col("source"))
    }),

    // The corpus DATA CARD (datasheets-for-datasets): per source, the
    // numbers a release documents — docs, tokens, quality/gopher keep
    // counts (funnel order), PII incidence, exact-dup fraction, and
    // language count — in the t19 one-tree discipline: every flag is a
    // per-row scalar over ONE corpus pass, the digest collapse is the
    // two-level (source, digest) rollup (hot digest costs
    // O(partitions)), and languages ride as per-(source,digest)
    // collect_sets (bounded by lang cardinality) flattened at the
    // source level — no second corpus scan for countDistinct. Every
    // predicate is a SHARED definition (t02 keep, GopherKeepSql, the
    // four PII patterns, contentDigest, t12 tokenization), so the card
    // can never disagree with the gates it summarizes.
    "t27_data_card" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("keep_q",
          TextFns.qualityFeatures(col("text")).getField("keep"))
        .withColumn("digest", DedupOps.contentDigest(col("text")))
        .withColumn("n_toks", TextFns.tokenCount(col("text")).cast("long"))
        .withColumn("has_pii",
          regexp_count(col("text"), lit(PiiEmail)) +
            regexp_count(col("text"), lit(PiiIpv4)) +
            regexp_count(col("text"), lit(PiiPhone)) +
            regexp_count(col("text"), lit(PiiIdRun)) > 0)
        .select(Seq(col("doc_id"), col("source"), col("lang"),
          col("keep_q"), col("digest"), col("n_toks"), col("has_pii")) ++
          gopherCountCols(col("text")): _*)
        .withColumn("keep_g", expr(GopherKeepSql))
      val lvl1 = base.groupBy(col("source"), col("digest"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_toks")).as("toks"),
          count(when(col("keep_q"), 1)).as("nq"),
          count(when(col("keep_q") && col("keep_g"), 1)).as("ng"),
          count(when(col("has_pii"), 1)).as("npii"),
          collect_set(col("lang")).as("langs"))
      lvl1.groupBy(col("source"))
        .agg(sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_distinct"),
          sum(col("toks")).as("n_tokens"),
          sum(col("nq")).as("n_quality_keep"),
          sum(col("ng")).as("n_gopher_keep"),
          sum(col("npii")).as("n_pii_docs"),
          size(array_distinct(flatten(collect_list(col("langs")))))
            .cast("long").as("n_langs"))
        .withColumn("dup_frac", round(
          lit(1.0) - col("n_distinct") / col("n_docs").cast("double"), 6))
        .orderBy(col("source"))
    }),

    // UT1-style domain blocklist filtering (the CCNet/RefinedWeb URL
    // gate): a host is blocked when any whole-label dot-suffix of it is
    // a blocklist entry — subdomains inherit their parent domain's
    // block. Per-row shape: the host's suffix chain is a bounded array
    // (≤ label count), the blocklist a LITERAL array, and the match a
    // per-row array scan — zero shuffle until the low-cardinality
    // rollup, so the corpus never moves. For a UT1-scale list (millions
    // of domains) the same semantics become: explode the suffix chain
    // and LEFT SEMI join a broadcast blocklist table on the suffix —
    // still one bounded explode, no LIKE scan over the list. Hosts are
    // synthesized sub{0..2}.host{0..19}.example.org so the subdomain
    // inheritance path is actually exercised (blocking
    // host3.example.org must catch sub*.host3.example.org).
    "t20_domain_blocklist" -> ((s, d) =>
      Tables.events(s, d)
        .select(concat(lit("sub"), col("user_id") % 3, lit(".host"),
          col("user_id") % 20, lit(".example.org")).as("host"))
        .withColumn("blocked_by", blockedBy(col("host")))
        .groupBy(col("host"), col("blocked_by"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("host"), col("blocked_by"))),

    // The composed cleaning pass a training corpus actually runs: quality
    // gate (t02's keep flag) → exact-dup collapse among survivors (md5,
    // min-id canonical) → per-(lang, source) accounting of every drop
    // reason. NO doc-volume shuffle anywhere (r8): the canonical survivor
    // per digest is a partial-aggregated min STRUCT carrying its (lang,
    // source) with it — not a window (one un-splittable task per hot
    // digest) and not a min-table join back onto the doc stream (every
    // doc row re-shuffled by the skewed digest; below AQE's 256 MB skew
    // threshold the hot key still lands one join task — measured in
    // NOTES.md, round 8). Kept counts roll up from the collapsed
    // canonical table; dup-rejects are the per-group remainder, since
    // every quality-surviving doc is either canonical or a dup. Text
    // never moves: exchanges carry (digest, id, lang, source) and
    // low-cardinality group rows only.
    "t07_clean_corpus" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("keep_q",
          TextFns.qualityFeatures(col("text")).getField("keep"))
        .withColumn("digest", DedupOps.contentDigest(col("text")))
        .select(col("doc_id"), col("lang"), col("source"),
          col("keep_q"), col("digest"))
      // min over (doc_id, lang, source): doc_id leads, so this IS the
      // min-id canonical survivor, with its group columns along for free
      val keptPerGroup = base.groupBy(col("digest"))
        .agg(min(when(col("keep_q"),
          struct(col("doc_id"), col("lang"), col("source")))).as("c"))
        .filter(col("c").isNotNull)
        .groupBy(col("c").getField("lang").as("lang"),
          col("c").getField("source").as("source"))
        .agg(count(lit(1)).as("n_kept"))
      base
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(!col("keep_q"), 1)).as("n_quality_rejected"))
        .join(keptPerGroup, Seq("lang", "source"), "left")
        .select(col("lang"), col("source"), col("n_docs"),
          col("n_quality_rejected"),
          (col("n_docs") - col("n_quality_rejected") -
            coalesce(col("n_kept"), lit(0L))).as("n_dup_rejected"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("lang"), col("source"))
    }),

    // Gopher-style intra-document repetition signals: duplicate-token
    // fraction, most-frequent-token fraction, duplicate-2-gram fraction —
    // the standard "repetitive junk" quality gates for a training corpus.
    // Everything is per-row array algebra (the top-token count is the max
    // run length in the SORTED token array, a single fold) — no explode,
    // no shuffle: at 100 TB each doc scores where it lives.
    "t08_repetition" -> ((s, d) =>
      // narrow sort FIRST, signal projection above it (order-preserving):
      // a global orderBy executes its child twice (range-sampling pass +
      // sort), so the per-row scoring must sit above the sort, not below
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), TextFns.repetitionSignals(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.dup_token_frac").as("dup_token_frac"),
          col("r.top_token_frac").as("top_token_frac"),
          col("r.dup_2gram_frac").as("dup_2gram_frac"))),

    // BM25 top-k corpus slicing: corpus stats (N, avgdl, per-term df) are
    // one broadcast scalar row; per-doc term frequencies are per-row array
    // algebra (no explode); the top-k is TakeOrderedAndProject (per-
    // partition heaps, no global sort shuffle). The oracle recomputes the
    // identical formula in the identical association order.
    "t09_bm25_topk" -> ((s, d) =>
      RelevanceOps.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        Seq("spark", "join", "window"), 20)),

    // Vocabulary/coverage table (tokenizer-training stats): vocab-sized
    // term-count shuffle with map-side combine; the unpartitioned ranking
    // window runs over at most topN rows (cut by TakeOrderedAndProject
    // first), never the corpus.
    // One BPE merge round's pair table over the distinct-word vocab —
    // the tokenizer-training inner loop. Two-level rollup so the char
    // explode runs over vocab, not corpus tokens: RelevanceOps.bpePairStats.
    "t28_bpe_pairs" -> ((s, d) =>
      RelevanceOps.bpePairStats(Tables.documents(s, d), "text", 50)
        .orderBy(desc("pair_count"), col("c1"), col("c2"))),

    // The merge-application half of t28: each top-5 candidate merge
    // applied independently over the DISTINCT-word vocab, priced by the
    // corpus token count it saves. See RelevanceOps.bpeApplyRound for
    // the replace-semantics argument and the vocab-reuse plan shape.
    "t30_bpe_apply" -> ((s, d) =>
      RelevanceOps.bpeApplyRound(Tables.documents(s, d), "text", 5)
        .orderBy(col("rank"))),

    // The full iterated BPE training loop at the pinned round count:
    // sequential merges, each recounted over the merged vocab — the
    // merge table t28/t30 only approximate from round one. See
    // RelevanceOps.bpeTrain for the fold/greedy-scan equivalence.
    "t40_bpe_train" -> ((s, d) =>
      RelevanceOps.bpeTrain(Tables.documents(s, d), "text",
        BpeTrainRounds)),

    // The same trainer 4× deeper — the t44/t40 bench ratio IS the
    // incremental recount's cost pin: per-round work must stay flat as
    // rounds grow (only affected words recount; the full vocab pair
    // explode runs once at setup). See RelevanceOps.bpeTrain.
    "t44_bpe_train_deep" -> ((s, d) =>
      RelevanceOps.bpeTrain(Tables.documents(s, d), "text",
        BpeTrainRoundsDeep)),

    // The train/apply SPLIT a production tokenizer lives by: merges
    // train on the doc_id % 2 == 0 slice and tokenize the HELD-OUT
    // slice (unseen words), applied in rank order by the SAME
    // greedyMerge fold the trainer used. See
    // RelevanceOps.bpeTokenCountsHeldOut.
    "t45_bpe_apply_heldout" -> ((s, d) =>
      RelevanceOps.bpeTokenCountsHeldOut(Tables.documents(s, d),
        "doc_id", "text", BpeTrainRounds, trainMod = 2)
        .orderBy(col("doc_id"))),

    // The apply path at the TRAINER's depth: t45's unrolled fold dies
    // long before a real 32k-merge vocabulary (linear expression
    // growth), so merges apply in blocks of 8 — fold a block into one
    // vocab projection, pin, repeat (the trainer's own loop
    // discipline). 32 trained rounds, identical semantics to the
    // unrolled fold (spec-pinned). See
    // RelevanceOps.bpeTokenCountsHeldOutBlocked.
    "t46_bpe_apply_blocked" -> ((s, d) =>
      RelevanceOps.bpeTokenCountsHeldOutBlocked(Tables.documents(s, d),
        "doc_id", "text", BpeTrainRoundsDeep, trainMod = 2, blockSize = 8)
        .orderBy(col("doc_id"))),

    // Corpus tokenization under t40's trained merge table — per-doc
    // word/char/BPE-token counts through one word-keyed vocab join.
    // See RelevanceOps.bpeTokenCounts for the vocab-level pricing shape.
    "t41_bpe_tokenize" -> ((s, d) =>
      RelevanceOps.bpeTokenCounts(Tables.documents(s, d), "doc_id",
        "text", BpeTrainRounds)
        .orderBy(col("doc_id"))),

    // MOSS winnowing fingerprints: position-anchored sub-document sketch
    // with the shared-run guarantee (any ≥ WinnowW+WinnowK−1-token copy
    // shares a fingerprint). Zero shuffle before the output sort — the
    // staged gram-hash projection keeps the selection at O(m) md5 +
    // O(m·w) probes per doc (DedupOps.winnowFps), and only the
    // ~2/(w+1)-density selections become rows.
    // explode_OUTER + post-generate null filter, NOT explode: a plain
    // explode makes InferFiltersFromGenerate infer `size(sel) > 0`,
    // which pushes below the staged projections with the WHOLE winnow
    // expression inlined — the O(m²·w) blow-up per row the staging
    // exists to prevent (measured 169 s → 4.6 s at sf0.01).
    "t42_winnowing" -> ((s, d) =>
      DedupOps.winnowFps(Tables.documents(s, d), "doc_id", "text",
        WinnowK, WinnowW)
        .select(col("doc_id"), explode_outer(col("sel")).as("s"))
        .filter(col("s").isNotNull)
        .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
        .orderBy(col("doc_id"), col("pos"))),

    // MOSS copy-pair detection over the t42 fingerprints: distinct fps
    // per doc (per-row), hot-fp cap (boilerplate + the C(cap,2) pair
    // bound), fp-keyed pair join, shared-count threshold. Position-
    // anchored substring evidence — complements d09/d10's whole-doc
    // MinHash. See DedupOps.winnowPairs.
    "d30_winnow_pairs" -> ((s, d) =>
      DedupOps.winnowPairs(Tables.documents(s, d), "doc_id", "text",
        WinnowK, WinnowW, WinnowMinShared, WinnowMaxDocsPerFp)
        .orderBy(col("id_a"), col("id_b"))),

    // The matched-region report over d30's pairs (the MOSS match display
    // as data): per pair and side, the union of k-token intervals
    // anchored at shared fingerprints — how much of each doc the copy
    // evidence covers and in how many contiguous spans. Token
    // coordinates only; text never moves. See DedupOps.winnowMatchSpans.
    "d31_winnow_match_spans" -> ((s, d) =>
      DedupOps.winnowMatchSpans(Tables.documents(s, d), "doc_id", "text",
        WinnowK, WinnowW, WinnowMinShared, WinnowMaxDocsPerFp)
        .orderBy(col("id_a"), col("id_b"))),

    // The matched slices with STRINGS — d31's spans joined back to source
    // text (one id-keyed join of evidence-sized span rows onto per-doc
    // token arrays), one row per (pair, side, contiguous span): what a
    // human adjudicating a copy pair reads. Slice token counts equal
    // d31's matched_tokens per pair side (spec-pinned). See
    // DedupOps.winnowMatchSlices.
    "d32_winnow_match_slices" -> ((s, d) =>
      DedupOps.winnowMatchSlices(Tables.documents(s, d), "doc_id", "text",
        WinnowK, WinnowW, WinnowMinShared, WinnowMaxDocsPerFp)
        .orderBy(col("id_a"), col("id_b"), col("side"), col("span_idx"))),

    // Token-window chunking with stride — the context-prep cut feeding an
    // embedder/encoder (t13 packs many short docs into one window; this
    // cuts one long doc into many). Pure per-row transform, zero shuffle.
    // tokens staged as their own projection (the lambda otherwise
    // re-splits the text per chunk) and explode_OUTER + null filter
    // (InferFiltersFromGenerate would inline the chunk build into a
    // pushed-down size() filter — the t42 lesson).
    "t43_chunk_windows" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode_outer(TextFns.chunkWindowsOver(col("toks"),
            ChunkTokens, ChunkStride)).as("c"))
        .filter(col("c").isNotNull)
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.start_pos").as("start_pos"), col("c.n_tokens").as("n_tokens"),
          col("c.chunk_text").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Chunk-level retrieval: the t43 chunk cut + hashing-trick embedding
    // + brute-force cosine top-k — the full RAG "index and query"
    // composition as one oracled query. Corpus never shuffles (chunk +
    // embed are per-row); queries broadcast; integer-exact vectors make
    // the cosine the same IEEE double in both engines. See
    // SimilarityOps.chunkRetrieval.
    "s28_chunk_retrieval" -> ((s, d) =>
      SimilarityOps.chunkRetrieval(Tables.documents(s, d), "doc_id", "text",
        ChunkTokens, ChunkStride, BowDim, ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"), col("rank"))),

    // The s28 scale path audited: sign-pattern LSH buckets (chunk and
    // query key on the sign bits of their hashed vector — at 100 TB the
    // all-pairs cross becomes an equi-join and the query side stops
    // broadcasting), with per-query candidate counts and exact-top-k
    // milli-recall. All-integer outputs. See
    // SimilarityOps.chunkRetrievalLshRecall.
    "s29_chunk_lsh_recall" -> ((s, d) =>
      SimilarityOps.chunkRetrievalLshRecall(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkQueryMod,
        ChunkTopK)
        .orderBy(col("query_id"))),

    // Multi-probe for the sign-bucket scheme: each query also probes its
    // dim single-bit-flip neighbor buckets; ONE pass reports both probe
    // budgets as columns (probes=1 ≡ s29, spec-pinned). See
    // SimilarityOps.chunkMultiProbeRecall.
    "s30_chunk_multiprobe" -> ((s, d) =>
      SimilarityOps.chunkMultiProbeRecall(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkQueryMod,
        ChunkTopK)
        .orderBy(col("query_id"))),

    // The index path EXECUTED: sign-bucket candidates exactly re-ranked,
    // s28's cross never runs — the plan one deploys at 100 TB, with
    // s29–s31 as its sampled recall audit. Bucket-miss queries emit no
    // rows (the honest index answer). See SimilarityOps.chunkRetrievalLshTopK.
    "s32_chunk_retrieval_lsh" -> ((s, d) =>
      SimilarityOps.chunkRetrievalLshTopK(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkQueryMod,
        ChunkTopK)
        .orderBy(col("query_id"), col("rank"))),

    // The probe dial EXECUTED: s32 at s30's probe budget (own bucket +
    // dim bit-flip neighbors) — the knob turned when the recall audit
    // says exact-bucket is too thin; still an equi-join, never a cross.
    // See SimilarityOps.chunkMultiProbeTopK.
    "s33_chunk_multiprobe_topk" -> ((s, d) =>
      SimilarityOps.chunkMultiProbeTopK(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkQueryMod,
        ChunkTopK)
        .orderBy(col("query_id"), col("rank"))),

    // The flip-2 rung of the multi-probe dial: s30 extended to the
    // C(dim,2) two-bit-flip neighbor buckets, ONE pass reporting all
    // three probe budgets as nested columns (probes=1 ≡ s29 and
    // 1+dim ≡ s30, spec-pinned). See SimilarityOps.chunkMultiProbe2Recall.
    "s31_chunk_multiprobe2" -> ((s, d) =>
      SimilarityOps.chunkMultiProbe2Recall(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkQueryMod,
        ChunkTopK)
        .orderBy(col("query_id"))),

    // The banded OR-construction for chunk retrieval: 4 independent
    // 4-bit sign bands, candidate on ANY whole-band agreement — reaches
    // the whole Hamming<=3 ball by pigeonhole (superset of s31's flip-2
    // set, so recall dominates rung for rung, spec-pinned) at x4
    // query-side fan-out instead of the x137 probe table. Corpus side is
    // the pre-materialized band index artifact. See
    // SimilarityOps.chunkBandRecall.
    "s34_chunk_band_recall" -> ((s, d) =>
      SimilarityOps.chunkBandRecall(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkBands,
        ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"))),

    // The index-WIDTH dial: the s29 recall audit re-run at a 32-bit
    // sign key (a 2x-wider hashed-BoW embedding, re-derived end to
    // end) — the knob that controls bucket saturation as the corpus
    // grows (the r13 100x lesson: at a fixed width, candidate volume
    // goes quadratic in corpus scale once the key space saturates).
    // See SimilarityOps.chunkRetrievalLshRecall.
    "s37_chunk_lsh_recall_wide" -> ((s, d) =>
      SimilarityOps.chunkRetrievalLshRecall(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDimWide,
        ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"))),

    // The bits-per-band dial priced from ONE pass (the d16/s31 sweep
    // discipline): 4x4-bit vs 2x8-bit band geometries as per-query
    // column pairs; coarse bands align on fine boundaries so the
    // coarse candidate set NESTS inside the fine one — recall and
    // candidate volume both monotone in band width, the trade a
    // deployment prices when sizing its index. Fine columns are
    // spec-pinned bit-equal to s34. See SimilarityOps.chunkBandSweep.
    "s36_chunk_band_sweep" -> ((s, d) =>
      SimilarityOps.chunkBandSweep(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkBands,
        ChunkBands / 2, ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"))),

    // The banded index EXECUTED: candidates from the int-only band
    // index's (band, key) equi-join, vectors fetched by ONE id-keyed
    // evidence-sized join for the exact rerank — the retrieval plan the
    // s34 audit prices. Candidates contain s33's flip-1 set
    // (pigeonhole), so per-rank sims dominate s33's (spec-pinned). See
    // SimilarityOps.chunkBandTopK.
    "s35_chunk_band_topk" -> ((s, d) =>
      SimilarityOps.chunkBandTopK(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDim, ChunkBands,
        ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"), col("rank"))),

    // The banded index executed at the SCALE-TRUE geometry: s35's
    // retrieval plan re-run at the wide signature (BowDimWide=32, 2
    // bands of 16 bits) — the parameterization whose per-band random-
    // collision mass is 2^-16, i.e. the one the r13 100x probe said a
    // production corpus can actually run (the 4x4-bit form's ~25%-of-
    // corpus candidate sets are the fixture-scale toy; NOTES r13).
    // Same plan, same shared core, different dial setting — both
    // engines re-derive the whole hashed-BoW chain at the wide
    // projection. See SimilarityOps.chunkBandTopK.
    "s38_chunk_band_topk_wide" -> ((s, d) =>
      SimilarityOps.chunkBandTopK(Tables.documents(s, d),
        "doc_id", "text", ChunkTokens, ChunkStride, BowDimWide,
        ChunkBandsWide, ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"), col("rank"))),

    // s38 served from the DEDUPED release — the serving pattern
    // CHUNKDIAL_100x_r17 priced out: at a dup-dense corpus the banded
    // candidate mass is STRUCTURAL (near-dup copies agree on whole
    // bands at any width — 2×24-bit bands read MORE candidates than
    // 2×16, 59.9k vs 53.3k mean/arrival at 100×), so the dial that
    // actually cuts it is indexing only the canonical member of every
    // near-dup cluster (the d10 machinery at the [[DedupThreshold]]
    // policy knob; 11× on the at-ingest b1200 ceiling,
    // INGEST_100x_r17). Same retrieval operator, same wide dial —
    // only the corpus the index serves changes.
    "s44_chunk_band_topk_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = DedupOps.minhashVerified(docs, "doc_id", "text",
          threshold = ServeDedupThreshold)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val canon = docs.join(
        DedupOps.connectedComponents(
            docs.select(col("doc_id").as("id")), edges)
          .filter(col("id") === col("cluster_id"))
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      SimilarityOps.chunkBandTopK(canon,
        "doc_id", "text", ChunkTokens, ChunkStride, BowDimWide,
        ChunkBandsWide, ChunkQueryMod, ChunkTopK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Margin-based bitext mining (LASER/CCMatrix ratio margin) over two
    // deterministic embedding halves: per-pair micro-unit cosine, k-NN
    // neighborhood sums as exact integer arithmetic, mutual margin-argmax
    // join. See SimilarityOps.bitextMarginMine for the criterion and the
    // banded-candidates scale shape.
    "s39_bitext_margin" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextMarginMine(
        emb.filter(bitextSide(col("vec_id")) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4)
        .orderBy(col("id_l"))
    }),

    // The miner through banded sign-LSH candidates (the s39 scale path
    // executed): sign signature over the first 16 coordinates, 2 bands
    // of 8 bits, cross-side (band, key) equi-join — never the L×R
    // cross. Criterion tail shared verbatim with s39 on BOTH engines.
    "s40_bitext_banded" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextMarginMineBanded(
        emb.filter(bitextSide(col("vec_id")) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4,
        sigDim = 16, bands = 2)
        .orderBy(col("id_l"))
    }),

    // The forward leg of banded bitext mining — the per-query serving
    // shape the at-ingest probe answers (bitextMineProbe's batch twin):
    // banded top-4 candidates per left id, margins against the
    // pre-materializable right-side neighborhood sums, margin argmax,
    // no mutual filter. See SimilarityOps.bitextForwardBest.
    "s41_bitext_forward" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextForwardBest(
        emb.filter(bitextSide(col("vec_id")) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4,
        sigDim = 16, bands = 2)
        .orderBy(col("id_l"))
    }),

    // The banded miner at the SCALE-TRUE dial — s40's plan at a 32-bit
    // signature, 2 bands of 16 bits: per-band random-collision mass
    // 2^-16, the s38 move applied to bitext after the 100x gate
    // measured the 8-bit dial's candidate mass going superlinear
    // (s40@100x 92.8 s — runs, but saturating). Same shared criterion
    // tail, different dial.
    "s42_bitext_banded_wide" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextMarginMineBanded(
        emb.filter(bitextSide(col("vec_id")) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4,
        sigDim = 32, bands = 2)
        .orderBy(col("id_l"))
    }),

    // The forward/serving leg at the SCALE-TRUE dial (the r14 verdict's
    // one `weak` closed): s41's plan — banded top-4 per left id, margins
    // against the pre-materializable neighborhood sums, margin argmax,
    // no mutual filter — at the 32-bit signature / 2×16-bit-band
    // geometry the 100× gate measured surviving corpus growth (s42
    // 3.5 s where the 8-bit dial saturated at ~97 s). This is the
    // geometry the at-ingest probe (bitextMineProbe's wide spec) keys
    // its release artifacts at, so stream and batch serve ONE dial.
    "s43_bitext_forward_wide" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextForwardBest(
        emb.filter(bitextSide(col("vec_id")) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4,
        sigDim = 32, bands = 2)
        .orderBy(col("id_l"))
    }),

    // The SAMPLED audit forms of the saturating 8-bit rungs (the d16s
    // move applied to bitext): s40/s41's full-cost 100× gate rows read
    // 110–166 s each BY DESIGN — their candidate mass IS the documented
    // dial cost — which priced the per-session scale gate out of daily
    // use (r15 VERDICT #3). These run the identical miner on a
    // deterministic 1/16 left subsample (abs(vec_id % 32) = 0 within
    // the left side), so per-left-query candidate saturation — the
    // signal the audit rungs exist to watch — is measured at ~1/16 the
    // wall; the full-cost rungs stay registered and get one full gate
    // row per round for the record.
    "s40s_bitext_banded_sampled" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextMarginMineBanded(
        emb.filter(bitextSide(col("vec_id")) === 0L &&
          abs(col("vec_id") % 32) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4,
        sigDim = 16, bands = 2)
        .orderBy(col("id_l"))
    }),

    "s41s_bitext_forward_sampled" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bitextForwardBest(
        emb.filter(bitextSide(col("vec_id")) === 0L &&
          abs(col("vec_id") % 32) === 0L),
        emb.filter(bitextSide(col("vec_id")) === 1L), 4,
        sigDim = 16, bands = 2)
        .orderBy(col("id_l"))
    }),

    // Top-30 PMI collocations at min count 5 — phrase mining over the
    // shared bigram transition table. See RelevanceOps.pmiCollocations
    // for the ln-sum overflow argument and the minCount-first prune.
    "t31_pmi_collocations" -> ((s, d) =>
      RelevanceOps.pmiCollocations(Tables.documents(s, d), "text",
        minCount = 5L, topK = 30)
        .orderBy(desc("pmi_micro"), col("w1"), col("w2"))),

    // Per-source lexical KL from the corpus mix — the domain-shift
    // datasheet line. See RelevanceOps.sourceKl for the plug-in
    // estimator and the one-explode count-table shape.
    "t32_source_kl" -> ((s, d) =>
      RelevanceOps.sourceKl(Tables.documents(s, d), "source", "text")
        .orderBy(col("source"))),

    // C4 line filters: per-doc drop accounting + the cleaned rebuild —
    // see c4LineStats for the rules, the in-aggregate filtered rebuild,
    // and the driver-data degeneracy note (fixture gate = real coverage).
    "t29_c4_line_filters" -> ((s, d) =>
      c4LineStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "t10_vocab_coverage" -> ((s, d) =>
      RelevanceOps.vocabCoverage(Tables.documents(s, d), "text", 30)
        .orderBy(col("rank"))),

    // CCNet-style unigram LM quality score + perplexity bucket. Bucket
    // thresholds sit at the corpus's observed head/tail knees (xent spans
    // ~3.38–3.70 on this synthetic vocabulary); production would derive
    // them from t11's own quantiles (q16's exact-percentile path).
    "t11_unigram_xent" -> ((s, d) =>
      RelevanceOps.unigramCrossEntropy(Tables.documents(s, d),
        "doc_id", "text", headBelow = 3.40, tailFrom = 3.41)
        .orderBy(col("doc_id"))),

    // The bigram order of t11: corpus-trained add-one-smoothed P(w2|w1),
    // scored as mean negative log prob over each doc's transitions — the
    // CCNet perplexity-filter proxy. See RelevanceOps.bigramCrossEntropy
    // for the micro-nat determinism and the not-broadcast bigram table.
    "t22_bigram_xent" -> ((s, d) =>
      RelevanceOps.bigramCrossEntropy(Tables.documents(s, d),
        "doc_id", "text")
        .orderBy(col("doc_id"))),

    // The interpolated-backoff order above t22: P(w2|w1) = λ·c12/c1 +
    // (1−λ)·(c2+1)/(T+V) — unseen transitions back off to the smoothed
    // unigram successor frequency, the KenLM-family shape the CCNet
    // filter actually uses. λ = LmInterpNum/LmInterpDen, one exact binary
    // rational on both engines. See RelevanceOps.interpolatedBigramXent.
    "t23_interp_xent" -> ((s, d) =>
      RelevanceOps.interpolatedBigramXent(Tables.documents(s, d),
        "doc_id", "text", LmInterpNum, LmInterpDen)
        .orderBy(col("doc_id"))),

    // The trigram order of the ladder — closest to the KenLM shape the
    // CCNet filter runs; λ₁=1/2, λ₂=1/4, λ₃ derived (all exact binary).
    // See RelevanceOps.interpolatedTrigramXent.
    "t24_trigram_xent" -> ((s, d) =>
      RelevanceOps.interpolatedTrigramXent(Tables.documents(s, d),
        "doc_id", "text", TriL1Num, TriL1Den, TriL2Num, TriL2Den)
        .orderBy(col("doc_id"))),

    // The 4-gram rung of the ladder — the order KenLM defaults to;
    // λ₁=1/2, λ₂=1/4, λ₃=1/8, λ₄ derived (all exact binary). See
    // RelevanceOps.interpolatedFourgramXent.
    "t37_fourgram_xent" -> ((s, d) =>
      RelevanceOps.interpolatedFourgramXent(Tables.documents(s, d),
        "doc_id", "text", QuadL1Num, QuadL1Den, QuadL2Num, QuadL2Den,
        QuadL3Num, QuadL3Den)
        .orderBy(col("doc_id"))),

    // DSIR importance resampling: raw docs (the 98%) scored against the
    // deterministic 2% holdout as the target distribution (d07's split
    // recipe — production would pass a curated target set), then the top
    // QUARTILE by weight selected — the resampling step (the paper adds
    // Gumbel noise for diversity; rand() is oracle-hostile by design, so
    // the deterministic top-fraction is the pinned form). The cut is
    // percentile_approx(logw, 3/4) — the s17 pinned convention, value at
    // sorted rank ceil(3n/4), tie-free — and docs select by VALUE above
    // it: no corpus-wide window. Hashed-unigram multinomials over a
    // FIXED 8192-bucket space; see RelevanceOps.dsirLogWeights for why
    // those count tables are the legitimate force-broadcast case.
    // Two-consumer note: the weights subtree feeds the cut aggregate and
    // the probe (the t25 barrier); in production the per-doc weight
    // table is a materialized artifact both read.
    "t26_dsir_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val w = RelevanceOps.dsirLogWeights(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text")
      val cut = w.agg(
        percentile_approx(col("logw"), lit(0.75), lit(10000)).as("cut"))
      w.crossJoin(broadcast(cut))
        .select(col("doc_id"), col("n_tokens"), col("logw"),
          (col("logw") > col("cut")).as("selected"))
        .orderBy(col("doc_id"))
    }),

    // CCNet's actual selection step over the xent ladder: per SOURCE
    // (CCNet buckets per language; the synthetic corpus's stratification
    // key is source), split scored docs into head/middle/tail terciles of
    // the t23 interpolated xent — head trains, tail drops. Scale shape:
    // NO per-source window over the corpus — tercile CUTS come from a
    // percentile_approx aggregate (sketch partials, n_sources rows out)
    // and docs bucket by VALUE against their source's two cuts, the s17
    // recipe (rank convention spec-pinned for p=1/3, 2/3; cuts are
    // elements at sorted positions, so ties cannot fork the bucket).
    // Docs with no transitions (t23 scores only docs with >= 2 tokens)
    // are unscored and excluded on both engines. The cuts table joins
    // without a hint: n_sources rows, AQE broadcasts (t22 rule).
    // Two-consumer note (FinalPlan-audited): the scored subtree feeds
    // BOTH the cuts aggregate and the probe — a barrier inherent to any
    // full-set threshold — so the xent pipeline runs twice here (AQE's
    // ReusedExchange bridges the count-table broadcasts but not the
    // differently-partitioned aggregates, the r7 lesson). In production
    // `scored` is t23's ALREADY-MATERIALIZED per-doc score table (the
    // s17/d01 ingest-artifact pattern): both passes read parquet, the
    // corpus is never re-scored to bucket it.
    "t25_ccnet_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // Measured: a localCheckpoint materialize-once of `scored` is
      // SLOWER locally (4.85 s vs 3.44 s warm at sf0.1 — checkpoint
      // overhead exceeds the AQE-bridged recompute), so the query stays
      // declarative and the artifact pattern stays a production note.
      val scored = RelevanceOps.interpolatedBigramXent(docs,
          "doc_id", "text", LmInterpNum, LmInterpDen)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("xent"))
      val third = lit(1.0) / 3
      val cuts = scored.groupBy(col("source"))
        .agg(percentile_approx(col("xent"), third, lit(10000)).as("cut1"),
          percentile_approx(col("xent"), third * 2, lit(10000)).as("cut2"))
      scored.join(cuts, Seq("source"))
        .select(col("doc_id"), col("source"), col("xent"),
          when(col("xent") <= col("cut1"), "head")
            .when(col("xent") <= col("cut2"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // ---- dedup ------------------------------------------------------------
    "d01_exact_dedup" -> ((s, d) =>
      DedupOps.exactDedup(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("digest"))),

    // Train/eval decontamination: flag corpus docs sharing any word
    // 3-gram with the benchmark split (doc_id % 50 == 0 — a deterministic
    // 2% holdout, SQL-recomputable; production would use the t06
    // md5-bucket split). The benchmark shingle set is tiny
    // relative to the corpus → broadcast join, so corpus shingles never
    // shuffle; for very large eval suites drop the broadcast hint and let
    // AQE pick the shuffle join — same plan shape, still keyed on the
    // shingle. wordShingles is per-doc distinct, so count(*) ==
    // countDistinct(sh) with one aggregate phase.
    "d07_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.decontaminationCounts(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", 3)
        .orderBy(col("doc_id"))
    }),

    // Eval-leakage report — d07's dual, rolled up per BENCHMARK item:
    // what fraction of each eval doc's distinct 3-grams appears anywhere
    // in the training split. Same %50 holdout as d07 so the two reports
    // describe the same contamination event from both sides. See
    // DedupOps.evalLeakage for the bench-bounded aggregate shape.
    "t33_eval_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.evalLeakage(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", 3)
        .orderBy(col("bench_id"))
    }),

    // Per-source leakage attribution — t33's actionable axis: WHICH
    // acquisition feed carries the contaminating grams (you can't fix an
    // eval item, but you can drop a feed). Same %50 holdout and 3-gram
    // shingles as d07/t33 so all three reports describe one
    // contamination event. See DedupOps.evalLeakageBySource.
    "t36_leakage_by_source" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.evalLeakageBySource(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", "source", 3)
        .orderBy(col("source"))
    }),

    // Duplicate-cluster size histogram — the dedup datasheet figure.
    // Driver documents are all-unique, so deterministic duplicated
    // slices (%10 -> 2-copy, %100 -> 3-copy, %1000 -> 6-copy clusters)
    // make buckets 1/2/4 genuinely arise; the fixture gates carry the
    // natural-dup coverage. See DedupOps.dupClusterHistogram.
    "d28_dup_histogram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def slice(m: Int, off: Long) = docs.filter(col("doc_id") % m === 0)
        .withColumn("doc_id", col("doc_id") + off)
      val corpus = docs
        .unionByName(slice(10, 1000000L)).unionByName(slice(100, 2000000L))
        .unionByName(slice(1000, 3000000L)).unionByName(slice(1000, 4000000L))
        .unionByName(slice(1000, 5000000L))
      DedupOps.dupClusterHistogram(corpus, "doc_id", "text")
        .orderBy(col("bucket_lo"))
    }),

    // Recrawl snapshot delta: full-outer digest alignment of two captures
    // of the same id space. %11/%13 carve asymmetric membership (added /
    // removed both non-empty) and %5 docs get deterministically revised
    // text, so all four statuses arise on driver data. See
    // DedupOps.snapshotDelta.
    "d27_snapshot_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 11 =!= 5)
      val next = docs.filter(col("doc_id") % 13 =!= 6)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      DedupOps.snapshotDelta(prev, next, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Corpus-internal boilerplate accounting: distinct word 3-grams with
    // document frequency >= 4 are "boilerplate"; per doc, how much of it
    // is made of them. Unlike d07 there is no broadcastable side — both
    // the df aggregate and the join back are keyed on the gram, and the
    // exchanges share that key. Text never shuffles.
    "d08_boilerplate_ngrams" -> ((s, d) =>
      DedupOps.boilerplateNgramCounts(Tables.documents(s, d),
        "doc_id", "text", 3, 4)
        .orderBy(col("doc_id"))),

    // End-to-end LSH audit: banded candidate pairs with the signature-
    // estimated AND exact Jaccard side by side. The oracle recomputes the
    // banding, pairing, and estimator from the independently-generated d04
    // signature vectors (slice equality stands in for the engine's
    // slice-hash band key — identical pairs absent a 2⁻⁶⁴ hash collision)
    // and the exact Jaccard from raw text, so the whole pipeline —
    // signature → band → pair → estimate — is pinned, not just signatures.
    "d09_lsh_estimates" -> ((s, d) =>
      DedupOps.minhashEstimates(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))),

    // Asymmetric containment over the same banded candidates — the
    // doc-in-doc audit (quoted-article / README-in-dump detection) that
    // symmetric Jaccard under-scores. See DedupOps.containmentEstimates
    // for the Jaccard-banding scope caveat.
    "d26_containment" -> ((s, d) =>
      DedupOps.containmentEstimates(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))),

    // LSH band-choice S-curve: candidate volume + true-dup yield per
    // aligned (bands, rows_per_band) config in one pass over the finest
    // banding's candidates — the d10 twin of s14's recall/cost frontier.
    // Oracle re-derives mask and configs from the independent d04
    // signature VALUES, so the whole sweep is cross-engine pinned.
    // Registry runs the FULL corpus (sampleFrac default 1.0); at 100 TB
    // this tuning audit runs on lshTuningCurve's deterministic
    // sampleFrac slice (md5-draw on doc_id, layout-independent).
    "d16_lsh_tuning" -> ((s, d) =>
      DedupOps.lshTuningCurve(Tables.documents(s, d), "doc_id", "text",
        threshold = LshSweepThreshold)),

    // The sampled form of the d16 audit — the shape it actually runs at
    // 100 TB: same sweep over the deterministic md5-draw half-slice, so
    // the sampling path itself is cross-engine oracled (the oracle
    // recomputes the identical 24-bit draw), not just spec-pinned.
    "d16s_lsh_tuning_sampled" -> ((s, d) =>
      DedupOps.lshTuningCurve(Tables.documents(s, d), "doc_id", "text",
        threshold = LshSweepThreshold, sampleFrac = LshSampleFrac)),

    // Lee-et-al exact-substring duplication accounting at an 8-token
    // window: per doc, positions covered by some >=8-token span occurring
    // at least twice corpus-wide — the repeated-span removal signal one
    // granularity below d11's whole-line pass. See
    // DedupOps.substringDupStats for the window-anchor equivalence.
    "d19_substring_stats" -> ((s, d) =>
      DedupOps.substringDupStats(Tables.documents(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id"))),

    // The cut half of the d19 pass: covered positions removed, survivors
    // reassembled — the keep/cut artifact. Same repeatedWindowStarts
    // kernel as d19, so n_kept = n_tokens - d19.n_covered row for row.
    "d29_substring_cut" -> ((s, d) =>
      DedupOps.substringCut(Tables.documents(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id"))),

    // Lee et al.'s actual release semantics: the globally FIRST
    // occurrence of a repeated span survives (min (doc, pos) canonical,
    // a hash-keyed aggregate), every other occurrence is cut — d29 cuts
    // all copies. Shared cutByStarts kernel, so the two policies cannot
    // disagree on interval algebra. See DedupOps.substringCutKeepFirst.
    "d33_substring_cut_keep1" -> ((s, d) =>
      DedupOps.substringCutKeepFirst(Tables.documents(s, d), "doc_id",
        "text", 8)
        .orderBy(col("doc_id"))),

    // Benchmark decontamination at span granularity (t33's cut half,
    // the GPT-3-style n-gram decontamination done surgically): every
    // corpus token covered by an 8-token window that appears in the
    // benchmark slice is cut, survivors reassembled — the same t33
    // bench/corpus split (doc_id % 50), the d19/d29/d33 window hashing
    // and interval kernel, bench window index broadcast at the probe.
    // See DedupOps.decontaminateCut.
    "t47_decontaminate_cut" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.decontaminateCut(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", 8)
        .orderBy(col("doc_id"))
    }),

    // The near-dup twin of d17 at the same corpus/batch split: batch docs
    // whose banded MinHash signature collides with a corpus doc and whose
    // exact shingle Jaccard verifies at d10's 0.9 gate. Band-keyed join is
    // the only corpus/batch meeting point; see DedupOps.incrementalNearDup.
    "d18_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.incrementalNearDup(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", 0.9)
        .orderBy(col("doc_id"))
    }),

    // The composed ingest gate: d17's exact classification, then d18's
    // near-dup over ONLY the new_unique survivors, one plan — the order a
    // production ingest runs its cheap-to-expensive checks. Same
    // corpus/batch split as d17/d18 so the three queries cross-check.
    "d20_ingest_triage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.ingestTriage(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", 0.9)
        .orderBy(col("doc_id"))
    }),

    // URL-canonicalization dedup — the crawl-native first pass that runs
    // BEFORE any content exists to hash (FineWeb dedups by URL before
    // text dedup): messy capture URLs (mixed case, default port, tracking
    // params, fragments, trailing slashes — each variant keyed off event
    // fields so the oracle rebuilds the identical mess) collapse to a
    // canonical form and the earliest capture per canonical URL survives.
    // Canonical rule list + scale shape: DedupOps.canonicalUrl/urlDedup.
    "d23_url_dedup" -> ((s, d) => {
      val messy = Tables.events(s, d).withColumn("url",
        concat(
          lit("http://"),
          when(col("event_id") % 2 === 0, lit("Host")).otherwise(lit("host")),
          col("user_id") % 20,
          when(col("event_id") % 2 === 0, lit(".Example.org"))
            .otherwise(lit(".example.org")),
          when(col("event_id") % 3 === 0, lit(":80"))
            .when(col("event_id") % 3 === 1, lit(":8080")).otherwise(lit("")),
          lit("/p/"), col("event_id") % 40,
          when(col("event_id") % 2 === 1, lit("/")).otherwise(lit("")),
          when(col("event_id") % 5 === 0, lit("?utm_source=feed"))
            .when(col("event_id") % 5 === 1,
              concat(lit("?q="), col("event_id") % 7)).otherwise(lit("")),
          when(col("event_id") % 4 === 0,
            concat(lit("#sec"), col("event_id") % 3)).otherwise(lit(""))))
      DedupOps.urlDedup(messy, "url", "ts", "event_id")
        .orderBy(col("canon_url"))
    }),

    // Per-source document cap (C4/RefinedWeb "no domain dominates"): keep
    // at most 10 docs per source, survivors chosen by the shared 24-bit
    // md5 draw (the t06/t12 recipe — deterministic, partition-independent,
    // oracle-recomputable) with doc_id tiebreak. The engine runs the
    // bounded top-K typed Aggregator (map-side partials capped at 10 —
    // see DedupOps.groupCap for why the row_number window is the wrong
    // shape for a monster domain); the oracle IS that window, which is
    // exactly the point: same answer, skew-free plan.
    "d21_source_cap" -> ((s, d) =>
      DedupOps.groupCap(Tables.documents(s, d), "source", "doc_id",
        cap = 10,
        priority = conv(substring(
          md5(col("doc_id").cast("string").cast("binary")), 1, 6),
          16, 10).cast("long"))
        .orderBy(col("doc_id"))),

    // Incremental-ingestion dedup: today's batch (doc_id % 10 == 0, a
    // deterministic 10% increment) classified against the accumulated
    // corpus (the other 90%) — the steady-state shape of a continuously
    // fed 100 TB corpus, where d01 is the cold-start backstop. See
    // DedupOps.incrementalDedup for why corpus text never moves.
    "d17_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.incrementalDedup(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Bloom-pruned incremental dedup: d17's classification with the
    // corpus scan probed by a batch-side bloom BEFORE any exchange —
    // Spark's own runtime-filter expressions, planted by hand (the
    // optimizer can't see batch ≪ corpus from thresholds alone). The
    // approximate structure prunes the plan, never the answer, so the
    // oracle is the same exact SQL shape as d17's — on a different
    // deterministic split (% 7) so the two entries exercise different
    // data. See DedupOps.bloomIncrementalDedup.
    "d24_bloom_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.bloomIncrementalDedup(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", expectedBatchDocs = 100000L)
        .orderBy(col("doc_id"))
    }),

    // Within-document line self-dedup: per-row HOFs, zero exchanges —
    // the per-page cleanup before d11's corpus pass. See
    // DedupOps.selfDedupLines.
    "d25_selfdedup_lines" -> ((s, d) =>
      DedupOps.selfDedupLines(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "d02_shingle_cardinality" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          size(TextFns.charShingles(col("text"), 5)).as("n_shingles"))
        .orderBy(col("doc_id"))),

    "d03_adjacent_jaccard" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        array_distinct(TextFns.tokens(col("text"))).as("toks"))
      val a = t.select(col("doc_id").as("id_a"), col("toks").as("ta"))
      val b = t.select((col("doc_id") - 1).as("id_a"), col("toks").as("tb"))
      a.join(b, Seq("id_a"))
        .select(col("id_a"),
          round(TextFns.jaccard(col("ta"), col("tb")), 6).as("jaccard"))
        .orderBy(col("id_a"))
    }),

    // MinHash signatures: cross-implementation oracle (independent Python
    // xxHash64/LCG/universal-hash pipeline → per-doc expected signatures);
    // LSH recall/precision additionally pinned on planted dups in DedupSpec.
    "d04_minhash_signatures" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below, signature above (t01)
        .select(col("doc_id"),
          TextFns.shingleMinhash(TextFns.tokens(col("text")), 3, 16).as("sig"))
        .select(col("doc_id"), concat_ws(",", col("sig")).as("sig_csv"))),

    "d05_simhash_signatures" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")) // narrow sort below, signature above (t01)
        .select(col("doc_id"),
          TextFns.simhash64Fast(TextFns.tokens(col("text"))).as("simhash"))),

    // Near-dup CLUSTER collapse: jaccard edges within (lang, source,
    // length-band) blocks → connected components by iterative min-label
    // propagation → canonical doc per cluster (min doc_id). The oracle
    // recomputes the same edges and closes them with a recursive CTE — the
    // full "cluster then keep one" training-data dedup step, end-to-end
    // differential-checked. The length band is the standard recall/cost
    // trade (a near-dup pair rarely differs by a whole band); doc_id<1000
    // bounds the bench working set (the operator itself is unbounded).
    "d06_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 1000)
        .withColumn("len_band", expr("n_chars DIV 100"))
      val edges = DedupOps.jaccardEdges(docs, "doc_id", "text",
        Seq("lang", "source", "len_band"), 0.6)
      DedupOps.connectedComponents(docs.select(col("doc_id").as("id")), edges)
        .select(col("id").as("doc_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // The LSH pipeline EXECUTED end-to-end: signature → band → candidate
    // pair → exact-Jaccard verify (≥ 0.9) → connected-component collapse →
    // canonical flag. d09 audits the estimator; this is the dedup decision
    // itself at LSH scale (no equality blocking — the band join IS the
    // blocker). Oracle: d09's independent-signature pairing + text verify,
    // then the d06 recursive closure.
    "d10_lsh_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = DedupOps.minhashVerified(docs, "doc_id", "text",
          threshold = 0.9)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      DedupOps.connectedComponents(docs.select(col("doc_id").as("id")), edges)
        .select(col("id").as("doc_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // d10's clusters with the PRODUCTION canonical choice: keep the
    // highest-VALUE member of every near-dup cluster (longest by token
    // count, min-id tiebreak) instead of d10's positional min-id — what a
    // curation pipeline actually does when a re-crawl found the fuller
    // page. The keeper is a cluster-keyed max_by aggregate (map-side
    // partials, one row per cluster out — no per-cluster window), joined
    // back on cluster_id un-hinted (a mega-cluster's join-back skew is
    // AQE skew-split territory). Token count is the t12-shared
    // tokenization, so the oracle recomputes the same integer key.
    "d22_quality_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = DedupOps.minhashVerified(docs, "doc_id", "text",
          threshold = 0.9)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val clusters = DedupOps.connectedComponents(
        docs.select(col("doc_id").as("id")), edges)
      val withQ = clusters.join(
        docs.select(col("doc_id").as("id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tokens")),
        Seq("id"))
      val best = withQ.groupBy(col("cluster_id"))
        .agg(max_by(col("id"),
          struct(col("n_tokens"), (-col("id")).as("t"))).as("keep_id"))
      withQ.join(best, Seq("cluster_id"))
        .select(col("id").as("doc_id"), col("cluster_id"), col("n_tokens"),
          (col("id") === col("keep_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // Line-level dedup (the CCNet/RefinedWeb line pass): keep the
    // corpus-wide first occurrence of every distinct trimmed line, report
    // per-doc accounting. Driver-synthetic docs carry no newlines (each
    // doc is one line, so this degenerates to d01-shaped accounting —
    // still a valid oracle); real multi-line docs with shared boilerplate
    // and blank lines are exercised by the structured-text fixture gate
    // (tools/structured_text_fixture.py + StructuredTextParitySpec).
    "d11_line_dedup" -> ((s, d) =>
      DedupOps.lineDedupStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Boilerplate-line report: lines in >= 2 distinct docs, with counts —
    // the inspection query a line-dedup rollout starts from (what WOULD
    // d11 remove, and is it navigation chrome or real content?).
    "d12_boilerplate_lines" -> ((s, d) =>
      DedupOps.boilerplateLines(Tables.documents(s, d), "doc_id", "text", 2)
        .orderBy(col("ldigest"))),

    // Paragraph-level variant of d11 (blank-line separator) — the CCNet
    // granularity between whole-document (d01) and single-line (d11)
    // dedup. Same operator, same digest, same scale shape; only the
    // separator differs.
    "d13_paragraph_dedup" -> ((s, d) =>
      DedupOps.lineDedupStats(Tables.documents(s, d), "doc_id", "text",
        sep = "\n\n")
        .orderBy(col("doc_id"))),

    // The deduped CORPUS d11 decides: each doc rebuilt from its kept
    // lines (original order, canonical trimmed form). The only family
    // member where text shuffles — materialization's irreducible cost.
    "d14_dedup_collapse" -> ((s, d) =>
      DedupOps.lineCollapse(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // ---- similarity -------------------------------------------------------
    "s01_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "s02_ivf_assign" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // sims are rounded (6) inside ivfAssign before the sum so both engines
      // add identical doubles; the outer round(4) then has ~1e-12 slack.
      SimilarityOps.ivfAssign(emb, emb.filter(col("vec_id") < 8))
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("sim")), 4).as("sum_sim"))
        .orderBy(col("centroid_id"))
    }),

    // IVF index-health datasheet over the 16-centroid assignment: per-cell
    // population + milli-fraction, cells used, milli imbalance factor —
    // all-integer outputs. See SimilarityOps.cellBalance.
    "s22_cell_balance" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.cellBalance(emb, emb.filter(col("vec_id") < 16))
        .orderBy(col("centroid_id"))
    }),

    // IVF single-probe ANN top-k — the scale path the s01 brute-force
    // baseline is traded against: assignment confines each query's scan to
    // one cell's inverted list. Differential-checked against DuckDB
    // recomputing the identical assign+probe, so the approximation itself
    // (not just the plumbing) is pinned.
    "s07_ivf_probe_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.probeTopK(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Multi-probe variant of s07: union of the query's 2 nearest cells —
    // the recall/cost knob, oracled with the identical probe ranking.
    "s08_ivf_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.multiProbeTopK(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 10), 5, 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The recall/cost FRONTIER s13 samples one point of: sweep probe
    // budgets 1..4 in a single pass (see SimilarityOps.recallCurve) and
    // emit integer hit + scanned-candidate totals per budget — the table
    // that picks nprobe before committing an index layout.
    "s14_recall_curve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.recallCurve(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 10), 5, 4)
        .orderBy(col("nprobe"))
    }),

    // The k-axis companion to s14's nprobe sweep: recall@k hits of
    // 2-probe IVF vs exact, for k in {1,3,5,10}, from ONE ranking of
    // each side to depth 10 — a hit at k is a pair ranked <= k by BOTH.
    // Hits are monotone in k (the top-k sets grow); the k=5 row must
    // equal s14's nprobe=2 hits exactly (same probe ranking — pinned in
    // RecallCurveSpec). Integer totals only.
    "s15_recall_at_k" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val exact = SimilarityOps.bruteForceTopK(emb, queries, 10)
        .select(col("query_id"), col("corpus_id"), col("rank").as("re"))
      val approx = SimilarityOps.multiProbeTopK(emb,
          emb.filter(col("vec_id") < 8), queries, 10, 2)
        .select(col("query_id"), col("corpus_id"), col("rank").as("ra"))
      val hits = approx.join(exact, Seq("query_id", "corpus_id"))
        .withColumn("k", explode(array(lit(1), lit(3), lit(5), lit(10))))
        .filter(col("ra") <= col("k") && col("re") <= col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("total_hits"))
      s.range(1)
        .select(explode(array(lit(1), lit(3), lit(5), lit(10))).as("k"))
        .join(hits, Seq("k"), "left")
        .select(col("k"), coalesce(col("total_hits"), lit(0L)).as("total_hits"))
        .orderBy(col("k"))
    }),

    // SSL-prototypes pruning over the d15 cell structure (vec_id < 16
    // embeddings as fixed centroids): prune the most prototypical 1/5 of
    // every cell. The gate is pure integer arithmetic and the ranking key
    // is the rounded similarity with a vec_id tiebreak — see
    // SimilarityOps.prototypicalityPrune for the scale discussion.
    "s16_prototype_prune" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.prototypicalityPrune(emb, emb.filter(col("vec_id") < 16),
        pruneNum = 1, pruneDen = 5)
        .orderBy(col("vec_id"))
    }),

    // The tiny-k quantile-threshold form of s16 as its own oracled entry.
    // Oracle-ability rests on two pinned facts: (1) at full accuracy
    // Spark's percentile_approx returns the element at rank ceil(p·n) from
    // the bottom (probed empirically across n=4..100 — 16/16 match; cells
    // here are far below the 10000-row sketch accuracy, so the sketch is
    // exact); (2) p = 3/4 is an exact binary double, so ceil(p·n) has no
    // float hazard (0.8·5 would round to exactly 4.0, but only by luck of
    // the rounding — 3/4 is exact by construction). The DuckDB twin
    // recomputes the cut as the rank-ceil(3n/4) element of the rounded
    // sims — a VALUE at a sorted position, so result is tiebreak-free.
    "s17_prototype_prune_approx" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.prototypicalityPruneApprox(emb,
        emb.filter(col("vec_id") < 16), pruneNum = 1, pruneDen = 4)
        .orderBy(col("vec_id"))
    }),

    // ANN evaluation harness: per-query recall@5 of single-probe IVF
    // against the exact brute-force baseline — the operational metric that
    // tunes nlist/nprobe before committing an index layout. Both rankings
    // are the already-oracled s01/s07 pipelines (rank-identical
    // cross-engine, so the overlap is too); the eval join moves only
    // k rows per query. recall = n_hits/5.0 is exact decimal math.
    // Product-quantization ADC recall: two 32-dim halves, 16-entry
    // sub-codebooks (the vec_id<16 vectors), max-inner-product encoding,
    // ADC = sum of two LUT dots, recall@5 vs the exact inner-product
    // baseline — see SimilarityOps.pqAdcRecall.
    "s19_pq_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.pqAdcRecall(emb, emb.filter(col("vec_id") < 10),
        emb.filter(col("vec_id") < 16), k = 5, halfDim = 32)
        .orderBy(col("query_id"))
    }),

    // The composed IVF-PQ query path: s13's cells (centroids vec_id<8),
    // s19's codes (codebooks vec_id<16), one eval pricing cell-miss AND
    // quantization together — SimilarityOps.ivfPqRecall.
    "s21_ivfpq_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.ivfPqRecall(emb, emb.filter(col("vec_id") < 10),
        emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") < 16),
        k = 5, halfDim = 32)
        .orderBy(col("query_id"))
    }),

    // The full serving stack: IVF route (nprobe=2 of 8 cells) -> sign-code
    // Hamming candidates (overfetch 4·k) -> exact re-rank, recall vs the
    // global baseline, per-query candidate-pool size for starvation
    // visibility. See SimilarityOps.ivfRerankRecall.
    "s26_ivf_rerank_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.ivfRerankRecall(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 10), k = 5, nprobe = 2, overfetch = 4,
        dim = 64)
        .orderBy(col("query_id"))
    }),

    // IVF-PQ with refinement: s26's serving stack with the candidate
    // stage swapped to s19's ADC (route nprobe=2 of 8 cells -> ADC top
    // 4·k code-word candidates -> full-precision re-rank), recall@5 vs
    // the s19/s21 exact inner-product baseline so it slots into the same
    // compression sweep. See SimilarityOps.ivfPqRerankRecall.
    "s27_ivfpq_rerank_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.ivfPqRerankRecall(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") < 16),
        k = 5, nprobe = 2, overfetch = 4, halfDim = 32)
        .orderBy(col("query_id"))
    }),

    // Matryoshka truncation sweep: recall@5 of prefix-dim cosine search
    // (m = 8/16/32 of the 64-dim embeddings) against the full-dim exact
    // baseline, for the usual 10-query eval set. One pair pass computes
    // every prefix sim — see SimilarityOps.matryoshkaRecall.
    // 1-bit sign-quantization recall: the far end of the compression
    // sweep s09 (int8) and s19 (PQ) sit on — 32× smaller codes, Hamming
    // ranking with zero float math in the pair loop. Packed words are in
    // the output so the oracle pins the quantization integer-exactly.
    "s20_sign_quant_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.signQuantRecall(emb, emb.filter(col("vec_id") < 10),
        k = 5, dim = 64)
        .orderBy(col("query_id"))
    }),

    // Two-stage retrieval: Hamming candidate generation over s20's sign
    // codes (overfetch 4·k) + exact cosine re-rank of only those
    // candidates — the candidate/re-rank serving shape every deployed
    // ANN system uses; the hamming-vs-reranked recall gap is the
    // second stage's justification. See SimilarityOps.rerankRecall.
    "s24_rerank_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.rerankRecall(emb, emb.filter(col("vec_id") < 10),
        k = 5, overfetch = 4, dim = 64)
        .orderBy(col("query_id"))
    }),

    // Overfetch tuning curve: re-ranked recall@5 per candidate budget
    // (1/2/4/8 × k) from ONE candidate pass at the largest budget —
    // the sizing frontier for s24's serving shape. See
    // SimilarityOps.overfetchCurve.
    "s25_overfetch_curve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.overfetchCurve(emb, emb.filter(col("vec_id") < 10),
        k = 5, overfetches = Seq(1, 2, 4, 8), dim = 64)
        .orderBy(col("overfetch"), col("query_id"))
    }),

    "s18_matryoshka_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.matryoshkaRecall(emb, emb.filter(col("vec_id") < 10),
        k = 5, prefixes = Seq(8, 16, 32), fullDim = 64)
        .orderBy(col("m"), col("query_id"))
    }),

    // Filtered ANN: the s13 eval with the corpus PRE-filtered to the
    // vec_id % 3 == 0 attribute slice; the per-query surviving-candidate
    // count rides next to the recall it explains (candidate starvation
    // is filtered search's failure mode). See
    // SimilarityOps.filteredProbeRecall.
    "s23_filtered_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.filteredProbeRecall(
        emb.filter(col("vec_id") % 3 === 0),
        emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"))
    }),

    "s13_ivf_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
        .select(col("query_id"), col("corpus_id"))
      val approx = SimilarityOps.probeTopK(emb, emb.filter(col("vec_id") < 8),
          queries, 5)
        .select(col("query_id"), col("corpus_id"))
      val hits = exact.join(approx, Seq("query_id", "corpus_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      queries.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / 5.0).as("recall_at_5"))
        .orderBy(col("query_id"))
    }),

    // Per-vector int8 scalar quantization — shuffle-free embedding
    // compression; the integer codes are an exact cross-engine oracle
    // (deterministic double math in array order, floor(u+0.5) rounding).
    "s09_quantize_int8" -> ((s, d) =>
      SimilarityOps.quantizeInt8(Tables.embeddings(s, d))
        .orderBy(col("vec_id"))),

    // One Lloyd step of k-means over the IVF centroids (index training):
    // s02's oracled assignment feeds a (centroid, dim) element-wise mean.
    "s10_centroid_refine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.centroidRefine(emb, emb.filter(col("vec_id") < 8))
        .orderBy(col("centroid_id"), col("dim"))
    }),

    // Full k-means training loop (2 Lloyd rounds from the s02/s10 seed):
    // the oracle unrolls both rounds in SQL — because each round's means
    // are 4dp-decimal-exact cross-engine, round 2's assignment compares
    // bit-identical doubles and the whole trajectory is pinned, not just
    // one step.
    "s12_kmeans_train" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.kmeansTrain(emb, emb.filter(col("vec_id") < 8), iters = 2)
        .orderBy(col("centroid_id"), col("dim"))
    }),

    // ANN over int8-quantized embeddings (the compressed-index search
    // path): both sides dequantized from their codes, ranked exactly like
    // s01; recall vs the exact baseline is spec-pinned.
    "s11_quantized_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.quantizedTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Embedding near-dup above a low threshold, IVF-blocked. The cell
    // assignment is deterministic (same argmax the s02 oracle recomputes),
    // so the full candidate-generation + verify pipeline is oracled.
    "s03_cosine_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // 16 cells: quadratically fewer same-cell pairs than 8 at equal recall trade
      SimilarityOps.cosineNearDupPairs(emb, emb.filter(col("vec_id") < 16), 0.2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SemDedup-shape semantic dedup: the s03 candidate machinery (same
    // 16-cell blocking, same threshold, one shared oracle prologue) with
    // the greedy earliest-id keep rule on top — every row emitted with
    // its fate and its strongest earlier-neighbor similarity. Planted
    // near-identical pair pinned in PipelineOpsSpec.
    "d15_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.semanticDedup(emb, emb.filter(col("vec_id") < 16), 0.2)
        .orderBy(col("vec_id"))
    }),

    // Hyperplane-LSH near-dup candidates: the sketch ints are engine-
    // exported (arbitrary by construction — seeded planes), and the full
    // downstream band/bucket/pair/cosine pipeline is oracled in DuckDB;
    // planted-pair recall additionally pinned in PipelineOpsSpec.
    "s04_lsh_neardup" -> ((s, d) =>
      SimilarityOps.lshNearDupPairs(Tables.embeddings(s, d), 0.2, dim = 64)
        .orderBy(col("id_a"), col("id_b"))),

    // ---- multimodal -------------------------------------------------------
    // Real container decode (r8): mediaFromDocuments builds genuine
    // BMP/WAV/Y4M bytes with doc-derived parameters, extractMeta sniffs
    // and PARSES them (MediaCodecs), and the oracle recomputes the same
    // parameters in SQL — so a mismatch anywhere in build→parse (wrong
    // row padding, endianness, chunk walk, frame count) breaks the gate.
    "m01_media_meta" -> ((s, d) => {
      import s.implicits._
      Multimodal.extractMeta(Multimodal.mediaFromDocuments(s, d))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"), col("sample_rate"))
        .orderBy(col("media_id"))
    }),

    // Frame-sampling fan-out over video rows (decode → every 5th frame →
    // per-frame signature): generator-shaped multimodal processing as a
    // declarative explode, no UDTF. n_frames comes from PARSING the Y4M
    // FRAME-marker chain; the oracle recomputes the generator's frame
    // count and the sampled index sequence in SQL, pinning the fan-out
    // shape and per-frame derivation end-to-end.
    "m02_frame_sample" -> ((s, d) => {
      import s.implicits._
      val meta = Multimodal.extractMeta(Multimodal.mediaFromDocuments(s, d)).toDF()
      Multimodal.sampleFrames(meta, 5)
        .withColumn("frame_sig",
          (col("media_id") * 1000003L + col("frame_idx") * 7919L) % 1000000007L)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Resize planning (fit into 224×224 + letterbox padding) over decoded
    // image metadata — pure projection, no shuffle; width/height come from
    // the real BMP header parse, the oracle recomputes the generator's
    // dimensions and the integer resize math.
    "m03_resize_plan" -> ((s, d) => {
      import s.implicits._
      val meta = Multimodal.extractMeta(Multimodal.mediaFromDocuments(s, d)).toDF()
      Multimodal.resizePlan(meta.filter(col("kind") === "image"), 224)
        .orderBy(col("media_id"))
    }),

    // Per-window audio loudness profile over REAL decoded PCM (the
    // silence-detection precursor of every speech pipeline): windows of
    // 100 frames, peak and integer milli-mean |amplitude|. Decode and
    // windowed reduction are one partition-local pass — samples never
    // become rows; the oracle recomputes the builder's LCG samples,
    // signed conversion, and floor-division mean in SQL, pinning the
    // whole build→parse→profile round trip.
    "m04_audio_profile" -> ((s, d) => {
      import s.implicits._
      Multimodal.audioProfile(Multimodal.mediaFromDocuments(s, d), 100)
        .toDF()
        .orderBy(col("media_id"), col("window_idx"))
    }),

    "m05_motion_profile" -> ((s, d) => {
      import s.implicits._
      Multimodal.motionProfile(Multimodal.mediaFromDocuments(s, d), 7)
        .toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Perceptual image hash over real decoded BMP planes — the visual
    // dedup signature. See Multimodal.imageHash for the grid/threshold
    // definition and the two-word packing rule.
    "m06_image_phash" -> ((s, d) => {
      import s.implicits._
      Multimodal.imageHash(Multimodal.mediaFromDocuments(s, d))
        .toDF()
        .orderBy(col("media_id"))
    }),

    // Shot segmentation over the m05 SAD stream: a frame whose SAD
    // reaches 128000 milli (straddling the synthetic pattern's ~127.9k
    // mean — both cut and non-cut branches exercised on driver data)
    // opens a new shot; one row per (video, shot). See
    // Multimodal.shotSegments for the bounded-window scale argument.
    "m07_shot_segments" -> ((s, d) => {
      import s.implicits._
      Multimodal.shotSegments(Multimodal.mediaFromDocuments(s, d),
        stride = 7, cutMilli = 128000L)
        .orderBy(col("media_id"), col("shot_id"))
    }),

    // Audio fingerprint: delta-energy sign bits over 10-frame windows
    // (5-25 windows per driver clip -> 4-24 meaningful bits), capped at
    // 32. See Multimodal.audioFingerprint.
    "m10_audio_fingerprint" -> ((s, d) => {
      import s.implicits._
      Multimodal.audioFingerprint(Multimodal.mediaFromDocuments(s, d),
        windowFrames = 10)
        .toDF()
        .orderBy(col("media_id"))
    }),

    // Visual duplicate clusters over the banded aHash graph. Identical
    // payloads re-keyed at +10M make every original/copy pair an exact
    // visual dup (the d28 synthesized-dup recipe — the pixel pattern
    // seeds from the ORIGINAL id, so a re-keyed copy is the "same image
    // ingested twice" case the operator exists for), and the oracle
    // recomputes both hash sets from the same seeds.
    "m09_visual_clusters" -> ((s, d) => {
      // one-pass corpus+copies synthesis (r17): flatMap emits the
      // original and the re-keyed copy from one payload build — same
      // row multiset as base.union(base.map(rekey)), half the decodes
      Multimodal.visualClusters(Multimodal.withRekeyedCopies(
          Multimodal.mediaFromDocuments(s, d, spread = true), 10000000L))
        .orderBy(col("media_id"))
    }),

    // Audio duplicate clusters over the banded delta-sign print with a
    // FULL-series verify. Identical payloads re-keyed at +10M make every
    // original/copy pair an exact audio dup (the m09 recipe for audio);
    // 5-frame windows push driver clips past the 32-bit print cap
    // (10-50 windows -> 9-49 delta bits), so the fb verify word is
    // genuinely exercised, not just the banded print prefix.
    "m11_audio_clusters" -> ((s, d) => {
      // one-pass corpus+copies synthesis (r17, see m09)
      Multimodal.audioClusters(Multimodal.withRekeyedCopies(
          Multimodal.mediaFromDocuments(s, d, spread = true), 10000000L),
          windowFrames = 5)
        .orderBy(col("media_id"))
    }),

    // Audio dup-cluster size histogram — the d28 datasheet figure for
    // the audio modality, over m11's ledger (same corpus recipe) through
    // the SHARED DedupOps.sizeHistogram bucket tail.
    "m12_audio_dup_histogram" -> ((s, d) => {
      // one-pass corpus+copies synthesis (r17, see m09)
      val sizes = Multimodal.audioClusters(Multimodal.withRekeyedCopies(
          Multimodal.mediaFromDocuments(s, d, spread = true), 10000000L),
          windowFrames = 5)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_copies"))
      DedupOps.sizeHistogram(sizes.select(col("n_copies")), 128)
        .orderBy(col("bucket_lo"))
    }),

    // Silence-trim plan over m04's windows: active at mean |amplitude|
    // >= 16.4M milli (straddles the synthetic PCM's ~16.38M mean — both
    // branches and the all-silent NULL case arise on driver data). See
    // Multimodal.silenceTrim for the one-pass per-clip shape.
    "m08_silence_trim" -> ((s, d) => {
      import s.implicits._
      Multimodal.silenceTrim(Multimodal.mediaFromDocuments(s, d),
        windowFrames = 100, silMilli = 16400000L)
        .toDF()
        .orderBy(col("media_id"))
    })
  )

  /** Shared d09/d10 oracle prologue: independent d04 signature VALUES →
    * parsed sigs → band keys (slice equality ≡ the engine's slice-hash
    * band key absent a 2⁻⁶⁴ collision) → candidate pairs, plus word
    * 3-gram shingle sets for exact-Jaccard verification. One constant so
    * the two oracles' banding/pairing/shingle logic can never drift.
    */
  private val lshSigShinglePrologue: String =
    s"""kk(doc_id, sig_csv) AS (VALUES
       |  ${SignatureVectors.values(SignatureVectors.d04Minhash)}),
       |s AS (SELECT doc_id, string_split(sig_csv, ',') AS sig FROM kk
       |      WHERE len(string_split(sig_csv, ',')) = 16),
       |tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |        FROM documents),
       |sh AS (SELECT doc_id,
       |         CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
       |              ELSE list_distinct([array_to_string(t[g:g+2], ' ')
       |                   FOR g IN generate_series(1, len(t) - 2)]) END AS shs
       |       FROM tok)""".stripMargin

  /** d16's sweep oracle, once for the full corpus and once for the
    * deterministic `sampleFrac` slice (`sampled = true` adds the same
    * 24-bit md5-draw restriction the engine applies, with the SAME
    * precomputed integer threshold [[LshSampleThresh]]) — one SQL body so
    * the two registry entries cannot drift.
    */
  private def d16OracleSql(sampled: Boolean): String = {
    val sampleCte = if (sampled)
      s"""samp AS (SELECT doc_id FROM documents
         |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
         |        AS BIGINT) < $LshSampleThresh),
         |""".stripMargin
    else ""
    val compFilter = if (sampled)
      " WHERE doc_id IN (SELECT doc_id FROM samp)" else ""
    s"WITH $lshSigShinglePrologue,\n" +
      sampleCte +
      s"""comp AS (SELECT doc_id, g, sig[g+1] AS v
         |         FROM s, range(0, 16) t(g)$compFilter),
         |cand16 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |           FROM comp a JOIN comp b
         |             ON a.g = b.g AND a.v = b.v AND a.doc_id < b.doc_id),
         |p AS (SELECT c.id_a, c.id_b,
         |        [sa.sig[i] = sb.sig[i] FOR i IN generate_series(1, 16)]
         |          AS mask,
         |        (CASE WHEN len(ja.shs) + len(jb.shs) = 0 THEN 0.0
         |              ELSE CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
         |                   / (len(ja.shs) + len(jb.shs)
         |                      - len(list_intersect(ja.shs, jb.shs)))
         |         END >= $LshSweepThreshold) AS is_dup
         |      FROM cand16 c
         |      JOIN s sa ON sa.doc_id = c.id_a
         |      JOIN s sb ON sb.doc_id = c.id_b
         |      JOIN sh ja ON ja.doc_id = c.id_a
         |      JOIN sh jb ON jb.doc_id = c.id_b),
         |cfg(bands, rows_per_band) AS (VALUES (2, 8), (4, 4), (8, 2), (16, 1)),
         |caught AS (
         |  SELECT p.is_dup, cfg.bands, cfg.rows_per_band,
         |    len([g FOR g IN generate_series(0, cfg.bands - 1)
         |         IF NOT list_contains(
         |              mask[g * cfg.rows_per_band + 1 :
         |                   g * cfg.rows_per_band + cfg.rows_per_band],
         |              false)]) > 0 AS hit
         |  FROM p CROSS JOIN cfg)
         |SELECT bands, rows_per_band,
         |  count(*) AS n_candidates,
         |  count(*) FILTER (WHERE is_dup) AS n_true_dups
         |FROM caught WHERE hit
         |GROUP BY bands, rows_per_band
         |ORDER BY bands""".stripMargin
  }

  /** The production bands=4 candidate pairing over [[lshSigShinglePrologue]]
    * — d09/d10's blocker; d16 swaps in its own finest-granularity pairing.
    */
  private val lshOraclePrologue: String =
    s"""$lshSigShinglePrologue,
       |bk AS (SELECT doc_id, g,
       |         array_to_string(sig[(g*4+1):(g*4+4)], ',') AS bkey
       |       FROM s, range(0, 4) t(g)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bk a JOIN bk b
       |           ON a.g = b.g AND a.bkey = b.bkey AND a.doc_id < b.doc_id)""".stripMargin

  /** Shared s07/s08/s13 oracle prologue: IVF centroid table + nearest-
    * centroid corpus assignment — one constant (the lshOraclePrologue
    * pattern) so a tie-break or rounding change to the probe family's
    * assignment can never drift between the three oracles.
    */
  /** Shared s03/d15 16-cell blocking prologue: centroid table, argmax
    * assignment, and the assigned-vector view `v` — one constant so the
    * near-dup pair generation and the semantic-dedup decision built on it
    * can never diverge in blocking or assignment.
    */
  private val cell16Prologue: String =
    """cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
      |         FROM embeddings WHERE vec_id < 16),
      |asg AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, cent.centroid_id,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY list_cosine_similarity(
      |                                CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
      |                              cent.centroid_id) AS rn
      |    FROM embeddings e, cent) WHERE rn = 1),
      |v AS (SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS vv,
      |             a.centroid_id
      |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id)""".stripMargin

  /** Shared t28/t30 oracle CTEs: tokenization → word-frequency vocab →
    * per-position character pairs — one constant so the pair table a
    * merge is chosen from (t28) can never drift from the pair table the
    * merge is applied with (t30).
    */
  /** Shared t28/t30/t40 oracle tokenization → word-frequency vocab — one
    * constant so the vocab a merge table is trained over (t40) is the
    * vocab the single-round views (t28/t30) see.
    */
  private val bpeTokWfCtes: String =
    """tok AS (
      |  SELECT CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
      |  FROM documents),
      |wf AS (SELECT w, count(*) AS tf
      |       FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w)""".stripMargin

  private val bpeVocabCtes: String =
    s"""$bpeTokWfCtes,
      |e AS (SELECT w, tf,
      |        unnest([i FOR i IN generate_series(1, length(w) - 1)]) AS i
      |      FROM wf WHERE length(w) >= 2),
      |p AS (SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2, tf
      |      FROM e)""".stripMargin

  /** t40 oracle: the SAME training loop unrolled as one CTE block per
    * round (the g01 fixed-iteration recipe), over [[bpeTokWfCtes]]'s
    * vocab with codepoint initial symbols. The greedy non-overlapping
    * application is done RELATIONALLY: match positions are grouped into
    * maximal consecutive runs (`i − row_number` constant within a run —
    * consecutive matches only arise from repeated-symbol runs), and the
    * odd-ranked position in each run is selected, which IS the
    * left-to-right scan (a selected match at i consumes i+1, so the
    * next selectable is i+2); selected positions emit the merged symbol
    * and suppress their successor row.
    *
    * The state CTEs (s0/sK, bK, gK) are AS MATERIALIZED — the t24
    * lesson, load-bearing here: DuckDB inlines CTEs by default, and
    * with three consumers per round the inlined chain re-plans the
    * whole prefix ~3^rounds times (observed as a file-handle blowup at
    * 8 rounds before pinning).
    */
  /** The codepoint initial-symbol state — shared by the t40 and t41
    * oracles so training and application segment identically. */
  private val bpeS0Cte: String =
    """s0 AS MATERIALIZED (SELECT w, tf,
      |         [substr(w, i, 1) FOR i IN generate_series(1, length(w))]
      |           AS sy
      |       FROM wf WHERE length(w) >= 1)""".stripMargin

  /** One chained CTE block per training round (s0 → s`rounds`); shared
    * by [[bpeTrainSql]] (reads every rK) and the t41 tokenize oracle
    * (reads only the final state). */
  private def bpeRoundBlocks(rounds: Int): String =
    (1 to rounds).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS (
         |  SELECT u.c1 AS c1, u.c2 AS c2, CAST(sum(tf) AS BIGINT) AS pc
         |  FROM (SELECT tf,
         |          unnest([{'c1': sy[i], 'c2': sy[i+1]}
         |                  FOR i IN generate_series(1, len(sy) - 1)]) AS u
         |        FROM $prev)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT c1, c2, pc FROM p$k
         |        ORDER BY pc DESC, c1, c2 LIMIT 1),
         |x$k AS (
         |  SELECT s.w, unnest([i FOR i IN generate_series(1, len(sy) - 1)
         |                      IF sy[i] = b.c1 AND sy[i+1] = b.c2]) AS i
         |  FROM $prev s, b$k b),
         |g$k AS MATERIALIZED (
         |  SELECT w, i FROM (
         |    SELECT w, i, row_number() OVER (PARTITION BY w, i - rn
         |                                    ORDER BY i) AS j
         |    FROM (SELECT w, i,
         |            row_number() OVER (PARTITION BY w ORDER BY i) AS rn
         |          FROM x$k))
         |  WHERE j % 2 = 1),
         |z$k AS (
         |  SELECT w, tf, u.i AS i, u.sym AS sym FROM (
         |    SELECT w, tf, unnest([{'i': i, 'sym': sy[i]}
         |                          FOR i IN generate_series(1, len(sy))]) AS u
         |    FROM $prev)),
         |y$k AS (
         |  SELECT z.w, z.tf, z.i,
         |    CASE WHEN g.i IS NOT NULL THEN b.c1 || b.c2 ELSE z.sym END
         |      AS sym,
         |    gp.i IS NOT NULL AS skip
         |  FROM z$k z
         |  CROSS JOIN b$k b
         |  LEFT JOIN g$k g ON g.w = z.w AND g.i = z.i
         |  LEFT JOIN g$k gp ON gp.w = z.w AND gp.i = z.i - 1),
         |s$k AS MATERIALIZED (
         |  SELECT w, tf, list(sym ORDER BY i) AS sy
         |  FROM y$k WHERE NOT skip GROUP BY w, tf
         |  UNION ALL
         |  SELECT w, tf, sy FROM $prev
         |  WHERE (SELECT count(*) FROM b$k) = 0),
         |r$k AS (
         |  SELECT $k AS rank, b.c1, b.c2, b.pc AS pair_count,
         |    (SELECT CAST(sum(tf * len(sy)) AS BIGINT) FROM s$k)
         |      AS tokens_after
         |  FROM b$k b)""".stripMargin
    }.mkString(",\n")

  /** t45's apply-side blocks: each trained pick b$k applied in rank
    * order to the HELD-OUT vocab h0 → h`rounds`, the same x/g/z/y
    * greedy-run machinery as [[bpeRoundBlocks]] but with no pair
    * recount (the merge table is foreign — that is the point). Both
    * this chain and [[bpeRoundBlocks]]'s state chain pass the previous
    * state through UNCHANGED when a round's pick b$k is empty (the
    * train slice ran out of pairs) — the engine's truncated-merge-table
    * semantics, so a degenerate train corpus can't zero the held-out
    * counts. */
  private def bpeApplyBlocks(rounds: Int): String =
    (1 to rounds).map { k =>
      val prev = s"h${k - 1}"
      s"""hx$k AS (
         |  SELECT h.w, unnest([i FOR i IN generate_series(1, len(sy) - 1)
         |                      IF sy[i] = b.c1 AND sy[i+1] = b.c2]) AS i
         |  FROM $prev h, b$k b),
         |hg$k AS MATERIALIZED (
         |  SELECT w, i FROM (
         |    SELECT w, i, row_number() OVER (PARTITION BY w, i - rn
         |                                    ORDER BY i) AS j
         |    FROM (SELECT w, i,
         |            row_number() OVER (PARTITION BY w ORDER BY i) AS rn
         |          FROM hx$k))
         |  WHERE j % 2 = 1),
         |hz$k AS (
         |  SELECT w, u.i AS i, u.sym AS sym FROM (
         |    SELECT w, unnest([{'i': i, 'sym': sy[i]}
         |                      FOR i IN generate_series(1, len(sy))]) AS u
         |    FROM $prev)),
         |hy$k AS (
         |  SELECT z.w, z.i,
         |    CASE WHEN g.i IS NOT NULL THEN b.c1 || b.c2 ELSE z.sym END
         |      AS sym,
         |    gp.i IS NOT NULL AS skip
         |  FROM hz$k z
         |  CROSS JOIN b$k b
         |  LEFT JOIN hg$k g ON g.w = z.w AND g.i = z.i
         |  LEFT JOIN hg$k gp ON gp.w = z.w AND gp.i = z.i - 1),
         |h$k AS MATERIALIZED (
         |  SELECT w, list(sym ORDER BY i) AS sy
         |  FROM hy$k WHERE NOT skip GROUP BY w
         |  UNION ALL
         |  SELECT w, sy FROM $prev
         |  WHERE (SELECT count(*) FROM b$k) = 0)""".stripMargin
    }.mkString(",\n")

  /** t45 oracle: train on the doc_id % `trainMod` == 0 slice (the SAME
    * unrolled chain as t40, seeded from the split's word frequencies),
    * then apply b1..b`rounds` to the held-out DISTINCT vocab and price
    * held-out docs through the word join — the t41 consumption shape on
    * a foreign merge table. */
  private def bpeApplyHeldOutSql(rounds: Int, trainMod: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
       |  FROM documents),
       |wf AS (SELECT w, count(*) AS tf
       |       FROM (SELECT unnest(t) AS w FROM tok
       |             WHERE doc_id % $trainMod = 0) GROUP BY w),
       |$bpeS0Cte,
       |${bpeRoundBlocks(rounds)},
       |hv AS (SELECT DISTINCT w
       |       FROM (SELECT unnest(t) AS w FROM tok
       |             WHERE doc_id % $trainMod <> 0)
       |       WHERE length(w) >= 1),
       |h0 AS MATERIALIZED (
       |  SELECT w, [substr(w, i, 1) FOR i IN generate_series(1, length(w))]
       |           AS sy
       |  FROM hv),
       |${bpeApplyBlocks(rounds)},
       |inst AS (SELECT doc_id, unnest(t) AS w FROM tok
       |         WHERE doc_id % $trainMod <> 0),
       |j AS (
       |  SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(length(i.w)) AS BIGINT) AS n_chars,
       |         CAST(sum(len(h.sy)) AS BIGINT) AS n_bpe_tokens
       |  FROM inst i JOIN h$rounds h ON h.w = i.w
       |  WHERE length(i.w) >= 1
       |  GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(j.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(j.n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(coalesce(j.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $trainMod <> 0) d
       |LEFT JOIN j USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Shared oracle prefix for t42/d30: the winnowing selection re-derived
    * relationally — gram md5-draw hashes as a per-doc list, positions and
    * windows as rows, per-window min, rightmost position achieving it
    * (max(pos) at fp = min — the engine fold's <= tie rule). Ends at
    * `pick(doc_id, pos, fp)` (one row per (doc, window); DISTINCT is the
    * consumer's job).
    */
  private def winnowPickSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id,
       |    [CAST(CAST('0x' || substr(md5(
       |        array_to_string(t[i:i+${WinnowK - 1}], ' ')), 1, 6)
       |      AS INTEGER) AS BIGINT)
       |     FOR i IN generate_series(1, len(t) - ${WinnowK - 1})] AS h
       |  FROM tok WHERE len(t) >= $WinnowK),
       |hrow0 AS (SELECT doc_id, h, len(h) AS m,
       |                 unnest(generate_series(1, len(h))) AS pos FROM hs),
       |hrow AS (SELECT doc_id, m, pos, h[pos] AS fp FROM hrow0),
       |wins AS (SELECT doc_id,
       |           unnest(generate_series(1, greatest(1, len(h) - ${WinnowW - 1})))
       |             AS j
       |         FROM hs),
       |pairs AS (SELECT h.doc_id, w.j, h.pos, h.fp
       |          FROM hrow h JOIN wins w ON w.doc_id = h.doc_id
       |           AND h.pos BETWEEN w.j AND least(w.j + ${WinnowW - 1}, h.m)),
       |mn AS (SELECT doc_id, j, min(fp) AS mn FROM pairs GROUP BY 1, 2),
       |pick AS (SELECT p.doc_id, max(p.pos) AS pos, m.mn AS fp
       |         FROM pairs p JOIN mn m ON m.doc_id = p.doc_id AND m.j = p.j
       |         WHERE p.fp = m.mn GROUP BY p.doc_id, p.j, m.mn)""".stripMargin

  /** Shared oracle prefix for t43/s28: the strided chunk chain — token
    * arrays, closed-form chunk count, one row per (doc, chunk j) with the
    * token array and counts still attached (`j0(doc_id, t, n, j)`).
    */
  private def chunkChainSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
       |  FROM documents),
       |c AS (SELECT doc_id, t, len(t) AS n,
       |        CASE WHEN len(t) = 0 THEN 0
       |             WHEN len(t) <= $ChunkTokens THEN 1
       |             ELSE 1 + (len(t) - ${ChunkTokens - ChunkStride + 1})
       |                      // $ChunkStride END AS nc
       |      FROM tok),
       |j0 AS (SELECT doc_id, t, n, unnest(generate_series(0, nc - 1)) AS j
       |       FROM c WHERE nc >= 1)""".stripMargin

  /** Shared oracle prefix for s28/s29: the chunk chain + hashed-BoW
    * bucket weights (cw/qw) + norms + dots + cosine scoring, through
    * `ranked(query_id, corpus_id, chunk_id, sim, rank)`; `chunks`, `q`,
    * `cw`, `qw` stay visible for consumers needing the raw weights.
    * Every standing consumer embeds at [[BowDim]]; s37 re-derives the
    * whole core at [[BowDimWide]] (a different hashed-BoW projection,
    * not a re-keying) via [[chunkRetrievalCoreSqlAt]].
    */
  private def chunkRetrievalCoreSql: String =
    chunkRetrievalCoreSqlAt(BowDim)

  /** s35/s38's shared oracle: the banded OR-construction's candidate
    * CTEs over the core at `dim` — sign keys, per-geometry band keys,
    * DISTINCT candidates, the core's per-pair sims restricted onto
    * them, re-ranked within — parameterized by (dim, bands) exactly as
    * the engine's [[SimilarityOps.chunkBandTopK]] is, so the two
    * executed geometries (s35's fixture-scale 4×4-bit and s38's
    * scale-true 2×16-bit) are ONE definition, two dial settings.
    */
  /** The two bitext sides — deterministic embedding halves, shared by
    * the s39 (exact cross) and s40 (banded) oracle prologues. */
  /** The deterministic two-side split, ONE definition both engines can
    * honor for ANY int64 id: `abs(id % 2)`. Spark's `pmod(id, 2)` and
    * SQL's `id % 2` disagree on negative ids (1 vs -1) — the fixtures
    * only mint non-negative ids, but the parity contract shouldn't
    * depend on a fixture convention (r14 ADVICE). abs(x % 2) ≡
    * pmod(x, 2) for modulus 2 since x % 2 ∈ {-1, 0, 1}. */
  private def bitextSide(id: Column): Column = abs(id % lit(2L))

  /** `leftExtra`: additional left-side predicate (the s40s/s41s sampled
    * audit rungs subsample the LEFT/query side — same miner, 1/16 the
    * query mass). */
  private def bitextSidesSql(leftExtra: String = ""): String =
    s"""WITH l AS (SELECT vec_id AS id_l, CAST(embedding AS DOUBLE[]) AS lv
      |           FROM embeddings WHERE abs(vec_id % 2) = 0$leftExtra),
      |r AS (SELECT vec_id AS id_r, CAST(embedding AS DOUBLE[]) AS rv
      |      FROM embeddings WHERE abs(vec_id % 2) = 1)""".stripMargin

  /** The banded candidate universe, SCORED — sign signature over the
    * first `sigDim` coordinates, 2 bands of sigDim/2 bits, cross-side
    * (band, key) equi-join, micro-unit cosine on candidates only. ONE
    * definition for s40/s41 (sigDim 16) and s42 (sigDim 32), mirroring
    * the engine's bitextBandedScored. */
  private def bitextBandedScoredSql(sigDim: Int = 16,
      leftExtra: String = ""): String = {
    val bits = sigDim / 2
    val mask = (1L << bits) - 1
    bitextSidesSql(leftExtra) +
      s""",
        |lsig AS (SELECT id_l, lv,
        |    sum(CASE WHEN lv[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
        |        ELSE 0 END) AS sig
        |  FROM l, generate_series(1, $sigDim) g(i) GROUP BY id_l, lv),
        |rsig AS (SELECT id_r, rv,
        |    sum(CASE WHEN rv[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
        |        ELSE 0 END) AS sig
        |  FROM r, generate_series(1, $sigDim) g(i) GROUP BY id_r, rv),
        |lb AS (SELECT id_l, band, (sig >> (band * $bits)) & $mask AS key
        |       FROM lsig, (VALUES (0), (1)) b(band)),
        |rb AS (SELECT id_r, band, (sig >> (band * $bits)) & $mask AS key
        |       FROM rsig, (VALUES (0), (1)) b(band)),
        |cpair AS (SELECT DISTINCT lb.id_l, rb.id_r
        |          FROM lb JOIN rb ON lb.band = rb.band
        |                         AND lb.key = rb.key),
        |scored AS (
        |  SELECT c.id_l, c.id_r,
        |         CAST(round(CASE WHEN list_dot_product(l.lv, l.lv) = 0
        |                           OR list_dot_product(r.rv, r.rv) = 0
        |                    THEN 0.0
        |                    ELSE list_cosine_similarity(l.lv, r.rv) END
        |                    * 1e6, 0) AS BIGINT) AS sim_micro
        |  FROM cpair c JOIN l ON l.id_l = c.id_l
        |               JOIN r ON r.id_r = c.id_r)""".stripMargin
  }

  /** The ratio-margin criterion downstream of a `scored(id_l, id_r,
    * sim_micro)` CTE — per-side top-4 integer neighborhood sums (the
    * heap's order spelled as a window), one double division, mutual
    * margin-argmax. ONE definition for s39 and s40, mirroring the
    * engine's shared bitextMarginTail. */
  private def bitextMarginTailSql: String =
    """,
      |rk AS (
      |  SELECT id_l, id_r, sim_micro,
      |         row_number() OVER (PARTITION BY id_l
      |                            ORDER BY sim_micro DESC, id_r) AS rl,
      |         row_number() OVER (PARTITION BY id_r
      |                            ORDER BY sim_micro DESC, id_l) AS rr
      |  FROM scored),
      |sl AS (SELECT id_l, CAST(sum(sim_micro) AS BIGINT) AS sum_l,
      |              count(*) AS cnt_l FROM rk WHERE rl <= 4 GROUP BY id_l),
      |sr AS (SELECT id_r, CAST(sum(sim_micro) AS BIGINT) AS sum_r,
      |              count(*) AS cnt_r FROM rk WHERE rr <= 4 GROUP BY id_r),
      |marg AS (
      |  SELECT rk.id_l, rk.id_r, rk.sim_micro,
      |         2.0 * rk.sim_micro * sl.cnt_l * sr.cnt_r
      |           / (sl.sum_l * sr.cnt_r + sr.sum_r * sl.cnt_l) AS margin
      |  FROM rk JOIN sl USING (id_l) JOIN sr USING (id_r)
      |  WHERE (rk.rl <= 4 OR rk.rr <= 4)
      |    AND sl.sum_l * sr.cnt_r + sr.sum_r * sl.cnt_l <> 0),
      |mb AS (
      |  SELECT id_l, id_r, sim_micro, margin,
      |         row_number() OVER (PARTITION BY id_l
      |                            ORDER BY margin DESC, id_r) AS bl,
      |         row_number() OVER (PARTITION BY id_r
      |                            ORDER BY margin DESC, id_l) AS br
      |  FROM marg)
      |SELECT id_l, id_r, round(sim_micro / 1e6, 6) AS sim,
      |       round(margin, 6) AS margin
      |FROM mb WHERE bl = 1 AND br = 1 ORDER BY id_l""".stripMargin

  /** The FORWARD-leg tail downstream of a `scored(id_l, id_r,
    * sim_micro)` CTE — fwd top-4 per left id, the right-side
    * neighborhood from the bwd top-4 sums (the release-artifact
    * definition), margin argmax per left id, NO mutual filter. ONE
    * definition for s41 (sigDim 16) and s43 (sigDim 32), mirroring the
    * engine's bitextForwardBest. */
  private def bitextForwardTailSql: String =
    """,
      |rk AS (
      |  SELECT id_l, id_r, sim_micro,
      |         row_number() OVER (PARTITION BY id_l
      |                            ORDER BY sim_micro DESC, id_r) AS rl,
      |         row_number() OVER (PARTITION BY id_r
      |                            ORDER BY sim_micro DESC, id_l) AS rr
      |  FROM scored),
      |sx AS (SELECT id_l, CAST(sum(sim_micro) AS BIGINT) AS sum_l,
      |              count(*) AS cnt_l FROM rk WHERE rl <= 4
      |       GROUP BY id_l),
      |sy AS (SELECT id_r, CAST(sum(sim_micro) AS BIGINT) AS sum_r,
      |              count(*) AS cnt_r FROM rk WHERE rr <= 4
      |       GROUP BY id_r),
      |marg AS (
      |  SELECT rk.id_l, rk.id_r, rk.sim_micro,
      |         2.0 * rk.sim_micro * sx.cnt_l * sy.cnt_r
      |           / (sx.sum_l * sy.cnt_r + sy.sum_r * sx.cnt_l) AS margin
      |  FROM rk JOIN sx USING (id_l) JOIN sy USING (id_r)
      |  WHERE rk.rl <= 4
      |    AND sx.sum_l * sy.cnt_r + sy.sum_r * sx.cnt_l <> 0),
      |best AS (
      |  SELECT id_l, id_r, sim_micro, margin,
      |         row_number() OVER (PARTITION BY id_l
      |                            ORDER BY margin DESC, id_r) AS bn
      |  FROM marg)
      |SELECT id_l, id_r, round(sim_micro / 1e6, 6) AS sim,
      |       round(margin, 6) AS margin
      |FROM best WHERE bn = 1 ORDER BY id_l""".stripMargin

  private def chunkBandTopKSqlAt(dim: Int, bands: Int): String = {
    val b = dim / bands
    chunkRetrievalCoreSqlAt(dim) +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |cband AS (SELECT doc_id, chunk_id, band,
         |    (sig >> (band * $b)) & ${(1L << b) - 1} AS key
         |  FROM (SELECT doc_id, chunk_id, sig,
         |          unnest(generate_series(0, ${bands - 1})) AS band
         |        FROM csig)),
         |qband AS (SELECT query_id, band,
         |    (sig >> (band * $b)) & ${(1L << b) - 1} AS key
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${bands - 1})) AS band
         |        FROM qsig)),
         |cand AS (SELECT DISTINCT qb.query_id, cb.doc_id AS corpus_id,
         |    cb.chunk_id
         |  FROM cband cb JOIN qband qb
         |    ON cb.band = qb.band AND cb.key = qb.key
         |    AND cb.doc_id <> qb.query_id),
         |cscored AS (SELECT s.query_id, s.corpus_id, s.chunk_id, s.sim
         |  FROM scored s JOIN cand c ON c.query_id = s.query_id
         |    AND c.corpus_id = s.corpus_id AND c.chunk_id = s.chunk_id),
         |cranked AS (SELECT query_id, corpus_id, chunk_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, corpus_id, chunk_id) AS rank
         |  FROM cscored)
         |SELECT query_id, corpus_id, chunk_id, CAST(rank AS INT) AS rank,
         |  round(sim, 6) AS sim
         |FROM cranked WHERE rank <= $ChunkTopK
         |ORDER BY query_id, rank""".stripMargin
  }

  private def chunkRetrievalCoreSqlAt(dim: Int): String = chunkChainSql +
    (s""",
         |chunks AS (SELECT doc_id, CAST(j AS INT) AS chunk_id,
         |    array_to_string(t[(j * $ChunkStride + 1):
         |      (j * $ChunkStride + least($ChunkTokens, n - j * $ChunkStride))],
         |      ' ') AS chunk_text
         |  FROM j0),
         |ctok AS (SELECT doc_id, chunk_id,
         |    unnest(CASE WHEN len(trim(chunk_text)) = 0 THEN CAST([] AS VARCHAR[])
         |           ELSE regexp_split_to_array(trim(chunk_text), '\\s+') END) AS tk
         |  FROM chunks),
         |cw AS (SELECT doc_id, chunk_id,
         |    CAST(CAST('0x' || substr(md5(tk), 1, 6) AS INTEGER) AS BIGINT)
         |      % $dim AS b,
         |    sum(CASE WHEN CAST('0x' || substr(md5(tk), 7, 1) AS INTEGER) < 8
         |        THEN 1 ELSE -1 END) AS w
         |  FROM ctok GROUP BY 1, 2, 3),
         |cn2 AS (SELECT doc_id, chunk_id, sum(w * w) AS n2 FROM cw GROUP BY 1, 2),
         |q AS (SELECT doc_id AS query_id, text FROM documents
         |      WHERE doc_id % $ChunkQueryMod = 0),
         |qtok AS (SELECT query_id,
         |    unnest(CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |           ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tk
         |  FROM q),
         |qw AS (SELECT query_id,
         |    CAST(CAST('0x' || substr(md5(tk), 1, 6) AS INTEGER) AS BIGINT)
         |      % $dim AS b,
         |    sum(CASE WHEN CAST('0x' || substr(md5(tk), 7, 1) AS INTEGER) < 8
         |        THEN 1 ELSE -1 END) AS w
         |  FROM qtok GROUP BY 1, 2),
         |qn2 AS (SELECT query_id, sum(w * w) AS n2 FROM qw GROUP BY 1),
         |dots AS (SELECT qw.query_id, cw.doc_id, cw.chunk_id,
         |    sum(qw.w * cw.w) AS dt
         |  FROM qw JOIN cw USING (b) GROUP BY 1, 2, 3),
         |base AS (SELECT q.query_id, ch.doc_id AS corpus_id, ch.chunk_id
         |  FROM q, chunks ch WHERE ch.doc_id <> q.query_id),
         |scored AS (SELECT p.query_id, p.corpus_id, p.chunk_id,
         |    CASE WHEN coalesce(c2.n2, 0) = 0 OR coalesce(q2.n2, 0) = 0
         |         THEN 0.0
         |         ELSE coalesce(d.dt, 0) / (sqrt(q2.n2) * sqrt(c2.n2)) END
         |      AS sim
         |  FROM base p
         |  LEFT JOIN cn2 c2 ON c2.doc_id = p.corpus_id
         |    AND c2.chunk_id = p.chunk_id
         |  LEFT JOIN qn2 q2 ON q2.query_id = p.query_id
         |  LEFT JOIN dots d ON d.query_id = p.query_id
         |    AND d.doc_id = p.corpus_id AND d.chunk_id = p.chunk_id),
         |ranked AS (SELECT query_id, corpus_id, chunk_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, corpus_id, chunk_id) AS rank
         |  FROM scored)""".stripMargin)

  private def bpeTrainSql(rounds: Int): String = {
    val union = (1 to rounds).map(k => s"SELECT * FROM r$k")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeTokWfCtes,
       |$bpeS0Cte,
       |${bpeRoundBlocks(rounds)}
       |SELECT rank, c1, c2, pair_count, tokens_after FROM (
       |$union)
       |ORDER BY rank""".stripMargin
  }

  /** t41 oracle: the identical unrolled training chain, but over a
    * doc-level tokenization (tok carries doc_id; wf is the same
    * multiset), consuming only the FINAL state — per-word symbol counts
    * joined back onto token instances and summed per document. Null,
    * empty, and all-empty-token docs coalesce to zeros (the budgeter
    * semantics — see RelevanceOps.bpeTokenCounts).
    */
  private def bpeTokenizeSql(rounds: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
       |  FROM documents),
       |wf AS (SELECT w, count(*) AS tf
       |       FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
       |$bpeS0Cte,
       |${bpeRoundBlocks(rounds)},
       |inst AS (SELECT doc_id, unnest(t) AS w FROM tok),
       |j AS (
       |  SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(length(i.w)) AS BIGINT) AS n_chars,
       |         CAST(sum(len(s.sy)) AS BIGINT) AS n_bpe_tokens
       |  FROM inst i JOIN s$rounds s ON s.w = i.w
       |  WHERE length(i.w) >= 1
       |  GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(j.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(j.n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(coalesce(j.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents d LEFT JOIN j USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Shared t23/t25 oracle CTEs: tokenization → bigram counts → per-
    * transition interpolated micro-nat cost (`per`) — one constant so the
    * xent a doc is bucketed by (t25) can never drift from the xent it
    * reports (t23). λ interpolates from LmInterpNum/LmInterpDen, the same
    * exact-binary rational the engine uses.
    */
  private val interpXentCtes: String =
    s"""tok AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id,
       |    unnest([{'w1': t[g], 'w2': t[g+1]}
       |            FOR g IN generate_series(1, len(t) - 1)]) AS p
       |  FROM tok),
       |b2 AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
       |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM b2 GROUP BY 1, 2, 3),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b2 GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM b2 GROUP BY w1),
       |c2 AS (SELECT w2, count(*) AS c2 FROM b2 GROUP BY w2),
       |tv AS (SELECT CAST(count(*) AS DOUBLE) AS t,
       |              CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM b2),
       |per AS (
       |  SELECT tf.doc_id, tf.tf,
       |    CAST(round(tf.tf * -ln(
       |        ($LmInterpNum.0 / $LmInterpDen)
       |          * (c12.c12 / CAST(c1.c1 AS DOUBLE))
       |        + (1 - $LmInterpNum.0 / $LmInterpDen)
       |          * ((c2.c2 + 1.0) / (tv.t + tv.v))) * 1e6)
       |         AS BIGINT) AS cm
       |  FROM tf JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
       |          JOIN c2 USING (w2), tv)""".stripMargin

  /** Shared s16/s17 oracle prologue: 16-centroid table + nearest-centroid
    * assignment KEEPING the similarity (unlike cell16Prologue, whose `asg`
    * drops it) — one constant so the exact-rank and quantile-threshold
    * prune decisions can never drift in assignment or tie-break.
    */
  private val proto16Prologue: String =
    """cent AS (SELECT vec_id AS centroid_id,
      |                CAST(embedding AS DOUBLE[]) AS cv
      |         FROM embeddings WHERE vec_id < 16),
      |a AS (
      |  SELECT vec_id, centroid_id, sim FROM (
      |    SELECT e.vec_id, cent.centroid_id,
      |           list_cosine_similarity(
      |             CAST(e.embedding AS DOUBLE[]), cent.cv) AS sim,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY list_cosine_similarity(
      |                                CAST(e.embedding AS DOUBLE[]),
      |                                cent.cv) DESC,
      |                              cent.centroid_id) AS rn
      |    FROM embeddings e, cent) WHERE rn = 1)""".stripMargin

  private val ivfOraclePrologue: String =
    """cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
      |         FROM embeddings WHERE vec_id < 8),
      |asg AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, cent.centroid_id,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY list_cosine_similarity(
      |                                CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
      |                              cent.centroid_id) AS rn
      |    FROM embeddings e, cent) WHERE rn = 1)""".stripMargin

  /** m11's full audio-cluster recompute — the m10 LCG/window chain at
    * 5-frame windows over base + re-keyed copies, the fa/fb 64-delta
    * packing, the 4-way fair-split banded pair join with the full-series Hamming
    * verify, and the recursive min-label closure, ending at the `reach`
    * CTE. ONE constant shared by the m11 ledger oracle and m12's
    * histogram so the two figures can never cluster differently.
    * Callers prepend "WITH RECURSIVE " and append their final SELECT
    * (m12 adds its own CTEs after a comma first). */
  private val audioClusterOraclePrologue: String =
    """a AS (
      |  SELECT doc_id AS media_id, doc_id AS seed,
      |         CAST(50 + length(text) % 200 AS INT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 1
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS media_id, doc_id AS seed,
      |         CAST(50 + length(text) % 200 AS INT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT media_id, seed,
      |         unnest([i FOR i IN generate_series(0, n_frames - 1)]) AS i
      |  FROM a),
      |v AS (
      |  SELECT media_id, i, i // 5 AS window_idx,
      |         (seed * 31 + i * 2654435761) % 65536 AS u
      |  FROM s),
      |x AS (SELECT media_id, window_idx,
      |             abs(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS ax
      |      FROM v),
      |w AS (SELECT media_id, window_idx,
      |             (1000 * sum(ax)) // count(*) AS mean_abs_milli
      |      FROM x GROUP BY media_id, window_idx),
      |d AS (SELECT media_id, window_idx, mean_abs_milli,
      |        lag(mean_abs_milli) OVER (PARTITION BY media_id
      |                                  ORDER BY window_idx) AS prev
      |      FROM w),
      |b AS (SELECT media_id, window_idx,
      |        CASE WHEN mean_abs_milli > prev THEN 1 ELSE 0 END AS bit
      |      FROM d WHERE prev IS NOT NULL AND window_idx <= 64),
      |nw AS (SELECT media_id, count(*) AS n_windows FROM w GROUP BY 1),
      |fp AS (SELECT media_id, count(*) AS n_bits,
      |         CAST(coalesce(sum(CASE WHEN window_idx <= 32
      |           THEN CAST(bit AS BIGINT)
      |             * (CAST(1 AS BIGINT) << (window_idx - 1)) END), 0)
      |           AS BIGINT) AS fa,
      |         CAST(coalesce(sum(CASE WHEN window_idx > 32
      |           THEN CAST(bit AS BIGINT)
      |             * (CAST(1 AS BIGINT) << (window_idx - 33)) END), 0)
      |           AS BIGINT) AS fb
      |       FROM b GROUP BY media_id),
      |pr AS (SELECT nw.media_id, nw.n_windows,
      |         coalesce(fp.n_bits, 0) AS n_bits,
      |         coalesce(fp.fa, 0) AS fa, coalesce(fp.fb, 0) AS fb
      |       FROM nw LEFT JOIN fp USING (media_id)),
      |bd AS (SELECT media_id, n_windows, fa, fb, bb.band,
      |         CASE
      |           WHEN lo >= 32 THEN
      |             (fb >> (lo - 32)) & ((CAST(1 AS BIGINT) << len) - 1)
      |           WHEN lo + len <= 32 THEN
      |             (fa >> lo) & ((CAST(1 AS BIGINT) << len) - 1)
      |           ELSE
      |             ((fa >> lo) & ((CAST(1 AS BIGINT) << (32 - lo)) - 1))
      |             | ((fb & ((CAST(1 AS BIGINT) << (lo + len - 32)) - 1))
      |                << (32 - lo))
      |         END AS band_key
      |       FROM (SELECT *,
      |               (bb0.band * n_bits) // 4 AS lo,
      |               ((bb0.band + 1) * n_bits) // 4
      |                 - (bb0.band * n_bits) // 4 AS len
      |             FROM pr, (SELECT unnest([0, 1, 2, 3]) AS band) bb0
      |             WHERE n_bits >= 8) bb),
      |e AS (SELECT DISTINCT l.media_id AS src, r.media_id AS dst
      |      FROM bd l JOIN bd r USING (n_windows, band, band_key)
      |      WHERE l.media_id < r.media_id
      |        AND bit_count(xor(l.fa, r.fa))
      |            + bit_count(xor(l.fb, r.fb)) <= 3),
      |eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      |reach(id, label) AS (
      |  SELECT media_id, media_id FROM pr
      |  UNION
      |  SELECT eb.dst, rr.label FROM reach rr JOIN eb ON eb.src = rr.id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Cross-IMPLEMENTATION oracles (the p19 murmur3 recipe): the VALUES
    // rows in SignatureVectors were computed by an independent pure-Python
    // implementation of each public algorithm over the same corpus —
    // xxHash64 from the public spec, java.util.Random's published LCG for
    // the (a·x+b) mod p minhash family, sign-vote SimHash, the polynomial
    // rolling hash, and the regex stopword lang-id — NOT by this engine.
    // LEFT JOIN from documents keeps a row (as a visible null mismatch)
    // if either side ever covers a different doc set.
    "d04_minhash_signatures" ->
      s"""WITH k(doc_id, sig_csv) AS (VALUES
         |  ${SignatureVectors.values(SignatureVectors.d04Minhash)})
         |SELECT d.doc_id, k.sig_csv
         |FROM documents d LEFT JOIN k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "d05_simhash_signatures" ->
      s"""WITH k(doc_id, simhash) AS (VALUES
         |  ${SignatureVectors.values(SignatureVectors.d05Simhash)})
         |SELECT d.doc_id, CAST(k.simhash AS BIGINT) AS simhash
         |FROM documents d LEFT JOIN k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // LSH end-to-end from the independent d04 signature vectors: banding
    // by slice equality (the engine's band key is a hash OF the slice, so
    // the pair sets agree absent a 64-bit collision), the MinHash
    // estimator as agreeing-components/16, exact Jaccard from raw text.
    "d09_lsh_estimates" ->
      (s"WITH $lshOraclePrologue\n" +
      """SELECT c.id_a, c.id_b,
        |  round(CAST(len(list_filter(range(1, 17), i -> sa.sig[i] = sb.sig[i]))
        |        AS DOUBLE) / 16.0, 6) AS est_jaccard,
        |  round(CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
        |        / (len(ja.shs) + len(jb.shs) - len(list_intersect(ja.shs, jb.shs))),
        |        6) AS jaccard
        |FROM cand c
        |JOIN s sa ON sa.doc_id = c.id_a JOIN s sb ON sb.doc_id = c.id_b
        |JOIN sh ja ON ja.doc_id = c.id_a JOIN sh jb ON jb.doc_id = c.id_b
        |ORDER BY id_a, id_b""".stripMargin),
    // d26: the d09 prologue's candidates and shingle arrays, with the
    // asymmetric |A∩B|/|A| ratios next to the integer set sizes.
    "d26_containment" ->
      (s"WITH $lshOraclePrologue\n" +
      """SELECT c.id_a, c.id_b,
        |  CAST(len(ja.shs) AS BIGINT) AS n_a,
        |  CAST(len(jb.shs) AS BIGINT) AS n_b,
        |  CAST(len(list_intersect(ja.shs, jb.shs)) AS BIGINT) AS n_common,
        |  round(CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
        |        / len(ja.shs), 6) AS containment_a,
        |  round(CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
        |        / len(jb.shs), 6) AS containment_b
        |FROM cand c
        |JOIN sh ja ON ja.doc_id = c.id_a JOIN sh jb ON jb.doc_id = c.id_b
        |ORDER BY id_a, id_b""".stripMargin),
    "t05_fingerprint" ->
      s"""WITH k(doc_id, fingerprint) AS (VALUES
         |  ${SignatureVectors.values(SignatureVectors.t05Fingerprint)})
         |SELECT d.doc_id, CAST(k.fingerprint AS BIGINT) AS fingerprint
         |FROM documents d LEFT JOIN k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t04_lang_id" ->
      s"""WITH k(lang_pred, n) AS (VALUES
         |  ${SignatureVectors.values(SignatureVectors.t04LangCounts)})
         |SELECT lang_pred, CAST(n AS BIGINT) AS n FROM k
         |ORDER BY lang_pred""".stripMargin,
    // s04: the 32-bit hyperplane sketch is arbitrary by construction
    // (seeded pseudo-random planes), so the sketch ints are engine-exported
    // (graft.tools.SketchDump — integer export, no float-literal formatting
    // at sign boundaries) and everything downstream of them — band slicing,
    // bucketed pair generation, distinctness, exact-cosine verify,
    // threshold — is independently recomputed here.
    "s04_lsh_neardup" ->
      s"""WITH sk(id, sketch) AS (VALUES
         |  ${SignatureVectors.values(SignatureVectors.s04Sketch)}),
         |v AS (SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS vv, sk.sketch
         |      FROM embeddings e JOIN sk ON sk.id = e.vec_id),
         |sl AS (SELECT v.id, s.slice, (v.sketch >> (s.slice * 8)) & 255 AS slice_key
         |       FROM v, (VALUES (0), (1), (2), (3)) s(slice)),
         |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |      FROM sl a JOIN sl b ON a.slice = b.slice
         |                         AND a.slice_key = b.slice_key
         |                         AND a.id < b.id)
         |SELECT p.id_a, p.id_b, round(list_cosine_similarity(va.vv, vb.vv), 6) AS sim
         |FROM p JOIN v va ON va.id = p.id_a JOIN v vb ON vb.id = p.id_b
         |WHERE list_cosine_similarity(va.vv, vb.vv) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin,
    // n_subwords counts CODE UNITS, not codepoints, for non-alnum chars:
    // the engine pins Spark's own composed-regex semantics, whose
    // lookaround split falls between surrogate halves — an astral char is
    // TWO pieces (TokenStatsImpl scaladoc). The last term adds one extra
    // per astral char on top of DuckDB's codepoint counting; the strip
    // term excludes only ASCII space, NOT \s (newlines/tabs count — both
    // found by fixture gates, rounds 7a/7b).
    "t01_token_stats" ->
      """SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) END AS n_distinct,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
        |    + len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
        |    + len(regexp_extract_all(text, '[\x{10000}-\x{10FFFF}]')) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    // keep gate interpolated from qualityKeepSql — the ONE formula t07
    // and t16 also read (review r7: hand-written copies could drift)
    // t35: interpXentCtes' per-doc xent (t23's exact epilogue, re-scaled
    // to e4 integers) joined with t34's score expression; HUGEINT
    // moments mirror the engine's DECIMAL(38,0) exactly, and the final
    // r repeats the same exact->double casts in the same
    // parenthesization.
    "t35_signal_corr" ->
      (s"WITH $interpXentCtes,\n" +
      """xd AS (SELECT doc_id,
        |         CAST(round(round(CAST(sum(cm) AS BIGINT) / 1e6 / sum(tf),
        |                          4) * 10000, 0) AS BIGINT) AS y
        |       FROM per GROUP BY doc_id),
        |f AS (
        |  SELECT doc_id, source,
        |    round((len(text) - len(regexp_replace(text, '[a-zA-Z]', '', 'g')))
        |          / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS alpha_ratio,
        |    round((len(text) - len(replace(text, ' ', '')))
        |          / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS space_ratio,
        |    round(len(replace(text, ' ', ''))
        |          / greatest(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |            AS DOUBLE), 1.0), 6) AS mean_token_len,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS n_tokens
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, source,
        |    CAST(round(alpha_ratio * 4000000, 0) AS BIGINT)
        |    + CAST(round(space_ratio * 2000000, 0) AS BIGINT)
        |    - CAST(round(mean_token_len * 250000, 0) AS BIGINT)
        |    + CAST(round(ln(1.0 + n_tokens) * 500000, 0) AS BIGINT) AS x
        |  FROM f),
        |j AS (SELECT sc.source, sc.x, xd.y
        |      FROM sc JOIN xd USING (doc_id)),
        |g AS (SELECT source, count(*) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx,
        |        sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |        sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        |      FROM j GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  CAST(CAST(sx AS BIGINT) // n AS BIGINT) AS mean_score_micro,
        |  CAST(CAST(sy AS BIGINT) // n AS BIGINT) AS mean_xent_e4,
        |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
        |            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |  END AS corr
        |FROM g ORDER BY source""".stripMargin),
    // t34: t02's feature expressions verbatim, each weighted term rounded
    // to integer micro-units before the sum (the ln term carries the
    // t09/t11 <=1-ulp caveat), integer bucket thresholds.
    "t34_edu_score" ->
      (s"WITH $eduScoreCtes\n" +
        """SELECT doc_id, source, score_micro,
          |  CASE WHEN score_micro >= 4630000 THEN 'high'
          |       WHEN score_micro >= 4370000 THEN 'medium'
          |       ELSE 'low' END AS edu_bucket
          |FROM t ORDER BY doc_id""".stripMargin),
    // t38: the engine's duplicated-slice corpus rebuilt verbatim; digest
    // rollup then bucket-span datasheet (same two levels).
    "t38_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |    WHERE doc_id % 10 = 0
        |  UNION ALL SELECT doc_id + 2000000, text FROM documents
        |    WHERE doc_id % 100 = 0),
        |s AS (
        |  SELECT md5(text) AS digest,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |         AS INTEGER) % 10 AS INT) AS bucket
        |  FROM corpus),
        |g AS (
        |  SELECT digest, CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
        |         CAST(count(*) AS BIGINT) AS n_docs
        |  FROM s GROUP BY digest)
        |SELECT n_buckets, count(*) AS n_digests,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs
        |FROM g GROUP BY n_buckets ORDER BY n_buckets""".stripMargin,
    // t39: the oracle's prefix sum is one naive global window — provably
    // the same values as the engine's two-level form (identical total
    // order, integer sums).
    "t39_budget_select" ->
      (s"WITH $eduScoreCtes,\n" +
        s"""c AS (
           |  SELECT doc_id, score_micro, CAST(n_tokens AS BIGINT) AS n_tokens,
           |    CAST(sum(n_tokens) OVER (ORDER BY score_micro DESC, doc_id
           |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           |  FROM t)
           |SELECT doc_id, score_micro, n_tokens, cum_tokens
           |FROM c WHERE cum_tokens <= ${SelectBudgetTokens}
           |ORDER BY score_micro DESC, doc_id""".stripMargin),
    "t02_quality_features" ->
      s"""SELECT doc_id,
         |  len(text) AS n_chars,
         |  CASE WHEN len(trim(text)) = 0 THEN 0
         |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |  round((len(text) - len(regexp_replace(text, '[a-zA-Z]', '', 'g')))
         |        / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS alpha_ratio,
         |  round((len(text) - len(replace(text, ' ', '')))
         |        / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS space_ratio,
         |  round((len(text) - (len(text) - len(replace(text, ' ', ''))))
         |        / greatest(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE), 1.0), 6)
         |    AS mean_token_len,
         |  ${qualityKeepSql("text")} AS keep
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t03_source_lang_rollup" ->
      """SELECT source, lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  round(avg(CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END), 4) AS avg_tokens
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "t07_clean_corpus" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, source,
         |    ${qualityKeepSql("text")} AS keep_q,
         |    md5(text) AS digest
         |  FROM documents),
        |g AS (
        |  SELECT *, min(CASE WHEN keep_q THEN doc_id END)
        |              OVER (PARTITION BY digest) AS min_id
        |  FROM f)
        |SELECT lang, source,
        |  count(*) AS n_docs,
        |  count(CASE WHEN NOT keep_q THEN 1 END) AS n_quality_rejected,
        |  count(CASE WHEN keep_q AND doc_id <> min_id THEN 1 END) AS n_dup_rejected,
        |  count(CASE WHEN keep_q AND doc_id = min_id THEN 1 END) AS n_kept
        |FROM g GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "t06_hash_split" ->
      """SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |            AS INTEGER) % 10 AS INT) AS bucket,
        |  count(*) AS n, min(doc_id) AS first_doc
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
    "t12_source_mix" ->
      """WITH k AS (
        |  SELECT source,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |         AS INTEGER) AS BIGINT) AS v,
        |    CAST((coalesce(TRY_CAST(regexp_extract(source, '([0-9]+)', 1)
        |           AS INTEGER), 0) % 4 + 1)
        |         AS BIGINT) * 4194304 AS thresh,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN v < thresh THEN 1 END) AS n_kept,
        |  CAST(coalesce(sum(CASE WHEN v < thresh THEN n_tokens END), 0)
        |       AS BIGINT) AS kept_tokens
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    // t21's float chain (divide → sqrt → least → ×2^24 → floor) is
    // IEEE-identical on both engines because no float ever reduces
    // across rows — see the engine comment.
    "t21_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
        |r AS (SELECT source, n_docs,
        |        CAST(floor(least(1.0,
        |          sqrt(CAST(n_total AS DOUBLE) / CAST(n_docs AS DOUBLE)) / 8)
        |          * 16777216.0) AS BIGINT) AS thresh
        |      FROM c, tot),
        |k AS (SELECT d.source,
        |        CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)
        |             AS INTEGER) AS BIGINT) AS v,
        |        CASE WHEN len(trim(d.text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(d.text), '\s+'))
        |        END AS n_tokens
        |      FROM documents d)
        |SELECT k.source, r.n_docs, r.thresh,
        |  count(CASE WHEN v < thresh THEN 1 END) AS n_kept,
        |  CAST(coalesce(sum(CASE WHEN v < thresh THEN n_tokens END), 0)
        |       AS BIGINT) AS kept_tokens
        |FROM k JOIN r USING (source)
        |GROUP BY k.source, r.n_docs, r.thresh
        |ORDER BY k.source""".stripMargin,
    "t13_pack_bins" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |         AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT source, doc_id, n_tokens,
         |  cum_before // $PackBudget AS bin_id,
         |  cum_before % $PackBudget AS bin_offset
         |FROM c ORDER BY source, doc_id""".stripMargin,
    // Line-level dedup: lines are 1-based here vs posexplode's 0-based —
    // only the (doc_id, line_no) ORDER matters (first-occurrence pick),
    // and it is identical. trim-then-digest matches the engine's
    // contentDigest(trim(line)) canonicalization.
    "d11_line_dedup" ->
      """WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |raw AS (SELECT doc_id, UNNEST(ls) AS line,
        |               UNNEST(generate_series(1, len(ls))) AS line_no FROM s),
        |l AS (SELECT doc_id, line_no, md5(trim(line)) AS ldigest
        |      FROM raw WHERE len(trim(line)) > 0),
        |m AS (SELECT doc_id, row_number() OVER (
        |        PARTITION BY ldigest ORDER BY doc_id, line_no) AS rn
        |      FROM l),
        |a AS (SELECT doc_id, count(*) AS n_lines,
        |        count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
        |        count(CASE WHEN rn > 1 THEN 1 END) AS n_removed
        |      FROM m GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_lines, 0) AS n_lines,
        |  coalesce(n_kept, 0) AS n_kept, coalesce(n_removed, 0) AS n_removed
        |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // d25: first-occurrence-per-(doc, line) via a within-doc window; the
    // rebuild string_aggs kept lines in original order. LEFT JOIN keeps
    // blank-only docs as (0, 0, '').
    "d25_selfdedup_lines" ->
      """WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |raw AS (SELECT doc_id, UNNEST(ls) AS line,
        |               UNNEST(generate_series(1, len(ls))) AS line_no FROM s),
        |l AS (SELECT doc_id, line_no, trim(line) AS line
        |      FROM raw WHERE len(trim(line)) > 0),
        |m AS (SELECT doc_id, line, line_no, row_number() OVER (
        |        PARTITION BY doc_id, line ORDER BY line_no) AS rn
        |      FROM l),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |        CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
        |        string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
        |                   ORDER BY line_no) AS clean_text
        |      FROM m GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_lines, 0) AS n_lines,
        |  coalesce(n_kept, 0) AS n_kept,
        |  coalesce(clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "d12_boilerplate_lines" ->
      """WITH raw AS (SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line
        |             FROM documents),
        |l AS (SELECT doc_id, trim(line) AS line FROM raw
        |      WHERE len(trim(line)) > 0)
        |SELECT md5(line) AS ldigest, min(line) AS line,
        |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
        |FROM l GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY ldigest""".stripMargin,
    // d14: the d11 pipeline keeping line text; string_agg ORDER BY
    // line_no rebuilds each doc deterministically (line_no unique per
    // doc), docs with nothing kept emit ''.
    "d14_dedup_collapse" ->
      """WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |raw AS (SELECT doc_id, UNNEST(ls) AS line,
        |               UNNEST(generate_series(1, len(ls))) AS line_no FROM s),
        |l AS (SELECT doc_id, line_no, trim(line) AS line,
        |             md5(trim(line)) AS ldigest
        |      FROM raw WHERE len(trim(line)) > 0),
        |m AS (SELECT doc_id, line_no, line, row_number() OVER (
        |        PARTITION BY ldigest ORDER BY doc_id, line_no) AS rn
        |      FROM l),
        |k AS (SELECT doc_id,
        |        string_agg(line, chr(10) ORDER BY line_no) AS clean_text,
        |        count(*) AS n_kept
        |      FROM m WHERE rn = 1 GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(clean_text, '') AS clean_text,
        |  coalesce(n_kept, 0) AS n_kept
        |FROM documents d LEFT JOIN k USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // t14/t15: the regex literals are interpolated from the SAME Scala
    // constants the engine queries use — one definition, zero drift.
    "t14_pii_counts" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$PiiEmail')) AS n_emails,
         |  len(regexp_extract_all(text, '$PiiIpv4')) AS n_ipv4,
         |  len(regexp_extract_all(text, '$PiiPhone')) AS n_phones,
         |  len(regexp_extract_all(text, '$PiiIdRun')) AS n_id_runs
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t15_pii_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id, len(text) AS n_chars_raw,
         |    ${piiRedactSql("text")} AS clean_text
         |  FROM documents)
         |SELECT doc_id, n_chars_raw, clean_text, len(clean_text) AS n_chars_clean
         |FROM r ORDER BY doc_id""".stripMargin,
    // t17: same tokenization as every text oracle (trim + '\s+' with the
    // empty-text guard), lines via literal chr(10) split + space-trim
    // (Spark trim is space-only, like DuckDB's), counts as BIGINT, and
    // the keep bit is the IDENTICAL GopherKeepSql string Spark expr's.
    // The counts CTE is gopherCountsCte — shared with t18/t19 so the
    // oracle-side count definitions exist once, mirroring gopherCountCols.
    "t17_gopher_rules" ->
      s"""WITH $gopherCountsCte
         |SELECT doc_id, n_words, n_word_chars, n_lines, n_bullet,
         |  n_ellipsis, n_stop, n_alpha_words, n_sym,
         |  $GopherKeepSql AS keep
         |FROM c ORDER BY doc_id""".stripMargin,
    // t18: first-failing-rule attribution via the shared GopherReasonSql
    // CASE; counts from the same shared CTE.
    "t18_gopher_reasons" ->
      s"""WITH $gopherCountsCte
         |SELECT $GopherReasonSql AS reason,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM c GROUP BY 1 ORDER BY reason""".stripMargin,
    // t19: staged funnel — quality keep from qualityKeepSql, gopher keep
    // from GopherKeepSql over the shared counts CTE (text re-joined for
    // the quality/digest stage), canonical = min surviving doc_id per
    // md5 digest, attributed to that doc's source.
    // The engine's suffix-chain membership and the oracle's
    // equals-or-dot-suffix predicate are the same whole-label match;
    // list_min of no matches is NULL = kept (both engines).
    "t20_domain_blocklist" ->
      s"""WITH e AS (
         |  SELECT 'sub' || (user_id % 3) || '.host' || (user_id % 20)
         |         || '.example.org' AS host
         |  FROM events),
         |m AS (
         |  SELECT host,
         |    list_min(list_filter(
         |      [${DomainBlocklist.map(dm => s"'$dm'").mkString(", ")}],
         |      dm -> host = dm OR ends_with(host, '.' || dm)))
         |      AS blocked_by
         |  FROM e)
         |SELECT host, blocked_by, count(*) AS n
         |FROM m GROUP BY host, blocked_by
         |ORDER BY host, blocked_by""".stripMargin,
    "t19_filter_funnel" ->
      s"""WITH $gopherCountsCte,
         |f AS (
         |  SELECT c.doc_id, c.source,
         |    ${qualityKeepSql("d.text")} AS keep_q,
         |    $GopherKeepSql AS keep_g,
         |    md5(d.text) AS digest
         |  FROM c JOIN documents d USING (doc_id)),
         |g AS (
         |  SELECT digest,
         |    min(CASE WHEN keep_q AND keep_g THEN doc_id END) AS min_id
         |  FROM f GROUP BY digest),
         |canon AS (
         |  SELECT f.source, CAST(count(*) AS BIGINT) AS n_canonical
         |  FROM f JOIN g ON f.doc_id = g.min_id
         |  GROUP BY f.source),
         |agg AS (
         |  SELECT source,
         |    CAST(count(*) AS BIGINT) AS n_raw,
         |    CAST(count(CASE WHEN keep_q THEN 1 END) AS BIGINT)
         |      AS n_quality,
         |    CAST(count(CASE WHEN keep_q AND keep_g THEN 1 END) AS BIGINT)
         |      AS n_gopher
         |  FROM f GROUP BY source)
         |SELECT agg.source, n_raw, n_quality, n_gopher,
         |  CAST(coalesce(n_canonical, 0) AS BIGINT) AS n_canonical
         |FROM agg LEFT JOIN canon ON agg.source = canon.source
         |ORDER BY agg.source""".stripMargin,
    "t16_redact_rescore" ->
      s"""WITH r AS (
         |  SELECT doc_id, text, ${piiRedactSql("text")} AS ct
         |  FROM documents),
         |k AS (
         |  SELECT doc_id,
         |    ${qualityKeepSql("text")} AS keep_raw,
         |    ${qualityKeepSql("ct")} AS keep_clean
         |  FROM r)
         |SELECT doc_id, keep_raw, keep_clean,
         |  keep_raw <> keep_clean AS flipped
         |FROM k ORDER BY doc_id""".stripMargin,
    // d13: d11's oracle with the blank-line separator; trim is
    // space-only on both engines, so paragraphs keep interior newlines.
    "d13_paragraph_dedup" ->
      """WITH s AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ls
        |           FROM documents),
        |raw AS (SELECT doc_id, UNNEST(ls) AS line,
        |               UNNEST(generate_series(1, len(ls))) AS line_no FROM s),
        |l AS (SELECT doc_id, line_no, md5(trim(line)) AS ldigest
        |      FROM raw WHERE len(trim(line)) > 0),
        |m AS (SELECT doc_id, row_number() OVER (
        |        PARTITION BY ldigest ORDER BY doc_id, line_no) AS rn
        |      FROM l),
        |a AS (SELECT doc_id, count(*) AS n_lines,
        |        count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
        |        count(CASE WHEN rn > 1 THEN 1 END) AS n_removed
        |      FROM m GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_lines, 0) AS n_lines,
        |  coalesce(n_kept, 0) AS n_kept, coalesce(n_removed, 0) AS n_removed
        |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,
    // Empty-text guard: tokens([]) not [''], LEFT JOIN (an empty doc has no
    // top-token row), and len(t)=0 → NULL on all three signals — matching
    // the engine's null struct ("repetition of nothing" has no value,
    // TextFns.repetitionSignals).
    "t08_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |top AS (
        |  SELECT doc_id, max(c) AS top_cnt FROM (
        |    SELECT doc_id, count(*) AS c
        |    FROM (SELECT doc_id, unnest(t) AS w FROM tok)
        |    GROUP BY doc_id, w)
        |  GROUP BY doc_id)
        |SELECT tok.doc_id,
        |  CASE WHEN len(t) = 0 THEN NULL
        |    ELSE round(1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
        |  END AS dup_token_frac,
        |  CASE WHEN len(t) = 0 THEN NULL
        |    ELSE round(CAST(top_cnt AS DOUBLE) / len(t), 6)
        |  END AS top_token_frac,
        |  CASE WHEN len(t) = 0 THEN NULL
        |    WHEN len(t) > 1 THEN
        |    round(1 - CAST(len(list_distinct([array_to_string(t[g:g+1], ' ')
        |            FOR g IN generate_series(1, len(t) - 1)])) AS DOUBLE)
        |          / (len(t) - 1), 6)
        |  ELSE 0.0 END AS dup_2gram_frac
        |FROM tok LEFT JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "d07_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
        |           ELSE list_distinct([array_to_string(t[g:g+2], ' ')
        |                FOR g IN generate_series(1, len(t) - 2)]) END) AS sh
        |  FROM tok),
        |b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0)
        |SELECT c.doc_id, count(*) AS n_shared
        |FROM c JOIN b USING (sh)
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,
    // t33: d07's shingle CTEs verbatim (same %50 holdout, same len<3
    // empty-shingle guard — which also defuses the '' -> [''] DuckDB
    // split trap), aggregated per bench item; leak_milli is integer
    // floor division, NULL when the item has no shingles.
    "t33_eval_leakage" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
        |           ELSE list_distinct([array_to_string(t[g:g+2], ' ')
        |                FOR g IN generate_series(1, len(t) - 2)]) END) AS sh
        |  FROM tok),
        |b AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 50 = 0),
        |cs AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 <> 0),
        |per AS (SELECT b.bench_id, count(*) AS n_grams,
        |          count(cs.sh) AS n_leaked
        |        FROM b LEFT JOIN cs USING (sh) GROUP BY b.bench_id)
        |SELECT d.doc_id AS bench_id,
        |  CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(per.n_leaked, 0) AS BIGINT) AS n_leaked,
        |  CASE WHEN coalesce(per.n_grams, 0) > 0
        |       THEN CAST((1000 * per.n_leaked) // per.n_grams AS BIGINT)
        |  END AS leak_milli
        |FROM documents d LEFT JOIN per ON per.bench_id = d.doc_id
        |WHERE d.doc_id % 50 = 0
        |ORDER BY bench_id""".stripMargin,
    // t36: t33's shingle CTEs with source carried on the corpus side;
    // distinct (source, sh) leak table, per-source distinct-gram/item
    // rollup, all-sources left join (zero-leak feeds still report), and
    // the 1-row bench total for the milli share.
    "t36_leakage_by_source" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |         regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    unnest(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
        |           ELSE list_distinct([array_to_string(t[g:g+2], ' ')
        |                FOR g IN generate_series(1, len(t) - 2)]) END) AS sh
        |  FROM tok),
        |b AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 50 = 0),
        |sl AS (SELECT DISTINCT source, sh FROM sh
        |       WHERE doc_id % 50 <> 0
        |         AND sh IN (SELECT sh FROM b)),
        |per AS (SELECT sl.source,
        |          count(DISTINCT sl.sh) AS n_leaked_grams,
        |          count(DISTINCT b.bench_id) AS n_items_hit
        |        FROM b JOIN sl USING (sh) GROUP BY sl.source),
        |srcs AS (SELECT DISTINCT source FROM documents
        |         WHERE doc_id % 50 <> 0),
        |t AS (SELECT count(*) AS n_items_total FROM documents
        |      WHERE doc_id % 50 = 0)
        |SELECT srcs.source,
        |  CAST(coalesce(per.n_leaked_grams, 0) AS BIGINT) AS n_leaked_grams,
        |  CAST(coalesce(per.n_items_hit, 0) AS BIGINT) AS n_items_hit,
        |  CAST(t.n_items_total AS BIGINT) AS n_items_total,
        |  CASE WHEN t.n_items_total > 0
        |       THEN CAST((1000 * coalesce(per.n_items_hit, 0))
        |                 // t.n_items_total AS BIGINT)
        |  END AS item_share_milli
        |FROM srcs LEFT JOIN per USING (source), t
        |ORDER BY srcs.source""".stripMargin,
    // d28: d01's md5 grouping over the unioned corpus, the same static
    // power-of-two bucket chain, totals from the rollup itself.
    "d28_dup_histogram" ->
      """WITH corpus AS (
        |  SELECT text FROM documents
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 100 = 0
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 1000 = 0
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 1000 = 0
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 1000 = 0),
        |c AS (SELECT md5(text) AS digest, count(*) AS n
        |      FROM corpus GROUP BY 1),
        |b AS (SELECT CASE WHEN n >= 128 THEN 128 WHEN n >= 64 THEN 64
        |                  WHEN n >= 32 THEN 32 WHEN n >= 16 THEN 16
        |                  WHEN n >= 8 THEN 8 WHEN n >= 4 THEN 4
        |                  WHEN n >= 2 THEN 2 ELSE 1 END AS bucket_lo, n
        |      FROM c),
        |g AS (SELECT bucket_lo, CAST(count(*) AS BIGINT) AS n_clusters,
        |             CAST(sum(n) AS BIGINT) AS n_docs
        |      FROM b GROUP BY bucket_lo),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM g)
        |SELECT g.bucket_lo, g.n_clusters, g.n_docs,
        |  CAST((1000 * g.n_docs) // t.total_docs AS BIGINT)
        |    AS doc_share_milli
        |FROM g, t ORDER BY g.bucket_lo""".stripMargin,
    // d27: full-outer digest alignment; status from id PRESENCE (not
    // digest nullness) and a null-safe digest comparison, mirroring the
    // engine's in_old/in_new flags and <=>.
    "d27_snapshot_delta" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS old_digest
        |  FROM documents WHERE doc_id % 11 <> 5),
        |n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
        |             ELSE text END) AS new_digest
        |  FROM documents WHERE doc_id % 13 <> 6)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  o.old_digest, n.new_digest,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.old_digest IS NOT DISTINCT FROM n.new_digest
        |         THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    "d08_boilerplate_ngrams" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
        |           ELSE list_distinct([array_to_string(t[g:g+2], ' ')
        |                FOR g IN generate_series(1, len(t) - 2)]) END) AS sh
        |  FROM tok),
        |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
        |SELECT s.doc_id, count(*) AS n_grams,
        |  count(CASE WHEN df.df >= 4 THEN 1 END) AS n_boiler,
        |  round(CAST(count(CASE WHEN df.df >= 4 THEN 1 END) AS DOUBLE)
        |        / count(*), 6) AS boiler_frac
        |FROM sh s JOIN df USING (sh)
        |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,
    // BM25: the SQL spells the identical per-term formula in the identical
    // association order as RelevanceOps.bm25TopK ((0.75*dl)/avgdl,
    // (n - df + 0.5)), each term contribution rounds to INTEGER micro-units
    // before the sum (the t11 recipe), so the per-doc score and the rank
    // are exact 64-bit integer arithmetic on both engines — ln's <=1-ulp
    // libm spread can't flip an integer except on a ~1e-9 boundary.
    "t09_bm25_topk" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |d AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM tok),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl,
        |    CAST(sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END)
        |         AS DOUBLE) AS df_0,
        |    CAST(sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END)
        |         AS DOUBLE) AS df_1,
        |    CAST(sum(CASE WHEN list_contains(t, 'window') THEN 1 ELSE 0 END)
        |         AS DOUBLE) AS df_2
        |  FROM d),
        |sc AS (
        |  SELECT d.doc_id,
        |    CAST(round(ln(1.0 + (st.n_docs - st.df_0 + 0.5) / (st.df_0 + 0.5))
        |        * (CAST(len(list_filter(d.t, x -> x = 'spark')) AS DOUBLE) * (1.2 + 1.0))
        |        / (CAST(len(list_filter(d.t, x -> x = 'spark')) AS DOUBLE)
        |           + 1.2 * (0.25 + (0.75 * d.dl) / (st.sum_dl / st.n_docs))) * 1e6)
        |      AS BIGINT)
        |    + CAST(round(ln(1.0 + (st.n_docs - st.df_1 + 0.5) / (st.df_1 + 0.5))
        |        * (CAST(len(list_filter(d.t, x -> x = 'join')) AS DOUBLE) * (1.2 + 1.0))
        |        / (CAST(len(list_filter(d.t, x -> x = 'join')) AS DOUBLE)
        |           + 1.2 * (0.25 + (0.75 * d.dl) / (st.sum_dl / st.n_docs))) * 1e6)
        |      AS BIGINT)
        |    + CAST(round(ln(1.0 + (st.n_docs - st.df_2 + 0.5) / (st.df_2 + 0.5))
        |        * (CAST(len(list_filter(d.t, x -> x = 'window')) AS DOUBLE) * (1.2 + 1.0))
        |        / (CAST(len(list_filter(d.t, x -> x = 'window')) AS DOUBLE)
        |           + 1.2 * (0.25 + (0.75 * d.dl) / (st.sum_dl / st.n_docs))) * 1e6)
        |      AS BIGINT)
        |      AS score_micro
        |  FROM d, st)
        |SELECT doc_id, score_micro / 1e6 AS score
        |FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,
    // Pairs from the distinct-word table (unnest over generate_series —
    // DuckDB's generate_series cannot lateral-join a column, hence the
    // list-comprehension spelling); strict (count desc, c1, c2) order so
    // the LIMIT boundary cannot tie-split across engines.
    // t29: the d11 line-split idiom + the same first-match rule chain
    // (CASE order mirrors the engine's when-chain exactly); string_agg
    // ORDER BY line_no rebuilds kept lines (the d14 idiom).
    "t29_c4_line_filters" ->
      """WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS ls
        |           FROM documents),
        |raw AS (SELECT doc_id, UNNEST(ls) AS line0,
        |               UNNEST(generate_series(1, len(ls))) AS line_no FROM s),
        |l AS (SELECT doc_id, line_no, trim(line0) AS line
        |      FROM raw WHERE len(trim(line0)) > 0),
        |r AS (SELECT doc_id, line_no, line,
        |        CASE
        |          WHEN len(regexp_split_to_array(line, '\s+')) < 4
        |            THEN 'short'
        |          WHEN contains(line, '{') THEN 'brace'
        |          WHEN contains(lower(line), 'javascript') THEN 'javascript'
        |          WHEN contains(lower(line), 'lorem ipsum') THEN 'lorem'
        |          WHEN NOT regexp_matches(line, '[.!?"]$') THEN 'no_punct'
        |        END AS reason
        |      FROM l),
        |a AS (SELECT doc_id, count(*) AS n_lines,
        |        count(CASE WHEN reason IS NULL THEN 1 END) AS n_kept,
        |        count(CASE WHEN reason = 'short' THEN 1 END) AS n_short,
        |        count(CASE WHEN reason = 'brace' THEN 1 END) AS n_brace,
        |        count(CASE WHEN reason = 'javascript' THEN 1 END)
        |          AS n_javascript,
        |        count(CASE WHEN reason = 'lorem' THEN 1 END) AS n_lorem,
        |        count(CASE WHEN reason = 'no_punct' THEN 1 END) AS n_no_punct,
        |        coalesce(string_agg(CASE WHEN reason IS NULL THEN line END,
        |          chr(10) ORDER BY line_no), '') AS clean_text
        |      FROM r GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_lines, 0) AS n_lines, coalesce(n_kept, 0) AS n_kept,
        |  coalesce(n_short, 0) AS n_short, coalesce(n_brace, 0) AS n_brace,
        |  coalesce(n_javascript, 0) AS n_javascript,
        |  coalesce(n_lorem, 0) AS n_lorem,
        |  coalesce(n_no_punct, 0) AS n_no_punct,
        |  coalesce(clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t28_bpe_pairs" ->
      (s"WITH $bpeVocabCtes\n" +
        """SELECT c1, c2, CAST(sum(tf) AS BIGINT) AS pair_count
          |FROM p GROUP BY c1, c2
          |ORDER BY pair_count DESC, c1, c2 LIMIT 50""".stripMargin),
    // t32: the engine's one-explode rollup chain mirrored CTE for CTE;
    // the per-term micro-nat chain parenthesizes identically.
    "t32_source_kl" ->
      """WITH tok AS (
        |  SELECT source,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |tw AS (SELECT source, unnest(t) AS w FROM tok),
        |sw AS (SELECT source, w, count(*) AS csw FROM tw GROUP BY 1, 2),
        |cw AS (SELECT w, CAST(sum(csw) AS BIGINT) AS cw FROM sw GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(csw) AS BIGINT) AS ns
        |       FROM sw GROUP BY 1),
        |tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS n FROM cw),
        |term AS (
        |  SELECT sw.source, ns.ns,
        |    CAST(round(CAST(sw.csw AS DOUBLE) *
        |      (((ln(CAST(sw.csw AS DOUBLE)) + ln(tot.n))
        |        - ln(CAST(ns.ns AS DOUBLE))) - ln(CAST(cw.cw AS DOUBLE)))
        |      * 1000000.0, 0) AS BIGINT) AS tm
        |  FROM sw JOIN cw USING (w) JOIN ns USING (source), tot)
        |SELECT source, max(ns) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  round(CAST(sum(tm) AS DOUBLE) / 1000000.0 / max(ns), 6) AS kl
        |FROM term GROUP BY source ORDER BY source""".stripMargin,
    // t31: rides interpXentCtes' corpus-level count tables (c12/c1/c2/tv
    // — ONE bigram definition with t23/t25); the ln-sum parenthesization
    // mirrors the engine token for token.
    "t31_pmi_collocations" ->
      (s"WITH $interpXentCtes\n" +
        """SELECT c12.w1, c12.w2, CAST(c12.c12 AS BIGINT) AS c12,
          |  CAST(round((((ln(CAST(c12.c12 AS DOUBLE)) + ln(tv.t))
          |    - ln(CAST(c1.c1 AS DOUBLE))) - ln(CAST(c2.c2 AS DOUBLE)))
          |    * 1000000.0, 0) AS BIGINT) AS pmi_micro
          |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), tv
          |WHERE c12.c12 >= 5
          |ORDER BY pmi_micro DESC, w1, w2 LIMIT 30""".stripMargin),
    // t30: t28's vocab/pair CTEs (ONE definition — bpeVocabCtes), the
    // strict (count desc, c1, c2) top-5, and each merge applied with the
    // engines' SHARED non-overlapping left-to-right replace semantics.
    "t30_bpe_apply" ->
      (s"WITH $bpeVocabCtes,\n" +
        """top5 AS (SELECT c1, c2, CAST(sum(tf) AS BIGINT) AS pair_count
          |         FROM p GROUP BY c1, c2
          |         ORDER BY pair_count DESC, c1, c2 LIMIT 5),
          |rk AS (SELECT c1, c2, pair_count,
          |         CAST(row_number() OVER (ORDER BY pair_count DESC, c1, c2)
          |              AS INT) AS rank
          |       FROM top5),
          |ap AS (SELECT r.rank, r.c1, r.c2, r.pair_count,
          |         v.tf * length(v.w) AS chars,
          |         v.tf * length(replace(v.w, r.c1 || r.c2, '•')) AS chars_after
          |       FROM rk r CROSS JOIN wf v)
          |SELECT rank, c1, c2, pair_count,
          |  CAST(sum(chars) AS BIGINT) AS tokens_before,
          |  CAST(sum(chars_after) AS BIGINT) AS tokens_after,
          |  CAST(sum(chars) - sum(chars_after) AS BIGINT) AS n_merges
          |FROM ap GROUP BY rank, c1, c2, pair_count
          |ORDER BY rank""".stripMargin),
    // t40: the full loop — one CTE block per round over the shared
    // tok/wf vocab, relational greedy application (see bpeTrainSql)
    "t40_bpe_train" -> bpeTrainSql(BpeTrainRounds),
    "t44_bpe_train_deep" -> bpeTrainSql(BpeTrainRoundsDeep),
    "t45_bpe_apply_heldout" -> bpeApplyHeldOutSql(BpeTrainRounds, 2),
    // t46: the SAME oracle chain as t45 at the deep round count — the
    // blocked engine path owes the identical answer to the unrolled
    // relational apply
    "t46_bpe_apply_blocked" -> bpeApplyHeldOutSql(BpeTrainRoundsDeep, 2),
    // t41: the same chain's final state applied per doc (bpeTokenizeSql)
    "t41_bpe_tokenize" -> bpeTokenizeSql(BpeTrainRounds),
    // t42: winnowing re-derived relationally — gram hashes as rows, a
    // window table, per-window min, rightmost position achieving it
    // (max(pos) FILTER fp = min — the engine fold's <= tie rule), distinct.
    "t42_winnowing" -> (winnowPickSql +
      "\nSELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, fp\n" +
      "FROM pick ORDER BY doc_id, pos"),
    // d30: copy pairs over the same pick chain — distinct (doc, fp),
    // hot-fp cap, fp-keyed pair join, shared-count threshold
    "d30_winnow_pairs" -> (winnowPickSql +
      s""",
         |docfp AS (SELECT DISTINCT doc_id, fp FROM pick),
         |tot AS (SELECT doc_id, count(*) AS n_fp FROM docfp GROUP BY 1),
         |bounded AS (
         |  SELECT d.doc_id, d.fp FROM docfp d
         |  JOIN (SELECT fp FROM docfp GROUP BY fp
         |        HAVING count(*) <= $WinnowMaxDocsPerFp) h USING (fp)),
         |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         count(*) AS shared_fp
         |       FROM bounded a JOIN bounded b
         |         ON a.fp = b.fp AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT pr.id_a, pr.id_b,
         |  CAST(ta.n_fp AS BIGINT) AS n_fp_a,
         |  CAST(tb.n_fp AS BIGINT) AS n_fp_b,
         |  CAST(pr.shared_fp AS BIGINT) AS shared_fp
         |FROM pr
         |JOIN tot ta ON ta.doc_id = pr.id_a
         |JOIN tot tb ON tb.doc_id = pr.id_b
         |WHERE pr.shared_fp >= $WinnowMinShared
         |ORDER BY id_a, id_b""".stripMargin),
    // d31: gaps-and-islands over the same pick chain — anchor positions
    // per pair side, islands merged while pos <= prev_max + k (interval
    // [pos, pos+k) overlap/abut), island tokens = max - min + k
    "d31_winnow_match_spans" -> (winnowPickSql +
      s""",
         |sel AS (SELECT DISTINCT doc_id, pos, fp FROM pick),
         |cap AS (SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM sel)
         |        GROUP BY fp HAVING count(*) <= $WinnowMaxDocsPerFp),
         |c AS (SELECT s.* FROM sel s JOIN cap USING (fp)),
         |anch AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp,
         |           a.pos AS pos_a, b.pos AS pos_b
         |         FROM c a JOIN c b ON a.fp = b.fp AND a.doc_id < b.doc_id),
         |prs AS (SELECT id_a, id_b, count(DISTINCT fp) AS shared_fp
         |        FROM anch GROUP BY 1, 2
         |        HAVING count(DISTINCT fp) >= $WinnowMinShared),
         |sides AS (SELECT DISTINCT id_a, id_b, 'a' AS side, pos_a AS pos FROM anch
         |          UNION ALL
         |          SELECT DISTINCT id_a, id_b, 'b' AS side, pos_b AS pos FROM anch),
         |sid AS (SELECT s.* FROM sides s JOIN prs USING (id_a, id_b)),
         |isl AS (SELECT id_a, id_b, side, pos,
         |          CASE WHEN pos <= coalesce(max(pos) OVER (
         |                 PARTITION BY id_a, id_b, side ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |               -$WinnowK) + $WinnowK THEN 0 ELSE 1 END AS brk
         |        FROM sid),
         |grp AS (SELECT *, sum(brk) OVER (
         |          PARTITION BY id_a, id_b, side ORDER BY pos) AS g FROM isl),
         |seg AS (SELECT id_a, id_b, side, g,
         |          max(pos) + $WinnowK - min(pos) AS tok
         |        FROM grp GROUP BY 1, 2, 3, 4),
         |agg AS (SELECT id_a, id_b, side, CAST(sum(tok) AS BIGINT) AS toks,
         |          CAST(count(*) AS BIGINT) AS ns
         |        FROM seg GROUP BY 1, 2, 3)
         |SELECT p.id_a, p.id_b, CAST(p.shared_fp AS BIGINT) AS shared_fp,
         |  a.toks AS matched_tokens_a, a.ns AS n_spans_a,
         |  b.toks AS matched_tokens_b, b.ns AS n_spans_b
         |FROM prs p
         |JOIN agg a ON a.id_a = p.id_a AND a.id_b = p.id_b AND a.side = 'a'
         |JOIN agg b ON b.id_a = p.id_a AND b.id_b = p.id_b AND b.side = 'b'
         |ORDER BY p.id_a, p.id_b""".stripMargin),
    // d32: d31's island chain kept through the per-span rows, then each
    // span sliced out of the side's token array (DuckDB list slice is
    // 1-based inclusive: [s : e-1] is tokens [s, e)) and joined by
    // single spaces — the same canonical token view the engine slices
    "d32_winnow_match_slices" -> (winnowPickSql +
      s""",
         |sel AS (SELECT DISTINCT doc_id, pos, fp FROM pick),
         |cap AS (SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM sel)
         |        GROUP BY fp HAVING count(*) <= $WinnowMaxDocsPerFp),
         |c AS (SELECT s.* FROM sel s JOIN cap USING (fp)),
         |anch AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp,
         |           a.pos AS pos_a, b.pos AS pos_b
         |         FROM c a JOIN c b ON a.fp = b.fp AND a.doc_id < b.doc_id),
         |prs AS (SELECT id_a, id_b FROM anch GROUP BY 1, 2
         |        HAVING count(DISTINCT fp) >= $WinnowMinShared),
         |sides AS (SELECT DISTINCT id_a, id_b, 'a' AS side, pos_a AS pos FROM anch
         |          UNION ALL
         |          SELECT DISTINCT id_a, id_b, 'b' AS side, pos_b AS pos FROM anch),
         |sid AS (SELECT s.* FROM sides s JOIN prs USING (id_a, id_b)),
         |isl AS (SELECT id_a, id_b, side, pos,
         |          CASE WHEN pos <= coalesce(max(pos) OVER (
         |                 PARTITION BY id_a, id_b, side ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |               -$WinnowK) + $WinnowK THEN 0 ELSE 1 END AS brk
         |        FROM sid),
         |grp AS (SELECT *, sum(brk) OVER (
         |          PARTITION BY id_a, id_b, side ORDER BY pos) AS g FROM isl),
         |seg AS (SELECT id_a, id_b, side, g, min(pos) AS s,
         |          max(pos) + $WinnowK AS e
         |        FROM grp GROUP BY 1, 2, 3, 4),
         |idx AS (SELECT *, row_number() OVER (
         |          PARTITION BY id_a, id_b, side ORDER BY s) AS span_idx
         |        FROM seg)
         |SELECT i.id_a, i.id_b, i.side, CAST(i.span_idx AS INT) AS span_idx,
         |  CAST(i.s AS INT) AS start_pos,
         |  CAST(i.e - i.s AS BIGINT) AS n_tokens,
         |  array_to_string(t.t[i.s : i.e - 1], ' ') AS slice_text
         |FROM idx i JOIN tok t
         |  ON t.doc_id = CASE WHEN i.side = 'a' THEN i.id_a ELSE i.id_b END
         |ORDER BY id_a, id_b, side, span_idx""".stripMargin),
    // t43: chunk count closed-form (1 + ceil((n-chunk)/stride) by integer
    // division), lateral chunk ids, inclusive list slice per chunk
    "t43_chunk_windows" -> (chunkChainSql +
      s"""
         |SELECT doc_id, CAST(j AS INT) AS chunk_id,
         |  CAST(j * $ChunkStride + 1 AS INT) AS start_pos,
         |  CAST(least($ChunkTokens, n - j * $ChunkStride) AS INT) AS n_tokens,
         |  array_to_string(t[(j * $ChunkStride + 1):
         |    (j * $ChunkStride + least($ChunkTokens, n - j * $ChunkStride))], ' ')
         |    AS chunk_text
         |FROM j0 ORDER BY doc_id, chunk_id""".stripMargin),
    // s28: the chunk chain → hashing-trick embeddings → cosine top-k.
    // Per-chunk/per-query (bucket, weight) rows re-derive hashed_bow
    // relationally; dot products join on the bucket; norms² and dots are
    // integer-valued so the cosine divides the same IEEE doubles the
    // engine divides (√·√ mirrored), and ranking can't disagree.
    "s28_chunk_retrieval" -> (chunkRetrievalCoreSql +
      s"""
         |SELECT query_id, corpus_id, chunk_id, CAST(rank AS INT) AS rank,
         |  round(sim, 6) AS sim
         |FROM ranked WHERE rank <= $ChunkTopK
         |ORDER BY query_id, rank""".stripMargin),
    // s29: the sign-pattern LSH audit over the same core — per chunk and
    // query, sig = sum of 1<<bucket over positive weights (a missing
    // (bucket, weight) row is weight 0, matching the engine's zero
    // vector slots), candidates join on sig, and every query reports its
    // candidate count + exact-top-k hits + milli-recall
    // s30: same sig CTEs as s29 plus the bit-flip probe table; min(nflip)
    // nests the budgets; FILTER splits the per-budget aggregates
    "s30_chunk_multiprobe" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |probes AS (SELECT query_id, sig AS key, 0 AS nflip FROM qsig
         |  UNION ALL
         |  SELECT query_id,
         |    xor(sig, CAST(1 AS BIGINT) << CAST(i AS INT)) AS key, 1 AS nflip
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${BowDim - 1})) AS i FROM qsig)),
         |cand AS (SELECT p.query_id, cs.doc_id AS corpus_id, cs.chunk_id,
         |    min(p.nflip) AS nflip
         |  FROM csig cs JOIN probes p ON cs.sig = p.key
         |    AND cs.doc_id <> p.query_id
         |  GROUP BY 1, 2, 3),
         |ncand AS (SELECT query_id,
         |    count(*) FILTER (WHERE nflip = 0) AS n1, count(*) AS nmp
         |  FROM cand GROUP BY 1),
         |ex AS (SELECT query_id, corpus_id, chunk_id FROM ranked
         |       WHERE rank <= $ChunkTopK),
         |nhit AS (SELECT e.query_id,
         |    count(*) FILTER (WHERE c.nflip = 0) AS n1, count(*) AS nmp
         |  FROM ex e JOIN cand c USING (query_id, corpus_id, chunk_id)
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(ncand.n1, 0) AS BIGINT) AS n_cand_1,
         |  CAST(coalesce(nhit.n1, 0) AS BIGINT) AS n_hits_1,
         |  CAST(coalesce(nhit.n1, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_1,
         |  CAST(coalesce(ncand.nmp, 0) AS BIGINT) AS n_cand_mp,
         |  CAST(coalesce(nhit.nmp, 0) AS BIGINT) AS n_hits_mp,
         |  CAST(coalesce(nhit.nmp, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_mp
         |FROM q
         |LEFT JOIN ncand ON ncand.query_id = q.query_id
         |LEFT JOIN nhit ON nhit.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin),
    // s32: s29's sig/candidate CTEs restricted onto the core's per-pair
    // sims, then re-ranked WITHIN the candidate set — the rerank the
    // engine runs on candidate-few rows, recomputed here over all pairs
    // (oracle-side cost, not the plan under test)
    "s32_chunk_retrieval_lsh" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |cand AS (SELECT qs.query_id, cs.doc_id AS corpus_id, cs.chunk_id
         |  FROM csig cs JOIN qsig qs ON cs.sig = qs.sig
         |    AND cs.doc_id <> qs.query_id),
         |cscored AS (SELECT s.query_id, s.corpus_id, s.chunk_id, s.sim
         |  FROM scored s JOIN cand c ON c.query_id = s.query_id
         |    AND c.corpus_id = s.corpus_id AND c.chunk_id = s.chunk_id),
         |cranked AS (SELECT query_id, corpus_id, chunk_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, corpus_id, chunk_id) AS rank
         |  FROM cscored)
         |SELECT query_id, corpus_id, chunk_id, CAST(rank AS INT) AS rank,
         |  round(sim, 6) AS sim
         |FROM cranked WHERE rank <= $ChunkTopK
         |ORDER BY query_id, rank""".stripMargin),
    // s33: s30's probe CTEs (flip-0 + flip-1, nflip dropped), DISTINCT
    // candidates restricted onto the core's per-pair sims, re-ranked
    // within — s32's consumption shape at the wider budget
    "s33_chunk_multiprobe_topk" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |probes AS (SELECT query_id, sig AS key FROM qsig
         |  UNION ALL
         |  SELECT query_id,
         |    xor(sig, CAST(1 AS BIGINT) << CAST(i AS INT)) AS key
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${BowDim - 1})) AS i FROM qsig)),
         |cand AS (SELECT DISTINCT p.query_id, cs.doc_id AS corpus_id,
         |    cs.chunk_id
         |  FROM csig cs JOIN probes p ON cs.sig = p.key
         |    AND cs.doc_id <> p.query_id),
         |cscored AS (SELECT s.query_id, s.corpus_id, s.chunk_id, s.sim
         |  FROM scored s JOIN cand c ON c.query_id = s.query_id
         |    AND c.corpus_id = s.corpus_id AND c.chunk_id = s.chunk_id),
         |cranked AS (SELECT query_id, corpus_id, chunk_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, corpus_id, chunk_id) AS rank
         |  FROM cscored)
         |SELECT query_id, corpus_id, chunk_id, CAST(rank AS INT) AS rank,
         |  round(sim, 6) AS sim
         |FROM cranked WHERE rank <= $ChunkTopK
         |ORDER BY query_id, rank""".stripMargin),
    // s31: s30's CTEs with the C(dim,2) two-flip probe tier appended;
    // min(nflip) still nests the budgets, FILTER splits all three
    "s31_chunk_multiprobe2" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |probes AS (SELECT query_id, sig AS key, 0 AS nflip FROM qsig
         |  UNION ALL
         |  SELECT query_id,
         |    xor(sig, CAST(1 AS BIGINT) << CAST(i AS INT)) AS key, 1 AS nflip
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${BowDim - 1})) AS i FROM qsig)
         |  UNION ALL
         |  SELECT query_id,
         |    xor(sig, (CAST(1 AS BIGINT) << CAST(i AS INT)) |
         |             (CAST(1 AS BIGINT) << CAST(j AS INT))) AS key,
         |    2 AS nflip
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${BowDim - 1})) AS i FROM qsig),
         |       generate_series(0, ${BowDim - 1}) g(j)
         |  WHERE j > i),
         |cand AS (SELECT p.query_id, cs.doc_id AS corpus_id, cs.chunk_id,
         |    min(p.nflip) AS nflip
         |  FROM csig cs JOIN probes p ON cs.sig = p.key
         |    AND cs.doc_id <> p.query_id
         |  GROUP BY 1, 2, 3),
         |ncand AS (SELECT query_id,
         |    count(*) FILTER (WHERE nflip = 0) AS n1,
         |    count(*) FILTER (WHERE nflip <= 1) AS nmp,
         |    count(*) AS nmp2
         |  FROM cand GROUP BY 1),
         |ex AS (SELECT query_id, corpus_id, chunk_id FROM ranked
         |       WHERE rank <= $ChunkTopK),
         |nhit AS (SELECT e.query_id,
         |    count(*) FILTER (WHERE c.nflip = 0) AS n1,
         |    count(*) FILTER (WHERE c.nflip <= 1) AS nmp,
         |    count(*) AS nmp2
         |  FROM ex e JOIN cand c USING (query_id, corpus_id, chunk_id)
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(ncand.n1, 0) AS BIGINT) AS n_cand_1,
         |  CAST(coalesce(nhit.n1, 0) AS BIGINT) AS n_hits_1,
         |  CAST(coalesce(nhit.n1, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_1,
         |  CAST(coalesce(ncand.nmp, 0) AS BIGINT) AS n_cand_mp,
         |  CAST(coalesce(nhit.nmp, 0) AS BIGINT) AS n_hits_mp,
         |  CAST(coalesce(nhit.nmp, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_mp,
         |  CAST(coalesce(ncand.nmp2, 0) AS BIGINT) AS n_cand_mp2,
         |  CAST(coalesce(nhit.nmp2, 0) AS BIGINT) AS n_hits_mp2,
         |  CAST(coalesce(nhit.nmp2, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_mp2
         |FROM q
         |LEFT JOIN ncand ON ncand.query_id = q.query_id
         |LEFT JOIN nhit ON nhit.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin),
    "s29_chunk_lsh_recall" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |cand AS (SELECT qs.query_id, cs.doc_id AS corpus_id, cs.chunk_id
         |  FROM csig cs JOIN qsig qs ON cs.sig = qs.sig
         |    AND cs.doc_id <> qs.query_id),
         |ncand AS (SELECT query_id, count(*) AS n FROM cand GROUP BY 1),
         |ex AS (SELECT query_id, corpus_id, chunk_id FROM ranked
         |       WHERE rank <= $ChunkTopK),
         |nhit AS (SELECT e.query_id, count(*) AS n
         |  FROM ex e JOIN cand c USING (query_id, corpus_id, chunk_id)
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(ncand.n, 0) AS BIGINT) AS n_candidates,
         |  CAST(coalesce(nhit.n, 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce(nhit.n, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli
         |FROM q
         |LEFT JOIN ncand ON ncand.query_id = q.query_id
         |LEFT JOIN nhit ON nhit.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin),
    // s37: the identical s29 audit tail over the WIDE core — the whole
    // hashed-BoW/cosine chain re-derived at BowDimWide
    "s37_chunk_lsh_recall_wide" -> (chunkRetrievalCoreSqlAt(BowDimWide) +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |cand AS (SELECT qs.query_id, cs.doc_id AS corpus_id, cs.chunk_id
         |  FROM csig cs JOIN qsig qs ON cs.sig = qs.sig
         |    AND cs.doc_id <> qs.query_id),
         |ncand AS (SELECT query_id, count(*) AS n FROM cand GROUP BY 1),
         |ex AS (SELECT query_id, corpus_id, chunk_id FROM ranked
         |       WHERE rank <= $ChunkTopK),
         |nhit AS (SELECT e.query_id, count(*) AS n
         |  FROM ex e JOIN cand c USING (query_id, corpus_id, chunk_id)
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(ncand.n, 0) AS BIGINT) AS n_candidates,
         |  CAST(coalesce(nhit.n, 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce(nhit.n, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli
         |FROM q
         |LEFT JOIN ncand ON ncand.query_id = q.query_id
         |LEFT JOIN nhit ON nhit.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin),
    // s35: s34's band CTEs, DISTINCT candidates restricted onto the
    // core's per-pair sims, re-ranked within — s32/s33's consumption
    // shape at the banded budget
    "s35_chunk_band_topk" -> chunkBandTopKSqlAt(BowDim, ChunkBands),
    // s38: the identical banded-retrieval tail at the WIDE dial — the
    // whole hashed-BoW chain re-derived at BowDimWide, 2 bands of 16
    // bits (the geometry whose collision mass survives corpus growth)
    "s38_chunk_band_topk_wide" ->
      chunkBandTopKSqlAt(BowDimWide, ChunkBandsWide),
    // s44: s38's exact tail over the CANONICAL corpus — the d10
    // closure (cross-impl signature VALUES → banded candidates → exact
    // shingle-Jaccard verify at ServeDedupThreshold → recursive
    // min-label closure) re-derived with d-prefixed CTE names (the
    // chunk chain owns `tok`), then the SHARED chunk SQL with its
    // `documents` references retargeted at the canonical CTE — one
    // tail definition with s38, so the two rungs can only differ in
    // the corpus the index serves.
    "s44_chunk_band_topk_dedup" ->
      (s"""WITH RECURSIVE kk(doc_id, sig_csv) AS (VALUES
         |  ${SignatureVectors.values(SignatureVectors.d04Minhash)}),
         |msig AS (SELECT doc_id, string_split(sig_csv, ',') AS sig FROM kk
         |      WHERE len(string_split(sig_csv, ',')) = 16),
         |dtok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |        FROM documents),
         |dsh AS (SELECT doc_id,
         |         CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
         |              ELSE list_distinct([array_to_string(t[g:g+2], ' ')
         |                   FOR g IN generate_series(1, len(t) - 2)]) END AS shs
         |       FROM dtok),
         |dbk AS (SELECT doc_id, g,
         |         array_to_string(sig[(g*4+1):(g*4+4)], ',') AS bkey
         |       FROM msig, range(0, 4) t(g)),
         |dcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM dbk a JOIN dbk b
         |           ON a.g = b.g AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |de AS (SELECT c.id_a AS src, c.id_b AS dst
         |      FROM dcand c
         |      JOIN dsh ja ON ja.doc_id = c.id_a
         |      JOIN dsh jb ON jb.doc_id = c.id_b
         |      WHERE CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
         |            / (len(ja.shs) + len(jb.shs)
         |               - len(list_intersect(ja.shs, jb.shs)))
         |            >= $ServeDedupThreshold),
         |deb AS (SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de),
         |dreach(id, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT deb.dst, r.label FROM dreach r JOIN deb ON deb.src = r.id),
         |documents_canon AS (
         |  SELECT d.* FROM documents d
         |  JOIN (SELECT id FROM dreach GROUP BY id HAVING id = min(label)) ck
         |    ON ck.id = d.doc_id),
         |""".stripMargin +
        chunkBandTopKSqlAt(BowDimWide, ChunkBandsWide)
          .stripPrefix("WITH ")
          .replace("FROM documents", "FROM documents_canon")),
    // s39: the ratio-margin miner re-derived end-to-end — micro-unit
    // pair cosines over the full cross, then the shared criterion tail
    // (bitextMarginTailSql). Candidates = rl<=k OR rr<=k, exactly the
    // engine's distinct(fwd ∪ bwd).
    "s39_bitext_margin" ->
      (bitextSidesSql() +
        """,
          |scored AS (
          |  SELECT id_l, id_r,
          |         CAST(round(CASE WHEN list_dot_product(lv, lv) = 0
          |                           OR list_dot_product(rv, rv) = 0 THEN 0.0
          |                    ELSE list_cosine_similarity(lv, rv) END * 1e6, 0)
          |              AS BIGINT) AS sim_micro
          |  FROM l, r)""".stripMargin + bitextMarginTailSql),
    // s40: the same criterion tail over the banded sign-LSH candidate
    // universe — per-side sign signature over the first 16 coordinates,
    // 2 bands of 8 bits, cross-side (band, key) equi-join, scoring only
    // candidate pairs. One tail definition with s39, so the two rungs
    // can only ever differ in candidate generation — as in the engine.
    "s40_bitext_banded" -> (bitextBandedScoredSql() + bitextMarginTailSql),
    // s40s/s41s: the SAMPLED audit forms — the identical miner over a
    // deterministic 1/16 left subsample (the cheap per-session gate
    // row; the full rungs keep one full-cost gate row per round).
    "s40s_bitext_banded_sampled" ->
      (bitextBandedScoredSql(16, " AND abs(vec_id % 32) = 0") +
        bitextMarginTailSql),
    "s41s_bitext_forward_sampled" ->
      (bitextBandedScoredSql(16, " AND abs(vec_id % 32) = 0") +
        bitextForwardTailSql),
    // s41/s43: the forward leg — banded top-4 candidates per left id,
    // the right-side neighborhood from the bwd top-4 sums (the artifact
    // definition), margin argmax per left id, no mutual filter. ONE
    // tail definition; the two rungs differ only in the banded dial.
    "s41_bitext_forward" ->
      (bitextBandedScoredSql() + bitextForwardTailSql),
    "s43_bitext_forward_wide" ->
      (bitextBandedScoredSql(32) + bitextForwardTailSql),
    // s42: the identical banded-mining tail at the WIDE dial — the
    // whole sign-signature chain re-derived at sigDim 32, 2 bands of
    // 16 bits (the geometry whose collision mass survives corpus
    // growth).
    "s42_bitext_banded_wide" ->
      (bitextBandedScoredSql(32) + bitextMarginTailSql),
    // s36: both band geometries' keyed rows unioned with a geom tag,
    // ONE join, per-pair coarse flag via max(); every joined row is a
    // fine candidate (coarse agreement implies both fine halves agree)
    "s36_chunk_band_sweep" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |cband AS (
         |  SELECT doc_id, chunk_id, $ChunkBands AS geom, band,
         |    (sig >> (band * ${BowDim / ChunkBands})) &
         |      ${(1L << (BowDim / ChunkBands)) - 1} AS key
         |  FROM (SELECT doc_id, chunk_id, sig,
         |          unnest(generate_series(0, ${ChunkBands - 1})) AS band
         |        FROM csig)
         |  UNION ALL
         |  SELECT doc_id, chunk_id, ${ChunkBands / 2} AS geom, band,
         |    (sig >> (band * ${2 * BowDim / ChunkBands})) &
         |      ${(1L << (2 * BowDim / ChunkBands)) - 1} AS key
         |  FROM (SELECT doc_id, chunk_id, sig,
         |          unnest(generate_series(0, ${ChunkBands / 2 - 1})) AS band
         |        FROM csig)),
         |qband AS (
         |  SELECT query_id, $ChunkBands AS geom, band,
         |    (sig >> (band * ${BowDim / ChunkBands})) &
         |      ${(1L << (BowDim / ChunkBands)) - 1} AS key
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${ChunkBands - 1})) AS band
         |        FROM qsig)
         |  UNION ALL
         |  SELECT query_id, ${ChunkBands / 2} AS geom, band,
         |    (sig >> (band * ${2 * BowDim / ChunkBands})) &
         |      ${(1L << (2 * BowDim / ChunkBands)) - 1} AS key
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${ChunkBands / 2 - 1})) AS band
         |        FROM qsig)),
         |cand AS (SELECT qb.query_id, cb.doc_id AS corpus_id, cb.chunk_id,
         |    max(CASE WHEN cb.geom = ${ChunkBands / 2} THEN 1 ELSE 0 END)
         |      AS mc
         |  FROM cband cb JOIN qband qb
         |    ON cb.geom = qb.geom AND cb.band = qb.band AND cb.key = qb.key
         |    AND cb.doc_id <> qb.query_id
         |  GROUP BY 1, 2, 3),
         |ncand AS (SELECT query_id, count(*) AS cf,
         |    count(*) FILTER (WHERE mc = 1) AS cc
         |  FROM cand GROUP BY 1),
         |ex AS (SELECT query_id, corpus_id, chunk_id FROM ranked
         |       WHERE rank <= $ChunkTopK),
         |nhit AS (SELECT e.query_id, count(*) AS hf,
         |    count(*) FILTER (WHERE c.mc = 1) AS hc
         |  FROM ex e JOIN cand c USING (query_id, corpus_id, chunk_id)
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(ncand.cf, 0) AS BIGINT) AS n_cand_fine,
         |  CAST(coalesce(nhit.hf, 0) AS BIGINT) AS n_hits_fine,
         |  CAST(coalesce(nhit.hf, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_fine,
         |  CAST(coalesce(ncand.cc, 0) AS BIGINT) AS n_cand_coarse,
         |  CAST(coalesce(nhit.hc, 0) AS BIGINT) AS n_hits_coarse,
         |  CAST(coalesce(nhit.hc, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli_coarse
         |FROM q
         |LEFT JOIN ncand ON ncand.query_id = q.query_id
         |LEFT JOIN nhit ON nhit.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin),
    // s34: s29's sig CTEs split into ChunkBands disjoint bit-slices on
    // BOTH sides; DISTINCT candidates on any whole-band agreement; the
    // same audit tail as s29
    "s34_chunk_band_recall" -> (chunkRetrievalCoreSql +
      s""",
         |csig0 AS (SELECT doc_id, chunk_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM cw GROUP BY 1, 2),
         |csig AS (SELECT ch.doc_id, ch.chunk_id, coalesce(s.sig, 0) AS sig
         |  FROM chunks ch LEFT JOIN csig0 s
         |    ON s.doc_id = ch.doc_id AND s.chunk_id = ch.chunk_id),
         |qsig0 AS (SELECT query_id,
         |    sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |        ELSE 0 END) AS sig
         |  FROM qw GROUP BY 1),
         |qsig AS (SELECT q.query_id, coalesce(s.sig, 0) AS sig
         |  FROM q LEFT JOIN qsig0 s ON s.query_id = q.query_id),
         |cband AS (SELECT doc_id, chunk_id, band,
         |    (sig >> (band * ${BowDim / ChunkBands})) &
         |      ${(1L << (BowDim / ChunkBands)) - 1} AS key
         |  FROM (SELECT doc_id, chunk_id, sig,
         |          unnest(generate_series(0, ${ChunkBands - 1})) AS band
         |        FROM csig)),
         |qband AS (SELECT query_id, band,
         |    (sig >> (band * ${BowDim / ChunkBands})) &
         |      ${(1L << (BowDim / ChunkBands)) - 1} AS key
         |  FROM (SELECT query_id, sig,
         |          unnest(generate_series(0, ${ChunkBands - 1})) AS band
         |        FROM qsig)),
         |cand AS (SELECT DISTINCT qb.query_id, cb.doc_id AS corpus_id,
         |    cb.chunk_id
         |  FROM cband cb JOIN qband qb
         |    ON cb.band = qb.band AND cb.key = qb.key
         |    AND cb.doc_id <> qb.query_id),
         |ncand AS (SELECT query_id, count(*) AS n FROM cand GROUP BY 1),
         |ex AS (SELECT query_id, corpus_id, chunk_id FROM ranked
         |       WHERE rank <= $ChunkTopK),
         |nhit AS (SELECT e.query_id, count(*) AS n
         |  FROM ex e JOIN cand c USING (query_id, corpus_id, chunk_id)
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(ncand.n, 0) AS BIGINT) AS n_candidates,
         |  CAST(coalesce(nhit.n, 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce(nhit.n, 0) * 1000 // $ChunkTopK AS BIGINT)
         |    AS recall_milli
         |FROM q
         |LEFT JOIN ncand ON ncand.query_id = q.query_id
         |LEFT JOIN nhit ON nhit.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin),
    "t10_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |tc AS (SELECT term, count(*) AS n
        |       FROM (SELECT unnest(t) AS term FROM tok) GROUP BY term),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM tc),
        |top AS (
        |  SELECT term, n,
        |         row_number() OVER (ORDER BY n DESC, term) AS rank,
        |         sum(n) OVER (ORDER BY n DESC, term
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM tc)
        |SELECT rank, term, n, round(CAST(cum AS DOUBLE) / total, 6) AS cum_frac
        |FROM top, tot WHERE rank <= 30 ORDER BY rank""".stripMargin,
    // Per-(doc, term) contributions round to INTEGER micro-nats before the
    // per-doc sum — exact 64-bit arithmetic, no order dependence (a float
    // sum of rounded doubles measurably loses the round-half lottery:
    // 2/500 docs at 4 dp). xent derives from the identical integers.
    "t11_unigram_xent" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |           ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
        |c AS (SELECT tf.doc_id, tf.tf,
        |        CAST(round(tf.tf * ln(tot.total / cnt.cnt) * 1e6)
        |             AS BIGINT) AS contrib_micro
        |      FROM tf JOIN cnt USING (term), tot),
        |d AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |        CAST(sum(contrib_micro) AS BIGINT) AS nll_micro
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, nll_micro,
        |  round(nll_micro / 1e6 / n_tokens, 4) AS xent,
        |  CASE WHEN round(nll_micro / 1e6 / n_tokens, 4) < 3.40 THEN 'head'
        |       WHEN round(nll_micro / 1e6 / n_tokens, 4) < 3.41 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM d ORDER BY doc_id""".stripMargin,
    // t22: the t11 micro-nat recipe at bigram order. The smoothed ratio
    // (c1+V)/(c12+1) >= 1 always (every bigram occurrence feeds its own
    // context count), so ln >= 0 and the half-up/half-away rounding modes
    // agree. generate_series(1, len-1) is empty for len < 2 — sub-bigram
    // docs drop on both engines.
    "t22_bigram_xent" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest([{'w1': t[g], 'b': t[g] || ' ' || t[g+1]}
        |            FOR g IN generate_series(1, len(t) - 1)]) AS p
        |  FROM tok),
        |b2 AS (SELECT doc_id, p.w1 AS w1, p.b AS b FROM bg),
        |tf AS (SELECT doc_id, w1, b, count(*) AS tf FROM b2 GROUP BY 1, 2, 3),
        |c12 AS (SELECT b, count(*) AS c12 FROM b2 GROUP BY b),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b2 GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT tt) AS DOUBLE) AS v
        |      FROM (SELECT unnest(t) AS tt FROM tok)),
        |per AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(tf.tf * ln((c1.c1 + v.v) / (c12.c12 + 1.0)) * 1e6)
        |         AS BIGINT) AS cm
        |  FROM tf JOIN c12 USING (b) JOIN c1 USING (w1), v)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(cm) AS BIGINT) / 1e6 / sum(tf), 4) AS xent
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // λ interpolated from LmInterpNum/LmInterpDen as an exact-binary
    // division both engines evaluate identically; the float chain
    // (λ·ratio + (1−λ)·ratio, then ln) mirrors the engine term-for-term.
    // CTEs shared with t25's bucketing (interpXentCtes — one definition).
    "t23_interp_xent" ->
      (s"WITH $interpXentCtes\n" +
      """SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(cm) AS BIGINT) / 1e6 / sum(tf), 4) AS xent
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // t26: hashed-feature multinomial log-ratio, mirrored term-for-term
    // (same md5 bucket, same smoothing, same left-associated float chain,
    // micro-nat rounding before the per-doc sum — sign-symmetric
    // away-from-zero rounding on both engines).
    "t26_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |fr AS (SELECT doc_id,
        |         CAST(CAST('0x' || substr(md5(tt), 1, 6) AS INTEGER)
        |              AS BIGINT) % 8192 AS f
        |       FROM (SELECT doc_id, unnest(t) AS tt FROM tok
        |             WHERE doc_id % 50 <> 0)),
        |ft AS (SELECT CAST(CAST('0x' || substr(md5(tt), 1, 6) AS INTEGER)
        |              AS BIGINT) % 8192 AS f
        |       FROM (SELECT unnest(t) AS tt FROM tok WHERE doc_id % 50 = 0)),
        |tf AS (SELECT doc_id, f, count(*) AS tf FROM fr GROUP BY 1, 2),
        |cr AS (SELECT f, count(*) AS cr FROM fr GROUP BY f),
        |ct AS (SELECT f, count(*) AS ct FROM ft GROUP BY f),
        |tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM fr) AS tr,
        |               (SELECT CAST(count(*) AS DOUBLE) FROM ft) AS tt),
        |per AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(tf.tf * ln(
        |        ((coalesce(ct.ct, 0) + 1.0) * (tot.tr + 8192))
        |        / ((cr.cr + 1.0) * (tot.tt + 8192))) * 1e6)
        |         AS BIGINT) AS cm
        |  FROM tf JOIN cr USING (f) LEFT JOIN ct USING (f), tot),
        |w AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |        round(CAST(sum(cm) AS BIGINT) / 1e6, 4) AS logw
        |      FROM per GROUP BY doc_id),
        |cu AS (SELECT logw AS cut FROM (
        |         SELECT logw, row_number() OVER (ORDER BY logw) AS rn,
        |                count(*) OVER () AS n FROM w)
        |       WHERE rn = (3 * n + 3) // 4)
        |SELECT w.doc_id, w.n_tokens, w.logw, w.logw > cu.cut AS selected
        |FROM w, cu ORDER BY w.doc_id""".stripMargin,

    // t25: per-source terciles of the t23 xent. The cuts are the
    // rank-ceil(n/3) / ceil(2n/3) elements of each source's sorted xents
    // — exactly what Spark's full-accuracy percentile_approx(1/3, 2/3)
    // returns (double(1/3) and double(2/3) both round BELOW the rational,
    // so ceil(p·n) never jumps a rank at multiples of 3; spec-pinned).
    // Values at sorted positions: tiebreak-free, like s17's cut.
    "t25_ccnet_buckets" ->
      (s"WITH $interpXentCtes,\n" +
      """sc AS (SELECT per.doc_id, d.source,
        |         round(CAST(sum(cm) AS BIGINT) / 1e6 / sum(tf), 4) AS xent
        |       FROM per JOIN documents d USING (doc_id)
        |       GROUP BY per.doc_id, d.source),
        |o AS (SELECT source, xent,
        |        row_number() OVER (PARTITION BY source ORDER BY xent) AS rn,
        |        count(*) OVER (PARTITION BY source) AS n
        |      FROM sc),
        |cu AS (SELECT source,
        |         max(CASE WHEN rn = (n + 2) // 3 THEN xent END) AS cut1,
        |         max(CASE WHEN rn = (2 * n + 2) // 3 THEN xent END) AS cut2
        |       FROM o GROUP BY source)
        |SELECT sc.doc_id, sc.source, sc.xent,
        |       CASE WHEN sc.xent <= cu.cut1 THEN 'head'
        |            WHEN sc.xent <= cu.cut2 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM sc JOIN cu USING (source) ORDER BY sc.doc_id""".stripMargin),
    // λ₃ spelled (1 − λ₁ − λ₂) with the same left-associated exact-binary
    // subtractions the engine performs; every join and ratio mirrors the
    // engine term-for-term (the t23 recipe one order up). b3 MUST be
    // MATERIALIZED: DuckDB inlines plain CTEs, and seven re-expansions of
    // the unnest comprehension under the count-table join tree send its
    // optimizer into a >240s plan (measured; 0.12s materialized).
    "t24_trigram_xent" ->
      (s"""WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id,
        |    unnest([{'w1': t[g], 'w2': t[g+1], 'w3': t[g+2]}
        |            FOR g IN generate_series(1, len(t) - 2)]) AS p
        |  FROM tok),
        |b3 AS MATERIALIZED (
        |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, p.w3 AS w3 FROM tg),
        |tf AS (SELECT doc_id, w1, w2, w3, count(*) AS tf
        |       FROM b3 GROUP BY 1, 2, 3, 4),
        |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM b3 GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b3 GROUP BY 1, 2),
        |c23 AS (SELECT w2, w3, count(*) AS c23 FROM b3 GROUP BY 1, 2),
        |c2 AS (SELECT w2, count(*) AS c2 FROM b3 GROUP BY w2),
        |c3 AS (SELECT w3, count(*) AS c3 FROM b3 GROUP BY w3),
        |tv AS (SELECT CAST(count(*) AS DOUBLE) AS t,
        |              CAST(count(DISTINCT w3) AS DOUBLE) AS v FROM b3),
        |per AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(tf.tf * -ln(
        |        ($TriL1Num.0 / $TriL1Den)
        |          * (c123.c123 / CAST(c12.c12 AS DOUBLE))
        |        + ($TriL2Num.0 / $TriL2Den)
        |          * (c23.c23 / CAST(c2.c2 AS DOUBLE))
        |        + (1 - $TriL1Num.0 / $TriL1Den - $TriL2Num.0 / $TriL2Den)
        |          * ((c3.c3 + 1.0) / (tv.t + tv.v))) * 1e6)
        |         AS BIGINT) AS cm
        |  FROM tf JOIN c123 USING (w1, w2, w3) JOIN c12 USING (w1, w2)
        |          JOIN c23 USING (w2, w3) JOIN c2 USING (w2)
        |          JOIN c3 USING (w3), tv)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
        |  round(CAST(sum(cm) AS BIGINT) / 1e6 / sum(tf), 4) AS xent
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // t37: t24's CTEs one order up — 4-gram instances, the four backoff
    // count tables per term, λ₄ derived from the three shared exact
    // binary rationals.
    "t37_fourgram_xent" ->
      (s"""WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
        |  FROM documents),
        |qg AS (
        |  SELECT doc_id,
        |    unnest([{'w1': t[g], 'w2': t[g+1], 'w3': t[g+2], 'w4': t[g+3]}
        |            FOR g IN generate_series(1, len(t) - 3)]) AS p
        |  FROM tok),
        |b4 AS MATERIALIZED (
        |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, p.w3 AS w3, p.w4 AS w4
        |  FROM qg),
        |tf AS (SELECT doc_id, w1, w2, w3, w4, count(*) AS tf
        |       FROM b4 GROUP BY 1, 2, 3, 4, 5),
        |c1234 AS (SELECT w1, w2, w3, w4, count(*) AS c1234
        |          FROM b4 GROUP BY 1, 2, 3, 4),
        |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM b4 GROUP BY 1, 2, 3),
        |c234 AS (SELECT w2, w3, w4, count(*) AS c234 FROM b4 GROUP BY 1, 2, 3),
        |c23 AS (SELECT w2, w3, count(*) AS c23 FROM b4 GROUP BY 1, 2),
        |c34 AS (SELECT w3, w4, count(*) AS c34 FROM b4 GROUP BY 1, 2),
        |c3 AS (SELECT w3, count(*) AS c3 FROM b4 GROUP BY w3),
        |c4 AS (SELECT w4, count(*) AS c4 FROM b4 GROUP BY w4),
        |tv AS (SELECT CAST(count(*) AS DOUBLE) AS t,
        |              CAST(count(DISTINCT w4) AS DOUBLE) AS v FROM b4),
        |per AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(tf.tf * -ln(
        |        ($QuadL1Num.0 / $QuadL1Den)
        |          * (c1234.c1234 / CAST(c123.c123 AS DOUBLE))
        |        + ($QuadL2Num.0 / $QuadL2Den)
        |          * (c234.c234 / CAST(c23.c23 AS DOUBLE))
        |        + ($QuadL3Num.0 / $QuadL3Den)
        |          * (c34.c34 / CAST(c3.c3 AS DOUBLE))
        |        + (1 - $QuadL1Num.0 / $QuadL1Den - $QuadL2Num.0 / $QuadL2Den
        |             - $QuadL3Num.0 / $QuadL3Den)
        |          * ((c4.c4 + 1.0) / (tv.t + tv.v))) * 1e6)
        |         AS BIGINT) AS cm
        |  FROM tf JOIN c1234 USING (w1, w2, w3, w4)
        |          JOIN c123 USING (w1, w2, w3) JOIN c234 USING (w2, w3, w4)
        |          JOIN c23 USING (w2, w3) JOIN c34 USING (w3, w4)
        |          JOIN c3 USING (w3) JOIN c4 USING (w4), tv)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_fourgrams,
        |  round(CAST(sum(cm) AS BIGINT) / 1e6 / sum(tf), 4) AS xent
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "d02_shingle_cardinality" ->
      """SELECT doc_id,
        |  CASE WHEN len(text) < 5 THEN 0
        |       ELSE len(list_distinct([substr(text, g, 5)
        |                 FOR g IN generate_series(1, len(text) - 4)])) END AS n_shingles
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    // Empty-text guard (DuckDB split('') = ['']) + explicit 0/0 → 0.0 so an
    // empty-vs-empty pair matches JaccardSim's empty-union-is-0.0 semantics
    // instead of diverging to NULL/NaN if fixtures ever gain empty docs.
    "d03_adjacent_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE list_distinct(regexp_split_to_array(trim(text), '\s+')) END AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a,
        |  round(CASE WHEN len(a.toks) + len(b.toks) = 0 THEN 0.0
        |        ELSE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        |        END, 6) AS jaccard
        |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,
    // d09's independent-signature banding/pairing + raw-text verify at
    // ≥ 0.9, closed transitively like d06. The exact-Jaccard filter
    // compares the identical integer-ratio double on both engines.
    "d10_lsh_clusters" ->
      (s"WITH RECURSIVE $lshOraclePrologue,\n" +
      """e AS (SELECT c.id_a AS src, c.id_b AS dst
        |      FROM cand c
        |      JOIN sh ja ON ja.doc_id = c.id_a
        |      JOIN sh jb ON jb.doc_id = c.id_b
        |      WHERE CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
        |            / (len(ja.shs) + len(jb.shs)
        |               - len(list_intersect(ja.shs, jb.shs))) >= 0.9),
        |eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT eb.dst, r.label FROM reach r JOIN eb ON eb.src = r.id)
        |SELECT id AS doc_id, min(label) AS cluster_id,
        |       (id = min(label)) AS is_canonical
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
    // t27: one CTE per shared predicate family — gopher counts + keep
    // from gopherCountsCte/GopherKeepSql, quality from qualityKeepSql,
    // PII from the four shared patterns, digest/tokens from the d01/t12
    // recipes — then the same two-level (source, digest) rollup.
    "t27_data_card" ->
      (s"WITH $gopherCountsCte,\n" +
      s"""g AS (SELECT doc_id, $GopherKeepSql AS keep_g FROM c),
         |dd AS (
         |  SELECT doc_id, source, lang, md5(text) AS digest,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+'))
         |         END AS BIGINT) AS n_toks,
         |    (len(regexp_extract_all(text, '$PiiEmail'))
         |     + len(regexp_extract_all(text, '$PiiIpv4'))
         |     + len(regexp_extract_all(text, '$PiiPhone'))
         |     + len(regexp_extract_all(text, '$PiiIdRun'))) > 0 AS has_pii,
         |    ${qualityKeepSql("text")} AS keep_q
         |  FROM documents),
         |j AS (SELECT dd.*, g.keep_g FROM dd JOIN g USING (doc_id)),
         |l1 AS (
         |  SELECT source, digest, count(*) AS n,
         |    CAST(sum(n_toks) AS BIGINT) AS toks,
         |    count(CASE WHEN keep_q THEN 1 END) AS nq,
         |    count(CASE WHEN keep_q AND keep_g THEN 1 END) AS ng,
         |    count(CASE WHEN has_pii THEN 1 END) AS npii
         |  FROM j GROUP BY source, digest),
         |nl AS (SELECT source, CAST(count(DISTINCT lang) AS BIGINT)
         |         AS n_langs
         |       FROM j GROUP BY source)
         |SELECT l1.source,
         |  CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(nq) AS BIGINT) AS n_quality_keep,
         |  CAST(sum(ng) AS BIGINT) AS n_gopher_keep,
         |  CAST(sum(npii) AS BIGINT) AS n_pii_docs,
         |  any_value(nl.n_langs) AS n_langs,
         |  round(1.0 - CAST(count(*) AS DOUBLE) / sum(n), 6) AS dup_frac
         |FROM l1 JOIN nl USING (source)
         |GROUP BY l1.source ORDER BY l1.source""".stripMargin),
    // d22: the d10 closure, then the keeper = row_number 1 by
    // (n_tokens DESC, doc_id) per cluster — the same total order the
    // engine's max_by(struct(n_tokens, -id)) maximizes.
    "d22_quality_canonical" ->
      (s"WITH RECURSIVE $lshOraclePrologue,\n" +
      """e AS (SELECT c.id_a AS src, c.id_b AS dst
        |      FROM cand c
        |      JOIN sh ja ON ja.doc_id = c.id_a
        |      JOIN sh jb ON jb.doc_id = c.id_b
        |      WHERE CAST(len(list_intersect(ja.shs, jb.shs)) AS DOUBLE)
        |            / (len(ja.shs) + len(jb.shs)
        |               - len(list_intersect(ja.shs, jb.shs))) >= 0.9),
        |eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT eb.dst, r.label FROM reach r JOIN eb ON eb.src = r.id),
        |cl AS (SELECT id AS doc_id, min(label) AS cluster_id
        |       FROM reach GROUP BY id),
        |tk AS (SELECT doc_id,
        |         CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |              END AS BIGINT) AS n_tokens
        |       FROM documents),
        |j AS (SELECT cl.doc_id, cl.cluster_id, tk.n_tokens
        |      FROM cl JOIN tk USING (doc_id)),
        |k AS (SELECT cluster_id, doc_id AS keep_id FROM (
        |        SELECT cluster_id, doc_id,
        |               row_number() OVER (PARTITION BY cluster_id
        |                 ORDER BY n_tokens DESC, doc_id) AS rn
        |        FROM j) WHERE rn = 1)
        |SELECT j.doc_id, j.cluster_id, j.n_tokens,
        |       j.doc_id = k.keep_id AS is_canonical
        |FROM j JOIN k USING (cluster_id) ORDER BY j.doc_id""".stripMargin),
    // d16: the banding sweep re-derived wholly from the independent d04
    // signatures — finest (one component per band) candidate pairing,
    // per-component agreement mask, each config's verdict from aligned
    // mask slices, exact word-3-gram Jaccard verify at the shared
    // threshold. String equality on sig components ≡ the engine's long
    // equality (same pinned values), and the Jaccard filter compares the
    // identical integer-ratio double on both engines (the d10 recipe).
    "d16_lsh_tuning" -> d16OracleSql(sampled = false),
    // identical sweep restricted to the deterministic md5-draw slice —
    // the oracle recomputes the same 24-bit threshold integer the engine
    // floors from LshSampleFrac
    "d16s_lsh_tuning_sampled" -> d16OracleSql(sampled = true),
    // d19's oracle anchors on the RAW window strings (the engine's
    // xxhash64 key can only over-mark on a 2^-64 collision — the
    // d09/d16 caveat class); the interval union is the same integer
    // first-L-then-min(L, gap) merge, and generate_series(1, len-7) is
    // empty below 8 tokens on both engines.
    "d19_substring_stats" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |iw AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'sh': array_to_string(t[g:g+7], ' ')}
        |            FOR g IN generate_series(1, len(t) - 7)]) AS p
        |  FROM tok),
        |inst AS (SELECT doc_id, p.pos AS pos, p.sh AS sh FROM iw),
        |rep AS (SELECT sh FROM inst GROUP BY sh HAVING count(*) >= 2),
        |m AS (SELECT i.doc_id, i.pos FROM inst i JOIN rep USING (sh)),
        |c AS (SELECT doc_id,
        |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |               IS NULL THEN 8
        |             ELSE least(8, pos - lag(pos)
        |               OVER (PARTITION BY doc_id ORDER BY pos)) END AS contrib
        |      FROM m),
        |cov AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS n_covered
        |        FROM c GROUP BY doc_id)
        |SELECT tok.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(cov.n_covered, 0) AS BIGINT) AS n_covered,
        |  round(coalesce(cov.n_covered, 0) / greatest(len(t), 1), 6)
        |    AS covered_frac
        |FROM tok LEFT JOIN cov USING (doc_id) ORDER BY tok.doc_id""".stripMargin,
    // d29: d19's raw-window-string CTEs (same repeated-start set), then
    // the cut done RELATIONALLY — a token at 1-based position i is
    // covered iff some repeated window starts in [i-7, i], i.e. the
    // windowed max of the start flag over the 7 preceding rows (dense
    // positions, so ROWS == positions); the engine's interval-fold form
    // is value-identical by the same union-of-[p,p+8) definition. A doc
    // whose tokens are ALL cut keeps '' (string_agg over zero rows is
    // NULL — coalesced under the not-null-text guard, the engine's
    // array_join([]) = '').
    "d29_substring_cut" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t,
        |    text IS NULL AS tnull
        |  FROM documents),
        |iw AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'sh': array_to_string(t[g:g+7], ' ')}
        |            FOR g IN generate_series(1, len(t) - 7)]) AS p
        |  FROM tok),
        |inst AS (SELECT doc_id, p.pos AS pos, p.sh AS sh FROM iw),
        |rep AS (SELECT sh FROM inst GROUP BY sh HAVING count(*) >= 2),
        |m AS (SELECT i.doc_id, i.pos FROM inst i JOIN rep USING (sh)),
        |tk AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'tk': t[g]}
        |            FOR g IN generate_series(1, len(t))]) AS u
        |  FROM tok),
        |pos AS (SELECT doc_id, u.pos AS pos, u.tk AS tk FROM tk),
        |cv AS (
        |  SELECT p.doc_id, p.pos, p.tk,
        |    max(CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY p.doc_id ORDER BY p.pos
        |            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c
        |  FROM pos p
        |  LEFT JOIN m ON m.doc_id = p.doc_id AND m.pos = p.pos),
        |ka AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS kt,
        |              CAST(count(*) AS BIGINT) AS nk
        |       FROM cv WHERE c = 0 GROUP BY doc_id)
        |SELECT tok.doc_id,
        |  CASE WHEN tnull THEN NULL ELSE CAST(len(t) AS BIGINT) END
        |    AS n_tokens,
        |  CASE WHEN tnull THEN NULL ELSE CAST(coalesce(ka.nk, 0) AS BIGINT)
        |    END AS n_kept,
        |  CASE WHEN tnull THEN NULL
        |    ELSE CAST(len(t) - coalesce(ka.nk, 0) AS BIGINT) END
        |    AS n_covered,
        |  CASE WHEN tnull THEN NULL ELSE coalesce(ka.kt, '') END
        |    AS kept_text
        |FROM tok LEFT JOIN ka USING (doc_id) ORDER BY tok.doc_id""".stripMargin,
    // t47: d29's raw-window-string chain with the repeated-set swapped
    // for the BENCH window-string set (doc_id % 50 = 0 slice) and rows
    // restricted to the corpus side — a corpus token is cut iff some
    // window starting in [i-7, i] appears verbatim in the benchmark
    "t47_decontaminate_cut" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t,
        |    text IS NULL AS tnull
        |  FROM documents WHERE doc_id % 50 <> 0),
        |btok AS (
        |  SELECT CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents WHERE doc_id % 50 = 0),
        |bw AS (
        |  SELECT DISTINCT
        |    unnest([array_to_string(t[g:g+7], ' ')
        |            FOR g IN generate_series(1, len(t) - 7)]) AS sh
        |  FROM btok),
        |iw AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'sh': array_to_string(t[g:g+7], ' ')}
        |            FOR g IN generate_series(1, len(t) - 7)]) AS p
        |  FROM tok),
        |inst AS (SELECT doc_id, p.pos AS pos, p.sh AS sh FROM iw),
        |m AS (SELECT i.doc_id, i.pos FROM inst i JOIN bw USING (sh)),
        |tk AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'tk': t[g]}
        |            FOR g IN generate_series(1, len(t))]) AS u
        |  FROM tok),
        |pos AS (SELECT doc_id, u.pos AS pos, u.tk AS tk FROM tk),
        |cv AS (
        |  SELECT p.doc_id, p.pos, p.tk,
        |    max(CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY p.doc_id ORDER BY p.pos
        |            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c
        |  FROM pos p
        |  LEFT JOIN m ON m.doc_id = p.doc_id AND m.pos = p.pos),
        |ka AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS kt,
        |              CAST(count(*) AS BIGINT) AS nk
        |       FROM cv WHERE c = 0 GROUP BY doc_id)
        |SELECT tok.doc_id,
        |  CASE WHEN tnull THEN NULL ELSE CAST(len(t) AS BIGINT) END
        |    AS n_tokens,
        |  CASE WHEN tnull THEN NULL ELSE CAST(coalesce(ka.nk, 0) AS BIGINT)
        |    END AS n_kept,
        |  CASE WHEN tnull THEN NULL
        |    ELSE CAST(len(t) - coalesce(ka.nk, 0) AS BIGINT) END
        |    AS n_covered,
        |  CASE WHEN tnull THEN NULL ELSE coalesce(ka.kt, '') END
        |    AS kept_text
        |FROM tok LEFT JOIN ka USING (doc_id) ORDER BY tok.doc_id""".stripMargin,
    // d33: d29's chain with the canonical exclusion — instances of a
    // repeated window rank by (doc_id, pos) and only rn >= 2 marks cut
    "d33_substring_cut_keep1" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t,
        |    text IS NULL AS tnull
        |  FROM documents),
        |iw AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'sh': array_to_string(t[g:g+7], ' ')}
        |            FOR g IN generate_series(1, len(t) - 7)]) AS p
        |  FROM tok),
        |inst AS (SELECT doc_id, p.pos AS pos, p.sh AS sh FROM iw),
        |rep AS (SELECT sh FROM inst GROUP BY sh HAVING count(*) >= 2),
        |rk AS (SELECT i.doc_id, i.pos,
        |         row_number() OVER (PARTITION BY i.sh
        |           ORDER BY i.doc_id, i.pos) AS rn
        |       FROM inst i JOIN rep USING (sh)),
        |m AS (SELECT doc_id, pos FROM rk WHERE rn >= 2),
        |tk AS (
        |  SELECT doc_id,
        |    unnest([{'pos': g, 'tk': t[g]}
        |            FOR g IN generate_series(1, len(t))]) AS u
        |  FROM tok),
        |pos AS (SELECT doc_id, u.pos AS pos, u.tk AS tk FROM tk),
        |cv AS (
        |  SELECT p.doc_id, p.pos, p.tk,
        |    max(CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY p.doc_id ORDER BY p.pos
        |            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c
        |  FROM pos p
        |  LEFT JOIN m ON m.doc_id = p.doc_id AND m.pos = p.pos),
        |ka AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS kt,
        |              CAST(count(*) AS BIGINT) AS nk
        |       FROM cv WHERE c = 0 GROUP BY doc_id)
        |SELECT tok.doc_id,
        |  CASE WHEN tnull THEN NULL ELSE CAST(len(t) AS BIGINT) END
        |    AS n_tokens,
        |  CASE WHEN tnull THEN NULL ELSE CAST(coalesce(ka.nk, 0) AS BIGINT)
        |    END AS n_kept,
        |  CASE WHEN tnull THEN NULL
        |    ELSE CAST(len(t) - coalesce(ka.nk, 0) AS BIGINT) END
        |    AS n_covered,
        |  CASE WHEN tnull THEN NULL ELSE coalesce(ka.kt, '') END
        |    AS kept_text
        |FROM tok LEFT JOIN ka USING (doc_id) ORDER BY tok.doc_id""".stripMargin,
    // d18 re-derives banding and pairing from the independent d04
    // signature VALUES (the d09/d16 recipe), restricted to batch→corpus
    // pairs; slice equality stands in for the engine's slice-hash band
    // key (identical pairs absent a 2⁻⁶⁴ collision). Same empty-shingle
    // CASE as d16 so an empty-vs-empty pair is 0.0, not NULL.
    "d18_incremental_neardup" ->
      (s"WITH $lshSigShinglePrologue,\n" +
      """bk AS (SELECT doc_id, g,
        |         array_to_string(sig[(g*4+1):(g*4+4)], ',') AS bkey
        |       FROM s, range(0, 4) t(g)),
        |cand AS (SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
        |         FROM bk b JOIN bk c ON b.g = c.g AND b.bkey = c.bkey
        |         WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0),
        |v AS (SELECT cand.bid, cand.cid
        |      FROM cand JOIN sh jb ON jb.doc_id = cand.bid
        |                JOIN sh jc ON jc.doc_id = cand.cid
        |      WHERE (CASE WHEN len(jb.shs) + len(jc.shs) = 0 THEN 0.0
        |              ELSE CAST(len(list_intersect(jb.shs, jc.shs)) AS DOUBLE)
        |                   / (len(jb.shs) + len(jc.shs)
        |                      - len(list_intersect(jb.shs, jc.shs)))
        |              END) >= 0.9),
        |a AS (SELECT bid, min(cid) AS dup_of,
        |             CAST(count(*) AS BIGINT) AS n_matches
        |      FROM v GROUP BY bid)
        |SELECT d.doc_id, a.dup_of,
        |       CAST(coalesce(a.n_matches, 0) AS BIGINT) AS n_matches
        |FROM documents d LEFT JOIN a ON a.bid = d.doc_id
        |WHERE d.doc_id % 10 = 0
        |ORDER BY d.doc_id""".stripMargin),
    // d17's status CTEs + d18's band/verify CTEs restricted to the
    // d21: the oracle is the per-source row_number window the engine
    // deliberately avoids (bounded top-K aggregator instead) — same kept
    // set by construction, since (draw, doc_id) is a total order.
    // The oracle rebuilds the identical messy URLs, applies the SAME
    // anchored rule list (DuckDB backrefs are \1 where Spark's are $1 —
    // dialect, not semantics; every pattern is anchored so replace-first
    // vs replace-all cannot diverge), then keeps the earliest capture via
    // the row_number window the engine's min-struct aggregate avoids.
    "d23_url_dedup" ->
      """WITH u AS (
        |  SELECT event_id, ts,
        |    'http://'
        |    || CASE WHEN event_id % 2 = 0 THEN 'Host' ELSE 'host' END
        |    || CAST(user_id % 20 AS VARCHAR)
        |    || CASE WHEN event_id % 2 = 0 THEN '.Example.org'
        |            ELSE '.example.org' END
        |    || CASE WHEN event_id % 3 = 0 THEN ':80'
        |            WHEN event_id % 3 = 1 THEN ':8080' ELSE '' END
        |    || '/p/' || CAST(event_id % 40 AS VARCHAR)
        |    || CASE WHEN event_id % 2 = 1 THEN '/' ELSE '' END
        |    || CASE WHEN event_id % 5 = 0 THEN '?utm_source=feed'
        |            WHEN event_id % 5 = 1
        |              THEN '?q=' || CAST(event_id % 7 AS VARCHAR)
        |            ELSE '' END
        |    || CASE WHEN event_id % 4 = 0
        |              THEN '#sec' || CAST(event_id % 3 AS VARCHAR)
        |            ELSE '' END AS url
        |  FROM events),
        |c1 AS (SELECT event_id, ts,
        |         regexp_replace(regexp_replace(url, '#.*$', ''),
        |                        '\?utm_[^&#]*$', '') AS x
        |       FROM u),
        |c2 AS (SELECT event_id, ts,
        |         lower(regexp_extract(x, '^((?i:https?)://[^/]*)', 1))
        |           || substr(x,
        |                length(regexp_extract(x, '^((?i:https?)://[^/]*)', 1)) + 1)
        |           AS x
        |       FROM c1),
        |c3 AS (SELECT event_id, ts,
        |         regexp_replace(
        |           regexp_replace(x, '^(http://[^/:]+):80(/|$)', '\1\2'),
        |           '/$', '') AS canon_url
        |       FROM c2),
        |r AS (SELECT canon_url, event_id,
        |        row_number() OVER (PARTITION BY canon_url
        |                           ORDER BY ts, event_id) AS rn,
        |        count(*) OVER (PARTITION BY canon_url) AS n_captures
        |      FROM c3)
        |SELECT canon_url, CAST(n_captures AS BIGINT) AS n_captures,
        |       event_id AS kept_event_id
        |FROM r WHERE rn = 1 ORDER BY canon_url""".stripMargin,
    "d21_source_cap" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |         AS INTEGER) AS BIGINT) AS draw
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY draw, doc_id) AS rn
        |      FROM d)
        |SELECT doc_id, source,
        |       CAST(CASE WHEN rn <= 10 THEN rn END AS INT) AS cap_rank,
        |       rn <= 10 AS kept
        |FROM r ORDER BY doc_id""".stripMargin,
    // new_unique survivors — the oracle recomputes the composition from
    // the same independent signature VALUES d18 uses.
    "d20_ingest_triage" ->
      (s"WITH $lshSigShinglePrologue,\n" +
      """c AS (SELECT DISTINCT md5(text) AS digest
        |      FROM documents WHERE doc_id % 10 <> 0),
        |b AS (SELECT doc_id, md5(text) AS digest
        |      FROM documents WHERE doc_id % 10 = 0),
        |f AS (SELECT digest, min(doc_id) AS first_id FROM b GROUP BY 1),
        |st AS (SELECT b.doc_id, b.digest,
        |         CASE WHEN c.digest IS NOT NULL THEN 'dup_in_corpus'
        |              WHEN b.doc_id = f.first_id THEN 'new_unique'
        |              ELSE 'dup_in_batch' END AS status
        |       FROM b JOIN f USING (digest) LEFT JOIN c ON b.digest = c.digest),
        |bk AS (SELECT doc_id, g,
        |         array_to_string(sig[(g*4+1):(g*4+4)], ',') AS bkey
        |       FROM s, range(0, 4) t(g)),
        |cand AS (SELECT DISTINCT bb.doc_id AS bid, cc.doc_id AS cid
        |         FROM bk bb JOIN bk cc ON bb.g = cc.g AND bb.bkey = cc.bkey
        |         WHERE bb.doc_id IN (SELECT doc_id FROM st
        |                             WHERE status = 'new_unique')
        |           AND cc.doc_id % 10 <> 0),
        |v AS (SELECT cand.bid, cand.cid
        |      FROM cand JOIN sh jb ON jb.doc_id = cand.bid
        |                JOIN sh jc ON jc.doc_id = cand.cid
        |      WHERE (CASE WHEN len(jb.shs) + len(jc.shs) = 0 THEN 0.0
        |              ELSE CAST(len(list_intersect(jb.shs, jc.shs)) AS DOUBLE)
        |                   / (len(jb.shs) + len(jc.shs)
        |                      - len(list_intersect(jb.shs, jc.shs)))
        |              END) >= 0.9),
        |a AS (SELECT bid, min(cid) AS dup_of,
        |             CAST(count(*) AS BIGINT) AS n_matches
        |      FROM v GROUP BY bid)
        |SELECT st.doc_id, st.digest, st.status,
        |       a.dup_of AS near_dup_of,
        |       CAST(coalesce(a.n_matches, 0) AS BIGINT) AS n_near_matches,
        |       CASE WHEN st.status <> 'new_unique' THEN st.status
        |            WHEN a.dup_of IS NOT NULL THEN 'near_dup_corpus'
        |            ELSE 'ingest' END AS decision
        |FROM st LEFT JOIN a ON a.bid = st.doc_id
        |ORDER BY st.doc_id""".stripMargin),
    "d17_incremental_dedup" ->
      """WITH c AS (SELECT DISTINCT md5(text) AS digest
        |           FROM documents WHERE doc_id % 10 <> 0),
        |b AS (SELECT doc_id, md5(text) AS digest
        |      FROM documents WHERE doc_id % 10 = 0),
        |f AS (SELECT digest, min(doc_id) AS first_id FROM b GROUP BY 1)
        |SELECT b.doc_id, b.digest,
        |  CASE WHEN c.digest IS NOT NULL THEN 'dup_in_corpus'
        |       WHEN b.doc_id = f.first_id THEN 'new_unique'
        |       ELSE 'dup_in_batch' END AS status
        |FROM b JOIN f USING (digest) LEFT JOIN c ON b.digest = c.digest
        |ORDER BY b.doc_id""".stripMargin,
    // d24: the bloom prunes the PLAN, never the answer (no false
    // negatives; false positives are rejected by the exact digest
    // equality join) — so the oracle is d17's exact SQL on the % 7 split.
    "d24_bloom_dedup" ->
      """WITH c AS (SELECT DISTINCT md5(text) AS digest
        |           FROM documents WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id, md5(text) AS digest
        |      FROM documents WHERE doc_id % 7 = 0),
        |f AS (SELECT digest, min(doc_id) AS first_id FROM b GROUP BY 1)
        |SELECT b.doc_id, b.digest,
        |  CASE WHEN c.digest IS NOT NULL THEN 'dup_in_corpus'
        |       WHEN b.doc_id = f.first_id THEN 'new_unique'
        |       ELSE 'dup_in_batch' END AS status
        |FROM b JOIN f USING (digest) LEFT JOIN c ON b.digest = c.digest
        |ORDER BY b.doc_id""".stripMargin,
    // Same empty-text guard as d03: empty docs tokenize to [] (not ['']),
    // and the edge predicate computes the Jaccard through a CASE so an
    // empty-vs-empty pair is 0.0 (< threshold, no edge — JaccardSim
    // semantics) rather than a 0/0 NULL/NaN.
    "d06_dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang, source, n_chars // 100 AS len_band,
        |         CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE list_distinct(regexp_split_to_array(trim(text), '\s+'))
        |         END AS toks
        |  FROM documents WHERE doc_id < 1000),
        |e AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.source = b.source
        |   AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |  WHERE CASE WHEN len(a.toks) + len(b.toks) = 0 THEN 0.0
        |        ELSE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        |        END >= 0.6),
        |eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT eb.dst, r.label FROM reach r JOIN eb ON eb.src = r.id)
        |SELECT id AS doc_id, min(label) AS cluster_id,
        |       (id = min(label)) AS is_canonical
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "s01_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS corpus_id,
        |         list_cosine_similarity(q.qv, CAST(c.embedding AS DOUBLE[])) AS sim
        |  FROM q, embeddings c WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, corpus_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, corpus_id) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, rank, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "s02_ivf_assign" ->
      """WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        |              FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, cent.centroid_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cent.cv) AS sim,
        |         row_number() OVER (PARTITION BY e.vec_id
        |                            ORDER BY list_cosine_similarity(
        |                              CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
        |                            cent.centroid_id) AS rn
        |  FROM embeddings e, cent)
        |SELECT centroid_id, count(*) AS n, round(sum(round(sim, 6)), 4) AS sum_sim
        |FROM scored WHERE rn = 1 GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,
    // s22: cell16Prologue's assignment (one definition with s03/d15),
    // LEFT-joined so empty cells keep their row; every output is an
    // integer count or a floor-divided milli-ratio.
    "s22_cell_balance" ->
      (s"WITH $cell16Prologue,\n" +
        """pc AS (SELECT c.centroid_id, count(a.vec_id) AS nv
          |       FROM cent c LEFT JOIN asg a USING (centroid_id)
          |       GROUP BY c.centroid_id),
          |tot AS (SELECT CAST(sum(nv) AS BIGINT) AS n_total,
          |               CAST(max(nv) AS BIGINT) AS max_cell,
          |               count(CASE WHEN nv > 0 THEN 1 END) AS n_cells_used,
          |               count(*) AS k
          |        FROM pc)
          |SELECT pc.centroid_id, CAST(pc.nv AS BIGINT) AS n_vectors,
          |  CAST(pc.nv * 1000 // tot.n_total AS BIGINT) AS milli_frac,
          |  CAST(tot.max_cell * tot.k * 1000 // tot.n_total AS BIGINT)
          |    AS milli_imbalance,
          |  CAST(tot.n_cells_used AS BIGINT) AS n_cells_used
          |FROM pc, tot ORDER BY pc.centroid_id""".stripMargin),
    "s03_cosine_neardup" ->
      (s"WITH $cell16Prologue\n" +
      """SELECT a.id AS id_a, b.id AS id_b,
        |       round(list_cosine_similarity(a.vv, b.vv), 6) AS sim
        |FROM v a JOIN v b ON a.centroid_id = b.centroid_id AND a.id < b.id
        |WHERE list_cosine_similarity(a.vv, b.vv) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin),
    // d15 recomputes the s03 candidate pipeline (same 16-cell blocking,
    // same threshold — one shared prologue so they can never drift), then
    // applies the greedy keep rule: dropped iff ANY earlier same-cell
    // neighbor reaches the threshold, max_sim the strongest such match.
    "d15_semantic_dedup" ->
      (s"WITH $cell16Prologue,\n" +
      """p AS (SELECT b.id AS id_b,
        |         max(round(list_cosine_similarity(a.vv, b.vv), 6)) AS max_sim
        |       FROM v a JOIN v b ON a.centroid_id = b.centroid_id AND a.id < b.id
        |       WHERE list_cosine_similarity(a.vv, b.vv) >= 0.2
        |       GROUP BY b.id)
        |SELECT e.vec_id, p.max_sim IS NULL AS kept, p.max_sim
        |FROM embeddings e LEFT JOIN p ON p.id_b = e.vec_id
        |ORDER BY e.vec_id""".stripMargin),
    "s07_ivf_probe_topk" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """q AS (SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
        |      WHERE e.vec_id < 10),
        |c AS (SELECT e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS sv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
        |scored AS (
        |  SELECT q.query_id, c.corpus_id,
        |         list_cosine_similarity(q.qv, c.sv) AS sim,
        |         row_number() OVER (PARTITION BY q.query_id
        |                            ORDER BY list_cosine_similarity(q.qv, c.sv) DESC,
        |                            c.corpus_id) AS rank
        |  FROM q JOIN c ON c.centroid_id = q.centroid_id
        |               AND c.corpus_id <> q.query_id)
        |SELECT query_id, corpus_id, rank, round(sim, 6) AS sim
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    // s19: the same slice/argmax/LUT chain with list_inner_product;
    // encoding argmax = row_number by (ip DESC, code_id) — the engine's
    // max_by tiebreak — and the ADC sum is one addition of two dots.
    "s19_pq_recall" ->
      """WITH cb AS (SELECT vec_id AS code_id,
        |                   CAST(embedding AS DOUBLE[]) AS v
        |            FROM embeddings WHERE vec_id < 16),
        |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id < 10),
        |e1 AS (SELECT corpus_id, code_id AS code1 FROM (
        |         SELECT c.corpus_id, cb.code_id,
        |                row_number() OVER (PARTITION BY c.corpus_id
        |                  ORDER BY list_inner_product(cv[1:32], v[1:32]) DESC,
        |                           cb.code_id) AS rn
        |         FROM c, cb) WHERE rn = 1),
        |e2 AS (SELECT corpus_id, code_id AS code2 FROM (
        |         SELECT c.corpus_id, cb.code_id,
        |                row_number() OVER (PARTITION BY c.corpus_id
        |                  ORDER BY list_inner_product(cv[33:64], v[33:64]) DESC,
        |                           cb.code_id) AS rn
        |         FROM c, cb) WHERE rn = 1),
        |l1 AS (SELECT q.query_id, cb.code_id AS code1,
        |              list_inner_product(q.qv[1:32], cb.v[1:32]) AS ip1
        |       FROM q, cb),
        |l2 AS (SELECT q.query_id, cb.code_id AS code2,
        |              list_inner_product(q.qv[33:64], cb.v[33:64]) AS ip2
        |       FROM q, cb),
        |adc AS (SELECT query_id, corpus_id FROM (
        |          SELECT l1.query_id, e1.corpus_id,
        |                 row_number() OVER (PARTITION BY l1.query_id
        |                   ORDER BY l1.ip1 + l2.ip2 DESC, e1.corpus_id) AS rank
        |          FROM e1 JOIN e2 USING (corpus_id)
        |               JOIN l1 USING (code1)
        |               JOIN l2 ON l2.code2 = e2.code2
        |                      AND l2.query_id = l1.query_id
        |          WHERE e1.corpus_id <> l1.query_id) WHERE rank <= 5),
        |ex AS (SELECT query_id, corpus_id FROM (
        |         SELECT q.query_id, c.corpus_id,
        |                row_number() OVER (PARTITION BY q.query_id
        |                  ORDER BY list_inner_product(c.cv, q.qv) DESC,
        |                           c.corpus_id) AS rank
        |         FROM q, c WHERE c.corpus_id <> q.query_id) WHERE rank <= 5),
        |h AS (SELECT a.query_id, count(*) AS n_hits
        |      FROM adc a JOIN ex USING (query_id, corpus_id)
        |      GROUP BY a.query_id)
        |SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM q LEFT JOIN h USING (query_id)
        |ORDER BY q.query_id""".stripMargin,
    // s21: s19's encode/LUT/ADC CTEs + the ivfOraclePrologue cell
    // assignment, candidates restricted to the query's cell before the
    // rank. Probed cell in the output pins the assignment too.
    "s21_ivfpq_recall" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """cb AS (SELECT vec_id AS code_id,
        |               CAST(embedding AS DOUBLE[]) AS v
        |        FROM embeddings WHERE vec_id < 16),
        |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id < 10),
        |e1 AS (SELECT corpus_id, code_id AS code1 FROM (
        |         SELECT c.corpus_id, cb.code_id,
        |                row_number() OVER (PARTITION BY c.corpus_id
        |                  ORDER BY list_inner_product(cv[1:32], v[1:32]) DESC,
        |                           cb.code_id) AS rn
        |         FROM c, cb) WHERE rn = 1),
        |e2 AS (SELECT corpus_id, code_id AS code2 FROM (
        |         SELECT c.corpus_id, cb.code_id,
        |                row_number() OVER (PARTITION BY c.corpus_id
        |                  ORDER BY list_inner_product(cv[33:64], v[33:64]) DESC,
        |                           cb.code_id) AS rn
        |         FROM c, cb) WHERE rn = 1),
        |l1 AS (SELECT q.query_id, cb.code_id AS code1,
        |              list_inner_product(q.qv[1:32], cb.v[1:32]) AS ip1
        |       FROM q, cb),
        |l2 AS (SELECT q.query_id, cb.code_id AS code2,
        |              list_inner_product(q.qv[33:64], cb.v[33:64]) AS ip2
        |       FROM q, cb),
        |adc AS (SELECT query_id, corpus_id FROM (
        |          SELECT l1.query_id, e1.corpus_id,
        |                 row_number() OVER (PARTITION BY l1.query_id
        |                   ORDER BY l1.ip1 + l2.ip2 DESC, e1.corpus_id) AS rank
        |          FROM e1 JOIN e2 USING (corpus_id)
        |               JOIN asg ac ON ac.vec_id = e1.corpus_id
        |               JOIN l1 USING (code1)
        |               JOIN l2 ON l2.code2 = e2.code2
        |                      AND l2.query_id = l1.query_id
        |               JOIN asg aq ON aq.vec_id = l1.query_id
        |                          AND aq.centroid_id = ac.centroid_id
        |          WHERE e1.corpus_id <> l1.query_id) WHERE rank <= 5),
        |ex AS (SELECT query_id, corpus_id FROM (
        |         SELECT q.query_id, c.corpus_id,
        |                row_number() OVER (PARTITION BY q.query_id
        |                  ORDER BY list_inner_product(c.cv, q.qv) DESC,
        |                           c.corpus_id) AS rank
        |         FROM q, c WHERE c.corpus_id <> q.query_id) WHERE rank <= 5),
        |h AS (SELECT a.query_id, count(*) AS n_hits
        |      FROM adc a JOIN ex USING (query_id, corpus_id)
        |      GROUP BY a.query_id)
        |SELECT q.query_id, aq.centroid_id,
        |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM q JOIN asg aq ON aq.vec_id = q.query_id
        |       LEFT JOIN h USING (query_id)
        |ORDER BY q.query_id""".stripMargin),
    // s18: list slices v[1:m] + list_cosine_similarity mirror the engine's
    // slice/dot/norm chain (the s01 raw-double rank precedent); baseline
    // is the m=64 full-dim ranking from the same pair table.
    // Exact-baseline CTE is s13's `b`; the pack mirrors the engine's
    // two-32-bit-word layout (a 64-bit pack would need 1<<63 — overflow
    // under DuckDB's checked shift, the reason BOTH engines use words).
    "s20_sign_quant_recall" ->
      """WITH q0 AS (SELECT vec_id AS query_id,
        |                   CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 10),
        |c0 AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings),
        |qc AS (SELECT query_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qa,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qb
        |       FROM q0),
        |cc AS (SELECT corpus_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS ca,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS cb
        |       FROM c0),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, c0.corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, c0.cv) DESC,
        |                              c0.corpus_id) AS rank
        |    FROM q0, c0 WHERE c0.corpus_id <> q0.query_id)
        |  WHERE rank <= 5),
        |hm AS (SELECT qc.query_id, cc.corpus_id,
        |         bit_count(xor(qc.qa, cc.ca)) + bit_count(xor(qc.qb, cc.cb))
        |           AS ham
        |       FROM qc, cc WHERE cc.corpus_id <> qc.query_id),
        |r AS (SELECT query_id, corpus_id,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY ham, corpus_id) AS rank
        |      FROM hm),
        |a AS (SELECT query_id, corpus_id FROM r WHERE rank <= 5),
        |h AS (SELECT query_id, count(*) AS n_hits
        |      FROM a JOIN b USING (query_id, corpus_id) GROUP BY query_id)
        |SELECT qc.query_id, qc.qa, qc.qb,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM qc LEFT JOIN h USING (query_id)
        |ORDER BY qc.query_id""".stripMargin,
    // s24: s20's packing/Hamming/baseline CTEs, plus the candidate cut at
    // rank 20 (4·k, all-integer (ham, corpus_id) order) and the exact
    // cosine re-rank restricted to candidates (the s01 raw-double rank
    // precedent, shared with the baseline CTE).
    "s24_rerank_recall" ->
      """WITH q0 AS (SELECT vec_id AS query_id,
        |                   CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 10),
        |c0 AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings),
        |qc AS (SELECT query_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qa,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qb
        |       FROM q0),
        |cc AS (SELECT corpus_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS ca,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS cb
        |       FROM c0),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, c0.corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, c0.cv) DESC,
        |                              c0.corpus_id) AS rank
        |    FROM q0, c0 WHERE c0.corpus_id <> q0.query_id)
        |  WHERE rank <= 5),
        |hm AS (SELECT qc.query_id, cc.corpus_id,
        |         bit_count(xor(qc.qa, cc.ca)) + bit_count(xor(qc.qb, cc.cb))
        |           AS ham
        |       FROM qc, cc WHERE cc.corpus_id <> qc.query_id),
        |r1 AS (SELECT query_id, corpus_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY ham, corpus_id) AS rank1
        |       FROM hm),
        |cand AS (SELECT query_id, corpus_id, rank1 FROM r1 WHERE rank1 <= 20),
        |s1 AS (SELECT query_id, corpus_id FROM cand WHERE rank1 <= 5),
        |rr AS (SELECT cand.query_id, cand.corpus_id,
        |         row_number() OVER (PARTITION BY cand.query_id
        |           ORDER BY list_cosine_similarity(q0.qv, c0.cv) DESC,
        |                    cand.corpus_id) AS rank2
        |       FROM cand JOIN q0 USING (query_id) JOIN c0 USING (corpus_id)),
        |s2 AS (SELECT query_id, corpus_id FROM rr WHERE rank2 <= 5),
        |h1 AS (SELECT query_id, count(*) AS n1
        |       FROM s1 JOIN b USING (query_id, corpus_id) GROUP BY query_id),
        |h2 AS (SELECT query_id, count(*) AS n2
        |       FROM s2 JOIN b USING (query_id, corpus_id) GROUP BY query_id)
        |SELECT q0.query_id,
        |  CAST(coalesce(h1.n1, 0) AS BIGINT) AS n_hits_hamming,
        |  coalesce(h1.n1, 0) / 5.0 AS recall_hamming_at_5,
        |  CAST(coalesce(h2.n2, 0) AS BIGINT) AS n_hits_reranked,
        |  coalesce(h2.n2, 0) / 5.0 AS recall_reranked_at_5
        |FROM q0 LEFT JOIN h1 USING (query_id) LEFT JOIN h2 USING (query_id)
        |ORDER BY q0.query_id""".stripMargin,
    // s26: the ivfOraclePrologue's per-row assignment + the s24 pack/
    // Hamming CTEs restricted to the query's top-2 routed cells; the
    // exact baseline and the re-rank share one cosine expression.
    "s26_ivf_rerank_recall" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 10),
        |c0 AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv2
        |       FROM embeddings),
        |route AS (SELECT query_id, centroid_id FROM (
        |  SELECT q0.query_id, cent.centroid_id,
        |         row_number() OVER (PARTITION BY q0.query_id
        |           ORDER BY list_cosine_similarity(q0.qv, cent.cv) DESC,
        |                    cent.centroid_id) AS rn
        |  FROM q0, cent) WHERE rn <= 2),
        |qc AS (SELECT query_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qa,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qb
        |       FROM q0),
        |cc AS (SELECT corpus_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv2[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS ca,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv2[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS cb
        |       FROM c0),
        |candpool AS (SELECT route.query_id, asg.vec_id AS corpus_id
        |             FROM route JOIN asg USING (centroid_id)
        |             WHERE asg.vec_id <> route.query_id),
        |nc AS (SELECT query_id, count(*) AS n_cand FROM candpool
        |       GROUP BY query_id),
        |hm AS (SELECT cp.query_id, cp.corpus_id,
        |         bit_count(xor(qc.qa, cc.ca)) + bit_count(xor(qc.qb, cc.cb))
        |           AS ham
        |       FROM candpool cp
        |       JOIN qc USING (query_id) JOIN cc USING (corpus_id)),
        |r1 AS (SELECT query_id, corpus_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY ham, corpus_id) AS rank1
        |       FROM hm),
        |cand AS (SELECT query_id, corpus_id FROM r1 WHERE rank1 <= 20),
        |rr AS (SELECT cand.query_id, cand.corpus_id,
        |         row_number() OVER (PARTITION BY cand.query_id
        |           ORDER BY list_cosine_similarity(q0.qv, c0.cv2) DESC,
        |                    cand.corpus_id) AS rank2
        |       FROM cand JOIN q0 USING (query_id) JOIN c0 USING (corpus_id)),
        |s2 AS (SELECT query_id, corpus_id FROM rr WHERE rank2 <= 5),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, c0.corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, c0.cv2) DESC,
        |                              c0.corpus_id) AS rank
        |    FROM q0, c0 WHERE c0.corpus_id <> q0.query_id)
        |  WHERE rank <= 5),
        |h AS (SELECT query_id, count(*) AS n
        |      FROM s2 JOIN b USING (query_id, corpus_id) GROUP BY query_id)
        |SELECT q0.query_id,
        |  CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n, 0) / 5.0 AS recall_at_5
        |FROM q0 LEFT JOIN nc USING (query_id) LEFT JOIN h USING (query_id)
        |ORDER BY q0.query_id""".stripMargin),
    // s27: s21's encode/LUT CTEs + s26's route CTE, the ADC rank over
    // the route-restricted pool (rank1 <= 20), the inner-product
    // re-rank, and the s19/s21 exact-IP baseline.
    "s27_ivfpq_rerank_recall" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """cb AS (SELECT vec_id AS code_id,
        |               CAST(embedding AS DOUBLE[]) AS v
        |        FROM embeddings WHERE vec_id < 16),
        |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv2
        |      FROM embeddings),
        |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id < 10),
        |route AS (SELECT query_id, centroid_id FROM (
        |  SELECT q.query_id, cent.centroid_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC,
        |                    cent.centroid_id) AS rn
        |  FROM q, cent) WHERE rn <= 2),
        |e1 AS (SELECT corpus_id, code_id AS code1 FROM (
        |         SELECT c.corpus_id, cb.code_id,
        |                row_number() OVER (PARTITION BY c.corpus_id
        |                  ORDER BY list_inner_product(cv2[1:32], v[1:32]) DESC,
        |                           cb.code_id) AS rn
        |         FROM c, cb) WHERE rn = 1),
        |e2 AS (SELECT corpus_id, code_id AS code2 FROM (
        |         SELECT c.corpus_id, cb.code_id,
        |                row_number() OVER (PARTITION BY c.corpus_id
        |                  ORDER BY list_inner_product(cv2[33:64], v[33:64]) DESC,
        |                           cb.code_id) AS rn
        |         FROM c, cb) WHERE rn = 1),
        |l1 AS (SELECT q.query_id, cb.code_id AS code1,
        |              list_inner_product(q.qv[1:32], cb.v[1:32]) AS ip1
        |       FROM q, cb),
        |l2 AS (SELECT q.query_id, cb.code_id AS code2,
        |              list_inner_product(q.qv[33:64], cb.v[33:64]) AS ip2
        |       FROM q, cb),
        |candpool AS (SELECT route.query_id, asg.vec_id AS corpus_id
        |             FROM route JOIN asg USING (centroid_id)
        |             WHERE asg.vec_id <> route.query_id),
        |nc AS (SELECT query_id, count(*) AS n_cand FROM candpool
        |       GROUP BY query_id),
        |adc AS (SELECT cp.query_id, cp.corpus_id,
        |          row_number() OVER (PARTITION BY cp.query_id
        |            ORDER BY l1.ip1 + l2.ip2 DESC, cp.corpus_id) AS rank1
        |        FROM candpool cp
        |        JOIN e1 ON e1.corpus_id = cp.corpus_id
        |        JOIN e2 ON e2.corpus_id = cp.corpus_id
        |        JOIN l1 ON l1.code1 = e1.code1
        |               AND l1.query_id = cp.query_id
        |        JOIN l2 ON l2.code2 = e2.code2
        |               AND l2.query_id = cp.query_id),
        |cand AS (SELECT query_id, corpus_id FROM adc WHERE rank1 <= 20),
        |rr AS (SELECT cand.query_id, cand.corpus_id,
        |         row_number() OVER (PARTITION BY cand.query_id
        |           ORDER BY list_inner_product(q.qv, c.cv2) DESC,
        |                    cand.corpus_id) AS rank2
        |       FROM cand JOIN q USING (query_id) JOIN c USING (corpus_id)),
        |s2 AS (SELECT query_id, corpus_id FROM rr WHERE rank2 <= 5),
        |ex AS (SELECT query_id, corpus_id FROM (
        |         SELECT q.query_id, c.corpus_id,
        |                row_number() OVER (PARTITION BY q.query_id
        |                  ORDER BY list_inner_product(c.cv2, q.qv) DESC,
        |                           c.corpus_id) AS rank
        |         FROM q, c WHERE c.corpus_id <> q.query_id) WHERE rank <= 5),
        |h AS (SELECT s2.query_id, count(*) AS n_hits
        |      FROM s2 JOIN ex USING (query_id, corpus_id)
        |      GROUP BY s2.query_id)
        |SELECT q.query_id,
        |  CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM q LEFT JOIN nc USING (query_id) LEFT JOIN h USING (query_id)
        |ORDER BY q.query_id""".stripMargin),
    // s25: s24's prologue with the candidate cut at the LARGEST budget
    // (8·5 = 40), then every configuration is a rank1-prefix slice of the
    // same candidate table — a smaller budget's candidates are by
    // construction a prefix of a larger one's.
    "s25_overfetch_curve" ->
      """WITH q0 AS (SELECT vec_id AS query_id,
        |                   CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 10),
        |c0 AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings),
        |qc AS (SELECT query_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qa,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN qv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS qb
        |       FROM q0),
        |cc AS (SELECT corpus_id,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv[i+1] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS ca,
        |         CAST(list_sum(list_transform(range(32), i ->
        |           CASE WHEN cv[i+33] >= 0 THEN (1::BIGINT << i)
        |                ELSE 0::BIGINT END)) AS BIGINT) AS cb
        |       FROM c0),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, c0.corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, c0.cv) DESC,
        |                              c0.corpus_id) AS rank
        |    FROM q0, c0 WHERE c0.corpus_id <> q0.query_id)
        |  WHERE rank <= 5),
        |hm AS (SELECT qc.query_id, cc.corpus_id,
        |         bit_count(xor(qc.qa, cc.ca)) + bit_count(xor(qc.qb, cc.cb))
        |           AS ham
        |       FROM qc, cc WHERE cc.corpus_id <> qc.query_id),
        |r1 AS (SELECT query_id, corpus_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY ham, corpus_id) AS rank1
        |       FROM hm),
        |cand AS (SELECT query_id, corpus_id, rank1 FROM r1 WHERE rank1 <= 40),
        |cfg AS (SELECT unnest([1, 2, 4, 8]) AS overfetch),
        |sl AS (SELECT cfg.overfetch, cand.query_id, cand.corpus_id,
        |         row_number() OVER (PARTITION BY cand.query_id, cfg.overfetch
        |           ORDER BY list_cosine_similarity(q0.qv, c0.cv) DESC,
        |                    cand.corpus_id) AS rank2
        |       FROM cand
        |       JOIN q0 USING (query_id) JOIN c0 USING (corpus_id), cfg
        |       WHERE cand.rank1 <= cfg.overfetch * 5),
        |s2 AS (SELECT overfetch, query_id, corpus_id FROM sl
        |       WHERE rank2 <= 5),
        |h AS (SELECT overfetch, query_id, count(*) AS n
        |      FROM s2 JOIN b USING (query_id, corpus_id)
        |      GROUP BY overfetch, query_id),
        |grid AS (SELECT cfg.overfetch, q0.query_id FROM cfg, q0)
        |SELECT grid.overfetch, grid.query_id,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n, 0) / 5.0 AS recall_at_5
        |FROM grid LEFT JOIN h USING (overfetch, query_id)
        |ORDER BY grid.overfetch, grid.query_id""".stripMargin,
    "s18_matryoshka_recall" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |ms AS (SELECT unnest([8, 16, 32, 64]) AS m),
        |p AS (SELECT q.query_id, c.corpus_id, ms.m,
        |        list_cosine_similarity(q.qv[1:ms.m], c.cv[1:ms.m]) AS sim
        |      FROM q, c, ms WHERE c.corpus_id <> q.query_id),
        |r AS (SELECT query_id, corpus_id, m,
        |        row_number() OVER (PARTITION BY query_id, m
        |                           ORDER BY sim DESC, corpus_id) AS rank
        |      FROM p),
        |topk AS (SELECT * FROM r WHERE rank <= 5),
        |base AS (SELECT query_id, corpus_id FROM topk WHERE m = 64),
        |h AS (SELECT t.m, t.query_id, count(*) AS n_hits
        |      FROM topk t JOIN base b USING (query_id, corpus_id)
        |      WHERE t.m <> 64 GROUP BY t.m, t.query_id),
        |grid AS (SELECT g.m, q.query_id
        |         FROM (SELECT unnest([8, 16, 32]) AS m) g, q)
        |SELECT grid.m, grid.query_id,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM grid LEFT JOIN h USING (m, query_id)
        |ORDER BY grid.m, grid.query_id""".stripMargin,
    // The brute CTE is s01's ranking, the probe CTEs are s07's (shared
    // prologue) — both pass exact (query, corpus, rank) hash-matches on
    // this fixture, so the recall overlap derived from them is rank-safe
    // cross-engine.
    // s23: s13's oracle with the corpus restricted to the % 3 attribute
    // slice everywhere (assignment is per-row, so filtering `asg` IS the
    // filtered corpus's assignment) plus the probed-cell candidate count.
    "s23_filtered_ann" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 10),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, c.vec_id AS corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, CAST(c.embedding AS DOUBLE[])) DESC,
        |                              c.vec_id) AS rank
        |    FROM q0, embeddings c
        |    WHERE c.vec_id % 3 = 0 AND c.vec_id <> q0.query_id)
        |  WHERE rank <= 5),
        |q AS (SELECT q0.query_id, q0.qv, a.centroid_id
        |      FROM q0 JOIN asg a ON a.vec_id = q0.query_id),
        |c AS (SELECT e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS sv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
        |      WHERE e.vec_id % 3 = 0),
        |p AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q.query_id, c.corpus_id,
        |           row_number() OVER (PARTITION BY q.query_id
        |                              ORDER BY list_cosine_similarity(q.qv, c.sv) DESC,
        |                              c.corpus_id) AS rank
        |    FROM q JOIN c ON c.centroid_id = q.centroid_id
        |                 AND c.corpus_id <> q.query_id)
        |  WHERE rank <= 5),
        |cand AS (SELECT q.query_id, count(*) AS n_candidates
        |         FROM q JOIN c ON c.centroid_id = q.centroid_id
        |                      AND c.corpus_id <> q.query_id
        |         GROUP BY q.query_id),
        |h AS (SELECT b.query_id, count(*) AS n_hits
        |      FROM b JOIN p USING (query_id, corpus_id) GROUP BY b.query_id)
        |SELECT q0.query_id,
        |       CAST(coalesce(cand.n_candidates, 0) AS BIGINT) AS n_candidates,
        |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM q0 LEFT JOIN cand ON cand.query_id = q0.query_id
        |        LEFT JOIN h ON h.query_id = q0.query_id
        |ORDER BY q0.query_id""".stripMargin),
    "s13_ivf_recall" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 10),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, c.vec_id AS corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, CAST(c.embedding AS DOUBLE[])) DESC,
        |                              c.vec_id) AS rank
        |    FROM q0, embeddings c WHERE c.vec_id <> q0.query_id)
        |  WHERE rank <= 5),
        |q AS (SELECT q0.query_id, q0.qv, a.centroid_id
        |      FROM q0 JOIN asg a ON a.vec_id = q0.query_id),
        |c AS (SELECT e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS sv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
        |p AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q.query_id, c.corpus_id,
        |           row_number() OVER (PARTITION BY q.query_id
        |                              ORDER BY list_cosine_similarity(q.qv, c.sv) DESC,
        |                              c.corpus_id) AS rank
        |    FROM q JOIN c ON c.centroid_id = q.centroid_id
        |                 AND c.corpus_id <> q.query_id)
        |  WHERE rank <= 5),
        |h AS (SELECT b.query_id, count(*) AS n_hits
        |      FROM b JOIN p USING (query_id, corpus_id) GROUP BY b.query_id)
        |SELECT q0.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
        |FROM q0 LEFT JOIN h ON h.query_id = q0.query_id
        |ORDER BY q0.query_id""".stripMargin),
    // s15: s08's 2-probe ranking and the brute ranking, both to depth
    // 10; a hit at k is a pair both sides rank <= k.
    // s16's rank key is the ROUNDED similarity (both engines round to the
    // 6-dp comparison precision BEFORE ranking, vec_id tiebreak), and the
    // prune gate is the integer form of rank <= ceil(cell_n / 5).
    "s16_prototype_prune" ->
      (s"WITH $proto16Prologue,\n" +
      """r AS (
        |  SELECT vec_id, centroid_id, round(sim, 6) AS proto_sim,
        |         row_number() OVER (PARTITION BY centroid_id
        |                            ORDER BY round(sim, 6) DESC, vec_id)
        |           AS cell_rank,
        |         count(*) OVER (PARTITION BY centroid_id) AS cell_n
        |  FROM a)
        |SELECT vec_id, centroid_id, proto_sim, cell_rank,
        |       5 * cell_rank <= cell_n + 4 AS pruned
        |FROM r ORDER BY vec_id""".stripMargin),
    // s17: the quantile-threshold prune. cell_cut = the rank-ceil(3n/4)
    // (from the bottom) element of the cell's 6-dp-rounded sims — exactly
    // what Spark's full-accuracy percentile_approx(rsim, 0.75) returns
    // (probed convention, see the registry comment). ceil(3n/4) is the
    // integer (3n+3)//4: no float touches the rank. The cut is a VALUE at
    // a sorted position, so ties in rsim cannot change it.
    "s17_prototype_prune_approx" ->
      (s"WITH $proto16Prologue,\n" +
      """r AS (SELECT vec_id, centroid_id, sim, round(sim, 6) AS rsim
        |       FROM a),
        |cut AS (
        |  SELECT centroid_id, rsim AS cell_cut FROM (
        |    SELECT centroid_id, rsim,
        |           row_number() OVER (PARTITION BY centroid_id
        |                              ORDER BY rsim) AS rn,
        |           count(*) OVER (PARTITION BY centroid_id) AS n
        |    FROM r)
        |  WHERE rn = (3 * n + 3) // 4)
        |SELECT r.vec_id, r.centroid_id, round(r.sim, 6) AS proto_sim,
        |       cut.cell_cut, r.rsim > cut.cell_cut AS pruned
        |FROM r JOIN cut USING (centroid_id)
        |ORDER BY r.vec_id""".stripMargin),
    "s15_recall_at_k" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """qp AS (
        |  SELECT query_id, centroid_id, qv FROM (
        |    SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv,
        |           cent.centroid_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |                              ORDER BY list_cosine_similarity(
        |                                CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
        |                              cent.centroid_id) AS pr
        |    FROM embeddings e, cent WHERE e.vec_id < 10) WHERE pr <= 2),
        |c AS (SELECT e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS sv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
        |ap AS (
        |  SELECT query_id, corpus_id, ra FROM (
        |    SELECT q.query_id, c.corpus_id,
        |           row_number() OVER (PARTITION BY q.query_id
        |                              ORDER BY list_cosine_similarity(q.qv, c.sv) DESC,
        |                              c.corpus_id) AS ra
        |    FROM qp q JOIN c ON c.centroid_id = q.centroid_id
        |                 AND c.corpus_id <> q.query_id)
        |  WHERE ra <= 10),
        |b AS (
        |  SELECT query_id, corpus_id, re FROM (
        |    SELECT q0.query_id, cc.vec_id AS corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, CAST(cc.embedding AS DOUBLE[])) DESC,
        |                              cc.vec_id) AS re
        |    FROM (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |          FROM embeddings WHERE vec_id < 10) q0,
        |         embeddings cc WHERE cc.vec_id <> q0.query_id)
        |  WHERE re <= 10),
        |ks AS (SELECT UNNEST([1, 3, 5, 10]) AS k),
        |h AS (SELECT ks.k, count(*) AS total_hits
        |      FROM ap JOIN b USING (query_id, corpus_id)
        |      JOIN ks ON ap.ra <= ks.k AND b.re <= ks.k
        |      GROUP BY ks.k)
        |SELECT ks.k, CAST(coalesce(h.total_hits, 0) AS BIGINT) AS total_hits
        |FROM ks LEFT JOIN h USING (k) ORDER BY ks.k""".stripMargin),
    // s14: the same prologue + probe ranking as s08/s13; the sweep
    // replicates each scored candidate to every budget >= its cell's
    // probe rank (range join on generate_series), re-ranks per (query,
    // budget), and totals integer hits vs the brute-force ranking.
    "s14_recall_curve" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """qs AS (
        |  SELECT query_id, centroid_id, qv, pr FROM (
        |    SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv,
        |           cent.centroid_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |                              ORDER BY list_cosine_similarity(
        |                                CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
        |                              cent.centroid_id) AS pr
        |    FROM embeddings e, cent WHERE e.vec_id < 10) WHERE pr <= 4),
        |cs AS (SELECT e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS sv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
        |swept AS (
        |  SELECT p.nprobe, q.query_id, q.qv, c.corpus_id, c.sv
        |  FROM qs q
        |  JOIN cs c ON c.centroid_id = q.centroid_id AND c.corpus_id <> q.query_id
        |  JOIN (SELECT UNNEST(generate_series(1, 4)) AS nprobe) p
        |    ON p.nprobe >= q.pr),
        |ranked AS (
        |  SELECT nprobe, query_id, corpus_id,
        |         row_number() OVER (PARTITION BY query_id, nprobe
        |                            ORDER BY list_cosine_similarity(qv, sv) DESC,
        |                            corpus_id) AS rank
        |  FROM swept),
        |b AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q0.query_id, cc.vec_id AS corpus_id,
        |           row_number() OVER (PARTITION BY q0.query_id
        |                              ORDER BY list_cosine_similarity(
        |                                q0.qv, CAST(cc.embedding AS DOUBLE[])) DESC,
        |                              cc.vec_id) AS rank
        |    FROM (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |          FROM embeddings WHERE vec_id < 10) q0,
        |         embeddings cc WHERE cc.vec_id <> q0.query_id)
        |  WHERE rank <= 5),
        |h AS (SELECT nprobe, count(*) AS total_hits
        |      FROM (SELECT nprobe, query_id, corpus_id
        |            FROM ranked WHERE rank <= 5) r
        |      JOIN b USING (query_id, corpus_id) GROUP BY nprobe),
        |sc AS (SELECT nprobe, count(*) AS total_scanned FROM swept GROUP BY nprobe)
        |SELECT sc.nprobe, CAST(coalesce(h.total_hits, 0) AS BIGINT) AS total_hits,
        |       CAST(sc.total_scanned AS BIGINT) AS total_scanned
        |FROM sc LEFT JOIN h USING (nprobe) ORDER BY sc.nprobe""".stripMargin),
    "s08_ivf_multiprobe" ->
      (s"WITH $ivfOraclePrologue,\n" +
      """qp AS (
        |  SELECT query_id, centroid_id, qv FROM (
        |    SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv,
        |           cent.centroid_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |                              ORDER BY list_cosine_similarity(
        |                                CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
        |                              cent.centroid_id) AS pr
        |    FROM embeddings e, cent WHERE e.vec_id < 10) WHERE pr <= 2),
        |c AS (SELECT e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS sv,
        |             a.centroid_id
        |      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
        |scored AS (
        |  SELECT q.query_id, c.corpus_id,
        |         list_cosine_similarity(q.qv, c.sv) AS sim,
        |         row_number() OVER (PARTITION BY q.query_id
        |                            ORDER BY list_cosine_similarity(q.qv, c.sv) DESC,
        |                            c.corpus_id) AS rank
        |  FROM qp q JOIN c ON c.centroid_id = q.centroid_id
        |               AND c.corpus_id <> q.query_id)
        |SELECT query_id, corpus_id, rank, round(sim, 6) AS sim
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    // s09: the integer codes are deterministic double math in array order
    // (floor(u+0.5)), so q_csv/q_sum are EXACT cross-engine checks; the
    // error metric is a max fold (order-independent), not a sum.
    "s09_quantize_int8" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |           FROM embeddings),
        |s AS (SELECT vec_id, vv,
        |        list_aggregate(vv, 'min') AS mn,
        |        list_aggregate(vv, 'max') AS mx,
        |        (list_aggregate(vv, 'max') - list_aggregate(vv, 'min')) / 255.0 AS sc
        |      FROM v),
        |q AS (SELECT vec_id, vv, mn, mx, sc,
        |        CASE WHEN sc = 0 THEN [0 FOR x IN vv]
        |             ELSE [CAST(floor((x - mn) / sc + 0.5) AS INT) FOR x IN vv]
        |        END AS qq
        |      FROM s)
        |SELECT vec_id, round(mn, 6) AS vmin, round(mx, 6) AS vmax,
        |  CAST(list_sum(qq) AS BIGINT) AS q_sum,
        |  array_to_string(qq, ',') AS q_csv,
        |  round(list_aggregate([abs(vv[g] - (mn + qq[g] * sc))
        |        FOR g IN generate_series(1, len(vv))], 'max'), 6) AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,
    // s11: dequantization (mn + code*scale) is spelled in the identical
    // association order; the ranking mirrors s01's established
    // list_cosine_similarity parity.
    "s11_quantized_knn" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |           FROM embeddings),
        |a AS (SELECT vec_id, vv, list_aggregate(vv, 'min') AS mn,
        |        (list_aggregate(vv, 'max') - list_aggregate(vv, 'min')) / 255.0 AS sc
        |      FROM v),
        |ap AS (SELECT vec_id,
        |        CASE WHEN sc = 0 THEN vv
        |             ELSE [mn + CAST(floor((x - mn) / sc + 0.5) AS INT) * sc
        |                   FOR x IN vv]
        |        END AS av
        |      FROM a),
        |q AS (SELECT vec_id AS query_id, av AS qv FROM ap WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS corpus_id,
        |         list_cosine_similarity(q.qv, c.av) AS sim
        |  FROM q, ap c WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, corpus_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, corpus_id) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, rank, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // s10: s02's oracled argmax assignment feeds an element-wise mean per
    // (centroid, dim); parallel unnest zips the value list with its
    // 1-based index list.
    "s10_centroid_refine" ->
      """WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        |              FROM embeddings WHERE vec_id < 8),
        |asg AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT e.vec_id, cent.centroid_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |                              ORDER BY list_cosine_similarity(
        |                                CAST(e.embedding AS DOUBLE[]), cent.cv) DESC,
        |                              cent.centroid_id) AS rn
        |    FROM embeddings e, cent) WHERE rn = 1),
        |x AS (
        |  SELECT a.centroid_id,
        |         unnest(generate_series(1, len(v.vv))) AS g,
        |         unnest(v.vv) AS x
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |        FROM embeddings) v
        |  JOIN asg a ON a.vec_id = v.vec_id)
        |SELECT centroid_id, CAST(g - 1 AS INT) AS dim, count(*) AS n,
        |       round(avg(x), 4) + 0.0 AS mean_val
        |FROM x GROUP BY centroid_id, g ORDER BY centroid_id, dim""".stripMargin,
    // Two unrolled Lloyd rounds; round-1 means rebuild into centroid
    // vectors ordered by dim, so round 2 assigns against the identical
    // 4dp decimals the engine uses.
    "s12_kmeans_train" ->
      """WITH corp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |              FROM embeddings),
        |cent0 AS (SELECT vec_id AS centroid_id, vv AS cv
        |          FROM corp WHERE vec_id < 8),
        |asg1 AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT c.vec_id, cent0.centroid_id,
        |           row_number() OVER (PARTITION BY c.vec_id
        |                              ORDER BY list_cosine_similarity(c.vv, cent0.cv) DESC,
        |                              cent0.centroid_id) AS rn
        |    FROM corp c, cent0) WHERE rn = 1),
        |x1 AS (SELECT a.centroid_id,
        |         unnest(generate_series(1, len(v.vv))) AS g, unnest(v.vv) AS x
        |       FROM corp v JOIN asg1 a ON a.vec_id = v.vec_id),
        |mm1 AS (SELECT centroid_id, g, round(avg(x), 4) + 0.0 AS mean_val
        |        FROM x1 GROUP BY centroid_id, g),
        |cent1 AS (SELECT centroid_id, list(mean_val ORDER BY g) AS cv
        |          FROM mm1 GROUP BY centroid_id),
        |asg2 AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT c.vec_id, cent1.centroid_id,
        |           row_number() OVER (PARTITION BY c.vec_id
        |                              ORDER BY list_cosine_similarity(c.vv, cent1.cv) DESC,
        |                              cent1.centroid_id) AS rn
        |    FROM corp c, cent1) WHERE rn = 1),
        |x2 AS (SELECT a.centroid_id,
        |         unnest(generate_series(1, len(v.vv))) AS g, unnest(v.vv) AS x
        |       FROM corp v JOIN asg2 a ON a.vec_id = v.vec_id)
        |SELECT centroid_id, CAST(g - 1 AS INT) AS dim, count(*) AS n,
        |       round(avg(x), 4) + 0.0 AS mean_val
        |FROM x2 GROUP BY centroid_id, g ORDER BY centroid_id, dim""".stripMargin,
    // m01–m03 recompute the mediaFromDocuments generator parameters (the
    // engine side PARSES real container bytes built from these): h0/h1 =
    // first/second codepoint (0 when absent — ord('') errors in DuckDB),
    // image = 24bpp BMP (54-byte headers + 4-byte-padded rows), audio =
    // 44-byte-header mono 16-bit PCM WAV, video = C420 YUV4MPEG2 whose
    // byte size includes the ASCII stream header and per-frame FRAME\n.
    "m01_media_meta" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id, doc_id % 3 AS k,
        |    CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS h0,
        |    CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS h1,
        |    length(text) AS nc
        |  FROM documents),
        |m AS (
        |  SELECT media_id,
        |    CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CASE k WHEN 0 THEN 4 + h0 % 60 WHEN 2 THEN 2 * (4 + h0 % 12) ELSE 0 END AS width,
        |    CASE k WHEN 0 THEN 4 + h1 % 60 WHEN 2 THEN 2 * (4 + h1 % 12) ELSE 0 END AS height,
        |    CASE k WHEN 0 THEN 1 WHEN 1 THEN 50 + nc % 200
        |           ELSE CAST(1 + media_id % 30 AS INT) END AS n_frames,
        |    CASE k WHEN 1 THEN CAST(8000 + (media_id % 5) * 2000 AS INT)
        |           WHEN 2 THEN 25 ELSE 0 END AS sample_rate
        |  FROM p)
        |SELECT media_id, kind,
        |  CASE kind
        |    WHEN 'image' THEN 54 + ((3 * width + 3) // 4) * 4 * height
        |    WHEN 'audio' THEN 44 + 2 * n_frames
        |    ELSE length('YUV4MPEG2 W' || width || ' H' || height ||
        |                ' F25:1 Ip A1:1 C420') + 1
        |         + n_frames * (6 + (width * height * 3) // 2)
        |  END AS n_bytes,
        |  width, height, n_frames, sample_rate
        |FROM m ORDER BY media_id""".stripMargin,
    "m02_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, CAST(1 + doc_id % 30 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT media_id,
        |         unnest([g FOR g IN generate_series(0, n_frames - 1, 5)]) AS frame_idx
        |  FROM v)
        |SELECT media_id, frame_idx,
        |       (media_id * 1000003 + frame_idx * 7919) % 1000000007 AS frame_sig
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "m03_resize_plan" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    4 + CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END % 60 AS width,
        |    4 + CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END % 60 AS height
        |  FROM documents WHERE doc_id % 3 = 0),
        |r AS (
        |  SELECT media_id, width, height,
        |         CAST(floor(width * 224.0 / greatest(width, height)) AS INT) AS out_w,
        |         CAST(floor(height * 224.0 / greatest(width, height)) AS INT) AS out_h
        |  FROM img)
        |SELECT media_id, width, height, out_w, out_h,
        |       CAST(floor((224 - out_w) / 2.0) AS INT) AS pad_x,
        |       CAST(floor((224 - out_h) / 2.0) AS INT) AS pad_y
        |FROM r ORDER BY media_id""".stripMargin,
    // m04: the builder writes sample_i = (seed*31 + i*2654435761) % 65536
    // little-endian; the parser reads it back signed. Recompute the
    // series, window it, and take the same integer floor-division mean.
    "m04_audio_profile" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id,
        |         CAST(50 + length(text) % 200 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT media_id,
        |         unnest([i FOR i IN generate_series(0, n_frames - 1)]) AS i
        |  FROM a),
        |v AS (
        |  SELECT media_id, i, i // 100 AS window_idx,
        |         (media_id * 31 + i * 2654435761) % 65536 AS u
        |  FROM s),
        |x AS (SELECT media_id, window_idx,
        |             abs(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS ax
        |      FROM v)
        |SELECT media_id, CAST(window_idx AS INT) AS window_idx,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(max(ax) AS INT) AS peak,
        |       CAST((1000 * sum(ax)) // count(*) AS BIGINT) AS mean_abs_milli
        |FROM x GROUP BY media_id, window_idx
        |ORDER BY media_id, window_idx""".stripMargin,
    // m05: the builder fills each Y4M frame payload with
    // (seed + 131·f + i) % 256 (MediaCodecs.buildY4m); luma is the first
    // w·h bytes of the 4:2:0 payload. Recompute the two mod-256 bytes per
    // sampled pixel and take the same integer floor-division milli-mean.
    "m05_motion_profile" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    2 * (4 + CASE WHEN length(text) >= 1
        |                  THEN ord(substr(text, 1, 1)) ELSE 0 END % 12) AS w,
        |    2 * (4 + CASE WHEN length(text) >= 2
        |                  THEN ord(substr(text, 2, 1)) ELSE 0 END % 12) AS h,
        |    CAST(1 + doc_id % 30 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT media_id, w, h,
        |         unnest([g FOR g IN generate_series(1, n_frames - 1)]) AS frame_idx
        |  FROM v WHERE n_frames >= 2),
        |p AS (
        |  SELECT media_id, frame_idx,
        |         unnest([i FOR i IN generate_series(0, w * h - 1, 7)]) AS i
        |  FROM f),
        |d AS (
        |  SELECT media_id, frame_idx,
        |         abs((media_id + 131 * frame_idx + i) % 256
        |             - (media_id + 131 * (frame_idx - 1) + i) % 256) AS ad
        |  FROM p)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(count(*) AS BIGINT) AS n_pixels,
        |       CAST((1000 * sum(ad)) // count(*) AS BIGINT) AS sad_milli
        |FROM d GROUP BY media_id, frame_idx
        |ORDER BY media_id, frame_idx""".stripMargin,
    // m06: the builder stores bottom-up, the decoder hands back top-down
    // (what vision code expects), so the oracle's pixel formula reads the
    // builder pattern at flipped row h-1-y — the decode round trip is
    // exactly what this pins. Grid anchors and the mean gate are
    // all-integer; bits pack into two 32-bit words (the s20 rule).
    "m06_image_phash" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    4 + (CASE WHEN length(text) >= 1
        |              THEN ord(substr(text, 1, 1)) ELSE 0 END) % 60 AS w,
        |    4 + (CASE WHEN length(text) >= 2
        |              THEN ord(substr(text, 2, 1)) ELSE 0 END) % 60 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (SELECT media_id, w, h,
        |        unnest([v FOR v IN generate_series(0, 63)]) AS idx
        |      FROM img),
        |px AS (SELECT media_id, w, h, idx,
        |        (media_id + 31 * (((idx % 8) * w) // 8)
        |         + 17 * (h - 1 - (((idx // 8) * h) // 8))) % 256 AS v
        |       FROM g),
        |s AS (SELECT media_id, sum(v) AS s64 FROM px GROUP BY 1),
        |bits AS (SELECT px.media_id, px.w, px.h, px.idx,
        |          CASE WHEN px.v * 64 > s.s64 THEN 1 ELSE 0 END AS bit
        |         FROM px JOIN s USING (media_id))
        |SELECT media_id, CAST(max(w) AS INT) AS width,
        |  CAST(max(h) AS INT) AS height,
        |  CAST(coalesce(sum(CASE WHEN idx < 32
        |    THEN CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << idx) END), 0)
        |    AS BIGINT) AS ha,
        |  CAST(coalesce(sum(CASE WHEN idx >= 32
        |    THEN CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << (idx - 32)) END), 0)
        |    AS BIGINT) AS hb,
        |  CAST(sum(bit) AS INT) AS n_ones
        |FROM bits GROUP BY media_id ORDER BY media_id""".stripMargin,
    // m07: m05's SAD CTEs verbatim, plus the frame-0 anchor union, the
    // cumulative-cut-count shot id (window sum over the bounded per-video
    // group), and the per-shot rollup with NULL mean for a shot that is
    // only the anchor of a single-frame video.
    "m07_shot_segments" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    2 * (4 + CASE WHEN length(text) >= 1
        |                  THEN ord(substr(text, 1, 1)) ELSE 0 END % 12) AS w,
        |    2 * (4 + CASE WHEN length(text) >= 2
        |                  THEN ord(substr(text, 2, 1)) ELSE 0 END % 12) AS h,
        |    CAST(1 + doc_id % 30 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT media_id, w, h,
        |         unnest([g FOR g IN generate_series(1, n_frames - 1)]) AS frame_idx
        |  FROM v WHERE n_frames >= 2),
        |p AS (
        |  SELECT media_id, frame_idx,
        |         unnest([i FOR i IN generate_series(0, w * h - 1, 7)]) AS i
        |  FROM f),
        |dd AS (
        |  SELECT media_id, frame_idx,
        |         abs((media_id + 131 * frame_idx + i) % 256
        |             - (media_id + 131 * (frame_idx - 1) + i) % 256) AS ad
        |  FROM p),
        |sad AS (
        |  SELECT media_id, frame_idx,
        |         CAST((1000 * sum(ad)) // count(*) AS BIGINT) AS sad_milli
        |  FROM dd GROUP BY media_id, frame_idx),
        |frames AS (
        |  SELECT media_id, 0 AS frame_idx, CAST(NULL AS BIGINT) AS sad_milli
        |  FROM v
        |  UNION ALL
        |  SELECT media_id, frame_idx, sad_milli FROM sad),
        |cuts AS (
        |  SELECT media_id, frame_idx, sad_milli,
        |    CAST(sum(CASE WHEN frame_idx = 0 OR sad_milli >= 128000
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY media_id ORDER BY frame_idx) - 1
        |      AS INT) AS shot_id
        |  FROM frames)
        |SELECT media_id, shot_id,
        |  CAST(min(frame_idx) AS INT) AS start_frame,
        |  CAST(max(frame_idx) AS INT) AS end_frame,
        |  CAST(count(*) AS INT) AS n_frames,
        |  CASE WHEN count(sad_milli) > 0
        |       THEN CAST(sum(sad_milli) // count(sad_milli) AS BIGINT)
        |  END AS mean_sad_milli
        |FROM cuts GROUP BY media_id, shot_id
        |ORDER BY media_id, shot_id""".stripMargin,
    // m10: m04's LCG/window chain at 10-frame windows, lag for the
    // delta, LSB-first packing capped at 32 bits.
    "m10_audio_fingerprint" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id,
        |         CAST(50 + length(text) % 200 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT media_id,
        |         unnest([i FOR i IN generate_series(0, n_frames - 1)]) AS i
        |  FROM a),
        |v AS (
        |  SELECT media_id, i, i // 10 AS window_idx,
        |         (media_id * 31 + i * 2654435761) % 65536 AS u
        |  FROM s),
        |x AS (SELECT media_id, window_idx,
        |             abs(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS ax
        |      FROM v),
        |w AS (SELECT media_id, window_idx,
        |             (1000 * sum(ax)) // count(*) AS mean_abs_milli
        |      FROM x GROUP BY media_id, window_idx),
        |d AS (SELECT media_id, window_idx, mean_abs_milli,
        |        lag(mean_abs_milli) OVER (PARTITION BY media_id
        |                                  ORDER BY window_idx) AS prev
        |      FROM w),
        |b AS (SELECT media_id, window_idx,
        |        CASE WHEN mean_abs_milli > prev THEN 1 ELSE 0 END AS bit
        |      FROM d WHERE prev IS NOT NULL AND window_idx <= 32),
        |nw AS (SELECT media_id, count(*) AS n_windows FROM w GROUP BY 1),
        |fp AS (SELECT media_id, count(*) AS n_bits,
        |         CAST(coalesce(sum(CAST(bit AS BIGINT)
        |           * (CAST(1 AS BIGINT) << (window_idx - 1))), 0) AS BIGINT)
        |           AS fp
        |       FROM b GROUP BY media_id)
        |SELECT nw.media_id, CAST(nw.n_windows AS INT) AS n_windows,
        |  CAST(coalesce(fp.n_bits, 0) AS INT) AS n_bits,
        |  coalesce(fp.fp, 0) AS fp
        |FROM nw LEFT JOIN fp USING (media_id)
        |ORDER BY nw.media_id""".stripMargin,
    // m09: m06's pixel/bit chain parameterized by the pattern SEED
    // (copies at +10M reuse the original seed — that is the point),
    // then the 4-band decomposition, the banded pair join with full
    // Hamming verify at radius 3, and the d06 recursive min-label
    // closure.
    "m09_visual_clusters" ->
      """WITH RECURSIVE img AS (
        |  SELECT doc_id AS media_id, doc_id AS seed,
        |    4 + (CASE WHEN length(text) >= 1
        |              THEN ord(substr(text, 1, 1)) ELSE 0 END) % 60 AS w,
        |    4 + (CASE WHEN length(text) >= 2
        |              THEN ord(substr(text, 2, 1)) ELSE 0 END) % 60 AS h
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS media_id, doc_id AS seed,
        |    4 + (CASE WHEN length(text) >= 1
        |              THEN ord(substr(text, 1, 1)) ELSE 0 END) % 60 AS w,
        |    4 + (CASE WHEN length(text) >= 2
        |              THEN ord(substr(text, 2, 1)) ELSE 0 END) % 60 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (SELECT media_id, seed, w, h,
        |        unnest([v FOR v IN generate_series(0, 63)]) AS idx
        |      FROM img),
        |px AS (SELECT media_id, idx,
        |        (seed + 31 * (((idx % 8) * w) // 8)
        |         + 17 * (h - 1 - (((idx // 8) * h) // 8))) % 256 AS v
        |       FROM g),
        |sm AS (SELECT media_id, sum(v) AS s64 FROM px GROUP BY 1),
        |bits AS (SELECT px.media_id, px.idx,
        |          CASE WHEN px.v * 64 > sm.s64 THEN 1 ELSE 0 END AS bit
        |         FROM px JOIN sm USING (media_id)),
        |hs AS (SELECT media_id,
        |  CAST(coalesce(sum(CASE WHEN idx < 32
        |    THEN CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << idx) END), 0)
        |    AS BIGINT) AS ha,
        |  CAST(coalesce(sum(CASE WHEN idx >= 32
        |    THEN CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << (idx - 32)) END), 0)
        |    AS BIGINT) AS hb
        |  FROM bits GROUP BY media_id),
        |bd AS (SELECT media_id, ha, hb, b.band,
        |        CASE b.band WHEN 0 THEN ha & 65535
        |                    WHEN 1 THEN (ha >> 16) & 65535
        |                    WHEN 2 THEN hb & 65535
        |                    ELSE (hb >> 16) & 65535 END AS band_key
        |       FROM hs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
        |e AS (SELECT DISTINCT a.media_id AS src, c.media_id AS dst
        |      FROM bd a JOIN bd c USING (band, band_key)
        |      WHERE a.media_id < c.media_id
        |        AND bit_count(xor(a.ha, c.ha))
        |            + bit_count(xor(a.hb, c.hb)) <= 3),
        |eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, label) AS (
        |  SELECT media_id, media_id FROM hs
        |  UNION
        |  SELECT eb.dst, r.label FROM reach r JOIN eb ON eb.src = r.id)
        |SELECT id AS media_id, min(label) AS cluster_id,
        |       (id = min(label)) AS is_canonical
        |FROM reach GROUP BY id ORDER BY media_id""".stripMargin,
    // m11: m10's LCG/window chain at 5-frame windows for base + copy
    // clips (copies at +10M reuse the original seed — that is the
    // point), the full 64-delta packing split fa/fb at window 32, the
    // fair-split banded pair join on (n_windows, band, band_key) with the
    // full-series Hamming verify at radius 3, minBits 8, and the d06
    // recursive min-label closure. The chain through `reach` is the
    // shared audioClusterOraclePrologue (m12 composes from it).
    "m11_audio_clusters" ->
      (s"WITH RECURSIVE $audioClusterOraclePrologue\n" +
      """SELECT id AS media_id, min(label) AS cluster_id,
        |       (id = min(label)) AS is_canonical
        |FROM reach GROUP BY id ORDER BY media_id""".stripMargin),
    // m12: the m11 prologue's cluster labels rolled to sizes, then d28's
    // bucket CASE chain and share column — the dedup datasheet figure
    // for the audio modality.
    "m12_audio_dup_histogram" ->
      (s"WITH RECURSIVE $audioClusterOraclePrologue,\n" +
      """cl AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
        |sz AS (SELECT cluster_id, count(*) AS n FROM cl GROUP BY 1),
        |bk AS (SELECT CASE WHEN n >= 128 THEN 128 WHEN n >= 64 THEN 64
        |                   WHEN n >= 32 THEN 32 WHEN n >= 16 THEN 16
        |                   WHEN n >= 8 THEN 8 WHEN n >= 4 THEN 4
        |                   WHEN n >= 2 THEN 2 ELSE 1 END AS bucket_lo, n
        |       FROM sz),
        |g AS (SELECT bucket_lo, CAST(count(*) AS BIGINT) AS n_clusters,
        |             CAST(sum(n) AS BIGINT) AS n_docs
        |      FROM bk GROUP BY bucket_lo),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM g)
        |SELECT g.bucket_lo, g.n_clusters, g.n_docs,
        |  CAST((1000 * g.n_docs) // t.total_docs AS BIGINT)
        |    AS doc_share_milli
        |FROM g, t ORDER BY g.bucket_lo""".stripMargin),
    // m08: m04's window CTEs verbatim, then the edge-trim plan: active
    // windows by the same integer milli-mean, first/last active bounds,
    // kept frames = samples inside the span; all-silent clips report
    // NULL bounds (the engine's None branch).
    "m08_silence_trim" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id,
        |         CAST(50 + length(text) % 200 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT media_id,
        |         unnest([i FOR i IN generate_series(0, n_frames - 1)]) AS i
        |  FROM a),
        |v AS (
        |  SELECT media_id, i, i // 100 AS window_idx,
        |         (media_id * 31 + i * 2654435761) % 65536 AS u
        |  FROM s),
        |x AS (SELECT media_id, window_idx,
        |             abs(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS ax
        |      FROM v),
        |w AS (SELECT media_id, window_idx, count(*) AS n_samples,
        |             (1000 * sum(ax)) // count(*) AS mean_abs_milli
        |      FROM x GROUP BY media_id, window_idx),
        |act AS (SELECT media_id, window_idx, n_samples,
        |          CASE WHEN mean_abs_milli >= 16400000 THEN 1 ELSE 0 END
        |            AS active
        |        FROM w),
        |agg AS (SELECT media_id,
        |          count(*) AS n_windows, sum(active) AS n_active,
        |          min(CASE WHEN active = 1 THEN window_idx END)
        |            AS first_active,
        |          max(CASE WHEN active = 1 THEN window_idx END)
        |            AS last_active
        |        FROM act GROUP BY media_id),
        |kept AS (SELECT act.media_id, sum(act.n_samples) AS kept_frames
        |         FROM act JOIN agg USING (media_id)
        |         WHERE act.window_idx
        |           BETWEEN agg.first_active AND agg.last_active
        |         GROUP BY act.media_id)
        |SELECT agg.media_id,
        |  CAST(agg.n_windows AS INT) AS n_windows,
        |  CAST(agg.n_active AS INT) AS n_active,
        |  CAST(agg.first_active AS INT) AS first_active,
        |  CAST(agg.last_active AS INT) AS last_active,
        |  CAST(agg.first_active * 100 AS BIGINT) AS start_frame,
        |  CAST(kept.kept_frames AS BIGINT) AS kept_frames
        |FROM agg LEFT JOIN kept USING (media_id)
        |ORDER BY agg.media_id""".stripMargin
  )
}
