package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for the training-data pipeline (builder
  * brief): tokenization, shingling, quality scoring, language-ID heuristic,
  * MinHash signatures, SimHash, rolling-hash fingerprints.
  *
  * Everything is per-row column algebra over arrays (no explode, no UDF, no
  * shuffle): at 100 TB each document's signature/score is computed where the
  * row lives, and only the tiny signatures move in later joins.
  */
object TextFns {

  /** Whitespace tokenization; empty text → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace words). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword-regex token count: word pieces, numbers, punctuation
    * runs counted separately (approximates tokenizer cost for budgeting).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      t => length(trim(t)) > 0))

  /** Fused `struct(n_tokens, n_distinct, n_subwords)` in one native char
    * scan ([[TokenStats]]) — value-identical to `tokenCount` /
    * `size(array_distinct(tokens))` / `subwordCount` above (the composed
    * forms are its differential oracle in NativeExprPropertySpec).
    */
  def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TokenStats(ColumnBridge.expression(text)))
  }

  /** Character n-gram shingles (distinct) — the MinHash/Jaccard input. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** Word n-gram shingles (distinct), joined with a single space. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** [[wordShingles]] over a pre-tokenized array — native one-pass
    * expression ([[WordShingles]]); the composed chain below is the
    * value-identical differential reference (four interpreted lambda
    * walks per row — it was the dominant cost of d07 at bench scale).
    */
  def wordShinglesFromTokens(ts: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WordShingles(ColumnBridge.expression(ts), n))
  }

  /** [[wordShinglesFromTokens]] out of built-ins only (differential). */
  def wordShinglesFromTokensComposed(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n))))))

  /** Fused tokenize-window-shingle-minhash ([[ShingleMinHash]]): signatures
    * bit-identical to `minhashSignatureFast(wordShinglesFromTokens(ts, n), k)`
    * (MinHash is duplicate-invariant, so skipping array_distinct changes
    * nothing) without materializing any shingle string or intermediate
    * array — the production form for signature computation over documents.
    */
  def shingleMinhash(ts: Column, n: Int, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleMinHash(ColumnBridge.expression(ts), n, k))
  }

  /** Exact n-gram-token Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(JaccardSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** [[jaccard]] via built-in set functions only (differential reference for
    * the native expression; materializes both the intersection and union
    * arrays per pair just to measure them).
    */
  def jaccardComposed(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  // ---------------------------------------------------------------- quality

  /** Quality-score feature struct (length/alpha/digit/space ratios, mean
    * token length) + a binary keep flag with conventional thresholds.
    * All ratios are exact double divisions of integer counts —
    * deterministic across engines for oracle comparison.
    */
  def qualityFeatures(text: Column): Column = {
    val len = length(text).cast("double")
    val nAlpha = (len - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double")
    val nDigit = (len - length(regexp_replace(text, "[0-9]", ""))).cast("double")
    val nSpace = (len - length(regexp_replace(text, " ", ""))).cast("double")
    val nTok = tokenCount(text).cast("double")
    val safeLen = when(len === 0, lit(1.0)).otherwise(len)
    struct(
      len.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(nAlpha / safeLen, 6).as("alpha_ratio"),
      round(nDigit / safeLen, 6).as("digit_ratio"),
      round(nSpace / safeLen, 6).as("space_ratio"),
      round((len - nSpace) / greatest(nTok, lit(1.0)), 6).as("mean_token_len"),
      (len >= 20 && len <= 100000 && nAlpha / safeLen > 0.5).as("keep"))
  }

  /** Gopher-style intra-document repetition signals as one struct:
    * duplicate-token fraction, most-frequent-token fraction,
    * duplicate-2-gram fraction. Per-row array algebra only — no explode,
    * no shuffle; the counters come from one native hash-counting pass
    * ([[RepetitionStats]] — the composed sort-fold formulation below is
    * the differential reference) and the ratios are exact integer-count
    * divisions rounded at 6 for cross-engine comparison.
    */
  def repetitionSignals(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val s = ColumnBridge.column(
      RepetitionStats(ColumnBridge.expression(tokens(text))))
    val n = s.getField("n_tokens").cast("double")
    // empty token array → null struct (ANSI double division by zero
    // throws, and "repetition of nothing" has no meaningful value)
    when(n > 0, struct(
      round(lit(1.0) - s.getField("n_distinct") / n, 6).as("dup_token_frac"),
      round(s.getField("top_count") / n, 6).as("top_token_frac"),
      when(n > 1,
        round(lit(1.0) - s.getField("n_distinct_2grams") / (n - 1.0), 6))
        .otherwise(0.0).as("dup_2gram_frac")))
  }

  /** [[repetitionSignals]] out of built-ins only (differential reference):
    * the top-token count is the max run length in the SORTED token array
    * (a struct-accumulator fold), 2-grams via the composed shingle chain.
    */
  def repetitionSignalsComposed(text: Column): Column = {
    val toks = tokens(text)
    val topRun = aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val n = size(toks).cast("double")
    val distinct2 = size(wordShinglesFromTokensComposed(toks, 2)).cast("double")
    when(n > 0, struct( // empty → null struct, matching the native form
      round(lit(1.0) - size(array_distinct(toks)) / n, 6).as("dup_token_frac"),
      round(topRun / n, 6).as("top_token_frac"),
      when(n > 1, round(lit(1.0) - distinct2 / (n - 1.0), 6)).otherwise(0.0)
        .as("dup_2gram_frac")))
  }

  // ---------------------------------------------------------------- lang id

  /** Stopword marker sets for the n-gram language-ID heuristic. Scores are
    * counts of language-specific function words; argmax wins, "und"
    * (undetermined) when nothing matches.
    */
  private val langMarkers: Seq[(String, Seq[String])] =
    LangIdImpl.langMarkers.toSeq.map { case (l, ms) => (l, ms.toSeq) }

  /** Heuristic language ID: per-language stopword hit count (ASCII
    * word-boundary matches), argmax with max-lang tie-break, "und" when no
    * marker hits. Native single-pass expression ([[LangId]]); the composed
    * regex form below is the semantics-defining differential reference.
    */
  def langId(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LangId(ColumnBridge.expression(text)))
  }

  /** [[langId]] out of regexp_count built-ins only — one regex scan per
    * language, `array_max` argmax over (score, lang) structs. ~100× more
    * per-row cost than the native form; kept as its differential oracle.
    */
  def langIdComposed(text: Column): Column = {
    val lowered = lower(text)
    val scores = langMarkers.map { case (lang, markers) =>
      val hits = regexp_count(lowered,
        lit("\\b(" + markers.mkString("|") + ")\\b"))
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*)) // max by (score, lang)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // ------------------------------------------------------------- fingerprint

  /** Rolling polynomial document fingerprint over tokens:
    * h_i = (h_{i-1}·B + token_hash) mod p — order-sensitive,
    * whitespace-normalization-invariant. A cheap content identity for
    * near-exact dedup where `content_digest` is absent. p = 2^31 − 1 keeps
    * every product in Long range (ANSI mode rejects wraparound multiply).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(2166136261L % MinhashPrime),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(MinhashPrime)),
        lit(MinhashPrime)))

  // ----------------------------------------------------------------- minhash

  /** Deterministic MinHash parameter set (k permutations) — public
    * (a·x + b) mod p universal-hash family with p = 2^31 − 1 so every
    * intermediate product fits a Long with no overflow (a,x < 2^31 ⇒
    * a·x < 2^62).
    */
  private[graft] val MinhashPrime = 2147483647L // 2^31 - 1

  private[graft] def minhashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eed)
    (0 until k).map { _ =>
      ((rnd.nextLong() & Long.MaxValue) % (MinhashPrime - 1) + 1,
        (rnd.nextLong() & Long.MaxValue) % MinhashPrime)
    }
  }

  /** MinHash signature (array<long>, length k) over a shingle array.
    * Per-row only — no shuffle; signatures are what downstream LSH joins
    * move around. Empty shingle set → null signature.
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hashed = transform(shingles, s => pmod(xxhash64(s), lit(MinhashPrime)))
    val sig = array(minhashParams(k).map { case (a, b) =>
      array_min(transform(hashed,
        h => pmod(h * lit(a) + lit(b), lit(MinhashPrime))))
    }: _*)
    when(size(shingles) > 0, sig)
  }

  /** [[minhashSignature]] as a native single-pass Catalyst expression
    * (same signatures bit-for-bit, one array walk instead of k+1) — the
    * production form; the composed version above is the differential
    * reference.
    */
  def minhashSignatureFast(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
  }

  /** LSH band keys: split the signature into `bands` bands of rows and hash
    * each band → array<long> of length `bands`. Candidate pairs = rows
    * sharing any (band_index, band_key) bucket.
    */
  def lshBandKeys(signature: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rows = k / bands
    array((0 until bands).map { b =>
      xxhash64(concat_ws("_", lit(b),
        concat_ws(",", slice(signature, b * rows + 1, rows))))
    }: _*)
  }

  // ----------------------------------------------------------------- simhash

  /** 64-bit SimHash over a token array, built-ins only: per-token xxhash64,
    * ±1 bit votes accumulated across tokens, sign → bit. Null for empty
    * input. Shift amounts must be static in the Scala API, so the 64 bit
    * positions are unrolled at plan-build time.
    */
  def simhash64(toks: Column): Column = {
    val zeros = array((0 until 64).map(_ => lit(0)): _*)
    val votes = aggregate(
      toks,
      zeros,
      (acc, t) => {
        val h = xxhash64(t)
        val tv = array((0 until 64).map(b =>
          when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)): _*)
        zip_with(acc, tv, (a, v) => a + v)
      })
    val packed = (0 until 64).map(b =>
      when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    when(size(toks) > 0, packed)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** [[simhash64]] as a native single-pass Catalyst expression (same bits,
    * ~10× faster) — the production form; the composed version above is the
    * differential reference.
    */
  def simhash64Fast(toks: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
  }
}
