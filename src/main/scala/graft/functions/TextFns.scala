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

  /** Hashed [[wordShingles]] (r18): xxhash64 of each distinct word
    * n-gram, `array<bigint>`. The Jaccard-verify family ships THIS
    * through its candidate-pair joins instead of the shingle strings —
    * 8 bytes/shingle on the wire and a primitive-long set kernel per
    * pair ([[SetMath.jaccardLong]]) instead of a UTF8String map. Set
    * SIZES and intersections equal the string form's whenever xxhash64
    * is injective on the document pair's shingles (collisions at the
    * 2⁻⁶⁴ ideal rate — the r17 window-slice-hash argument; the oracle
    * computes the same Jaccard from raw strings and stays green).
    * Consumers that need shingle VALUES (decontamination, boilerplate
    * df) keep [[wordShingles]].
    */
  def wordShingleHashes(text: Column, n: Int): Column =
    transform(wordShingles(text, n), s => xxhash64(s))

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

  /** Pushdown-safe cheap equivalent of `shingleMinhash(tokens(text), n, k)
    * .isNotNull` (and, at n = 1, of `simhash64Fast(tokens(text)).isNotNull`):
    * the signature is null iff the text has fewer than n whitespace tokens
    * ([[ShingleMinHashImpl.sig]] returns null for `numElements − n + 1 ≤ 0`,
    * null input → null). Filtering on the SIGNATURE column makes Catalyst
    * push the predicate below the projection with the whole minhash
    * substituted in — the full k-lane signature then evaluates TWICE per
    * row (Filter + Project; there is no cross-operator CSE), which the r17
    * d16 plan showed on all four corpus scans. This predicate filters the
    * exact same rows for the cost of one native char scan
    * (`token_stats.n_tokens` ≡ `size(tokens(text))`, differentially pinned
    * in NativeExprPropertySpec).
    */
  def hasMinTokens(text: Column, n: Int): Column =
    tokenStats(text).getField("n_tokens") >= n

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

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): hash every token k-gram, slide a window of `w` consecutive
    * gram hashes, and in each window select the RIGHTMOST minimal hash; the
    * distinct selected `(pos, fp)` pairs are the document's fingerprint
    * set. Unlike [[rollingFingerprint]] (one hash per doc — exact identity)
    * this yields a position-anchored SUB-document sketch with the winnowing
    * guarantee: any token run of length ≥ w + k − 1 shared by two documents
    * produces at least one shared fingerprint, so a fingerprint-key join
    * finds every long-enough copy. Density is ~2/(w+1) of the gram count.
    *
    * The gram hash is the repo's cross-engine md5 recipe (hex chars 1–6 →
    * [0, 2²⁴), [[graft.operators.PipelineQueries.draw24]] over gram text)
    * so a DuckDB oracle recomputes the selection exactly. Per-row array
    * algebra only — no explode before selection, no shuffle; at 100 TB the
    * O(grams × w) fold runs where the row lives and only the selected
    * ~2m/(w+1) fingerprints ever become rows. Fewer grams than w (but ≥ 1)
    * → one window over all grams; fewer than k tokens → empty set.
    *
    * Returns `array<struct<pos:int, fp:bigint>>` (pos is the 1-based gram
    * position; at most one fp per pos, so (doc, pos) is a total key).
    *
    * PERFORMANCE: this composed form inlines the gram-hash array into the
    * selection lambda — fine for tests/short texts, O(m²·w) md5s per doc
    * on real corpora. Query paths stage [[gramHashes]] as its own
    * projection and apply [[winnowSelect]] to the staged column (see
    * [[graft.operators.DedupOps.winnowFps]]).
    */
  def winnowing(text: Column, k: Int, w: Int): Column =
    winnowSelect(gramHashes(text, k), w)

  /** [[winnowing]] as the single fused native expression
    * ([[WinnowFpsExpr]]) — what every query/stream path uses; the
    * composed form above is the executable spec it is property-pinned
    * against (WinnowFpsParitySpec). One byte loop per row, no staged
    * intermediate arrays, codegen-friendly, never null (empty array for
    * null/token-less text).
    */
  def winnowingFast(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WinnowFpsExpr(ColumnBridge.expression(text), k, w))
  }

  /** Hashing-trick signed bag-of-words vector (`array<long>` of length
    * dim) — the native [[HashedBowExpr]]; see [[HashedBowImpl]] for the
    * draw/sign contract and [[hashedBowComposed]] for the executable
    * built-ins spec it is property-pinned against. Never null (zero
    * vector for null/token-less text).
    */
  def hashedBow(text: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HashedBowExpr(ColumnBridge.expression(text), dim))
  }

  /** The composed built-ins reference for [[hashedBow]]: per bucket, the
    * signed count of tokens drawing it — O(dim × tokens) lambda folds,
    * tests only.
    */
  def hashedBowComposed(text: Column, dim: Int): Column = {
    val toks = tokens(text)
    transform(sequence(lit(0), lit(dim - 1)), b =>
      coalesce(aggregate(toks, lit(0L), (acc, t) => {
        val draw = conv(substring(md5(t.cast("binary")), 1, 6), 16, 10)
          .cast("long")
        val sign = when(conv(substring(md5(t.cast("binary")), 7, 1), 16, 10)
          .cast("long") < 8, lit(1L)).otherwise(lit(-1L))
        acc + when(pmod(draw, lit(dim.toLong)) === b.cast("long"), sign)
          .otherwise(lit(0L))
      }), lit(0L)))
  }

  /** The gram-hash half of [[winnowing]]: one md5-draw hash per token
    * k-gram, `array<bigint>` of length `tokens − k + 1` (empty below k
    * tokens). MUST be staged as its OWN projection (`.select(...as "hs")`
    * then consume `col("hs")` in the next select) before [[winnowSelect]]
    * in any query path: inlined into the selection lambda, every
    * `element_at` re-evaluates the whole O(m) md5 array — O(m²·w) md5s
    * per doc instead of O(m). The two-projection form is safe because
    * CollapseProject never inlines a non-cheap alias referenced more than
    * once. [[winnowing]] is the inlined composition — tests and one-off
    * short texts only.
    */
  def gramHashes(text: Column, k: Int): Column = {
    require(k >= 1, s"k=$k")
    val toks = tokens(text)
    val m = size(toks) - (k - 1) // gram count
    val hs = transform(sequence(lit(1), m), i =>
      conv(substring(md5(concat_ws(" ", slice(toks, i, lit(k)))
        .cast("binary")), 1, 6), 16, 10).cast("long"))
    when(m >= 1, hs).otherwise(array().cast("array<bigint>"))
  }

  /** The window-selection half of [[winnowing]] over a staged
    * [[gramHashes]] column: O(m·w) `element_at` probes of an attribute-
    * bound array — the fold runs where the row lives, zero shuffle.
    */
  def winnowSelect(hs: Column, w: Int): Column = {
    require(w >= 1, s"w=$w")
    val m = size(hs)
    val sel = transform(sequence(lit(1), greatest(lit(1), m - (w - 1))), j =>
      aggregate(sequence(j, least(j + (w - 1), m)),
        struct(lit(0).as("pos"), lit(Long.MaxValue).as("fp")),
        (acc, p) => {
          val h = element_at(hs, p)
          // <= keeps the RIGHTMOST minimum (robust winnowing's tie rule)
          when(h <= acc.getField("fp"),
            struct(p.as("pos"), h.as("fp"))).otherwise(acc)
        }))
    when(m >= 1, array_distinct(sel))
      .otherwise(array().cast("array<struct<pos:int,fp:bigint>>"))
  }

  /** Fixed-size token-window chunking with stride (the context-prep /
    * RAG-embedding cut): chunk j covers tokens [j·stride + 1,
    * min(j·stride + size, n)], chunks are emitted while they add unseen
    * tokens — i.e. `1 + ceil((n − size)/stride)` chunks for n > size, one
    * chunk for 1 ≤ n ≤ size, none for empty/null text. Consecutive chunks
    * overlap by `size − stride` tokens. Complements [[graft.operators
    * .PipelineQueries]]'s t13 sequence packing (many short docs → one
    * window); chunking is the other direction (one long doc → many
    * windows). Pure per-row array algebra — zero shuffle at any scale; the
    * output is a transform of the corpus, ~size/stride × its token mass.
    *
    * Returns `array<struct<chunk_id:int, start_pos:int, n_tokens:int,
    * chunk_text:string>>`, chunk_id 0-based.
    */
  def chunkWindows(text: Column, chunk: Int, stride: Int): Column =
    chunkWindowsOver(tokens(text), chunk, stride)

  /** [[chunkWindows]] over a pre-staged token-array column. Query paths
    * stage `tokens(text)` as its OWN projection and pass the attribute:
    * inlined, the lambda's `slice(toks, …)` re-splits the text per chunk
    * — O(n²/stride) per doc instead of O(n·chunks/stride) slice work.
    * (CollapseProject keeps the staging: non-cheap alias, multi-ref.)
    */
  def chunkWindowsOver(toks: Column, chunk: Int, stride: Int): Column = {
    require(chunk >= 1 && stride >= 1 && stride <= chunk,
      s"chunk=$chunk stride=$stride")
    val n = size(toks)
    // 1 + ceil((n-chunk)/stride) via floor((n - chunk + stride - 1)/stride);
    // values are token counts (≪ 2^31), exact in double
    val nc = when(n >= 1,
      when(n <= chunk, lit(1)).otherwise(
        lit(1) + floor((n - lit(chunk - stride + 1)) / lit(stride)).cast("int")))
      .otherwise(lit(0))
    val chunks = transform(sequence(lit(0), nc - 1), j => {
      val len = least(lit(chunk), n - j * stride)
      struct(j.as("chunk_id"),
        (j * stride + 1).as("start_pos"),
        len.as("n_tokens"),
        concat_ws(" ", slice(toks, j * stride + 1, len)).as("chunk_text"))
    })
    when(nc >= 1, chunks).otherwise(array().cast(
      "array<struct<chunk_id:int,start_pos:int,n_tokens:int,chunk_text:string>>"))
  }

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
