package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Column-function library for the crawl-event domain — every scalar
  * transform from SURVEY.md §2.2, as pure `Column => Column` functions
  * built from codegen'd built-ins (no UDFs on the hot path).
  *
  * Reference line citations are on each function; quirks the reference left
  * accidental (two host notions, arrival-order semantics) are resolved here
  * and documented.
  */
object CrawlCols {

  /** P2/P3: host of a URL. Standardizes on `hostname` semantics (lowercase,
    * port stripped — reference report.py:154-155) and handles the `dns:`
    * scheme (reference streamer.py:93-102). `parse_url(_, "HOST")` already
    * excludes the port; we lowercase on top.
    */
  def hostOf(url: Column): Column =
    when(url.startsWith("dns:"), lower(regexp_replace(url, "^dns:", "")))
      .otherwise(lower(try_parse_url(url, lit("HOST"))))

  /** P2 (netloc form): the raw URL authority, case and port preserved —
    * the reference's Kafka-key input is `urlparse(uri).netloc` (reference
    * enqueue.py:127), NOT the lowercased hostname; empty string when the URL
    * has no `//` authority (mirrors urlparse).
    */
  def netlocOf(url: Column): Column =
    coalesce(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1), lit(""))

  /** P4: unwrap `screenshot:<orig>` → orig; null for non-screenshot URLs
    * (reference analysis.py:93-100). Empty originals stay empty — filter
    * with [[nonEmptyStr]] (F4).
    */
  def screenshotOrig(url: Column): Column =
    when(url.startsWith("screenshot:"), substring(url, 12, Int.MaxValue))

  /** F4 helper: non-null, non-empty string predicate. */
  def nonEmptyStr(c: Column): Column = c.isNotNull && length(c) > 0

  /** P8: hop-path normalize — empty/null → "_" — and last-hop extraction
    * (last char = hop type; reference streamer.py:52-53, streamer.py:75).
    */
  def normHopPath(hopPath: Column): Column =
    when(hopPath.isNull || hopPath === "", lit("_")).otherwise(hopPath)

  def lastHop(hopPath: Column): Column = substring(normHopPath(hopPath), -1, 1)

  /** P7: wayback timestamp — digits-only of the ISO timestamp → 17-digit ts
    * (reference streamer.py:47).
    */
  def waybackTs(isoTs: Column): Column = regexp_replace(isoTs, "[^0-9]", "")

  /** P9: hour truncation of an ISO timestamp string (reference
    * streamer.py:104-110 slices the string; we truncate the parsed time).
    */
  def hourOf(isoTs: Column): Column =
    // try_: under Spark 4's default ANSI mode a bare to_timestamp THROWS
    // on one malformed row and kills the job — the null-on-malformed
    // discipline splitStartTime already follows
    date_trunc("hour", try_to_timestamp(isoTs))

  /** P10: `start_time_plus_duration` "yyyyMMddHHmmssSSS+<ms>" →
    * struct(start_time timestamp, duration_ms long); duration null when the
    * `+` part is missing (reference report.py:202-209).
    */
  def splitStartTime(c: Column): Column = {
    val parts = split(c, "\\+")
    val t = try_element_at(parts, lit(1))
    // Java-time patterns can't parse 17 contiguous digits (greedy yyyy), so
    // parse the 14-digit second part and add the millis arithmetically.
    val base = try_to_timestamp(substring(t, 1, 14), lit("yyyyMMddHHmmss"))
    // try_cast throughout: ANSI CAST throws on non-digit millis or a
    // malformed duration part, voiding the try_to_timestamp design above
    // (null millis null the start_time — same value semantics as the
    // pre-ANSI cast, minus the task kill)
    val ms = when(length(t) >= 17, substring(t, 15, 3).try_cast(LongType))
      .otherwise(lit(0L))
    struct(
      timestamp_millis(unix_millis(base) + ms).as("start_time"),
      try_element_at(parts, lit(2)).try_cast(LongType).as("duration_ms"))
  }

  /** P12 (first half): tokenize the comma-separated `annotations` string →
    * trimmed, non-empty array (reference report.py:182-201; also fixes the
    * reference's char-wise iteration bug at streamer.py:81).
    */
  def annotationsArr(annotations: Column): Column =
    filter(transform(split(coalesce(annotations, lit("")), ","),
      a => trim(a)), a => a =!= "")

  /** P12 (routing): first annotation with the given prefix, prefix stripped;
    * null if absent (`ip:` → ip, `dol:` → dol, `launchTimestamp:` → ts).
    */
  def annotationWithPrefix(annotations: Column, prefix: String): Column = {
    val hits = filter(annotationsArr(annotations), a => a.startsWith(prefix))
    when(size(hits) > 0, substring(hits.getItem(0), prefix.length + 1, Int.MaxValue))
  }

  /** P13: annotation regex classes (reference streamer.py:59-62, 80-90):
    * retries `^\d+t$`, IPv4, `^dol:\d+`.
    */
  def retriesAnnotation(annotations: Column): Column = {
    val hits = filter(annotationsArr(annotations), a => a.rlike("^\\d+t$"))
    // try_cast: the regex admits >19-digit runs the ANSI cast would
    // throw on; null is the right answer for an unrepresentable count
    when(size(hits) > 0,
      regexp_replace(hits.getItem(0), "t$", "").try_cast(LongType))
  }

  /** P16: crawler derivation — explicit `crawler` wins, else Heritrix iff
    * `thread` present (reference report.py:214-219).
    */
  def crawlerOf(crawler: Column, thread: Column): Column =
    coalesce(crawler,
      when(thread.isNotNull, lit("Heritrix")).otherwise(lit("WebRender")))

  /** P14: document id synthesis `crawl-log:<ts>/<url>` (reference
    * report.py:177).
    */
  def docId(logTimestamp: Column, url: Column): Column =
    concat(lit("crawl-log:"), logTimestamp, lit("/"), url)

  /** P18: scheme defaulting — prepend `http://` when the URI has no scheme
    * (reference submit.py:42-44; scheme = RFC 3986 `ALPHA *(ALPHA/DIGIT/+/-/.)`
    * before a `:`).
    */
  def withScheme(uri: Column): Column =
    when(uri.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), uri)
      .otherwise(concat(lit("http://"), uri))

  /** P5: null → "-" display coalesce (reference report.py:52-55,
    * streamer.py:49-57; also fixes the `str(None)` → "None" leak at
    * report.py:129-132 — SURVEY.md §7.5).
    */
  def nullDash(c: Column): Column = coalesce(c.cast("string"), lit("-"))

  /** P6: fixed-width crawl-log line, field-for-field the reference's
    * rendering (report.py:57): ts, status (%6s), size (%10s), url, full
    * hop_path, via, mimetype, #thread, start_time_plus_duration,
    * content_digest, seed, annotations — nulls rendered as "-" (P5).
    * The reference leaves an empty (non-null) hop_path as-is, so no "_"
    * normalization here.
    */
  def logLine(ts: Column, status: Column, size: Column, url: Column,
      hopPath: Column, via: Column, mime: Column, thread: Column,
      startTime: Column, digest: Column, seed: Column,
      annotations: Column): Column =
    format_string("%s %6s %10s %s %s %s %s #%s %s %s %s %s",
      nullDash(ts), nullDash(status), nullDash(size), nullDash(url),
      nullDash(hopPath), nullDash(via), nullDash(mime), nullDash(thread),
      nullDash(startTime), nullDash(digest), nullDash(seed),
      nullDash(annotations))

  /** P19: Kafka partition key — LE-hex unsigned Murmur3-32(seed 0) of the
    * URL authority (reference enqueue.py:126-127), as a native codegen'd
    * expression.
    */
  def authorityKey(host: Column): Column =
    ColumnBridge.column(AuthorityKey(ColumnBridge.expression(host)))

  /** Register SQL-callable forms of the custom expressions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "authority_key", exprs => AuthorityKey(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f64", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_id", exprs => LangId(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sim", exprs => JaccardSim(exprs(0), exprs(1)), "scala_udf")
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_minhash", exprs => ShingleMinHash(exprs.head,
        intLit(exprs(1), "shingle_minhash n"), intLit(exprs(2), "shingle_minhash k")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head,
        intLit(exprs(1), "minhash_sig k")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs.head,
        intLit(exprs(1), "word_shingles n")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_stats", exprs => RepetitionStats(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps", exprs => WinnowFpsExpr(exprs.head,
        intLit(exprs(1), "winnow_fps k"), intLit(exprs(2), "winnow_fps w")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hashed_bow", exprs => HashedBowExpr(exprs.head,
        intLit(exprs(1), "hashed_bow dim")), "scala_udf")
  }
}
