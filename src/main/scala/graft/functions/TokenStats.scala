package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics matching the composed built-ins exactly:
  *
  *   n_tokens   = size(when(length(trim(t)) = 0, array()).otherwise(
  *                  split(trim(t), "\\s+")))
  *   n_distinct = size(array_distinct(same tokens))
  *   n_subwords = size(filter(split(t, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
  *                  p -> length(trim(p)) > 0))
  *
  * Quirks preserved (pinned by the scalacheck differential in
  * NativeExprPropertySpec):
  *
  *  - `trim` strips ONLY ASCII space 0x20 (UTF8String.trim), so a string
  *    trimmed of spaces can still begin/end with \t \n \x0B \f \r;
  *  - Java `split("\\s+", -1)` then yields a leading "" element when the
  *    trimmed text starts with such whitespace, and a trailing "" when it
  *    ends with one (limit −1 keeps trailing empties) — both count as
  *    tokens, and "" participates in the distinct set;
  *  - `\s` is the ASCII class [ \t\n\x0B\f\r], NOT Unicode whitespace;
  *  - the subword lookaround split produces maximal [a-zA-Z0-9] runs plus
  *    one piece per non-alnum CODE UNIT — the regex engine's lookaround
  *    split positions fall between the halves of a surrogate pair, so an
  *    astral char becomes TWO pieces — and the filter keeps any piece
  *    whose space-trim is non-empty, so tabs/newlines/punctuation (and
  *    lone surrogates) count while spaces don't.
  *
  * Replaces two regex split machines + an array_distinct allocation per row
  * with a single char scan (the t01 profile: regex-split dominated).
  */
object TokenStatsImpl {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def eval(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    // trim 0x20 only, like the trim() builtin / UTF8String.trim
    var b = 0
    var e = len
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1

    // ---- whitespace tokens over the trimmed span -------------------------
    var nTokens = 0
    var nDistinct = 0
    if (e > b) { // empty trimmed text → guard branch → zero tokens
      val distinct = new java.util.HashSet[String]()
      if (isWs(s.charAt(b))) { // leading separator → leading "" element
        nTokens += 1
        distinct.add("")
      }
      var runStart = -1
      var endsWithWs = false
      var i = b
      while (i < e) {
        val c = s.charAt(i)
        if (isWs(c)) {
          if (runStart >= 0) {
            nTokens += 1
            distinct.add(s.substring(runStart, i))
            runStart = -1
          }
          endsWithWs = true
        } else {
          if (runStart < 0) runStart = i
          endsWithWs = false
        }
        i += 1
      }
      if (runStart >= 0) {
        nTokens += 1
        distinct.add(s.substring(runStart, e))
      }
      if (endsWithWs) { // trailing separator → trailing "" kept by limit −1
        nTokens += 1
        distinct.add("")
      }
      nDistinct = distinct.size
    }

    // ---- subword pieces over the FULL string -----------------------------
    // Char-based on purpose: the lookaround split positions fall BETWEEN
    // the halves of a surrogate pair (verified against the regex engine),
    // so an astral char yields TWO one-surrogate pieces, each kept by the
    // filter. Iterating code points here would undercount by one per
    // astral char.
    var nSub = 0
    var inAlnum = false
    var j = 0
    while (j < len) {
      val c = s.charAt(j)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
      if (alnum) {
        if (!inAlnum) { nSub += 1; inAlnum = true }
      } else {
        inAlnum = false
        if (c != ' ') nSub += 1
      }
      j += 1
    }

    InternalRow(nTokens, nDistinct, nSub)
  }
}

/** `token_stats(string) → struct<n_tokens:int, n_distinct:int,
  * n_subwords:int>` as a native codegen'd expression; null text → null
  * struct, matching the composed forms' null propagation (ANSI `size(NULL)`
  * is NULL).
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStatsImpl.schema
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    TokenStatsImpl.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsImpl.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}
