package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word shingling, value-identical to the composed
  * `array_distinct ∘ transform ∘ sequence ∘ concat_ws ∘ slice` chain in
  * [[TextFns.wordShinglesFromTokensComposed]]:
  *
  *  - fewer than n tokens → EMPTY array (the composed `when` branch);
  *  - each n-token window joined with a single space, null tokens skipped
  *    (`concat_ws` semantics);
  *  - distinct with first-occurrence order preserved (`array_distinct`).
  *
  * The composed chain walks the token array through four higher-order
  * lambda interpreters and materializes two intermediate arrays per row —
  * it benchmarked as the dominant cost of d07 (3.6 s of a 3.7 s query at
  * sf0.1); this is one tight loop with a LinkedHashSet.
  */
object WordShinglesImpl {
  private val space = UTF8String.fromString(" ")

  def shingles(toks: ArrayData, n: Int): GenericArrayData = {
    val total = toks.numElements()
    val cnt = total - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var m = 0
      var j = 0
      while (j < n) { // concat_ws skips null elements
        if (!toks.isNullAt(i + j)) { parts(m) = toks.getUTF8String(i + j); m += 1 }
        j += 1
      }
      seen.add(UTF8String.concatWs(space, java.util.Arrays.copyOf(parts, m): _*))
      i += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }
}

/** `word_shingles(array<string> tokens, n) → array<string>` (distinct,
  * first-occurrence order). Null input → null, matching the composed
  * chain's null propagation.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType | ArrayType(NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** One-pass repetition counters feeding [[TextFns.repetitionSignals]]:
  * token count, distinct-token count, most-frequent-token count, and
  * distinct-2-gram count (2-grams joined with a single space, exactly the
  * composed `wordShinglesFromTokens(toks, 2)` string semantics — tokens
  * are whitespace-split so the joined form is collision-free).
  *
  * Replaces the composed formulation's array_sort + struct-accumulator
  * fold + shingle chain (three interpreted higher-order walks per row;
  * 7.0 s of the 7.0 s t08 query at sf0.1) with one hash-counting loop.
  * The most-frequent count equals the composed form's max run length in
  * the sorted array.
  */
object RepetitionStatsImpl {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_distinct_2grams", LongType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  private def join2(a: UTF8String, b: UTF8String): UTF8String =
    if (a == null) { if (b == null) UTF8String.EMPTY_UTF8 else b }
    else if (b == null) a
    else UTF8String.concatWs(space, a, b)

  def stats(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val grams = new java.util.HashSet[UTF8String]()
    var top = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val c = counts.merge(t, 1, (a: Integer, b: Integer) => a + b)
      if (c > top) top = c
      if (i > 0) grams.add(join2(prev, t))
      prev = t
      i += 1
    }
    InternalRow(n.toLong, counts.size.toLong, top.toLong, grams.size.toLong)
  }
}

/** `repetition_stats(array<string>) → struct<n_tokens, n_distinct,
  * top_count, n_distinct_2grams>` (all long). Null input → null struct.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsImpl.schema
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType | ArrayType(NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    RepetitionStatsImpl.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStatsImpl.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
