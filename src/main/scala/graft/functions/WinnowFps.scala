package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing fingerprint selection matching the composed
  * [[TextFns.gramHashes]] → [[TextFns.winnowSelect]] chain bit for bit
  * (WinnowFpsParitySpec pins the equivalence property):
  *
  *  - tokens = `split(trim(text), "\\s+")` semantics: SQL trim strips
  *    0x20 spaces only, Java-regex `\s+` splits runs of ASCII whitespace;
  *    empty/whitespace-only/null text → NO tokens → empty result;
  *  - gram hash = first 24 bits of md5 over the UTF-8 bytes of the k
  *    tokens joined by one space (hex chars 1–6 of the md5, the repo's
  *    cross-engine draw — `conv(substring(md5(...), 1, 6), 16, 10)`);
  *  - per window of w consecutive gram hashes, the RIGHTMOST minimal
  *    hash is selected (the `<=` fold tie rule); consecutive windows
  *    selecting the same position collapse (selections are strictly
  *    position-increasing, which is also why consecutive-dedup equals
  *    global `array_distinct` here).
  *
  * One fused byte loop per row replaces the higher-order-function chain
  * (two interpreted lambda folds + per-element Invoke overhead — measured
  * ~10× per-row on the documents profile), and makes the fingerprint pass
  * a plain codegen'd projection at 100 TB.
  */
object WinnowFpsImpl {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Never-null result; empty array for null/token-less input. */
  def fps(text: UTF8String, k: Int, w: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    // SQL trim = 0x20 only (UTF8String.trim), then Java-regex \s+ split
    // with limit -1: Spark's split KEEPS trailing empty strings, so a
    // tab-only string yields ["", ""] — two empty tokens — exactly like
    // the composed chain (concat_ws keeps empty strings, skips only null)
    val trimmed = text.trim()
    if (trimmed.numBytes() == 0) return new GenericArrayData(Array.empty[Any])
    val toks = trimmed.toString.split("\\s+", -1)
    val m = toks.length - (k - 1)
    if (m < 1) return new GenericArrayData(Array.empty[Any])

    val tokBytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      tokBytes(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    val md = md5Local.get()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(tokBytes(i + j))
        j += 1
      }
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
      i += 1
    }

    // rolling rightmost-min (<= keeps the rightmost tie); selections are
    // position-nondecreasing across windows, so consecutive dedup is
    // exactly the composed form's array_distinct
    val out = new java.util.ArrayList[Any](2 * m / (w + 1) + 2)
    var lastPos = 0
    val nWin = math.max(1, m - (w - 1))
    var jw = 1
    while (jw <= nWin) {
      var pos = 0
      var fp = Long.MaxValue
      var p = jw
      val end = math.min(jw + (w - 1), m)
      while (p <= end) {
        if (hs(p - 1) <= fp) { pos = p; fp = hs(p - 1) }
        p += 1
      }
      if (pos != lastPos) {
        out.add(new GenericInternalRow(Array[Any](pos, fp)))
        lastPos = pos
      }
      jw += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_fps(string) → array<struct<pos:int, fp:bigint>>` as a native
  * Catalyst expression with k/w fixed at plan time — see [[WinnowFpsImpl]]
  * for the exact equivalence contract with the composed chain. Never
  * null: null/empty text yields an EMPTY array, matching the composed
  * form's `when(m >= 1, …).otherwise(array())` fall-through.
  */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k=$k w=$w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override def eval(input: InternalRow): Any =
    WinnowFpsImpl.fps(child.eval(input).asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.WinnowFpsImpl.fps(
            ${childGen.isNull} ? null : ${childGen.value}, $k, $w);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}
