package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Tight-loop SimHash implementation shared by interpreted eval and codegen.
  * Token hashes use XXH64 with seed 42 — the same function and seed as
  * Spark's built-in `xxhash64()` — so the result is bit-identical to the
  * composed-built-ins formulation in [[TextFns.simhash64]].
  */
object SimHash64Impl {
  def hash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      // A null token hashes to the seed itself (42) — exactly what the
      // composed form's xxhash64(NULL) yields, so the two paths stay
      // bit-identical on null-element input (and no NPE here).
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val h = if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(array<string>) → long` as a native Catalyst expression: one
  * pass over the token array per row, 64 bit-votes in a local array —
  * replaces a 64-wide unrolled expression tree (~10× less interpreter
  * overhead, and the codegen path is a single static call that stays inside
  * whole-stage codegen). Null for null/empty input, matching the composed
  * form.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType |
         ArrayType(org.apache.spark.sql.types.NullType, _) => // empty array literal
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else SimHash64Impl.hash(arr)
  }

  // nullSafeEval returning null needs eval-side handling too
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null else SimHash64Impl.hash(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimHash64Impl.hash($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
