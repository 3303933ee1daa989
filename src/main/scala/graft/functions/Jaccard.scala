package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set math for the native Jaccard expression. */
object SetMath {

  /** Jaccard similarity of two string arrays as distinct sets, matching the
    * composed `size(array_intersect)/size(array_union)` form bit-for-bit:
    * distinct semantics, a null ELEMENT counts as one distinct value (and
    * intersects when present on both sides, like Spark's array set ops),
    * 0.0 when the union is empty. One hash-set pass per side, no
    * intermediate arrays.
    */
  def jaccardStr(a: ArrayData, b: ArrayData): Double = {
    // ONE presized map instead of two grow-as-you-go HashSets (r17: this
    // sits on the 157k-pair d16 verify loop — two unsized sets per pair
    // were ~60% of the query's execution): a-side elements insert with
    // flag A; the b pass counts a new distinct b on first sight and an
    // intersection hit when the first sight finds flag A. Counts (da,
    // db, inter) — and therefore the returned double — are identical.
    val na = a.numElements()
    val nb = b.numElements()
    val m = new java.util.HashMap[UTF8String, java.lang.Byte](
      math.max(8, ((na + nb) * 4) / 3))
    val A: java.lang.Byte = 1.toByte // seen in a only
    val B: java.lang.Byte = 2.toByte // seen in b (and counted)
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else m.put(a.getUTF8String(i), A)
      i += 1
    }
    val da = m.size + (if (aHasNull) 1 else 0)
    var bHasNull = false
    var db = 0
    var inter = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val prev = m.put(b.getUTF8String(i), B)
        if (prev == null) db += 1 // new distinct, b-only
        else if (prev eq A) { db += 1; inter += 1 } // first b sight of an a elem
        // prev == B: duplicate b element, already counted
      }
      i += 1
    }
    if (aHasNull && bHasNull) inter += 1
    if (bHasNull) db += 1
    val union = da + db - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** `jaccard_sim(array<string>, array<string>) → double` as a native
  * codegen'd Catalyst expression: the composed
  * `size(array_intersect)/size(array_union)` form builds BOTH result arrays
  * (allocation + copy per pair) just to take their sizes; this computes the
  * two counts directly. It sits on the verification inner loop of every
  * candidate-pair dedup operator (n-gram Jaccard, LSH verification, the
  * near-dup cluster edge pass), where all-pairs-within-block makes it the
  * dominant cost.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) | ArrayType(NullType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SetMath.jaccardStr(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.SetMath.jaccardStr($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSim = copy(left = newLeft, right = newRight)
}
