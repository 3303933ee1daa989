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
    val sa = new java.util.HashSet[UTF8String]()
    var aHasNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true else sa.add(a.getUTF8String(i))
      i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    var bHasNull = false
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else sb.add(b.getUTF8String(i))
      i += 1
    }
    var inter = if (aHasNull && bHasNull) 1 else 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val da = sa.size + (if (aHasNull) 1 else 0)
    val db = sb.size + (if (bHasNull) 1 else 0)
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
