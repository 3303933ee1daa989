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

  /** [[jaccardStr]] for `array<bigint>` sides (r18): the hashed-shingle
    * representation ships 8-byte longs through the candidate-pair joins
    * instead of shingle strings and counts set membership in ONE
    * open-addressing primitive-long table — no boxing, no UTF8String
    * hashing per probe. Distinct/null semantics identical to
    * [[jaccardStr]] (a null element is one distinct value on its side
    * and intersects when present on both). Counts — and therefore the
    * returned double — equal the string form's on the same shingle sets
    * whenever the element hash is injective on them (xxhash64 at the
    * 2⁻⁶⁴ ideal collision rate; the same argument as the r17
    * window-slice hash).
    */
  def jaccardLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // power-of-two capacity ≥ 2·(na+nb) keeps load factor ≤ 0.5
    var cap = 8
    while (cap < (na + nb) * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val flags = new Array[Byte](cap) // 0 empty, 1 seen-in-a, 2 seen-in-b
    val mask = cap - 1
    // Stafford mix13 finalizer — avalanches xxhash64 values whose low
    // bits alone would cluster linear probes
    def slot(k: Long): Int = {
      var h = k ^ (k >>> 31)
      h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27
      var i = (h & mask).toInt
      while (flags(i) != 0 && keys(i) != k) i = (i + 1) & mask
      i
    }
    var aHasNull = false
    var da = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else {
        val k = a.getLong(i)
        val s = slot(k)
        if (flags(s) == 0) { keys(s) = k; flags(s) = 1; da += 1 }
      }
      i += 1
    }
    if (aHasNull) da += 1
    var bHasNull = false
    var db = 0
    var inter = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val k = b.getLong(i)
        val s = slot(k)
        if (flags(s) == 0) { keys(s) = k; flags(s) = 2; db += 1 }
        else if (flags(s) == 1) { flags(s) = 2; db += 1; inter += 1 }
        // flags(s) == 2: duplicate b element, already counted
      }
      i += 1
    }
    if (aHasNull && bHasNull) inter += 1
    if (bHasNull) db += 1
    val union = da + db - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** `jaccard_sim(array<string>, array<string>) → double` (and, r18, the
  * `array<bigint>` pair form over hashed shingles) as a native codegen'd
  * Catalyst expression: the composed
  * `size(array_intersect)/size(array_union)` form builds BOTH result arrays
  * (allocation + copy per pair) just to take their sizes; this computes the
  * two counts directly. It sits on the verification inner loop of every
  * candidate-pair dedup operator (n-gram Jaccard, LSH verification, the
  * near-dup cluster edge pass), where all-pairs-within-block makes it the
  * dominant cost. Long sides dispatch to [[SetMath.jaccardLong]] — the
  * primitive-set kernel the hashed-shingle representation exists for.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaccard_sim"

  /** True when both sides are long arrays (incl. one-sided null/empty
    * edge types, which carry no elements and work under either kernel);
    * element kinds must agree — a string-vs-long pair is a type error. */
  private def longSides: Boolean = Seq(left.dataType, right.dataType).exists {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def kind(t: DataType): Option[String] = t match {
      case ArrayType(StringType, _) => Some("str")
      case ArrayType(org.apache.spark.sql.types.LongType, _) => Some("long")
      case ArrayType(NullType, _) | NullType => None // elementless: either
      case _ => Some("bad")
    }
    val kinds = Seq(kind(left.dataType), kind(right.dataType)).flatten.distinct
    if (kinds.forall(k => k == "str" || k == "long") && kinds.size <= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> or two array<bigint> " +
        s"arguments, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (longSides)
      SetMath.jaccardLong(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      SetMath.jaccardStr(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (longSides) "jaccardLong" else "jaccardStr"
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.SetMath.$kernel($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSim = copy(left = newLeft, right = newRight)
}
