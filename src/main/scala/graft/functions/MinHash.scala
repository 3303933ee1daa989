package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass MinHash signatures, bit-identical to the composed
  * [[TextFns.minhashSignature]] formulation it replaces:
  *
  *  - per shingle: `h = pmod(xxhash64(s), p)` with p = 2^31 − 1 and
  *    xxhash64's seed 42 (a NULL shingle hashes to the seed itself, like
  *    the built-in);
  *  - per permutation j: `min over shingles of pmod(h·a_j + b_j, p)` with
  *    the deterministic [[TextFns.minhashParams]] (a,b) family — every
  *    product stays under 2^62, no overflow;
  *  - empty shingle array → null signature (matching `when(size > 0, …)`).
  *
  * The composed form walks the shingle array k+1 times through
  * higher-order-function lambda interpreters and allocates k intermediate
  * arrays per row; this walks it once, updating k running minima in a
  * local array. Per-k work is identical arithmetic in identical order, so
  * signatures (and therefore LSH bucketing) are unchanged.
  */
object MinHashSigImpl {

  private val P = TextFns.MinhashPrime

  private def pmod(x: Long, p: Long): Long = {
    val r = x % p
    if (r < 0) r + p else r
  }

  /** (a, b) pairs for k permutations, materialized once per k. */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def params(k: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(k, k2 => {
      val ps = TextFns.minhashParams(k2)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  def sig(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    val (as, bs) = params(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val h0 = if (s == null) 42L // xxhash64(NULL) = the seed
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val h = pmod(h0, P)
      var j = 0
      while (j < k) {
        val v = pmod(h * as(j) + bs(j), P)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_sig(array<string>, k) → array<long>` as a native codegen'd
  * Catalyst expression (k fixed at plan time). Null/empty input → null.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType |
         ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  // empty array → null, so eval is overridden directly (SimHash64 pattern)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null else MinHashSigImpl.sig(arr, k)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashSigImpl.sig($c, $k);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
