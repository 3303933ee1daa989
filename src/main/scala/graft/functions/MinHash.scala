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
/** The permutation-family pieces BOTH minhash expressions share — one
  * prime, one pmod, one (a, b) parameter cache. A single definition is
  * load-bearing: [[ShingleMinHashImpl]]'s bit-identity contract with
  * `minhash_sig(wordShingles(...))` (and therefore LSH-bucket
  * compatibility across every signature in a corpus) holds only while
  * the two expressions hash through literally the same parameters. */
private[functions] object MinHashShared {

  val P: Long = TextFns.MinhashPrime

  def pmod(x: Long, p: Long): Long = {
    val r = x % p
    if (r < 0) r + p else r
  }

  /** (a, b) pairs for k permutations, materialized once per k. */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def params(k: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(k, k2 => {
      val ps = TextFns.minhashParams(k2)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })
}

object MinHashSigImpl {
  import MinHashShared.{P, pmod, params}

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

/** Fused word-shingling + MinHash: signatures over n-token windows computed
  * straight from the token array, bit-identical to
  * `minhash_sig(wordShingles(text, n), k)` — because MinHash is invariant
  * to duplicate shingles, the composed chain's `array_distinct ∘ transform ∘
  * slice ∘ concat_ws` (which materializes every shingle string and two
  * intermediate arrays per row through lambda interpreters) can be replaced
  * by one reused byte buffer per row: each window's tokens are appended
  * space-joined (skipping null tokens exactly like `concat_ws`), hashed with
  * the same seeded xxhash64 → p-mod → k-lane running minima as
  * [[MinHashSigImpl.sig]]. This was the single hottest expression in the
  * registry once benches stopped letting count() prune it.
  */
object ShingleMinHashImpl {
  import MinHashShared.{P, pmod, params}

  def sig(toks: ArrayData, n: Int, k: Int): GenericArrayData = {
    val cnt = toks.numElements() - n + 1
    if (cnt <= 0) return null
    val (as, bs) = params(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < cnt) {
      var len = 0
      var wrote = false
      var j = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) { // concat_ws skips null elements
          val s = toks.getUTF8String(i + j)
          val nb = s.numBytes
          if (len + nb + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.max(buf.length * 2, len + nb + 1))
          if (wrote) { buf(len) = ' '.toByte; len += 1 }
          s.writeToMemory(buf,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += nb
          wrote = true
        }
        j += 1
      }
      val h0 = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      val h = pmod(h0, P)
      var q = 0
      while (q < k) {
        val v = pmod(h * as(q) + bs(q), P)
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `shingle_minhash(array<string> tokens, n, k) → array<long>`: fused
  * windowed shingling + signature ([[ShingleMinHashImpl]]). Null input or
  * fewer than n tokens → null (matching the composed chain's empty-shingle
  * → null).
  */
case class ShingleMinHash(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n > 0 && k > 0, s"n and k must be positive, got n=$n k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType |
         ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  // short input → null, so eval is overridden directly (MinHashSig pattern)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ShingleMinHashImpl.sig(v.asInstanceOf[ArrayData], n, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ShingleMinHashImpl.sig($c, $n, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
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
