package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical MurmurHash3 x86_32 (public domain algorithm, Austin Appleby) —
  * NOT Spark's seed-42 `hash()` variant. The reference keys Kafka messages
  * with the little-endian hex of the unsigned seed-0 hash of the URL
  * authority (reference enqueue.py:126-127), matching the Java crawler's
  * partitioner, so this must be bit-exact (SURVEY.md §7.4 #2).
  */
object Murmur3 {

  def hash32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    // tail
    val tailStart = nBlocks * 4
    var k = 0
    val rem = data.length & 3
    if (rem >= 3) k ^= (data(tailStart + 2) & 0xff) << 16
    if (rem >= 2) k ^= (data(tailStart + 1) & 0xff) << 8
    if (rem >= 1) {
      k ^= data(tailStart) & 0xff
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    // finalization
    h ^= data.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** 8 hex chars = little-endian byte order of the unsigned seed-0 hash of
    * the UTF-8 input — the reference's Kafka key encoding
    * (`hex(pack("<I", mmh3.hash(netloc, signed=False)))`, enqueue.py:127).
    */
  def authorityKeyHex(s: UTF8String): UTF8String = {
    val h = hash32(s.getBytes, 0)
    val out = new Array[Char](8)
    val digits = "0123456789abcdef"
    var i = 0
    while (i < 4) { // emit bytes LSB-first (little-endian)
      val b = (h >>> (8 * i)) & 0xff
      out(i * 2) = digits.charAt(b >>> 4)
      out(i * 2 + 1) = digits.charAt(b & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Catalyst expression computing [[Murmur3.authorityKeyHex]] — codegen'd so
  * it stays inside whole-stage codegen on the Kafka-sink hot path
  * (preference order SURVEY.md §2.7: native Expression beats a Scala UDF).
  */
case class AuthorityKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "authority_key"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Murmur3.authorityKeyHex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala object methods have static forwarders → direct static call.
    defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3.authorityKeyHex($c)")

  override protected def withNewChildInternal(newChild: Expression): AuthorityKey =
    copy(child = newChild)
}
