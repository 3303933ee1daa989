package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** P19 bit-exactness (SURVEY.md §7.4 #2): vectors generated from an
  * independent implementation validated against the published SMHasher
  * values ("hello" → 0x248bfa47 seed 0) and python-mmh3's documented
  * `hash('foo') == -156908512`.
  */
class Murmur3Spec extends AnyFunSuite with SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  /** Independent straight-line reimplementation (ByteBuffer-based) used as a
    * differential check against the production loop on random inputs.
    */
  private def mmh3Ref(data: Array[Byte], seed: Int): Int = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var h = seed
    while (bb.remaining() >= 4) {
      var k = bb.getInt()
      k *= 0xcc9e2d51; k = Integer.rotateLeft(k, 15); k *= 0x1b873593
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    }
    var k = 0
    val tail = new Array[Byte](bb.remaining())
    bb.get(tail)
    if (tail.length == 3) k ^= (tail(2) & 0xff) << 16
    if (tail.length >= 2) k ^= (tail(1) & 0xff) << 8
    if (tail.length >= 1) {
      k ^= tail(0) & 0xff
      k *= 0xcc9e2d51; k = Integer.rotateLeft(k, 15); k *= 0x1b873593
      h ^= k
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  test("murmur3 x86_32 seed-0 matches published vectors") {
    assert(Murmur3.hash32("hello".getBytes("UTF-8"), 0) === 0x248bfa47)
    assert(Murmur3.hash32("".getBytes("UTF-8"), 0) === 0)
    assert(Murmur3.hash32("foo".getBytes("UTF-8"), 0) === -156908512)
  }

  test("authority key = LE hex of unsigned hash (reference enqueue.py:127)") {
    val vectors = Map(
      "" -> "00000000",
      "a" -> "b269253c",
      "example.org" -> "df8c385f",
      "www.example.org:8080" -> "9864aab5",
      "news.bbc.co.uk" -> "df3a94b5",
      "twitter.com" -> "178b53ec",
      "hello" -> "47fa8b24")
    vectors.foreach { case (in, want) =>
      assert(Murmur3.authorityKeyHex(u(in)).toString === want, s"input=$in")
    }
  }

  test("property: production hash agrees with independent reimpl on random bytes") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val len = rnd.nextInt(64)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val seed = rnd.nextInt()
      assert(Murmur3.hash32(bytes, seed) === mmh3Ref(bytes, seed),
        s"len=$len seed=$seed")
    }
  }

  test("expression codegen path agrees with interpreted eval on a DataFrame") {
    import spark.implicits._
    val hosts = Seq("example.org", "", "пример.испытание", "a.b.c.d.e.f",
      "xn--e1afmkfd.xn--80akhbyknj4f", "host-with-unicode-✓.org")
    val df = hosts.toDF("host")
      .withColumn("key", CrawlCols.authorityKey(org.apache.spark.sql.functions.col("host")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { h =>
      assert(got(h) === Murmur3.authorityKeyHex(u(h)).toString, s"host=$h")
    }
  }

  test("SQL registration: authority_key callable from spark.sql") {
    CrawlCols.register(spark)
    val r = spark.sql("SELECT authority_key('twitter.com') AS k").collect()
    assert(r.head.getString(0) === "178b53ec")
    assert(spark.sql("SELECT authority_key(NULL) AS k").collect().head.isNullAt(0))
  }
}
