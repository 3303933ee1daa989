package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** SolrSink protocol tests with an in-JVM recording transport (local mode
  * shares the JVM, so a static buffer observes executor-side posts): batch
  * shape, JSON validity, endpoint routing, commit ordering, failure
  * propagation.
  */
object RecordingTransport {
  import scala.jdk.CollectionConverters._
  private val calls =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  @volatile var failWith: Int = 0 // non-zero => every call returns it

  def post(url: String, body: String): Int = {
    calls.add((url, body))
    if (failWith != 0) failWith else 200
  }
  def reset(): Unit = { calls.clear(); failWith = 0 }
  def all: Seq[(String, String)] = calls.iterator().asScala.toSeq
}

class SolrSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (s"doc:$i", s"url$i", 200)).toDF("id", "url", "status")

  test("batches per partition, docs endpoint, one trailing commit") {
    RecordingTransport.reset()
    val n = SolrSink.write(docs(10).repartition(2), "http://solr:8983/solr/c",
      batchSize = 3, transport = RecordingTransport.post)
    assert(n === 10)
    val (commits, posts) = RecordingTransport.all.partition(_._1.endsWith("/update"))
    assert(commits === Seq(("http://solr:8983/solr/c/update", """{"commit":{}}""")))
    assert(posts.forall(_._1 == "http://solr:8983/solr/c/update/json/docs"))
    // 2 partitions × batches of ≤3 covering 10 docs: 4 posts (3+2 or 4+... )
    val sizes = posts.map(_._2.count(_ == '{')) // docs per batch body
    assert(sizes.sum === 10)
    assert(sizes.forall(s => s >= 1 && s <= 3))
    // every body is a well-formed JSON array of objects with the id field
    posts.foreach { case (_, body) =>
      assert(body.startsWith("[") && body.endsWith("]"))
      assert(body.contains("\"id\":\"doc:"))
    }
  }

  test("non-2xx on a batch fails the job; commit never issued") {
    RecordingTransport.reset()
    RecordingTransport.failWith = 503
    val e = intercept[org.apache.spark.SparkException] {
      SolrSink.write(docs(4), "http://solr:8983/solr/c",
        batchSize = 2, transport = RecordingTransport.post)
    }
    assert(e.getMessage.contains("Solr rejected") ||
      Option(e.getCause).exists(_.getMessage.contains("Solr rejected")))
    assert(!RecordingTransport.all.exists(_._1.endsWith("/update")),
      "no commit after a failed batch")
  }
}
