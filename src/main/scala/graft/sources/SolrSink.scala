package graft.sources

import org.apache.spark.sql.DataFrame

/** S10 — the Solr document sink (reference report.py:222-224,
  * `SolrKevalsDB.import_items_from`): executor-side batched JSON POSTs to
  * Solr's update endpoint, with the transport injectable so the sink's
  * batching/rendering/commit protocol is fully testable in-JVM (this
  * environment has no egress; the default transport is a plain
  * `java.net.http` client used verbatim at deployment).
  *
  * Scale shape: documents are rendered and posted WHERE THEY LIVE
  * (`foreachPartition` over the `toJSON` dataset — no collect, no
  * shuffle); each partition streams its rows in `batchSize` groups, so
  * executor memory holds one batch of JSON strings at a time. A non-2xx
  * response throws, failing the task — Spark's task retry gives
  * at-least-once delivery, idempotent because Solr upserts on the `id`
  * field (P14's doc id).
  */
object SolrSink {

  /** (url, jsonBody) => HTTP status. Must be serializable — executors
    * invoke it. */
  type Transport = (String, String) => Int

  /** One pooled client per (JVM, timeout): the transport closure must be
    * serializable, but building an HttpClient (selector threads + pool)
    * PER BATCH would discard connection reuse — a 1M-doc write at
    * batchSize 100 is 10k clients. The lazy map lives object-side on
    * each executor; closures capture only the timeout. */
  @transient private lazy val clientCache =
    new java.util.concurrent.ConcurrentHashMap[Int, java.net.http.HttpClient]()

  private def clientFor(timeoutMs: Int): java.net.http.HttpClient =
    clientCache.computeIfAbsent(timeoutMs, t =>
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(t)).build())

  /** Default deployment transport: POST application/json. */
  def httpTransport(timeoutMs: Int = 30000): Transport = (url, body) => {
    val client = clientFor(timeoutMs)
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      .statusCode()
  }

  /** Post `docs` (one Solr document per row) to
    * `<baseUrl>/update/json/docs` in per-partition batches, then issue one
    * commit from the driver. Returns the number of documents posted.
    */
  def write(docs: DataFrame, baseUrl: String, batchSize: Int = 100,
      transport: Transport = httpTransport()): Long = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val docsUrl = s"$baseUrl/update/json/docs"
    val posted = docs.sparkSession.sparkContext.longAccumulator("solr_docs")
    docs.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach { batch =>
        val body = batch.mkString("[", ",", "]")
        val status = transport(docsUrl, body)
        if (status < 200 || status >= 300)
          throw new java.io.IOException(
            s"Solr rejected a ${batch.size}-doc batch: HTTP $status")
        posted.add(batch.size)
      }
    }
    val commitStatus = transport(s"$baseUrl/update", """{"commit":{}}""")
    if (commitStatus < 200 || commitStatus >= 300)
      throw new java.io.IOException(s"Solr commit failed: HTTP $commitStatus")
    posted.value
  }
}
