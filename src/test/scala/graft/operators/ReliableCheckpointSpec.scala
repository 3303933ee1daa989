package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-checkpoint mode of the iterative loops (VERDICT r10
  * "what's wrong" #1): `reliable = true` must change ONLY the lineage-pin
  * mechanism (executor-resident localCheckpoint → checkpoint-dir write),
  * never a value — pinned here by running both modes on graphs that
  * exercise every loop path (multi-hop label propagation, singletons,
  * weighted cycles, dangling hosts) and asserting identical output.
  */
class ReliableCheckpointSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("reliable mode without a checkpoint dir fails fast") {
    // order matters JVM-wide: this must run before any test sets the dir
    // (there is no unset). If another suite got there first, skip — the
    // require path is still covered by the message assert below when not.
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      DedupOps.connectedComponents(nodes, edges, reliable = true)
    }
    assert(e.getMessage.contains("setCheckpointDir"))
  }

  private def withCkptDir(): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      dir.toFile.deleteOnExit()
      spark.sparkContext.setCheckpointDir(dir.toString)
    }

  test("connectedComponents: identical labels in both pin modes") {
    withCkptDir()
    // chain (multi-hop), pair, singleton 6 — hits the fused first hop,
    // later hops, convergence, and the singleton rejoin
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
      .toDF("src", "dst")
    def run(reliable: Boolean): Seq[(Long, Long)] =
      DedupOps.connectedComponents(nodes, edges, reliable = reliable)
        .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(run(reliable = true) === run(reliable = false))
  }

  test("hostRank: identical ranks in both pin modes") {
    withCkptDir()
    val links = Seq("a" -> "b", "a" -> "b", "a" -> "c", "b" -> "a",
      "d" -> "a", "c" -> "d").toDF("src", "dst")
    def run(reliable: Boolean): Seq[(String, Long)] =
      GraphOps.hostRank(links, iterations = 5, reliable = reliable)
        .as[(String, Long)].collect().toSeq
    assert(run(reliable = true) === run(reliable = false))
  }

  test("bpeTrain: identical merge table and token counts in both pin modes") {
    withCkptDir()
    // enough repetition for 4 distinct merges, plus a word the trained
    // vocab prices at several symbols — exercises every loop round and
    // the final-state surface (t41's input) under both pin modes
    val docs = Seq((0L, "aaab aaab aaab cd"), (1L, "aaab cd cd xyz"))
      .toDF("doc_id", "text")
    def train(reliable: Boolean): Seq[(Int, String, String, Long, Long)] =
      RelevanceOps.bpeTrain(docs, "text", rounds = 4, reliable = reliable)
        .as[(Int, String, String, Long, Long)].collect().toSeq
    def price(reliable: Boolean): Seq[(Long, Long, Long, Long)] =
      RelevanceOps.bpeTokenCounts(docs, "doc_id", "text", rounds = 4,
          reliable = reliable)
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(train(reliable = true) === train(reliable = false))
    assert(price(reliable = true) === price(reliable = false))
  }
}
