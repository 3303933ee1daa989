package graft.operators

import graft.SparkSpec
import graft.functions.MediaCodecs
import org.scalatest.funsuite.AnyFunSuite

/** m09: cluster semantics over controlled payloads — identical images
  * cluster with the min id canonical, distinct images stay apart, a
  * non-image row contributes nothing, and exact copies still cluster at
  * maxHamming 0 (the banding and CC pieces carry their own specs; this
  * pins their composition).
  */
class VisualClustersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import Multimodal.MediaRow

  test("copies cluster on the min id; distinct images stay singletons") {
    val a = MediaCodecs.buildBmp(16, 12, 7L)
    val b = MediaCodecs.buildBmp(20, 20, 99L)
    val media = Seq(
      MediaRow(1L, "image", a), MediaRow(2L, "image", a),
      MediaRow(5L, "image", a),
      MediaRow(3L, "image", b), MediaRow(4L, "image", b),
      MediaRow(9L, "junk", "not an image".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.visualClusters(media)
      .orderBy("media_id")
      .select("media_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 3L, false), (5L, 1L, false)))
  }

  test("exact copies still cluster at maxHamming 0") {
    val a = MediaCodecs.buildBmp(10, 10, 3L)
    val media = Seq(MediaRow(1L, "image", a), MediaRow(2L, "image", a)).toDS()
    val out = Multimodal.visualClusters(media, maxHamming = 0)
      .select("cluster_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 1L))
  }
}
