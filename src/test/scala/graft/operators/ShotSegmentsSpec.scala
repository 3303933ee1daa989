package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** m07: shot segmentation over hand-authored Y4M bytes with EXACT known
  * luma planes (constant-valued frames make every SAD a closed form), so
  * the cut rule, the anchor handling, the per-shot rollup, and the
  * poison-row rule are pinned independently of the builder pattern the
  * sf-data oracle re-derives.
  */
class ShotSegmentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import Multimodal.MediaRow

  /** C420 Y4M with the given constant-luma frames (chroma zeroed). */
  private def y4m(w: Int, h: Int, lumaVals: Seq[Int]): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= header
    lumaVals.foreach { v =>
      out ++= "FRAME\n".getBytes("US-ASCII")
      out ++= Array.fill(w * h)(v.toByte)
      out ++= new Array[Byte](w * h / 2)
    }
    out.toArray
  }

  test("cuts, anchors, means, and the poison row") {
    val media = Seq(
      MediaRow(1L, "video", y4m(4, 4, Seq(10, 10, 210, 210))),
      MediaRow(2L, "video", y4m(4, 4, Seq(50))),
      MediaRow(3L, "video", "not a container".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.shotSegments(media, stride = 1, cutMilli = 100000L)
      .orderBy("media_id", "shot_id")
      .select("media_id", "shot_id", "start_frame", "end_frame",
        "n_frames", "mean_sad_milli")
      .as[(Long, Int, Int, Int, Int, Option[Long])].collect().toSeq
    assert(out === Seq(
      // |210-10| = 200 per pixel -> sad 200000 opens shot 1 at frame 2
      (1L, 0, 0, 1, 2, Some(0L)),
      (1L, 1, 2, 3, 2, Some(100000L)),
      // single-frame video: one anchor-only shot, no motion rows
      (2L, 0, 0, 0, 1, None)))
  }

  test("shots partition the frame range contiguously") {
    val vals = Seq(0, 0, 200, 200, 90, 90, 250, 10)
    val media = Seq(MediaRow(7L, "video", y4m(4, 4, vals))).toDS()
    val out = Multimodal.shotSegments(media, stride = 1, cutMilli = 100000L)
      .orderBy("shot_id")
      .select("shot_id", "start_frame", "end_frame", "n_frames",
        "mean_sad_milli")
      .as[(Int, Int, Int, Int, Option[Long])].collect().toSeq
    // SADs: 0, 200000, 0, 110000, 0, 160000, 240000 -> cuts at 2, 4, 6, 7
    assert(out === Seq(
      (0, 0, 1, 2, Some(0L)), (1, 2, 3, 2, Some(100000L)),
      (2, 4, 5, 2, Some(55000L)), (3, 6, 6, 1, Some(160000L)),
      (4, 7, 7, 1, Some(240000L))))
    // contiguity: each shot starts one past the previous shot's end
    out.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 === a._3 + 1)
      case _ =>
    }
    assert(out.head._2 === 0 && out.last._3 === vals.length - 1)
  }
}
