package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** d27: snapshot-delta semantics the sf-data oracle can't isolate —
  * null-text presence (a null-text capture is PRESENT, and two of them
  * compare `unchanged` through the null-safe digest comparison), and the
  * reversal property (swapping snapshots maps added↔removed and fixes
  * changed/unchanged — the ledger is directionless up to that relabel).
  */
class SnapshotDeltaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val prev = Seq(
    (1L, "same text"), (2L, "old body"), (3L, null.asInstanceOf[String]),
    (4L, "dropped page")).toDF("doc_id", "text")
  private val next = Seq(
    (1L, "same text"), (2L, "new body"), (3L, null.asInstanceOf[String]),
    (5L, "fresh page")).toDF("doc_id", "text")

  test("all four statuses, including null-text presence") {
    val out = DedupOps.snapshotDelta(prev, next, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "status").as[(Long, String)].collect().toSeq
    assert(out === Seq(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  test("reversal maps added<->removed and fixes the rest") {
    val fwd = DedupOps.snapshotDelta(prev, next, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    val rev = DedupOps.snapshotDelta(next, prev, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(fwd.keySet === rev.keySet)
    fwd.foreach { case (id, st) =>
      val expected = st match {
        case "added" => "removed"
        case "removed" => "added"
        case other => other
      }
      assert(rev(id) === expected, s"doc $id")
    }
  }
}
