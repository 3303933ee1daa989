package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00")),
    (2L, "k1", ts("2024-01-01 12:00:00")),
    (3L, "k1", ts("2024-01-01 09:00:00")), // before any right row
    (4L, "k2", ts("2024-01-01 12:00:00")), // equality match
    (5L, "k3", ts("2024-01-01 12:00:00"))  // key with no right rows
  ).toDF("id", "k", "ts")

  private lazy val right = Seq(
    ("k1", ts("2024-01-01 09:30:00"), "a"),
    ("k1", ts("2024-01-01 11:00:00"), "b"),
    ("k2", ts("2024-01-01 12:00:00"), "c")
  ).toDF("k", "rts", "payload")

  test("asof: greatest right ts ≤ left ts per key; null when none") {
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("payload"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_payload")).toMap
    assert(got === Map(1L -> "a", 2L -> "b", 3L -> null, 4L -> "c", 5L -> null))
  }

  test("asof strict: equality excluded") {
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("payload"),
      strict = true)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_payload")).toMap
    assert(got(4L) === null) // k2's only right row is at exactly 12:00
    assert(got(2L) === "b")
  }

  test("asof plan: single shuffle on the key, no cartesian/range join") {
    val plan = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }
}
