package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("range join: exactly the in-window pairs, each emitted once") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:29")), // within 30s of 1
      (3L, ts("2024-01-01 10:00:31")), // within 30s of 2, not of 1
      (4L, ts("2024-01-01 10:05:00"))  // isolated
    ).toDF("id", "ts")
    val pairs = RangeJoin.within(rows, rows, "ts", 30)
      .filter(col("id") < col("r_id"))
      .select(col("id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)))
  }

  test("bucket-boundary pairs are found and not duplicated") {
    // 59 and 61 straddle a 30s bucket boundary (buckets [30,60),[60,90))
    val rows = Seq((1L, ts("2024-01-01 00:00:59")), (2L, ts("2024-01-01 00:01:01")))
      .toDF("id", "ts")
    val pairs = RangeJoin.within(rows, rows, "ts", 30)
      .filter(col("id") < col("r_id")).collect()
    assert(pairs.length === 1)
  }

  test("plan is an equi-join, not nested-loop") {
    val rows = Seq((1L, ts("2024-01-01 00:00:59"))).toDF("id", "ts")
    val plan = RangeJoin.within(rows, rows, "ts", 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
