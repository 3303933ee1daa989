package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join verification: a join whose left side is dominated by one
  * hot key gets its skewed partition SPLIT at runtime by adaptive
  * execution (the `salting for skew` requirement's other half — joins are
  * AQE's job, aggregations are [[Skew.saltedCountSum]]'s).
  *
  * Thresholds are lowered so local[4]-sized data trips the same code path
  * a 100 TB hot host would: a partition counts as skewed at 32 KB here vs
  * 256 MB in production — the mechanism (OptimizeSkewedJoin splitting one
  * partition into many reader tasks) is identical.
  */
class AqeSkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("AQE splits the hot-key partition at runtime (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows of the hot key vs a uniform tail → one giant partition
      val left = spark.range(0, 110000)
        .select(when(col("id") < 100000, lit(7L)).otherwise(col("id") % 97)
          .as("k"), (col("id") * 37 % 1000).as("payload"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's queryExecution (count() would build
      // a separate one whose adaptive plan we couldn't inspect)
      assert(joined.collect().length === 110000)
      // inspect the FINAL adaptive plan (skew decisions happen at runtime)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split join in the final plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
