package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout pruning: a date/bucket-partitioned warehouse layout
  * turns per-partition predicates into file skipping (static pruning) and
  * selective dim-side filters into runtime partition subqueries (dynamic
  * partition pruning) — at 100 TB these are the difference between reading
  * 1 partition and reading 100 TB.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSpec {

  test("static pruning: partition predicate never reaches the data files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      spark.range(0, 20000)
        .select(col("id"), (col("id") % 20).as("d"), (col("id") * 7 % 100).as("v"))
        .write.partitionBy("d").parquet(s"$tmp/data")
      val pruned = spark.read.parquet(s"$tmp/data").filter(col("d") === 3)
      assert(pruned.count() === 1000)
      val plan = pruned.queryExecution.executedPlan.toString
      // the d=3 predicate is a PartitionFilter (directory skip), not a
      // PushedFilter (row-group skip) — 1 of 20 partitions read
      assert(plan.contains("PartitionFilters:") && plan.contains("(d#"), plan)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(tmp))
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val prev = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      spark.range(0, 20000)
        .select(col("id"), (col("id") % 20).as("d"), (col("id") * 7 % 100).as("v"))
        .write.partitionBy("d").parquet(s"$tmp/data")
      val fact = spark.read.parquet(s"$tmp/data")
      val dim = spark.range(0, 20).select(col("id").as("d"),
        when(col("id") < 2, lit("hot")).otherwise(lit("cold")).as("tag"))
      val joined = fact.join(dim, "d").filter(col("tag") === "hot")
      assert(joined.collect().length === 2000) // d ∈ {0, 1}
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamicpruning partition subquery on the fact scan:\n$plan")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
