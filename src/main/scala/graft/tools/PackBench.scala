package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.PipelineQueries

/** Measures the round-8 restructure of t13's sequence packing on a corpus
  * with a HOT source (VERDICT r7 #7 → r6 standing note): the direct
  * `sum().over(Window.partitionBy(source).orderBy(doc_id))` prefix sum
  * serializes each source through one sorted window task, so a source
  * holding half the corpus puts half the corpus in one task — AQE cannot
  * split a window. The shipped two-level form (per-(source, chunk) sums,
  * cascade over the small chunk table, within-chunk row windows) keeps
  * every task bounded by the chunk size.
  *
  * Times the pre-r8 direct form (inline replica, NOT used by any query
  * path) against PipelineQueries.packBins on the same frozen input and
  * prints per-variant wall seconds plus the max single-task shuffle-read
  * rows (the direct hot-task signature).
  *
  * Usage: runMain graft.tools.PackBench [nDocs] [hotFrac]
  */
object PackBench {

  /** The pre-r8 single-window implementation, kept verbatim as the
    * measurement baseline.
    */
  private def directVariant(docs: DataFrame, budget: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", TextFns.tokenCount(col("text")).cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"cum_before DIV $budget").as("bin_id"),
        (col("cum_before") % budget).as("bin_offset"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 4000000L
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.5
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("graft-pack-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one hot source takes hotFrac of all docs; the rest spread over 40
    // cold sources — the usual training-mix shape (one web crawl dwarfing
    // curated sets). ~8 tokens/doc keeps tokenCount work proportional.
    val docs = spark.range(nDocs).toDF("doc_id")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(1000)) < lit((hotFrac * 1000).toLong),
          lit("webcrawl"))
          .otherwise(concat(lit("src"), pmod(col("doc_id"), lit(40))))
          .as("source"),
        concat(lit("alpha beta gamma delta epsilon zeta eta theta doc "),
          col("doc_id")).as("text"))
      .localCheckpoint() // freeze so both variants read identical data

    val maxTaskRows = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val r = t.taskMetrics.shuffleReadMetrics.recordsRead
          maxTaskRows.getAndUpdate(m => math.max(m, r))
        }
      })

    def time(label: String, df: => DataFrame): Unit = {
      maxTaskRows.set(0)
      val t0 = System.nanoTime()
      // aggregate over bin columns so the packing itself cannot be pruned
      val row = df.agg(max(col("bin_id")), sum(col("bin_offset"))).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus is async; let task-end events drain
      println(f"$label%-10s maxBin=${row.getLong(0)} offSum=${row.getLong(1)} " +
        f"sec=$sec%.2f maxTaskShuffleRows=${maxTaskRows.get()}")
    }

    val warm = docs.limit(1000).localCheckpoint()
    directVariant(warm, 256).count()
    PipelineQueries.packBins(warm, 256).count()

    for (_ <- 1 to 2) {
      time("direct", directVariant(docs, 256))
      time("chunked", PipelineQueries.packBins(docs, 256, chunkSize = 1 << 18))
    }
    spark.stop()
  }
}
