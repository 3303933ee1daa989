package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Measures the round-8 de-skew of the line-dedup first-occurrence pass on
  * a corpus with a genuinely hot line — the evidence behind replacing
  * `min(struct).over(Window.partitionBy(ldigest))` with a
  * partial-aggregated `groupBy(ldigest)` + join back (VERDICT r7 #1).
  *
  * The fixture plants one boilerplate line ("Home | About | Contact") in
  * `hotFrac` of documents, the skew profile of a shared nav/footer on a
  * web corpus. Under the window shape every instance of that line lands in
  * ONE task (AQE splits skewed joins, not windows); under the aggregate
  * shape each map partition pre-collapses the hot digest to a single row.
  * The tool times the CURRENT DedupOps.lineDedupStats against an inline
  * replica of the pre-r8 window implementation on the same input and
  * prints per-variant wall seconds plus the max single-task shuffle-read
  * rows (the direct hot-task signature).
  *
  * Usage: runMain graft.tools.SkewBench [nDocs] [hotFrac]
  */
object SkewBench {

  /** VERDICT r7's sketched fix — instance stream ⋈ per-digest min table —
    * kept as a measured ALTERNATIVE (NOT used by any query path): it
    * removes the window's un-splittable task but still shuffles every
    * instance row by the skewed digest, and below AQE's 256 MB skew
    * threshold the hot key still lands one join task. The shipped shape
    * (DedupOps.lineDedupStats) shuffles nothing instance-sized at all.
    */
  private def joinBackVariant(docs: DataFrame): DataFrame = {
    def digested = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote("\n")))
          .as(Seq("line_no", "line")))
      .withColumn("line", trim(col("line")))
      .filter(length(col("line")) > 0)
      .withColumn("ldigest", md5(col("line").cast("binary")))
      .select(col("doc_id"), col("line_no"), col("ldigest"))
    val minTable = digested
      .groupBy(col("ldigest"))
      .agg(min(struct(col("doc_id"), col("line_no"))).as("first_occ"))
    val marked = digested.join(minTable, Seq("ldigest"))
      .withColumn("kept",
        col("first_occ").getField("doc_id") === col("doc_id") &&
        col("first_occ").getField("line_no") === col("line_no"))
    val perDoc = marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("kept"), 1)).as("n_kept"),
        count(when(!col("kept"), 1)).as("n_removed"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** The pre-r8 window-based implementation, kept verbatim as the
    * measurement baseline (NOT used by any query path).
    */
  private def windowVariant(docs: DataFrame): DataFrame = {
    val marked = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote("\n")))
          .as(Seq("line_no", "line")))
      .withColumn("line", trim(col("line")))
      .filter(length(col("line")) > 0)
      .withColumn("ldigest", md5(col("line").cast("binary")))
      .select(col("doc_id"), col("line_no"), col("ldigest"))
      .withColumn("first_occ",
        min(struct(col("doc_id"), col("line_no")))
          .over(Window.partitionBy(col("ldigest"))))
      .withColumn("kept",
        col("first_occ").getField("doc_id") === col("doc_id") &&
        col("first_occ").getField("line_no") === col("line_no"))
    val perDoc = marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("kept"), 1)).as("n_kept"),
        count(when(!col("kept"), 1)).as("n_removed"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.5
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("graft-skew-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~6 lines/doc: one hot nav line for hotFrac of docs, one line shared
    // within a 1k-doc cohort (mild duplication), four unique lines.
    val docs = spark.range(nDocs).toDF("doc_id")
      .select(col("doc_id"), concat_ws("\n",
        when(pmod(col("doc_id"), lit(1000)) < lit((hotFrac * 1000).toLong),
          lit("Home | About | Contact")).otherwise(concat(lit("nav "), col("doc_id"))),
        concat(lit("cohort line "), (col("doc_id") / 1000).cast("long")),
        concat(lit("alpha body "), col("doc_id")),
        concat(lit("beta body "), col("doc_id")),
        concat(lit("gamma body "), col("doc_id")),
        concat(lit("delta body "), col("doc_id"))).as("text"))
      .localCheckpoint() // freeze the input so both variants read identical data

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
      // aggregate over the OUTPUT columns: a bare count() lets Catalyst
      // prune the unique-key joins (and with them the pass under test)
      val row = df.agg(sum(col("n_kept")), sum(col("n_removed"))).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus is async; let task-end events drain
      println(f"$label%-10s kept=${row.getLong(0)} removed=${row.getLong(1)} " +
        f"sec=$sec%.2f maxTaskShuffleRows=${maxTaskRows.get()}")
    }

    // warm all code paths once at small scale, then measure
    val warm = docs.limit(1000).localCheckpoint()
    windowVariant(warm).count()
    joinBackVariant(warm).count()
    DedupOps.lineDedupStats(warm, "doc_id", "text").count()

    for (_ <- 1 to 2) {
      time("window", windowVariant(docs))
      time("join-back", joinBackVariant(docs))
      time("rollup", DedupOps.lineDedupStats(docs, "doc_id", "text"))
    }
    spark.stop()
  }
}
