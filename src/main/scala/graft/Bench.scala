package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  *
  * Session/table warmup happens before any timing so the first measured
  * query doesn't absorb JVM/codegen/file-cache startup; queries run in
  * sorted name order for run-to-run comparability.
  *
  * Output protocol (round-critical, spec-pinned in BenchLineSpec): the
  * driver captures only the last ~2.9 KB of combined output and
  * line-parses it for bare JSON, so the line must (a) be the LAST line
  * printed — Spark is stopped and quieted first, sbt's logger prefix and
  * success banner are disabled in build.sbt — and (b) stay well under the
  * capture window: per-query keys are abbreviated (id prefix + word
  * initials, collisions fall back to the full name) at 3 dp. The
  * full-name line is written to BENCH_FULL.json for the permanent record.
  */
object Bench {

  /** 3-dp rendering; failures are the sentinel -1. */
  private[graft] def r3(v: Double): String =
    if (v < 0) "-1"
    else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Abbreviated key per query name: id prefix + word initials
    * (`a04_counter_map` → `a04cm`); names whose abbreviation collides
    * keep their full name so keys stay unique.
    */
  private[graft] def shortKeys(names: Seq[String]): Map[String, String] = {
    val raw = names.map { k =>
      val parts = k.split('_')
      k -> (parts.head + parts.tail.map(_.head).mkString)
    }.toMap
    val counts = raw.values.groupBy(identity).view.mapValues(_.size)
    raw.map { case (k, s) => k -> (if (counts(s) > 1) k else s) }
  }

  /** The one-line JSON protocol record. `results` in report order;
    * failed queries carry a negative time and are excluded from the
    * total. `key` maps a query name to its printed key.
    */
  /** Per-query measurement policy: a FIRST-run failure is terminal
    * ((-1, not-flaky) — never retried into a success, so the bench can't
    * mask a broken query as a fast one); a successful first run takes
    * best-of-three against ambient scheduler/page-cache noise, and a retry
    * failure AFTER a successful first run reports (best success, flaky).
    */
  private[graft] def measure(once: () => Double): (Double, Boolean) = {
    val first = once()
    if (first < 0) (-1.0, false)
    else {
      val retries = Seq(once(), once())
      ((first +: retries.filter(_ >= 0)).min, retries.exists(_ < 0))
    }
  }

  private[graft] def renderLine(results: Seq[(String, Double)],
      flaky: Seq[String], sfDir: String,
      key: String => String): String = {
    val qs = results
      .map { case (k, v) => "\"" + key(k) + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val flakyJson = flaky.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"flaky":$flakyJson,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TimestampFilterPushdown.enable(spark)
    graft.functions.CrawlCols.register(spark)

    // Warmup: touch every table (file-footer + page cache), force one
    // codegen'd aggregate through the whole stack.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()

    // A failed query must not masquerade as a fast one: a FIRST-run failure
    // is terminal — recorded -1.0 (excluded from the total) and listed
    // under "failed", never retried into a success. Only queries whose
    // first run succeeds take best-of-three — ambient scheduler/page-cache
    // contention otherwise dominates sub-second queries (observed
    // run-to-run swings of 3× on an otherwise idle box). A retry that
    // fails after a successful first run marks the query "flaky" (its
    // successful time still counts).
    val flaky = scala.collection.mutable.ArrayBuffer.empty[String]
    // Dev aid: SPARK_GRAFT_ONLY=q16_percentiles,q17_asof_join restricts the
    // run to named queries (unset in driver runs — full registry).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { ns =>
      val unknown = ns -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(ns =>
      SparkEntry.queries.filter { case (k, _) => ns(k) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink, NOT count(): under count() Catalyst prunes every column
      // the row count doesn't need — a projection query times as a bare
      // scan and a trailing window vanishes entirely (confirmed via task
      // metrics: the composed as-of join shuffled 59 B under count()).
      // The noop write computes the full output schema and discards it.
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      }
      val (best, isFlaky) = measure(() => once())
      if (isFlaky) flaky += name
      (name, best)
    }
    val short = shortKeys(results.map(_._1))
    // Only a full-registry run may refresh the committed artifact — a
    // SPARK_GRAFT_ONLY profiling run would silently truncate it.
    if (only.isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        renderLine(results, flaky.toSeq, sfDir, identity) + "\n")
    // The driver line-parses the tail of combined output for bare JSON —
    // stop Spark (and silence shutdown-path logging) BEFORE printing so
    // the JSON line is the final line of the run.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(renderLine(results, flaky.toSeq, sfDir, short))
    System.out.flush()
  }
}
