package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quiet-box A/B for the session-wide
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` raise
  * (r15 VERDICT #1): d20_ingest_triage's driver bench read ~1.7-2.1x
  * its r14 median while controls moved only with the box, and the one
  * GLOBAL change that round was this threshold (128 -> 131072 in every
  * session builder). The raise is provably safe for the capped-heap
  * aggregates it was argued from (buffers <= k entries), but it also
  * governs every UNCAPPED ObjectHashAggregate — this probe measures
  * whether it costs the uncapped consumers anything.
  *
  * Protocol: ONE session (the threshold is a runtime SQLConf, set and
  * restored around each run), reps x {128, 131072} x keys, the
  * threshold order ALTERNATING per rep so warm-up/box drift is shared
  * equally between the two arms; cpu calib probes bracket the run.
  * Controls (t01/q01/p05 — no object aggregate in their plans) ride
  * along: if the arms differ on d20 but not on the controls, the
  * threshold is implicated; if both arms read alike everywhere, the
  * round-over-round delta was box state.
  *
  *   runMain graft.tools.ThresholdAB /root/testdata/sf0.1 THRESH_AB_r16.json 5
  */
object ThresholdAB {

  val Conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  val DefaultKeys: Seq[String] = Seq(
    "d20_ingest_triage", "d17_incremental_dedup", "d18_incremental_neardup",
    "t01_token_stats", "q01_pricing_summary", "p05_null_dash")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ThresholdAB <sfDir> <outJson> [reps] [keys,...]")
    val sfDir = args(0)
    val outJson = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val keys =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else DefaultKeys
    val unknown = keys.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // HeapScope-scoped keys build under the child session pinned at
    // 131072, so the parent-session conf.set below never reaches them —
    // both arms would measure the same config and report a misleading
    // ratio≈1. Fail loudly instead (r16 ADVICE).
    val scoped = keys.filter(graft.HeapScope.Keys)
    require(scoped.isEmpty,
      s"keys ${scoped.mkString(", ")} are HeapScope-scoped: the A/B " +
        "variable cannot reach their child session; A/B them via direct " +
        "operator calls instead")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // deliberately NOT setting the threshold here — it is the A/B variable
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TimestampFilterPushdown.enable(spark)
    graft.functions.CrawlCols.register(spark)

    val thresholds = Seq("128", "131072")

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def r3(d: Double): String = f"$d%.3f"
    def calibCpu(): Double = timed(() =>
      spark.range(0, 200L << 20, 1, cpus.toInt)
        .select(sum(pmod(xxhash64(col("id")), lit(65536L))))
        .write.format("noop").mode("overwrite").save())
    def runOnce(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      timed(() => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }

    // warm-up: page cache + codegen, one pass per key under each arm
    // (discarded) so JIT state is symmetric before the timed reps
    Seq("documents", "lineitem", "orders").foreach { t =>
      graft.Tables.table(spark, sfDir, t).count()
    }
    graft.Tables.events(spark, sfDir).count()
    thresholds.foreach { thr =>
      spark.conf.set(Conf, thr)
      keys.foreach(runOnce)
    }

    val calibStart = Seq.fill(3)(calibCpu())
    // runs(key)(thr) = observed seconds, in execution order
    val runs = collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (0 until reps).foreach { rep =>
      val order = if (rep % 2 == 0) thresholds else thresholds.reverse
      order.foreach { thr =>
        spark.conf.set(Conf, thr)
        keys.foreach { k =>
          val sec = runOnce(k)
          runs((k, thr)) = runs((k, thr)) :+ sec
          println(s"[thresh-ab] rep=$rep thr=$thr $k ${r3(sec)}s")
        }
      }
    }
    val calibEnd = calibCpu()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val rows = keys.map { k =>
      val a = runs((k, "128")); val b = runs((k, "131072"))
      val mA = median(a); val mB = median(b)
      println(f"[thresh-ab] $k%-28s thr128 med=${r3(mA)} thr131072 med=${r3(mB)} ratio=${mB / mA}%.3f")
      s""""$k":{"thr128":[${a.map(r3).mkString(",")}],""" +
        s""""thr131072":[${b.map(r3).mkString(",")}],""" +
        s""""med128":${r3(mA)},"med131072":${r3(mB)},""" +
        s""""ratio":${f"${mB / mA}%.3f"}}"""
    }
    val json = s"""{"sf":"$sfDir","reps":$reps,""" +
      s""""calib_cpu":[${calibStart.map(r3).mkString(",")}],""" +
      s""""calib_cpu_end":${r3(calibEnd)},""" +
      s""""queries":{${rows.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[thresh-ab] wrote $outJson")
    spark.stop()
  }
}
