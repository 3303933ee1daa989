package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the [[graft.HeapScope]] child session against building the
  * same queries directly on the parent session (with the threshold set
  * session-wide there, so the EXECUTED conf is identical and only the
  * session plumbing differs). Interleaved reps; the delta is the cost
  * of `newSession()` + a cold per-session catalog/FileIndex for the
  * tables the query reads.
  *
  *   runMain graft.tools.HeapScopeOverheadProbe /root/testdata/sf0.1 5
  */
object HeapScopeOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val keys = Seq("s32_chunk_retrieval_lsh", "s38_chunk_band_topk_wide",
      "s43_bitext_forward_wide")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // parent runs the same threshold the child would set, so the two
    // arms execute under the IDENTICAL conf
    spark.conf.set(graft.HeapScope.Conf, graft.HeapScope.Raised)

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def r3(d: Double): String = f"$d%.3f"
    // direct (parent-session) forms of the same registered queries —
    // bypassing SparkEntry's HeapScope wrapper
    val direct = graft.operators.PipelineQueries.defs
    // session creation alone
    val mk = Seq.fill(5)(timed(() => { graft.HeapScope.session(spark); () }))
    println(s"[heapscope-probe] newSession+set: ${mk.map(r3).mkString(",")}")

    val acc = collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // warm both arms once
    keys.foreach { k =>
      graft.SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      direct(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    (0 until reps).foreach { rep =>
      val arms = if (rep % 2 == 0) Seq("scoped", "direct")
                 else Seq("direct", "scoped")
      arms.foreach { arm =>
        keys.foreach { k =>
          val fn = if (arm == "scoped") graft.SparkEntry.queries(k)
                   else direct(k)
          val sec = timed(() => fn(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
          acc((k, arm)) = acc((k, arm)) :+ sec
        }
      }
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    keys.foreach { k =>
      val s = acc((k, "scoped")); val d = acc((k, "direct"))
      println(f"[heapscope-probe] $k%-28s scoped med=${r3(med(s))} " +
        f"direct med=${r3(med(d))} delta=${med(s) - med(d)}%+.3f " +
        s"scoped=[${s.map(r3).mkString(",")}] direct=[${d.map(r3).mkString(",")}]")
    }
    spark.stop()
  }
}
