package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r18): where does the BPE round critical path go — codegen
  * compilation of per-round plans (fresh merge literals defeat the
  * source-keyed codegen cache) or Catalyst planning itself?
  *
  * Runs t44_bpe_train_deep best-of-3 under (a) default codegen, (b)
  * whole-stage codegen off, (c) fully interpreted expressions — timing
  * only; the output frames are noop-sunk. Never a registry path.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.BpeLoopProbe /root/testdata/sf0.1
  */
object BpeLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count() // warm
    def run(tag: String, confs: Map[String, String]): Unit = {
      val old = confs.keys.map(k =>
        k -> util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.operators.RelevanceOps.bpeTrain(docs, "text", 32)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[bpeloop] $tag%-12s best=${runs.min}%6.2f med=${runs.sorted.apply(1)}%6.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      } finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    run("default", Map.empty)
    run("no-wscg", Map("spark.sql.codegen.wholeStage" -> "false"))
    run("interpreted", Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"))
    run("default2", Map.empty)
    spark.stop()
  }
}
