package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the blocked BPE apply at PRODUCTION depth (r13 next-round
  * #5) — time train+apply (`bpeTokenCountsHeldOutBlocked`, blockSize 8)
  * at a ladder of merge counts on a given sf/ladder dir and report the
  * per-block cost, which must stay flat where t45's unrolled fold is
  * long dead (its one projection grows linearly in merges).
  *
  *   runMain graft.tools.BpeDepthProbe /tmp/sf1x10 32,128,256
  */
object BpeDepthProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpeDepthProbe <sfDir> [rounds,rounds,...]")
    val sfDir = args(0)
    val depths = (if (args.length > 1) args(1) else "32,128,256")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    depths.foreach { rounds =>
      val t0 = System.nanoTime()
      graft.operators.RelevanceOps
        .bpeTokenCountsHeldOutBlocked(docs, "doc_id", "text", rounds,
          trainMod = 2, blockSize = 8)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-depth] rounds=$rounds%4d total=${secs}%8.2f s " +
        f"(${secs / (rounds / 8.0)}%6.3f s/block of 8)")
    }
    spark.stop()
  }
}
