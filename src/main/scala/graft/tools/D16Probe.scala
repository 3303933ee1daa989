package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Dev probe (r17): where does d16_lsh_tuning's execution time go?
  * Times TIMING-ONLY variants of the lshTuningCurve internals (results
  * deliberately wrong for some variants — never a registry path):
  *
  *   full     — the registered query as-is
  *   nojacc   — is_dup := true (no JaccardSim, sh still shipped)
  *   nosh     — side ships sig only; is_dup := mask-based proxy
  *   candsonly— candidate pair count only (band join + distinct)
  *   sigpass  — one corpus signature pass (scan + minhash floor)
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.D16Probe /root/testdata/sf0.1
  */
object D16Probe {
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
    val k = 16; val shingleWords = 3
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[d16probe] $tag%-10s best=${runs.min}%6.2f med=${runs.sorted.apply(1)}%6.2f")
    }
    val cands = graft.operators.DedupOps
      .minhashCandidates(docs, "doc_id", "text", k, bands = k, shingleWords)
    def side(withSh: Boolean) = {
      val base = docs.filter(TextFns.hasMinTokens(col("text"), shingleWords))
      val cols = Seq(col("doc_id").as("jid"),
        TextFns.shingleMinhash(TextFns.tokens(col("text")), shingleWords, k).as("sig")) ++
        (if (withSh) Seq(TextFns.wordShingles(col("text"), shingleWords).as("sh")) else Nil)
      base.select(cols: _*).repartition(col("jid"))
    }
    def scored(withSh: Boolean, withJacc: Boolean) = {
      val s = side(withSh)
      def renamed(sfx: String) = {
        val cols = Seq(col("jid").as(s"id_$sfx"), col("sig").as(s"sig_$sfx")) ++
          (if (withSh) Seq(col("sh").as(s"sh_$sfx")) else Nil)
        s.select(cols: _*)
      }
      val j = cands.join(renamed("a"), Seq("id_a")).join(renamed("b"), Seq("id_b"))
      val isDup = if (withJacc) (TextFns.jaccard(col("sh_a"), col("sh_b")) >= 0.5)
        else (col("sig_a")(0) === col("sig_b")(0))
      j.select(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y).as("mask"),
        isDup.as("is_dup"))
    }
    def rollup(sc: DataFrame) = sc
      .select(col("is_dup"), explode(array(Seq(2, 4, 8, 16).map { b =>
        val r = k / b
        struct(lit(b).as("bands"), lit(r).as("rows_per_band"),
          exists(sequence(lit(0), lit(b - 1)),
            g => forall(slice(col("mask"), g * lit(r) + lit(1), lit(r)), x => x)).as("caught"))
      }: _*)).as("c"))
      .filter(col("c.caught"))
      .groupBy(col("c.bands").as("bands"), col("c.rows_per_band").as("rows_per_band"))
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("is_dup"), 1)).as("n_true_dups"))
    time("sigpass") { docs.filter(TextFns.hasMinTokens(col("text"), shingleWords))
      .select(TextFns.shingleMinhash(TextFns.tokens(col("text")), shingleWords, k).as("sig")) }
    time("candsonly") { cands }
    time("nosh") { rollup(scored(withSh = false, withJacc = false)) }
    time("nojacc") { rollup(scored(withSh = true, withJacc = false)) }
    time("full") { rollup(scored(withSh = true, withJacc = true)) }
    time("registry") { graft.SparkEntry.queries("d16_lsh_tuning")(spark, sfDir) }
    spark.stop()
  }
}
