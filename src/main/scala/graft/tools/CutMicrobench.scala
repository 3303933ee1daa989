package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-bench for the at-ingest substring cut's within-doc repeat
  * marking (r13 What's-wrong #3): times the OLD per-element
  * `array_position` rescan (O(w²) per document) against the NEW single
  * sort pass over (hash, pos) pairs (O(w log w)) on synthetic long
  * documents, batch-side — the dup-marking expression matches the
  * streaming leg (and the window hash below matches the production
  * r17 slice-hash form, so the timings measure the shipped
  * expressions), so per-row compute is what's under test, not the
  * stateful wrapper. Also asserts the two flag vectors agree on every
  * run, so the timing table doubles as a differential check.
  *
  *   runMain graft.tools.CutMicrobench 10000,30000,100000 [oldCap]
  *
  * `oldCap` (default 30000): largest doc the quadratic form is ASKED to
  * run — at 100k tokens it would be ~10¹⁰ comparisons, the cliff whose
  * absence this tool documents.
  */
object CutMicrobench {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "10000,30000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val oldCap = if (args.length > 1) args(1).toInt else 30000
    val L = 8
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    sizes.foreach { n =>
      // half the vocabulary repeats, so dup marking has real work
      val text = (0 until n).map(j => s"t${j % (n / 2)}").mkString(" ")
      val base = Seq((1L, text)).toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.TextFns.tokens(col("text")).as("toks"))
        .withColumn("hs", expr(
          // the production window hash (r17 slice form — see
          // DedupOps.windowInstances), so the micro-bench doesn't pay
          // the abandoned concat_ws string build in its timings
          s"transform(sequence(1, size(toks) - ${L - 1}), " +
            s"i -> xxhash64(slice(toks, i, $L)))"))
      def run(dupExpr: String): Array[Long] = {
        var out: Array[Long] = null
        val secs = timed(() => {
          out = base.withColumn("shi", sort_array(expr(
              "transform(hs, (h, i) -> struct(h AS h, i AS pos))")))
            .select(explode(expr(dupExpr)).as("p"))
            .select(col("p.pos").as("pos"))
            .filter(expr("p.dup"))
            .orderBy(col("pos"))
            .collect().map(_.getAs[Int]("pos").toLong)
        })
        println(f"  ${secs}%8.2f s, ${out.length} dup windows")
        out
      }
      val newExpr = "transform(shi, (x, j) -> struct(x.h AS h, " +
        "x.pos AS pos, CASE WHEN j = 0 THEN false " +
        "ELSE element_at(shi, j).h = x.h END AS dup))"
      val oldExpr = "transform(hs, (h, i) -> struct(h AS h, i AS pos, " +
        "array_position(hs, h) < i + 1 AS dup))"
      println(s"[cut-microbench] n=$n tokens (${n - L + 1} windows):")
      print("  new (sort pass):"); val a = run(newExpr)
      if (n <= oldCap) {
        print("  old (array_position rescan):"); val b = run(oldExpr)
        require(java.util.Arrays.equals(a, b),
          s"dup flag vectors diverge at n=$n")
        println("  flag vectors identical")
      } else println(s"  old form skipped (n > oldCap=$oldCap — the cliff)")
    }
    spark.stop()
  }
}
