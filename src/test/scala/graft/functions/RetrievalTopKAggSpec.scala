package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The retrieval rerank heap ([[RetrievalTopKAgg]]) must be
  * bit-identical to the rank window it replaced — same
  * (sim desc, corpus_id, chunk_id) total order, same
  * k-or-fewer-rows-per-query contract — on tie-HEAVY inputs, where a
  * wrong tiebreak or a non-total merge order would diverge. The
  * executed rungs' oracle gate (DuckDB row_number) is the same
  * differential on real data; this spec isolates the aggregate.
  */
class RetrievalTopKAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("heap top-k equals the rank window on tie-heavy scored rows, any k") {
    val rnd = new scala.util.Random(23)
    // few distinct sims -> dense ties; duplicate-free (q, c, chunk)
    // keys (the real rungs dedup candidates before scoring)
    val rows = rnd.shuffle(
      (for {
        q <- 0L until 7L
        c <- 0L until 25L
        ch <- 0 until 3
      } yield (q, c, ch)).toSeq)
      .map { case (q, c, ch) =>
        (q, c, ch, Seq(0.0, 0.25, 0.25, 0.5, 1.0)(rnd.nextInt(5)))
      }
    val scored = rows.toDF("query_id", "corpus_id", "chunk_id", "sim")
      .repartition(7) // partial/merge paths genuinely exercised
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), col("corpus_id"), col("chunk_id"))
    for (k <- Seq(1, 3, 10, 200)) { // 200 > any group: emits everything
      val windowed = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("corpus_id"), col("chunk_id"),
          col("rank").cast("int").as("rank"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getDouble(4))).toSet
      val heaped = scored
        .select(col("query_id").as("_1"),
          struct(col("sim"), col("corpus_id"), col("chunk_id")).as("_2"))
        .as[(Long, RetrievalTopKAgg.Entry)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(RetrievalTopKAgg.topK(k).toColumn.name("top"))
        .select(col("key").as("query_id"),
          posexplode(col("top")).as(Seq("r", "t")))
        .select(col("query_id"), col("t.corpus_id"), col("t.chunk_id"),
          (col("r") + 1).cast("int").as("rank"), col("t.sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getDouble(4))).toSet
      assert(heaped === windowed, s"k=$k")
    }
  }
}
