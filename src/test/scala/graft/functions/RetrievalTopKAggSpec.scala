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

  test("distinct heap top-k equals DISTINCT + rank window on duplicate-heavy rows (the at-ingest shape)") {
    val rnd = new scala.util.Random(91)
    // duplicate-HEAVY: every (q, c, ch, sim) row repeats 1–3 times —
    // the multi-band/multi-probe delivery shape the streaming legs see
    val base = (for {
      q <- 0L until 5L
      c <- 0L until 20L
      ch <- 0 until 2
    } yield (q, c, ch, Seq(0.0, 0.25, 0.5, 1.0)(rnd.nextInt(4))))
    val rows = rnd.shuffle(base.flatMap(r => Seq.fill(1 + rnd.nextInt(3))(r)))
    val scored = rows.toDF("query_id", "corpus_id", "chunk_id", "sim")
      .repartition(7)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), col("corpus_id"), col("chunk_id"))
    val topkUdaf = udaf(RetrievalTopKAgg.topKDistinct(3))
    val heaped = scored
      .groupBy(col("query_id"))
      .agg(topkUdaf(col("sim"), col("corpus_id"),
        col("chunk_id").cast("int")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("query_id"), col("t.corpus_id"), col("t.chunk_id"),
        (col("r") + 1).cast("int").as("rank"), col("t.sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toSet
    val windowed = scored.distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("corpus_id"), col("chunk_id"),
        col("rank").cast("int").as("rank"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toSet
    assert(heaped === windowed)
  }

  test("bitext distinct heap: order, dedup, cap, and nullable neighborhood payload") {
    val topkUdaf = udaf(BitextTopKAgg.topKDistinct(2))
    // id 30 has NO neighborhood entry (nulls); duplicates of id 10
    // arrive thrice; id 20 is best
    val rows = Seq(
      (1L, 900000L, 10L, Option(5L), Option(2L)),
      (1L, 900000L, 10L, Option(5L), Option(2L)),
      (1L, 950000L, 20L, Option(7L), Option(3L)),
      (1L, 900000L, 10L, Option(5L), Option(2L)),
      (1L, 900000L, 30L, Option.empty[Long], Option.empty[Long]))
      .toDF("id_l", "sim_micro", "id_r", "sum_r", "cnt_r")
      .repartition(3)
    val got = rows.groupBy(col("id_l"))
      .agg(topkUdaf(col("sim_micro"), col("id_r"), col("sum_r"),
        col("cnt_r")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.sim_micro"), col("t.id_r"), col("t.sum_r"),
        col("t.cnt_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    // k=2 distinct best: (950000, 20) then (900000, 10) — the id-30
    // null-payload row ties 10 on sim but loses the id tiebreak and
    // the dup copies of 10 collapse to one
    assert(got === Seq((950000L, 20L, Some(7L), Some(3L)),
      (900000L, 10L, Some(5L), Some(2L))))
  }
}
