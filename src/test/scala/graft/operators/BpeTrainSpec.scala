package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** t40 pinned against an independent driver-side reimplementation of the
  * same public algorithm (plain Scala, no Spark), plus the exact cases
  * where counting and application semantics diverge: overlapping pair
  * counts vs non-overlapping greedy application on repeated-symbol runs,
  * merges built from earlier merges, and the t28 round-1 agreement.
  */
class BpeTrainSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Sennrich-style BPE by hand: overlapping pair counts, argmax under
    * (count desc, c1, c2), greedy left-to-right non-overlapping apply.
    * Returns the merge table and the final per-word symbol counts. */
  private def trainByHandFull(words: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long, Long)], Map[String, Int]) = {
    var st: Seq[(String, Vector[String], Long)] =
      words.toSeq.map { case (w, tf) => (w, w.map(_.toString).toVector, tf) }
    val rows = (1 to rounds).map { k =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      st.foreach { case (_, sy, tf) =>
        var i = 0
        while (i + 1 < sy.length) { pc((sy(i), sy(i + 1))) += tf; i += 1 }
      }
      val ((c1, c2), best) =
        pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      st = st.map { case (w, sy, tf) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == c1 && sy(i + 1) == c2) {
            buf += (c1 + c2); i += 2
          } else { buf += sy(i); i += 1 }
        }
        (w, buf.result(), tf)
      }
      val after = st.map { case (_, sy, tf) => tf * sy.length }.sum
      (k, c1, c2, best, after)
    }
    (rows, st.map { case (w, sy, _) => w -> sy.length }.toMap)
  }

  private def trainByHand(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] =
    trainByHandFull(words, rounds)._1

  private def trainSpark(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    // a doc per word repeated tf times reproduces the vocab exactly
    val docs = words.toSeq.map { case (w, tf) =>
      Seq.fill(tf.toInt)(w).mkString(" ")
    }.toDF("text")
    RelevanceOps.bpeTrain(docs, "text", rounds)
      .as[(Int, String, String, Long, Long)].collect().toSeq
  }

  test("matches the hand fold over a mixed vocab for 6 rounds") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "lowest" -> 4L, "wide" -> 1L)
    assert(trainSpark(words, 6) === trainByHand(words, 6))
  }

  test("incremental recount: matches the hand fold at rounds 8 AND 32") {
    // the engine maintains the pair-count table incrementally (only
    // affected words recounted per round); this differential pins exact
    // identity with the naive full recount (the hand fold) deep enough
    // that delta bookkeeping errors cannot hide — a vocab rich enough
    // for 32 distinct merges, with tf weights, shared prefixes/suffixes,
    // and repeated-symbol runs (the greedy-vs-overlap divergence)
    val words = Map(
      "low" -> 5L, "lower" -> 2L, "lowest" -> 4L, "newest" -> 6L,
      "widest" -> 3L, "wide" -> 1L, "newer" -> 7L, "news" -> 2L,
      "aaaa" -> 3L, "aaab" -> 2L, "banana" -> 5L, "bandana" -> 1L,
      "antidisestablishment" -> 1L, "establishment" -> 2L,
      "mississippi" -> 4L, "missive" -> 1L, "repetition" -> 3L,
      "repetitive" -> 2L, "tokenizer" -> 6L, "tokens" -> 8L)
    assert(trainSpark(words, 8) === trainByHand(words, 8))
    assert(trainSpark(words, 32) === trainByHand(words, 32))
  }

  test("repeated-symbol run: overlapping count, non-overlapping apply") {
    // "aaaa": round 1 counts (a,a) 3 times (overlapping) but applies
    // only twice -> [aa, aa]; round 2 merges (aa,aa) once -> [aaaa]
    val words = Map("aaaa" -> 1L)
    val got = trainSpark(words, 2)
    assert(got === Seq(
      (1, "a", "a", 3L, 2L),
      (2, "aa", "aa", 1L, 1L)))
    assert(got === trainByHand(words, 2))
  }

  test("odd run keeps the stranded tail symbol") {
    // "aaa aaa": each word [a,a,a] -> greedy leaves [aa, a]; the (a,a)
    // count is 4 (2 per word), tokens go 6 -> 4
    val words = Map("aaa" -> 2L)
    val got = trainSpark(words, 1)
    assert(got === Seq((1, "a", "a", 4L, 4L)))
    assert(got === trainByHand(words, 1))
  }

  test("leading newline's empty token carries zero symbols") {
    // trim strips 0x20 only, so "\nab ab" tokenizes to ["", "ab", "ab"];
    // the empty token must contribute NO symbols (Spark's sequence(1,0)
    // is the descending [1,0] — unguarded it minted two phantom empty
    // symbols and a constant tokens_after offset vs the oracle)
    val docs = Seq("\nab ab").toDF("text")
    val got = RelevanceOps.bpeTrain(docs, "text", 1)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 2L, 2L)))
  }

  test("tokenize: per-doc counts follow the trained merge table") {
    val docs = Seq(
      (1L, "low lower low"),
      (2L, "newest wide lowest"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "low low low low")
    ).toDF("doc_id", "text")
    val words = Seq("low", "lower", "low", "newest", "wide", "lowest",
      "low", "low", "low", "low")
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val (_, lens) = trainByHandFull(words, 4)
    val got = RelevanceOps.bpeTokenCounts(docs, "doc_id", "text", 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    def doc(ws: String*): (Long, Long, Long) =
      (ws.size.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => lens(w).toLong).sum)
    val e1 = doc("low", "lower", "low")
    val e2 = doc("newest", "wide", "lowest")
    val e5 = doc("low", "low", "low", "low")
    assert(got === Seq(
      (1L, e1._1, e1._2, e1._3),
      (2L, e2._1, e2._2, e2._3),
      (3L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L),
      (5L, e5._1, e5._2, e5._3)))
    // the merge table visibly compresses: "low" must have merged below
    // its character length by round 4 on this vocab
    assert(lens("low") < 3)
  }

  test("round 1 equals t28's top pair on the same corpus") {
    val docs = Seq("the quick brown fox", "the lazy dog the end")
      .toDF("text")
    val r1 = RelevanceOps.bpeTrain(docs, "text", 1)
      .as[(Int, String, String, Long, Long)].head()
    val top = RelevanceOps.bpePairStats(docs, "text", 1)
      .as[(String, String, Long)].head()
    assert((r1._2, r1._3, r1._4) === top)
  }

  test("held-out apply: trains on the even split, prices the odd split by the hand fold") {
    val docs = Seq(
      (0L, "low lower low newest"),        // train
      (2L, "newest widest lowest newest"), // train
      (4L, "low low wide lowest"),         // train
      (1L, "low lowest unseen lower"),     // held out: mixed seen words
      (3L, "zebra quux"),                  // held out: fully OOV words
      (5L, ""),                            // held out: empty
      (7L, null.asInstanceOf[String])      // held out: null
    ).toDF("doc_id", "text")
    val trainWords = Seq("low", "lower", "low", "newest", "newest",
      "widest", "lowest", "newest", "low", "low", "wide", "lowest")
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val (merges, _) = trainByHandFull(trainWords, 4)
    // hand-apply the trained merges in rank order to a held-out word
    def applyByHand(w: String): Int = {
      var sy = w.map(_.toString).toVector
      merges.foreach { case (_, c1, c2, _, _) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == c1 && sy(i + 1) == c2) {
            buf += (c1 + c2); i += 2
          } else { buf += sy(i); i += 1 }
        }
        sy = buf.result()
      }
      sy.length
    }
    val got = RelevanceOps.bpeTokenCountsHeldOut(docs, "doc_id", "text",
        rounds = 4, trainMod = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    def doc(ws: String*): (Long, Long, Long) =
      (ws.size.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => applyByHand(w).toLong).sum)
    val e1 = doc("low", "lowest", "unseen", "lower")
    val e3 = doc("zebra", "quux")
    assert(got === Seq(
      (1L, e1._1, e1._2, e1._3),
      (3L, e3._1, e3._2, e3._3),
      (5L, 0L, 0L, 0L),
      (7L, 0L, 0L, 0L)))
    // fully OOV words pay full character length (no merge applies)
    assert(applyByHand("zebra") === 5 && applyByHand("quux") === 4)
    // and at least one held-out word actually compressed under the
    // foreign table, or the test shows nothing about transfer
    assert(e1._3 < e1._2)
  }

  // ADVICE r11: the trainer used to throw when the corpus ran out of
  // adjacent pairs before `rounds`, while the chained-CTE oracle
  // degrades silently (an empty argmax CTE cascades and later rounds
  // emit zero rows). Pinned behavior: return the TRUNCATED merge table,
  // matching the oracle's short table.
  test("degenerate corpus: truncated merge table, never a throw") {
    // all single-codepoint words — zero adjacent pairs at round 1
    val flat = Seq((0L, "a b c a b"), (1L, "c a")).toDF("doc_id", "text")
    assert(RelevanceOps.bpeTrain(flat, "text", 3).count() === 0L)
    // t41's surface still prices under the (unchanged) final state
    val priced = RelevanceOps.bpeTokenCounts(flat, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(priced === Seq((0L, 5L, 5L, 5L), (1L, 2L, 2L, 2L)))

    // pairs exhaust after exactly two merges: (a,b)→ab, (ab,?)… "ab ab"
    // has one pair per word instance; after merging (a,b) every word is
    // one symbol — 1 row out of rounds=4
    val short = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val table = RelevanceOps.bpeTrain(short, "text", 4)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(table === Seq((1, "a", "b", 3L, 3L)))
  }

  // ADVICE r12: the setup aggregate's sum() over ZERO vocab rows is
  // null — an all-empty/whitespace/null-text corpus must yield the
  // truncated (empty) merge table, not an NPE; reachable through the
  // held-out split when the TRAIN slice has no tokens at all.
  test("empty-vocab corpus: empty merge table, held-out prices at full char length") {
    val docs = Seq(
      (0L, ""),                            // train: empty
      (2L, "   "),                         // train: whitespace only
      (4L, null.asInstanceOf[String]),     // train: null
      (1L, "ab ab cd")                     // held out
    ).toDF("doc_id", "text")
    assert(RelevanceOps.bpeTrain(docs.filter($"doc_id" % 2 === 0),
      "text", 4).count() === 0L)
    // no trained merges → every held-out word pays full character length
    val got = RelevanceOps.bpeTokenCountsHeldOut(docs, "doc_id", "text",
        rounds = 4, trainMod = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 6L, 6L)))
    // and the blocked apply path agrees on the same degenerate table
    val blocked = RelevanceOps.bpeTokenCountsHeldOutBlocked(docs,
        "doc_id", "text", rounds = 4, trainMod = 2, blockSize = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(blocked === got)
  }

  // t46: the blocked apply is DEFINITIONALLY the unrolled fold, merely
  // materialized every blockSize merges — identical output at any
  // block size, including blocks that don't divide the round count.
  test("blocked apply: equals the unrolled fold at rounds 8, any block size") {
    val docs = Seq(
      (0L, "low lower low newest newest widest"),
      (2L, "newest widest lowest newest low low"),
      (4L, "low low wide lowest lower widest"),
      (1L, "low lowest unseen lower lowest"),
      (3L, "zebra quux newest"),
      (5L, ""),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val unrolled = RelevanceOps.bpeTokenCountsHeldOut(docs, "doc_id",
        "text", rounds = 8, trainMod = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    Seq(1, 3, 8).foreach { bs =>
      val blocked = RelevanceOps.bpeTokenCountsHeldOutBlocked(docs,
          "doc_id", "text", rounds = 8, trainMod = 2, blockSize = bs)
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
      assert(blocked === unrolled, s"blockSize=$bs")
    }
  }

  // t46 at the trainer's deep round count: block-size invariance at 32
  // rounds (8-merge blocks vs one 32-merge block), on a corpus rich
  // enough that all 32 rounds actually pick merges — the depth t45's
  // single unrolled projection is being retired from.
  test("blocked apply: block-size invariant at 32 rounds") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 24L).map { i =>
      (i, (0 until 30).map(_ => s"w${rnd.nextInt(40)}x${rnd.nextInt(5)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    // enough distinct adjacent pairs that 32 rounds never truncate
    assert(RelevanceOps.bpeTrain(docs.filter($"doc_id" % 2 === 0),
      "text", 32).count() === 32L)
    val b8 = RelevanceOps.bpeTokenCountsHeldOutBlocked(docs, "doc_id",
        "text", rounds = 32, trainMod = 2, blockSize = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val b32 = RelevanceOps.bpeTokenCountsHeldOutBlocked(docs, "doc_id",
        "text", rounds = 32, trainMod = 2, blockSize = 32)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(b8 === b32)
    // at least one held-out word compressed under the foreign table
    assert(b8.exists { case (_, _, ch, bpe) => bpe < ch })
  }

  test("blocked apply: block-size invariant at 128 rounds (production-depth pin)") {
    // r13 VERDICT next-round #5: the deepest pinned run was 32 merges —
    // pin the blocked apply at a depth where the unrolled fold is
    // already unusable (one projection of 128 chained greedyMerge
    // transforms). Long mixed-alphabet words give the trainer a pair
    // space rich enough that 128 rounds never truncate.
    val rnd = new scala.util.Random(17)
    def word(): String =
      (0 until 10).map(_ => "abcdefghijklmnop".charAt(rnd.nextInt(16)))
        .mkString
    val docs = (0L until 16L).map { i =>
      (i, (0 until 40).map(_ => word()).mkString(" "))
    }.toDF("doc_id", "text")
    assert(RelevanceOps.bpeTrain(docs.filter($"doc_id" % 2 === 0),
      "text", 128).count() === 128L)
    val b8 = RelevanceOps.bpeTokenCountsHeldOutBlocked(docs, "doc_id",
        "text", rounds = 128, trainMod = 2, blockSize = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val b64 = RelevanceOps.bpeTokenCountsHeldOutBlocked(docs, "doc_id",
        "text", rounds = 128, trainMod = 2, blockSize = 64)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(b8 === b64)
    assert(b8.exists { case (_, _, ch, bpe) => bpe < ch })
  }
}
