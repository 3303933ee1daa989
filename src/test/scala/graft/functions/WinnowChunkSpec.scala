package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.security.MessageDigest
import scala.util.Random

/** Behavioral + differential tests for TextFns.winnowing (MOSS fingerprint
  * selection) and TextFns.chunkWindows (strided token chunking): edge
  * geometry, the winnowing shared-run guarantee, and bit-exact agreement
  * with an independent driver-side re-implementation on random corpora.
  */
class WinnowChunkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  // -- driver-side reference implementations (independent of the Column form)

  private def gramHash(toks: Seq[String]): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(toks.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    java.lang.Long.parseLong(hex, 16)
  }

  private def refWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.trim match {
      case "" => Seq.empty[String]
      case t  => t.split("\\s+").toSeq
    }
    val m = toks.length - (k - 1)
    if (m < 1) return Set.empty
    val hs = (1 to m).map(i => gramHash(toks.slice(i - 1, i - 1 + k)))
    (1 to math.max(1, m - (w - 1))).map { j =>
      var pos = 0; var fp = Long.MaxValue
      (j to math.min(j + (w - 1), m)).foreach { p =>
        if (hs(p - 1) <= fp) { pos = p; fp = hs(p - 1) } // rightmost min
      }
      (pos, fp)
    }.toSet
  }

  private def refChunks(text: String, chunk: Int, stride: Int)
      : Seq[(Int, Int, Int, String)] = {
    val toks = text.trim match {
      case "" => Seq.empty[String]
      case t  => t.split("\\s+").toSeq
    }
    val n = toks.length
    val nc = if (n == 0) 0
             else if (n <= chunk) 1
             else 1 + (n - (chunk - stride + 1)) / stride
    (0 until nc).map { j =>
      val len = math.min(chunk, n - j * stride)
      (j, j * stride + 1, len,
        toks.slice(j * stride, j * stride + len).mkString(" "))
    }
  }

  private def runWinnow(texts: Seq[(Long, String)], k: Int = K, w: Int = W)
      : Map[Long, Set[(Int, Long)]] =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(TextFns.winnowing(col("text"), k, w)).as("s"))
      .select(col("doc_id"), col("s.pos"), col("s.fp"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet
      }

  test("winnowing: edge geometry — empty, <k tokens, exactly k, m<w") {
    val out = texts2map(Seq(
      (0L, ""), (1L, "  "), (2L, "one two"),        // < k tokens → no grams
      (3L, "one two three"),                          // exactly one gram
      (4L, "a b c d")))                               // m=2 < w → one window
    assert(out.getOrElse(0L, Set.empty).isEmpty)
    assert(out.getOrElse(1L, Set.empty).isEmpty)
    assert(out.getOrElse(2L, Set.empty).isEmpty)
    assert(out(3L) === refWinnow("one two three", K, W))
    assert(out(3L).size === 1 && out(3L).head._1 === 1)
    assert(out(4L) === refWinnow("a b c d", K, W))
    assert(out(4L).size === 1) // single window → single selection
  }

  private def texts2map(ts: Seq[(Long, String)]) = runWinnow(ts)

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    val run = "omega kappa sigma delta theta lambda" // w+k-1 = 6 tokens
    val a = s"alpha beta $run gamma epsilon zeta"
    val b = s"one two three four $run five six"
    val out = runWinnow(Seq((0L, a), (1L, b)))
    val shared = out(0L).map(_._2) intersect out(1L).map(_._2)
    assert(shared.nonEmpty, "winnowing guarantee violated on planted run")
  }

  test("winnowing: differential vs driver reference on random corpora") {
    val rnd = new Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 60L).map { i =>
      val n = rnd.nextInt(20) // 0..19 tokens spans every geometry
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = runWinnow(docs)
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) === refWinnow(t, K, W),
        s"doc $id text='$t'")
    }
    // (doc, pos) is a total key: one fp per selected position
    got.values.foreach(s => assert(s.size === s.map(_._1).size))
  }

  test("winnowPairs: planted copy found, boilerplate fps capped away, strangers unpaired") {
    import graft.operators.DedupOps
    val run = "omega kappa sigma delta theta lambda rho" // > w+k-1 tokens
    val boiler = "terms of service apply to every visitor here"
    val docs = Seq(
      (0L, s"alpha beta $run gamma epsilon zeta"),
      (1L, s"uno dos tres quatro $run cinco seis"),
      // 6 docs > cap sharing only the boilerplate run, unique tails
      (2L, s"$boiler aa2 bb2 cc2 dd2"), (3L, s"$boiler aa3 bb3 cc3 dd3"),
      (4L, s"$boiler aa4 bb4 cc4 dd4"), (5L, s"$boiler aa5 bb5 cc5 dd5"),
      (6L, s"$boiler aa6 bb6 cc6 dd6"), (7L, s"$boiler aa7 bb7 cc7 dd7"),
      (8L, "entirely unrelated content speaking about something else wholly")
    ).toDF("doc_id", "text")
    val got = DedupOps.winnowPairs(docs, "doc_id", "text", K, W,
        minShared = 1L, maxDocsPerFp = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), "planted copy pair missed")
    // every boilerplate fp is carried by 6 > 4 docs → capped → no pairs
    // among 2..7, and doc 8 pairs with nobody
    assert(got === Set((0L, 1L)), s"unexpected pairs: $got")
  }

  test("winnowMatchSpans: pair set == d30, span stats match a driver reference") {
    import graft.operators.DedupOps
    val run = "omega kappa sigma delta theta lambda rho mu nu xi"
    val docs = Seq(
      (0L, s"alpha beta $run gamma epsilon zeta"),
      (1L, s"uno dos tres quatro $run cinco seis"),
      (2L, "entirely unrelated content speaking about something else wholly"),
      (3L, s"alpha beta $run gamma epsilon zeta") // exact copy of 0
    )
    val df = docs.toDF("doc_id", "text")
    val (minShared, cap) = (1L, 8)
    val spans = DedupOps.winnowMatchSpans(df, "doc_id", "text", K, W,
        minShared, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val pairs = DedupOps.winnowPairs(df, "doc_id", "text", K, W,
        minShared, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("shared_fp"))
      .toMap
    assert(spans.keySet === pairs.keySet)
    spans.foreach { case (k2, v) => assert(v._1 === pairs(k2)) }

    // driver reference: same cap, anchors, interval union
    val sel = docs.map { case (id, t) => id -> refWinnow(t, K, W) }.toMap
    val docFp = sel.toSeq.flatMap { case (id, s) => s.map(_._2).toSet.map((f: Long) => (id, f)) }
    val okFp = docFp.groupBy(_._2).filter(_._2.size <= cap).keySet
    def union(ps: Seq[Int]): (Long, Long) = {
      var tok = 0L; var ns = 0L; var end = 0
      ps.sorted.foreach { p =>
        if (p <= end) { tok += p + K - end; end = p + K }
        else { tok += K; ns += 1; end = p + K }
      }
      (tok, ns)
    }
    for (a <- docs.map(_._1); b <- docs.map(_._1) if a < b) {
      val fa = sel(a).filter(x => okFp(x._2)); val fb = sel(b).filter(x => okFp(x._2))
      val shared = fa.map(_._2) intersect fb.map(_._2)
      if (shared.size >= minShared) {
        val pa = fa.filter(x => shared(x._2)).map(_._1).toSeq.distinct
        val pb = fb.filter(x => shared(x._2)).map(_._1).toSeq.distinct
        val (ta, na) = union(pa); val (tb, nb) = union(pb)
        assert(spans((a, b)) === ((shared.size.toLong, ta, na, tb, nb)),
          s"pair ($a,$b)")
      } else assert(!spans.contains((a, b)), s"pair ($a,$b) should be absent")
    }
    // the exact-copy pair covers identical token mass on both sides
    val full = spans((0L, 3L))
    assert(full._2 === full._4 && full._3 === full._5)
  }

  test("winnowMatchSlices: reconciles with d31 row-for-row, slices are the docs' own tokens") {
    import graft.operators.DedupOps
    val run = "omega kappa sigma delta theta lambda rho mu nu xi"
    val docs = Seq(
      (0L, s"alpha beta $run gamma epsilon zeta"),
      (1L, s"uno dos tres quatro $run cinco seis"),
      (2L, "entirely unrelated content speaking about something else wholly"),
      (3L, s"alpha beta $run gamma epsilon zeta")
    )
    val df = docs.toDF("doc_id", "text")
    val (minShared, cap) = (1L, 8)
    val slices = DedupOps.winnowMatchSlices(df, "doc_id", "text", K, W,
        minShared, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getString(6)))
    val spans = DedupOps.winnowMatchSpans(df, "doc_id", "text", K, W,
        minShared, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    // per pair side: slice count == n_spans, Σ n_tokens == matched_tokens
    val bySide = slices.groupBy(s => (s._1, s._2, s._3))
    assert(bySide.keySet.map(k => (k._1, k._2)) === spans.keySet)
    bySide.foreach { case ((a, b, side), rs) =>
      val (ta, na, tb, nb) = spans((a, b))
      val (toks, ns) = if (side == "a") (ta, na) else (tb, nb)
      assert(rs.length.toLong === ns, s"($a,$b,$side) span count")
      assert(rs.map(_._6).sum === toks, s"($a,$b,$side) token mass")
      // span_idx is 1..n in start order, spans don't touch (else merged)
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to rs.length))
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._5 + x._6 < y._5, "spans must be disjoint, non-abutting")
        case _ =>
      }
    }
    // every slice is literally the doc's tokens [start, start+n) joined
    val tokOf = docs.toMap.view.mapValues(_.trim.split("\\s+").toSeq).toMap
    slices.foreach { case (a, b, side, _, start, n, text) =>
      val doc = if (side == "a") a else b
      assert(text === tokOf(doc).slice(start - 1, start - 1 + n.toInt)
        .mkString(" "), s"($a,$b,$side) slice at $start")
    }
    // exact-copy pair: both sides present the identical evidence text
    val copy = slices.filter(s => s._1 == 0L && s._2 == 3L)
    assert(copy.nonEmpty)
    assert(copy.filter(_._3 == "a").map(s => (s._4, s._5, s._7)).toSet ===
      copy.filter(_._3 == "b").map(s => (s._4, s._5, s._7)).toSet)
  }

  test("chunkRetrieval: verbatim copy ranks first at sim 1, self excluded") {
    import graft.operators.SimilarityOps
    val q = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, q),                                    // query (0 % 97 == 0)
      (5L, q),                                    // verbatim copy
      (6L, "one two three four five six seven eight nine ten"),
      (7L, s"prefix words $q suffix words end")   // contains the query
    ).toDF("doc_id", "text")
    val got = SimilarityOps.chunkRetrieval(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3)
      .collect()
      .map(r => (r.getInt(3), r.getLong(1), r.getInt(2), r.getDouble(4)))
      .sortBy(_._1)
    // rank 1: the verbatim copy's single chunk at cosine exactly 1
    assert(got.head === ((1, 5L, 0, 1.0)))
    // the query doc's own chunks never appear
    assert(!got.exists(_._2 == 0L))
    // the containing doc outranks the unrelated doc
    val r7 = got.find(_._2 == 7L).map(_._1)
    val r6 = got.find(_._2 == 6L).map(_._1)
    assert(r7.isDefined && (r6.isEmpty || r7.get < r6.get))
  }

  test("chunkRetrievalLshRecall: verbatim copy shares the sign bucket and counts as a hit") {
    import graft.operators.SimilarityOps
    val q = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, q),                                    // query (0 % 97 == 0)
      (5L, q),                                    // verbatim copy: same vector, same sig
      (6L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val rows = SimilarityOps.chunkRetrievalLshRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set(0L)) // every query reports exactly one row
    val (cand, hits, recall) = rows(0L)
    assert(cand >= 1L, "identical vector must share the sign bucket")
    assert(hits >= 1L && recall >= 333L)
  }

  test("chunkMultiProbeRecall: budgets nest, probes=1 column equals s29, recall only rises") {
    import graft.operators.SimilarityOps
    val docs = (0L until 40L).map { i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 25}").mkString(" "))
    }.toDF("doc_id", "text")
    val mp = SimilarityOps.chunkMultiProbeRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val s29 = SimilarityOps.chunkRetrievalLshRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(mp.keySet === s29.keySet)
    mp.foreach { case (q, (c1, h1, r1, cmp, hmp, rmp)) =>
      // the probes=1 columns ARE s29
      assert((c1, h1, r1) === s29(q), s"query $q")
      // multi-probe only adds: candidates, hits, recall all nest
      assert(cmp >= c1 && hmp >= h1 && rmp >= r1, s"query $q")
    }
  }

  test("chunkMultiProbe2Recall: flip-1/flip-0 columns equal s30 bit-for-bit, flip-2 nests on top") {
    import graft.operators.SimilarityOps
    val docs = (0L until 40L).map { i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 25}").mkString(" "))
    }.toDF("doc_id", "text")
    val mp2 = SimilarityOps.chunkMultiProbe2Recall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)),
          (r.getLong(7), r.getLong(8), r.getLong(9)))).toMap
    val s30 = SimilarityOps.chunkMultiProbeRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(mp2.keySet === s30.keySet)
    mp2.foreach { case (q, (lower, (c2, h2, r2))) =>
      // the nflip <= 1 budget columns ARE s30 (which itself pins ≡ s29
      // at probes=1 above) — three rungs of ONE dial, never re-scored
      assert(lower === s30(q), s"query $q")
      val (_, _, _, cmp, hmp, rmp) = lower
      assert(c2 >= cmp && h2 >= hmp && r2 >= rmp, s"query $q")
    }
    // the rung must actually widen somewhere on this corpus, or the
    // test proves nothing about the flip-2 tier
    assert(mp2.exists { case (q, (lower, (c2, _, _))) => c2 > lower._4 })
  }

  test("chunkBandRecall: candidates are a superset of s31's flip-2 set — hits and recall dominate rung for rung") {
    import graft.operators.SimilarityOps
    val docs = (0L until 40L).map { i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 25}").mkString(" "))
    }.toDF("doc_id", "text")
    val banded = SimilarityOps.chunkBandRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, bands = 4, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val mp2 = SimilarityOps.chunkMultiProbe2Recall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(7), r.getLong(8), r.getLong(9))).toMap
    assert(banded.keySet === mp2.keySet) // every query reports in both
    banded.foreach { case (q, (cB, hB, rB)) =>
      val (c2, h2, r2) = mp2(q)
      // pigeonhole: any chunk within Hamming<=3 of the query's sign
      // pattern agrees on some whole 4-bit band, so the banded candidate
      // set contains s31's entire flip-2 (Hamming<=2) set — counts,
      // hits, and recall can only dominate
      assert(cB >= c2 && hB >= h2 && rB >= r2, s"query $q")
    }
    // the OR-construction must actually reach BEYOND the flip-2 ball
    // somewhere on this corpus, or the test proves nothing about it
    assert(banded.exists { case (q, (cB, _, _)) => cB > mp2(q)._1 })
  }

  test("chunkRetrievalLshRecall at the wide key: verbatim copy still a hit, candidate volume drops") {
    import graft.operators.SimilarityOps
    val q = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val verbatim = Seq(
      (0L, q), (5L, q),
      (6L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    // identical text embeds to the identical vector at ANY width, so
    // the copy shares the bucket and counts as a hit at 32 bits too
    val wide = SimilarityOps.chunkRetrievalLshRecall(verbatim, "doc_id",
        "text", chunk = 64, stride = 48, dim = 32, queryMod = 97, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(wide.keySet === Set(0L))
    assert(wide(0L)._1 >= 1L && wide(0L)._2 >= 1L && wide(0L)._3 >= 333L)

    // the width dial: on a corpus of near-miss texts, the 2x-wider key
    // space can only make sign agreement rarer — corpus-wide candidate
    // volume drops (the r13 100x saturation lesson in miniature). Not
    // a pointwise claim (different hashed-BoW projections), so the pin
    // is the corpus total on this fixed corpus.
    // on a REALISTIC corpus (vocabulary >> dim, every bucket a mixed
    // sum) the wider key can only make sign agreement rarer. NOT true
    // on tiny vocabularies — measured here first: with 10 distinct
    // tokens, widening the table ISOLATES tokens into single-token
    // buckets whose sign is the token's fixed hash draw (negative
    // draws read bit 0 for every doc, discriminating nothing), and a
    // 200-doc/10-token corpus read t32=504 > t16=424 — so the pin runs
    // on real testdata, where vocab >> 32 mixes every bucket
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def total(dim: Int): Long = SimilarityOps.chunkRetrievalLshRecall(
        docs, "doc_id", "text", 64, 48, dim, queryMod = 13, k = 3)
      .agg(sum(col("n_candidates"))).head().getLong(0)
    val (t16, t32) = (total(16), total(32))
    assert(t32 < t16, s"t16=$t16 t32=$t32")
  }

  test("chunkBandSweep: fine columns equal s34 bit-for-bit, coarse nests inside fine") {
    import graft.operators.SimilarityOps
    val docs = (0L until 40L).map { i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 25}").mkString(" "))
    }.toDF("doc_id", "text")
    val sweep = SimilarityOps.chunkBandSweep(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, bandsFine = 4, bandsCoarse = 2,
        queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)),
          (r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val s34 = SimilarityOps.chunkBandRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, bands = 4, queryMod = 13, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sweep.keySet === s34.keySet)
    sweep.foreach { case (q, (fine, coarse)) =>
      // the fine geometry IS s34 — one dial, never re-scored
      assert(fine === s34(q), s"query $q")
      // 8-bit-band agreement implies both 4-bit halves agree, so the
      // coarse candidate set nests: counts, hits, recall all <=
      assert(coarse._1 <= fine._1 && coarse._2 <= fine._2 &&
        coarse._3 <= fine._3, s"query $q")
    }
    // the wider bands must genuinely prune somewhere on this corpus,
    // or the sweep prices nothing
    assert(sweep.exists { case (_, (fine, coarse)) => coarse._1 < fine._1 })
  }

  test("chunkBandRecall: verbatim copy is always a banded hit; disjoint-band strangers are not candidates") {
    import graft.operators.SimilarityOps
    val q = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, q),                                    // query (0 % 97 == 0)
      (5L, q),                                    // verbatim copy: identical sig, all bands agree
      (6L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val rows = SimilarityOps.chunkBandRecall(docs, "doc_id", "text",
        chunk = 64, stride = 48, dim = 16, bands = 4, queryMod = 97, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set(0L))
    val (cand, hits, recall) = rows(0L)
    assert(cand >= 1L && hits >= 1L && recall >= 333L)
  }

  test("chunkRetrievalLshTopK: equals s28 when the bucket holds the exact top-k; bucket-miss emits nothing") {
    import graft.operators.SimilarityOps
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, base),                 // query (0 % 97 == 0)
      (5L, base),                 // verbatim copy — same bucket, sim 1
      (6L, base + " extra tail"), // superset — same sign pattern likely
      (7L, "one two three four five six seven eight nine ten"),
      (97L, "wholly disjoint vocabulary speaking of other matters entirely")
    ).toDF("doc_id", "text")     // 97 is also a query (97 % 97 == 0)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getInt(2),
        r.getDouble(4))).toMap
    val lsh = SimilarityOps.chunkRetrievalLshTopK(docs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3)
    val exact = SimilarityOps.chunkRetrieval(docs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3)
    val lshRows = keyed(lsh)
    val exactRows = keyed(exact)
    // query 0's bucket: if the s29 audit says every exact top hit is a
    // candidate (n_hits == min(k, n_cand)), the index answer's prefix
    // must equal s28's ranking restricted to the bucket — for the
    // verbatim copy that means rank 1 at sim 1.0 in BOTH
    assert(lshRows((0L, 1)) === exactRows((0L, 1)))
    assert(lshRows((0L, 1))._1 === 5L && lshRows((0L, 1))._3 === 1.0)
    // the index never invents a pair s28's universe lacks, and sims for
    // shared (query, corpus, chunk) rows are the identical doubles
    val exactAll = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getDouble(4))
      .toMap
    lsh.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getInt(2))
      exactAll.get(key).foreach(s => assert(s === r.getDouble(4), s"$key"))
    }
    // query 97 shares no content: its bucket holds no foreign chunk in
    // this corpus, so the index answer is EMPTY (s28 still fills k rows
    // with whatever the cross scores — the contract difference under test)
    assert(!lshRows.keySet.exists(_._1 == 97L))
    assert(exactRows.keySet.count(_._1 == 97L) === 3)

    // s33 — the dial executed: every candidate s32 ranked is still in
    // the wider probe pool, so per-rank sims can only improve, and a
    // recall-1000 query's answer is IDENTICAL at every budget incl. s28
    val mp = keyed(SimilarityOps.chunkMultiProbeTopK(docs, "doc_id",
      "text", chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3))
    assert(mp((0L, 1)) === lshRows((0L, 1)))
    lshRows.foreach { case ((qid, r), (_, _, s)) =>
      assert(mp.contains((qid, r)) && mp((qid, r))._3 >= s,
        s"rank $r of query $qid degraded under more probes")
    }
    // the s29 audit for query 0 is full recall here, so all three
    // rungs (s32, s33, s28) agree exactly on its answer
    val rec = SimilarityOps.chunkRetrievalLshRecall(docs, "doc_id",
        "text", 64, 48, 16, 97, 3)
      .filter(col("query_id") === 0L).head()
    if (rec.getAs[Long]("recall_milli") == 1000L)
      (1 to 3).foreach { r =>
        assert(mp.get((0L, r)) === exactRows.get((0L, r)), s"rank $r")
      }

    // s35 — the banded index executed: its candidates contain s33's
    // flip-1 set (pigeonhole via the Hamming<=3 ball), so per-rank sims
    // dominate s33's rung for rung, and the verbatim copy still leads
    val banded = keyed(SimilarityOps.chunkBandTopK(docs, "doc_id",
      "text", chunk = 64, stride = 48, dim = 16, bands = 4,
      queryMod = 97, k = 3))
    assert(banded((0L, 1)) === lshRows((0L, 1)))
    mp.foreach { case ((qid, r), (_, _, s)) =>
      assert(banded.contains((qid, r)) && banded((qid, r))._3 >= s,
        s"rank $r of query $qid degraded under the banded index")
    }
    // full-recall query: banded answer equals s28's exactly too
    if (rec.getAs[Long]("recall_milli") == 1000L)
      (1 to 3).foreach { r =>
        assert(banded.get((0L, r)) === exactRows.get((0L, r)), s"rank $r")
      }
  }

  test("chunkBandTopK at the wide dial (s38): verbatim copy leads, answers live inside the wide-exact universe, full-recall query equals exact") {
    import graft.operators.SimilarityOps
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, base),
      (5L, base),                 // verbatim copy — identical 32-bit sig,
                                  // so it agrees on BOTH 16-bit bands
      (6L, base + " extra tail"),
      (7L, "one two three four five six seven eight nine ten"),
      (97L, "wholly disjoint vocabulary speaking of other matters entirely")
    ).toDF("doc_id", "text")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getInt(2),
        r.getDouble(4))).toMap
    val wide = keyed(SimilarityOps.chunkBandTopK(docs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 32, bands = 2, queryMod = 97, k = 3))
    val exactWide = SimilarityOps.chunkRetrieval(docs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 32, queryMod = 97, k = 3)
    val exactRows = keyed(exactWide)
    // a verbatim copy shares the whole wide sign pattern, hence every
    // band — it can never be banded away, and it reranks to the top
    assert(wide((0L, 1))._1 === 5L && wide((0L, 1))._3 === 1.0)
    assert(wide((0L, 1)) === exactRows((0L, 1)))
    // the banded index never invents a pair the wide-exact universe
    // lacks, and shared (query, corpus, chunk) sims are identical
    // doubles (same hashed-BoW projection, same integer-exact cosine)
    val exactAll = exactWide.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getDouble(4))
      .toMap
    SimilarityOps.chunkBandTopK(docs, "doc_id", "text", 64, 48, 32, 2,
      97, 3).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getInt(2))
      exactAll.get(key).foreach(s => assert(s === r.getDouble(4), s"$key"))
    }
    // when the wide banded audit says query 0 has full recall, the
    // executed wide answer equals the wide-exact answer rank for rank
    val rec = SimilarityOps.chunkBandRecall(docs, "doc_id", "text",
        64, 48, 32, 2, 97, 3)
      .filter(col("query_id") === 0L).head()
    if (rec.getAs[Long]("recall_milli") == 1000L)
      (1 to 3).foreach { r =>
        assert(wide.get((0L, r)) === exactRows.get((0L, r)), s"rank $r")
      }
    // the disjoint-vocabulary query shares no 16-bit band with any
    // foreign chunk here: the honest index answer is empty
    assert(!wide.keySet.exists(_._1 == 97L))
  }

  test("chunkBandTopKServe: serving from pre-materialized artifacts equals the registered s38 row for row") {
    import graft.operators.SimilarityOps
    // a corpus with real band collisions: copies, near-copies, and a
    // larger shared-vocabulary pool so candidates flow through both
    // the band join and the vector-fetch rerank
    def txt(seed: Long): String =
      (0 until 16).map(j => s"w${(seed * 5 + j * 3) % 23}").mkString(" ")
    val docs = ((0L until 40L).map(i => (i, txt(i % 7))) ++
      Seq((97L, "unrelated words on some other subject entirely")))
      .toDF("doc_id", "text")
    val bandIdx = SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
      64, 48, 32, 2)
    val vecIdx = SimilarityOps.chunkVecIndex(docs, "doc_id", "text",
      64, 48, 32)
    val served = SimilarityOps.chunkBandTopKServe(bandIdx, vecIdx, docs,
      "doc_id", "text", dim = 32, bands = 2, queryMod = 7, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toSet
    val registered = SimilarityOps.chunkBandTopK(docs, "doc_id", "text",
      64, 48, 32, 2, 7, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toSet
    assert(served === registered)
    assert(served.nonEmpty) // an empty universe would prove nothing
  }

  test("chunkWindows: geometry, coverage, overlap, differential vs reference") {
    val chunk = 5; val stride = 3
    val rnd = new Random(7)
    val docs = (0L until 40L).map { i =>
      val n = rnd.nextInt(18)
      (i, (1 to n).map(j => s"w$j").mkString(" "))
    } ++ Seq((100L, ""), (101L, "solo"), (102L, (1 to 5).map("t" + _).mkString(" ")))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(TextFns.chunkWindows(col("text"), chunk, stride)).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.start_pos"),
        col("c.n_tokens"), col("c.chunk_text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1))
          .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSeq
      }
    docs.foreach { case (id, t) =>
      val ref = refChunks(t, chunk, stride)
      assert(got.getOrElse(id, Seq.empty) === ref, s"doc $id text='$t'")
      val n = if (t.trim.isEmpty) 0 else t.trim.split("\\s+").length
      if (ref.nonEmpty) {
        // full coverage: last chunk reaches token n; every consecutive pair
        // overlaps by chunk - stride (or less only at the tail)
        assert(ref.last._2 + ref.last._3 - 1 === n)
        ref.sliding(2).foreach {
          case Seq((_, s1, l1, _), (_, s2, _, _)) =>
            assert(s2 - s1 === stride)
            assert(s2 <= s1 + l1, "gap between consecutive chunks")
          case _ =>
        }
      } else assert(n === 0)
    }
  }
}
