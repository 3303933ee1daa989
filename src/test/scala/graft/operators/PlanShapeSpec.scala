package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regression pins for the operators whose scale story
  * depends on a specific plan: shuffle-exchange counts stay at (or under)
  * the designed number, intended broadcasts stay broadcasts, and top-k
  * stays TakeOrderedAndProject. A refactor that silently degrades one of
  * these (a broadcast falling back to a shuffle join, a per-row operator
  * growing an exchange) fails here long before a bench shows it.
  *
  * Counts are on the pre-execution plan (AQE's initial plan), which is
  * exactly what the design controls; AQE may only merge/elide at runtime.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Shuffle exchanges only — BroadcastExchange is counted separately, and
    * ReusedExchange is excluded (it re-reads an existing exchange's output;
    * counting it would let a reused broadcast trip a shuffle bound, or a
    * tightened bound mask a real added shuffle).
    */
  private def shuffles(df: DataFrame): Int =
    "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(planOf(df)).size

  /** Plans under a disabled auto-broadcast threshold: toy-scale inputs
    * otherwise broadcast everywhere, hiding the exchange shape the same
    * plan takes at corpus scale. Explicit broadcast() hints survive.
    */
  private def withoutAutoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "ten nine eight seven six five four three two one")
  ).toDF("doc_id", "text")

  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)), (3L, Array(0.0f, 0.9f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("per-row operators plan zero exchanges") {
    assert(shuffles(SimilarityOps.quantizeInt8(emb)) === 0)
    val meta = Seq((1L, 640, 480)).toDF("media_id", "width", "height")
    assert(shuffles(Multimodal.resizePlan(meta, 64)) === 0)
    // m07/m08/m10: the per-clip reductions live inside the decode pass —
    // a per-clip window or rollup reappearing here means a shuffle came
    // back (the m08 lesson, pinned for all three)
    val media = Seq(Multimodal.MediaRow(1L, "video", Array[Byte]())).toDS()
    assert(shuffles(Multimodal.shotSegments(media, 1, 1000L)) === 0)
    assert(shuffles(Multimodal.silenceTrim(media, 4, 1000L).toDF()) === 0)
    assert(shuffles(Multimodal.audioFingerprint(media, 4).toDF()) === 0)
    assert(shuffles(Multimodal.audioFullBits(media, 4).toDF()) === 0)
  }

  test("exact dedup is exactly one digest-keyed exchange") {
    assert(shuffles(DedupOps.exactDedup(docs, "doc_id", "text")) === 1)
  }

  test("ivf assign: centroids broadcast, one vec-keyed exchange") {
    val p = planOf(SimilarityOps.ivfAssign(emb, emb.filter(col("vec_id") < 2)))
    assert(p.contains("BroadcastExchange"), p)
    assert(shuffles(SimilarityOps.ivfAssign(emb, emb.filter(col("vec_id") < 2))) === 1)
  }

  private lazy val emb4 = Seq(
    (0L, Array(1.0f, -1.0f, 0.5f, 0.25f)),
    (1L, Array(-1.0f, 1.0f, 0.5f, -0.25f)),
    (2L, Array(0.9f, 0.1f, -0.2f, 0.7f)),
    (3L, Array(0.0f, 0.9f, 0.1f, -0.6f)),
    (4L, Array(0.4f, -0.3f, 0.8f, 0.1f)),
    (5L, Array(-0.2f, 0.6f, -0.9f, 0.3f))
  ).toDF("vec_id", "embedding")

  test("two-stage rerank: exactly two pair loops (candidates + baseline)") {
    // the s14 two-consumer lesson, pinned: both cut depths ride ONE
    // candidate pass as columns, so a third pair loop appearing means the
    // candidate subtree grew a second consumer again
    val df = SimilarityOps.rerankRecall(emb4,
      emb4.filter(col("vec_id") < 2), k = 2, overfetch = 2, dim = 4)
    val p = planOf(df)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 2, p)
  }

  test("overfetch sweep: no pair loop beyond s24's two plus the grid") {
    val df = SimilarityOps.overfetchCurve(emb4,
      emb4.filter(col("vec_id") < 2), k = 2, overfetches = Seq(1, 2),
      dim = 4)
    val p = planOf(df)
    // candidates + exact baseline + the |Q|×|configs| grid scaffold
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 3, p)
  }

  test("brute-force knn: corpus side never shuffles before scoring") {
    val df = SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 2), 2)
    val p = planOf(df)
    assert(p.contains("BroadcastExchange"), p)
    // the only shuffle is the per-query ranking window's repartition
    assert(shuffles(df) <= 1, p)
  }

  test("bm25: stats are one broadcast scalar row; top-k is a heap, not a sort") {
    val df = RelevanceOps.bm25TopK(docs, "doc_id", "text", Seq("alpha"), 2)
    val p = planOf(df)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // single-row stats aggregate: partial + one SinglePartition exchange
    assert(shuffles(df) <= 1, p)
  }

  test("decontamination: benchmark shingles broadcast onto the corpus") {
    val df = DedupOps.decontaminationCounts(
      docs.filter(col("doc_id") > 0), docs.filter(col("doc_id") === 0),
      "doc_id", "text", 3)
    val p = planOf(df)
    assert(p.contains("BroadcastExchange"), p)
    // benchmark distinct + final per-doc rollup; the corpus side's
    // shingles must reach the join without an exchange of their own
    assert(shuffles(df) <= 2, p)
  }

  test("unigram xent: tf/vocab aggregates bounded, count table broadcast") {
    val df = RelevanceOps.unigramCrossEntropy(docs, "doc_id", "text", 1.0, 2.0)
    val p = planOf(df)
    assert(p.contains("BroadcastExchange"), p)
    // (doc,term) tf agg + vocab agg + scalar total + final doc rollup
    assert(shuffles(df) <= 4, p)
  }

  test("correlated subqueries decorrelate to joins, not per-row re-execution") {
    val df = graft.SparkEntry.queries("q32_subqueries")(
      spark, "/root/testdata/sf0.001")
    val p = planOf(df)
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("lateral limit-1 decorrelates to a ranking window + join") {
    val df = graft.SparkEntry.queries("q33_lateral")(
      spark, "/root/testdata/sf0.001")
    val p = planOf(df)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("minhash candidates: only the band-keyed self-join moves data") {
    val df = DedupOps.minhashCandidates(docs, "doc_id", "text")
    // two join-side exchanges on (band, band_key) + the pair distinct
    assert(shuffles(df) <= 3, planOf(df))
  }

  // ---- iterative-family loop bodies: at 100× scale an extra exchange PER
  // HOP is the difference between hours and days, so the per-iteration
  // plan is pinned exactly, with auto-broadcast off (checkpointed loop
  // state at corpus scale never broadcasts).

  test("cc hop (d06/d10 loop body): 3 exchanges exactly, equi-join only") {
    withoutAutoBroadcast {
      val edges = Seq((0L, 1L), (2L, 3L)).toDF("src", "dst")
      val both = edges.unionByName(
          edges.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      val labels = both.groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("__mn"))
        .select(col("id"), least(col("id"), col("__mn")).as("label"))
        .localCheckpoint()
      val hop = DedupOps.ccHop(both, labels)
      val p = planOf(hop)
      // 2 equi-join side exchanges + 1 min-label aggregation exchange; the
      // convergence flag rides in-band (a 4th exchange would mean a
      // convergence re-join crept back in)
      assert(shuffles(hop) === 3, p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("cc jump (pointer-halving step): 2 exchanges exactly, equi-join only") {
    withoutAutoBroadcast {
      val labels = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 2L))
        .toDF("id", "label").localCheckpoint()
      val jump = DedupOps.ccJump(labels)
      val p = planOf(jump)
      // one side hashed on `label`, the other on the renamed `id` —
      // no aggregate, no third exchange
      assert(shuffles(jump) === 2, p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("rank hop (g01 loop body): 5 exchanges exactly, equi-join only") {
    withoutAutoBroadcast {
      val links = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"))
        .toDF("src", "dst")
      val edges = links.filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .localCheckpoint()
      val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
        .localCheckpoint()
      val nodes = edges.select(col("src").as("host"))
        .unionByName(edges.select(col("dst").as("host"))).distinct()
        .localCheckpoint()
      val ranks = nodes
        .withColumn("rank_micro", lit(GraphOps.RankInitMicro))
        .localCheckpoint()
      val hop = GraphOps.rankHop(edges, outw, nodes, ranks)
      val p = planOf(hop)
      // edges⋈ranks on src (2 side exchanges) + the outw divisor side (1;
      // the join output is already src-partitioned) + the dst-keyed
      // contribution sum (1) + the nodes side of the left-join (1 — the
      // contrib side arrives host-partitioned from its own aggregate,
      // the dst→host alias propagates). A 6th exchange means a hop
      // subtree stopped reusing its partitioning; every input must
      // arrive as a checkpointed scan (LogicalRDD), never be recomputed
      // per hop.
      assert(shuffles(hop) === 5, p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("kmeans round (s12 loop body): refine 3 exchanges + broadcast, rebuild 1") {
    withoutAutoBroadcast {
      val e = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
        (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)))
        .toDF("vec_id", "embedding").localCheckpoint()
      val cent = e.filter(col("vec_id") < 2).localCheckpoint()
      val refine = SimilarityOps.centroidRefine(e, cent)
      val p = planOf(refine)
      // the centroid table rides an EXPLICIT broadcast (hint survives the
      // disabled threshold); assignment never shuffles the corpus vectors
      assert(p.contains("BroadcastExchange"), p)
      // corpus join side + per-vector argmax agg + (centroid, dim) means
      assert(shuffles(refine) === 3, p)
      val rebuild = SimilarityOps.centroidRebuild(refine.localCheckpoint())
      // one model-sized (k rows × dims) aggregation exchange
      assert(shuffles(rebuild) === 1, planOf(rebuild))
    }
  }

  test("source mix / pack bins: one keyed exchange + the presentation sort") {
    val mix = graft.SparkEntry.queries("t12_source_mix")(
      spark, "/root/testdata/sf0.001")
    // source-keyed aggregate (map-side partials) + the output orderBy
    assert(shuffles(mix) <= 2, planOf(mix))
    val pack = graft.SparkEntry.queries("t13_pack_bins")(
      spark, "/root/testdata/sf0.001")
    val p = planOf(pack)
    // r8 two-level prefix sum: the ROW window must be partitioned by
    // (source, chunk) — never by source alone, which would serialize a
    // hot source through one task — while the small chunk-offset cascade
    // keeps its per-source window. Both partition-spec brackets are
    // pinned; no window may be global.
    assert("Window \\[[^\\]]*\\], \\[source#\\d+, chunk#\\d+"
      .r.findFirstIn(p).nonEmpty, p)
    assert("Window \\[[^\\]]*\\], \\[source#\\d+\\]".r.findFirstIn(p).nonEmpty, p)
    assert(shuffles(pack) <= 5, p)
  }

  test("line dedup (d11/d13/d14): partial-agg first occurrence, no digest window, no text on accounting exchanges") {
    // exchanges appear at preparation (EnsureRequirements), and AQE wraps
    // the prepared tree out of collect's reach — probe with AQE off, on a
    // DEDICATED child session so the conf flip is invisible to any other
    // suite sharing the JVM (ADVICE r7); the inputs must be re-bound to
    // that session or plans still execute under the parent's conf.
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    val pdocs = probe.createDataFrame(docs.rdd, docs.schema)
    for (sep <- Seq("\n", "\n\n")) {
      val df = DedupOps.lineDedupStats(pdocs, "doc_id", "text", sep)
      val p = planOf(df)
      // the de-skew pin (r8): first occurrence is a partial-aggregated
      // groupBy, NEVER min().over(Window.partitionBy(digest)) — a window
      // funnels every instance of the hottest line into one un-splittable
      // task (AQE splits skewed joins, not windows), and SkewBench
      // measured the instance⋈min-table join-back alternative slower AND
      // still hot (NOTES r8) — so no instance-sized stream may shuffle
      // at all: n_lines is a per-row scalar, n_kept rolls up from the
      // collapsed min table.
      assert(!p.contains("Window"), p)
      assert(p.contains("partial_min"), p)
      // every shuffle's input schema must be narrow — the 100TB
      // guarantee that only small tuples cross the wire, never text
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.child.output.map(_.name)
      }
      assert(exchanges.nonEmpty)
      for (cols <- exchanges)
        assert(!cols.exists(n => n == "line" || n == "text"),
          s"sep=${sep.length}: exchange carries text columns: $cols")
      // full corpus-scale exchange budget (RDD-backed input → no stats →
      // nothing broadcasts): digest agg (collapsed to one row per
      // distinct line), kept-per-doc rollup, docs side of the final left
      // join. Every exchange is uniform-hash; there is no skewable key.
      assert(shuffles(df) <= 3, p)
    }
    // reconstruction (d14): kept text rides INSIDE the min struct through
    // the same partial-aggregated digest exchange — no window, and no
    // instance-stream join-back at all
    val collapse = DedupOps.lineCollapse(pdocs, "doc_id", "text")
    val cp = planOf(collapse)
    assert(!cp.contains("Window"), cp)
    assert(cp.contains("partial_min"), cp)
    assert(shuffles(collapse) <= 3, cp)
  }

  test("incremental dedup (d17): text never shuffles, corpus digests pre-collapsed") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pdocs = probe.createDataFrame(docs.rdd, docs.schema)
    val df = DedupOps.incrementalDedup(
      pdocs.filter(col("doc_id") % 2 === 0),
      pdocs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    for (cols <- exchanges)
      assert(!cols.contains("text"), s"exchange carries text: $cols")
    // corpus side must partial-aggregate its digests BEFORE the probe
    // join (one row per distinct body per map partition — the steady-state
    // guarantee that a 100 TB corpus contributes digests, not volume)
    assert(planOf(df).contains("partial_"), planOf(df))
    // batch (id, digest) exchange + its min rollup reuse one partitioning;
    // corpus digest agg is the third — nothing else may shuffle
    assert(shuffles(df) <= 3, planOf(df))
  }

  test("incremental near-dup (d18): band keys are the only corpus/batch meeting, no text on exchanges") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pdocs = probe.createDataFrame(docs.rdd, docs.schema)
    val df = DedupOps.incrementalNearDup(
      pdocs.filter(col("doc_id") % 2 === 0),
      pdocs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 0.5)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    // the band join moves (id, band, band_key); the verify joins move
    // shingle ARRAYS for candidates only — raw text never crosses a wire
    for (cols <- exchanges)
      assert(!cols.contains("text"), s"exchange carries text: $cols")
    assert(exchanges.exists(_.contains("band_key")),
      s"no band-keyed exchange found: $exchanges")
  }

  test("ingest triage (d20): no text on any exchange, survivor semi-join is band-side") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pdocs = probe.createDataFrame(docs.rdd, docs.schema)
    val df = DedupOps.ingestTriage(
      pdocs.filter(col("doc_id") % 2 === 0),
      pdocs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 0.5)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    // the whole composition inherits d17+d18's wire discipline: digests,
    // ids, band keys, and candidate shingle arrays move — raw text never
    for (cols <- exchanges)
      assert(!cols.contains("text"), s"exchange carries text: $cols")
    assert(exchanges.exists(_.contains("band_key")),
      s"no band-keyed exchange found: $exchanges")
  }

  test("prototypicality prune (s16): broadcast assignment, cell window, no corpus self-join") {
    val df = SimilarityOps.prototypicalityPrune(emb,
      emb.filter(col("vec_id") < 2), 1, 5)
    val p = planOf(df)
    // the assignment is ivfAssign's broadcast-centroids aggregate — the
    // corpus itself never shuffles before its one vec-keyed exchange.
    // rank and cell count plan as two Window nodes (different frames
    // cannot merge) but share the SAME centroid partitioning: the ≤2
    // shuffle bound proves the second window rides the first's exchange
    assert(p.contains("BroadcastExchange"), p)
    assert(shuffles(df) <= 2, p)
  }

  test("semantic dedup (d15): self-join sides share one assignment exchange") {
    // AQE performs exchange reuse at stage materialization, invisible in
    // the printed initial plan — probe with AQE off on a dedicated child
    // session (the d11 recipe) and auto-broadcast disabled so the
    // corpus-scale exchange shape is the one planned
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pemb = probe.createDataFrame(emb.rdd, emb.schema)
    val fates = SimilarityOps.semanticDedup(pemb,
      pemb.filter(col("vec_id") < 2), 0.9)
    val p = planOf(fates)
    // the a/b sides of the within-cell pair join are the SAME
    // assigned-corpus subtree hashed by the same centroid key — at
    // corpus scale (no broadcasts) Catalyst must bridge them with
    // ReusedExchange, or the full corpus assignment would run twice
    assert(p.contains("ReusedExchange"), p)
  }

  test("clean corpus (t07): canonical-survivor rollup, no digest window, no doc-volume join") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.SparkEntry.queries("t07_clean_corpus")(
      probe, "/root/testdata/sf0.001")
    val p = planOf(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
    // digest agg (collapsed; survivor's (lang, source) rides the min
    // struct) + kept (lang, source) rollup + totals rollup + the
    // low-cardinality group join / presentation sort — the doc stream
    // itself is never re-shuffled by the skewed digest
    assert(shuffles(df) <= 5, p)
  }

  test("url dedup (d23): one canonical-keyed exchange, partial min, no window") {
    val caps = Seq((1L, "2024-01-01 00:00:00", "http://A.example.org/x/"))
      .toDF("event_id", "ts_s", "url")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val df = DedupOps.urlDedup(caps, "url", "ts", "event_id")
    val p = planOf(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min") || p.contains("partial"), p)
    assert(shuffles(df) === 1, p)
  }

  test("bpe pairs (t28): two rollup exchanges, top-k is a heap not a sort") {
    val df = RelevanceOps.bpePairStats(docs, "text", 10)
    val p = planOf(df)
    // word-tf rollup + pair rollup; the limit plans TakeOrderedAndProject
    assert(shuffles(df) === 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }

  test("sign-quant recall (s20): queries broadcast, corpus never shuffles before ranking") {
    withoutAutoBroadcast {
      val df = SimilarityOps.signQuantRecall(emb, emb.filter(col("vec_id") < 2),
        k = 2, dim = 2)
      val p = planOf(df)
      assert(p.contains("BroadcastNestedLoopJoin"), p)
      // rank windows (approx + exact baseline) and the hit rollup shuffle
      // ids only — the packed-code projection happens scan-side
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("recursive cte (q34): recursion plans equi-joins, never a cartesian") {
    val df = graft.SparkEntry.queries("q34_recursive_cte")(
      spark, "/root/testdata/sf0.001")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("4-gram xent (t37): exactly one forced broadcast — the (T,V) row; no text on exchanges") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pdocs = probe.createDataFrame(docs.rdd, docs.schema)
    val df = RelevanceOps.interpolatedFourgramXent(pdocs, "doc_id", "text")
    val p = planOf(df)
    // the t22 rule at the widest rung: all eight count tables join
    // UN-hinted (Heaps-unbounded at corpus scale), so with auto-broadcast
    // off the ONLY broadcast left is the forced 1-row (T,V) scalar
    assert("BroadcastExchange".r.findAllIn(p).size === 1, p)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    for (cols <- exchanges)
      assert(!cols.contains("text"), s"exchange carries text: $cols")
  }

  test("audio clusters (m11): payload never shuffles, bands are the only pair generator") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import probe.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", Array[Byte]()),
      Multimodal.MediaRow(2L, "audio", Array[Byte]())).toDS()
    // the index build is scan-side end to end: decode, windowing, the
    // delta fold, and the band explode all live inside the one pass —
    // zero exchanges before a consumer joins it
    assert(shuffles(Multimodal.audioBandIndex(media, 4)) === 0)
    // the edge generator (the SAME join shape audioNearDupDetector
    // probes stream-static): band-keyed hash join, no payload on any
    // exchange. Pinned on the join subtree because audioClusters'
    // component loop materializes its edge input internally (the d06
    // driver-scalar-per-iteration design), hiding upstream exchanges
    // from the final plan.
    val bands = Multimodal.audioBitBands(
      Multimodal.audioFullBits(media, 4).toDF())
    val edges = bands.join(Multimodal.audioBandIndex(media, 4),
      Seq("n_windows", "band", "band_key"))
    val exchanges = edges.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    for (cols <- exchanges)
      assert(!cols.contains("payload"), s"exchange carries payload: $cols")
    assert(exchanges.forall(_.contains("band_key")),
      s"non-band-keyed exchange found: $exchanges")
    // and the clusters output itself still never moves payload bytes
    val full = Multimodal.audioClusters(media, windowFrames = 4)
    val fullEx = full.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    for (cols <- fullEx)
      assert(!cols.contains("payload"), s"exchange carries payload: $cols")
  }

  test("leakage by source (t36): corpus text dies before the distinct exchange") {
    val probe = spark.newSession()
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    probe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pdocs = probe.createDataFrame(docs.rdd, docs.schema)
      .withColumn("source", when(col("doc_id") < 2, "web").otherwise("news"))
    val df = DedupOps.evalLeakageBySource(
      pdocs.filter(col("doc_id") % 2 === 0),
      pdocs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", "source", 3)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    for (cols <- exchanges)
      assert(!cols.contains("text"), s"exchange carries text: $cols")
    // the bench set and the (source, sh) leak table stay broadcast even
    // with auto-broadcast off — they are forced, bench-bounded sides
    assert(planOf(df).contains("BroadcastExchange"), planOf(df))
  }

  test("refined ivf-pq (s27): corpus index joins by key, no cartesian anywhere") {
    withoutAutoBroadcast {
      val df = SimilarityOps.ivfPqRerankRecall(emb,
        emb.filter(col("vec_id") < 2), emb.filter(col("vec_id") < 2),
        emb.filter(col("vec_id") < 2), k = 2, nprobe = 1, overfetch = 1,
        halfDim = 1)
      val p = planOf(df)
      // every query-side table (route, LUTs, candidates, baseline) is a
      // forced broadcast; the corpus's code/cell tables meet them through
      // hash joins — a CartesianProduct would mean a corpus self-pairing
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("BroadcastExchange"), p)
    }
  }

  /** A parquet-backed copy of [[docs]]: LocalRelation inputs constant-fold
    * per-row projections out of the plan entirely (ConvertToLocalRelation),
    * hiding the expression sites these pins count.
    */
  private lazy val fileDocs: DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("planshape").toString
    docs.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("winnowing (t42/d30): fingerprint expression at exactly one plan site, zero exchanges") {
    // Fused winnow_fps expression, consumed via explode_outer + null
    // filter: a bare explode would let InferFiltersFromGenerate push a
    // size() filter below the projection that re-evaluates the expression
    // per row (under the pre-native staged form that regression measured
    // 169 s vs 4.6 s at sf0.01 — same trap, same pin).
    val t42ish = DedupOps.winnowFps(fileDocs, "doc_id", "text", 3, 4)
      .select(col("doc_id"), explode_outer(col("sel")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
    val p = planOf(t42ish)
    assert(shuffles(t42ish) === 0)
    assert("winnow_fps".r.findAllIn(p).size === 1,
      s"fingerprint expression evaluated at more than one plan site:\n$p")
  }

  test("winnow pairs (d30): fp rows are the only exchanges, one per aggregate role") {
    withoutAutoBroadcast {
      val df = DedupOps.winnowPairs(fileDocs, "doc_id", "text", 3, 4,
        minShared = 1L, maxDocsPerFp = 8)
      val p = planOf(df)
      // fingerprints computed once per consumer subtree (cap count +
      // probe + pair side), never inside a pushed-down filter
      assert(!"Filter [^\\n]*winnow_fps".r.findFirstIn(p).isDefined,
        s"winnow expression inlined into a filter:\n$p")
      // exchanges carry (doc_id, n_fp, fp)-shaped rows only — the text
      // column must die before every exchange
      assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
    }
  }

  test("executed index path (s32): sign-key equi-join only, never the s28 cross") {
    withoutAutoBroadcast {
      val df = SimilarityOps.chunkRetrievalLshTopK(fileDocs, "doc_id",
        "text", chunk = 8, stride = 6, dim = 16, queryMod = 2, k = 3)
      val p = planOf(df)
      // the whole point of s32 vs s28: candidate generation must be a
      // hash join on the sign key — any nested-loop/cartesian means the
      // brute-force cross crept back into the deployed path
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("executed probe/banded paths (s33/s35/s38): equi-joins only, NO forced broadcast on query-derived sides") {
    withoutAutoBroadcast {
      // the query side is a 1/queryMod corpus sample — linear in corpus
      // scale — so a forced broadcast() hint (which bypasses size
      // checks) would OOM the driver exactly at the scale these plans
      // exist for. With auto-broadcast disabled, hints are the ONLY
      // thing that can leave a BroadcastExchange in the plan: its
      // absence here proves strategy stays with estimates + AQE, and
      // the joins must still be hash/sort-merge equi-joins, never a
      // nested-loop fallback (r13 ADVICE pin).
      val probed = SimilarityOps.chunkMultiProbeTopK(fileDocs, "doc_id",
        "text", chunk = 8, stride = 6, dim = 16, queryMod = 2, k = 3)
      val banded = SimilarityOps.chunkBandTopK(fileDocs, "doc_id",
        "text", chunk = 8, stride = 6, dim = 16, bands = 4,
        queryMod = 2, k = 3)
      val bandedWide = SimilarityOps.chunkBandTopK(fileDocs, "doc_id",
        "text", chunk = 8, stride = 6, dim = 32, bands = 2,
        queryMod = 2, k = 3)
      Seq("s33" -> probed, "s35" -> banded, "s38" -> bandedWide)
        .foreach { case (name, df) =>
          val p = planOf(df)
          assert(!p.contains("BroadcastExchange"),
            s"$name forces a broadcast on a corpus-proportional side:\n$p")
          assert(!p.contains("CartesianProduct"), s"$name:\n$p")
          assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
        }
    }
  }

  test("keep-one cut (d33): canonical pick is an aggregate, no per-hash window, no text on exchanges") {
    withoutAutoBroadcast {
      val df = DedupOps.substringCutKeepFirst(fileDocs, "doc_id", "text", 4)
      val p = planOf(df)
      // the canonical (min (doc, pos) per hash) must stay a hash-keyed
      // partial aggregate — a Window over instance rows keyed by h is
      // the skew hazard the d08 rule exists for
      assert(!"Window [^\\n]*\\[h".r.findFirstIn(p).isDefined,
        s"per-hash window crept into the canonical pick:\n$p")
      // everything before the one id-keyed text join moves int/hash rows
      val textExchanges = "Exchange [^\\n]*text".r.findAllIn(p).size
      assert(textExchanges <= 1, s"text on $textExchanges exchanges:\n$p")
    }
  }
}
