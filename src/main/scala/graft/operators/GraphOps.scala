package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Host-graph operators over observed crawl links — the frontier-
  * prioritization signal a crawler derives from its own traffic (the idea
  * behind Heritrix's precedence providers and OPIC-style cash schedulers:
  * rank hosts by how much of the observed link mass flows into them, then
  * spend politeness budget top-down). Reference behavior: the crawl-stream
  * analyses in /root/reference/crawlstreams (report.py's per-host
  * summaries); the rank itself is the classic public PageRank recurrence
  * re-expressed Spark-first.
  *
  * Arithmetic discipline (the t11/t21 micro-nat rule carried to graphs):
  * ranks live in integer MICRO-units and every per-edge contribution is
  * computed with the two-term integer split
  *
  *   contrib = (rank div ow) * w  +  ((rank mod ow) * w) div ow
  *
  * — floor division only, no cross-row float reduction anywhere, so the
  * iteration is order-independent and IEEE-free: engine and oracle agree
  * bit-for-bit by construction. The split also sets the overflow envelope:
  * `(rank div ow) * w <= rank` (w <= ow termwise) is bounded by total mass
  * N·10^6, and `(rank mod ow) * w < ow^2`, so the math is int64-exact while
  * the heaviest host's total out-weight stays below sqrt(2^63) ~ 3.0e9
  * observed out-links — comfortably past any real host graph; past it,
  * swap the two products to DECIMAL(38,0) (the t35 recipe).
  */
object GraphOps {

  /** Initial per-node mass: 1.0 in micro-units. */
  val RankInitMicro = 1000000L
  /** Damping d = 85/100 as ONE shared rational (engine + oracle). */
  val DampNum = 85L
  val DampDen = 100L
  /** Teleport term (1-d)·init, floored once — 150000 micro. */
  val TeleportMicro: Long = (DampDen - DampNum) * RankInitMicro / DampDen

  /** Weighted integer PageRank over an observed-link edge stream.
    *
    * Input: one row per observed link (src, dst) — multi-edges become
    * weights. Self-loops are dropped (a link to the same host spends no
    * frontier budget). Output: (host, rank_micro) for every host that
    * appears on either side of an edge, ordered rank-desc then host.
    *
    * Semantics: fixed `iterations` of
    *   rank'(v) = teleport + d · Σ_{(u,v)} rank(u)·w(u,v)/out(u)
    * with the integer split above; dangling hosts (in-links only) keep
    * teleport + nothing and their mass LEAKS by design — a relative
    * priority signal does not need the stochastic-matrix patch, and
    * skipping the dangling redistribution keeps the iteration one
    * edges⋈ranks join instead of an extra global scalar pass. Fixed
    * iteration count (the public convention for ranking use) keeps the
    * loop plan-pinned and the oracle expressible as chained CTEs.
    *
    * Scale shape: the edge aggregate — the only corpus-sized shuffle —
    * happens ONCE and is checkpointed for reuse; each iteration is two
    * keyed shuffles (edges⋈ranks on src, contribution sum on dst) plus
    * the node left-join, all on (host, long) rows — no text, no driver
    * data, plans O(1) via the lineage pin (the d06 loop discipline). The
    * rank table is host-cardinality, orders of magnitude below the link
    * count at 100 TB.
    *
    * `reliable = true` swaps every lineage pin for a reliable
    * `checkpoint()` (requires `SparkContext.setCheckpointDir`): the
    * default `localCheckpoint` keeps pinned blocks on executors, so on a
    * real cluster ONE executor loss mid-iteration kills the whole
    * multi-hop job — at the 100 TB envelope pay the checkpoint-dir write
    * per iteration instead of the restart. Output is identical in both
    * modes ([[graft.operators]] ReliableCheckpointSpec pins it).
    */
  def hostRank(links: DataFrame, iterations: Int = 10,
      reliable: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations")
    val edges = DedupOps.pin(links
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w")), reliable)
    val outw = DedupOps.pin(
      edges.groupBy(col("src")).agg(sum(col("w")).as("ow")), reliable)
    val nodes = DedupOps.pin(edges.select(col("src").as("host"))
      .unionByName(edges.select(col("dst").as("host")))
      .distinct(), reliable)
    var ranks = nodes.withColumn("rank_micro", lit(RankInitMicro))
    // the initial ranks are a projection over the NODES pin (live for
    // every hop) — only pins created by THIS loop are ever released
    var prevRanksPin: DataFrame = null
    var i = 0
    while (i < iterations) {
      // TWO hops chained per pin (r17): the same rankHop arithmetic in
      // the same order, materialized every second hop — half the
      // checkpoint writes and driver job chains for a bounded (2-hop)
      // lineage depth per pin. Odd tails run the last hop alone.
      val once = rankHop(edges, outw, nodes, ranks)
      val fused = i + 1 < iterations
      ranks = DedupOps.pin(
        if (fused) rankHop(edges, outw, nodes, once) else once, reliable)
      // deterministic release of the superseded rank pin (r18, guide §5
      // — see connectedComponents): dead once the new pin materialized;
      // the final pin is never released (it IS the output)
      if (prevRanksPin != null) DedupOps.unpin(prevRanksPin)
      prevRanksPin = ranks
      i += (if (fused) 2 else 1)
    }
    ranks.orderBy(col("rank_micro").desc, col("host"))
  }

  /** One rank iteration of [[hostRank]] — the fixed per-hop plan:
    * edges⋈ranks on src, the outw divisor join on the same key, the
    * contribution sum keyed by dst, and the node left-join that applies
    * teleport + damping. Package-private so PlanShapeSpec pins the
    * per-iteration exchange count — g01 is the bench ceiling, and at
    * 100× scale one silent extra exchange per hop is 10 extra
    * corpus-key shuffles per run.
    */
  private[graft] def rankHop(edges: DataFrame, outw: DataFrame,
      nodes: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = edges
      .join(ranks.withColumnRenamed("host", "src"), Seq("src"))
      .join(outw, Seq("src"))
      .groupBy(col("dst").as("host"))
      .agg(sum(expr(
        "(rank_micro div ow) * w + ((rank_micro % ow) * w) div ow"))
        .as("c"))
    nodes
      .join(contrib, Seq("host"), "left")
      .select(col("host"), expr(
        s"CAST($TeleportMicro AS BIGINT) + " +
          s"($DampNum * coalesce(c, CAST(0 AS BIGINT))) div $DampDen")
        .as("rank_micro"))
  }

  /** The registry's synthesized host-link stream: every event is one
    * observed link from the referring host (event_id-derived) to the
    * landing host (user_id-derived) — 20 hosts, deterministic, and
    * recomputable in ANSI SQL so the oracle rebuilds the identical graph. */
  private[graft] def eventLinks(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d).select(
      concat(lit("host"), col("event_id") % 20, lit(".example.org"))
        .as("src"),
      concat(lit("host"), col("user_id") % 20, lit(".example.org"))
        .as("dst"))

  val HostRankIters = 10

  /** g03: mirror detection — sources (hosts/feeds) republishing the same
    * content, resolved to mirror CLUSTERS: build (source, digest) pairs,
    * drop boilerplate digests carried by more than `maxSources` sources
    * (a digest on hundreds of hosts is a template, not a mirror — and the
    * cap is what bounds the digest-keyed pair fan-out: without it one
    * mega-digest makes the self-join quadratic, the d08/d09 blow-up),
    * edge two sources when they share at least `minShared` distinct
    * contents, then the shared
    * [[graft.operators.DedupOps.connectedComponents]] closure. One row
    * per source: (source, cluster_id, is_canonical).
    *
    * Scale shape: text never shuffles (digest + source only); the pair
    * generator is digest-keyed and capped at C(maxSources,2) pairs per
    * digest; the component loop iterates over edge endpoints only —
    * source-cardinality rows, orders below the corpus.
    */
  private[graft] def mirrorSources(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String, minShared: Long,
      maxSources: Int): DataFrame = {
    require(minShared >= 1 && maxSources >= 2,
      s"minShared=$minShared maxSources=$maxSources")
    val dg = docs.select(col(srcCol).cast("string").as("source"),
        DedupOps.contentDigest(col(textCol)).as("digest"))
      .filter(col("digest").isNotNull) // null text is not shared content
      .distinct()
    val bounded = dg.join(
      dg.groupBy(col("digest")).agg(count(lit(1)).as("n_src"))
        .filter(col("n_src") <= maxSources)
        .select(col("digest")),
      Seq("digest"))
    val edges = bounded
      .join(bounded.select(col("digest"), col("source").as("source_b")),
        Seq("digest"))
      .filter(col("source") < col("source_b"))
      .groupBy(col("source"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("source").as("src"), col("source_b").as("dst"))
    val nodes = docs.select(col(srcCol).cast("string").as("id")).distinct()
    DedupOps.connectedComponents(nodes, edges)
      .select(col("id").as("source"), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("source"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_host_rank" -> ((s, d) =>
      hostRank(eventLinks(s, d), HostRankIters)),

    // The graph datasheet companion (the d28 idea for links): per-host
    // degree/weight profile — what a politeness scheduler sizes its
    // per-host queues from. One pass over the edge aggregate.
    "g02_host_degrees" -> ((s, d) => {
      val edges = eventLinks(s, d)
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w"))
      val out = edges.groupBy(col("src").as("host"))
        .agg(count(lit(1)).as("out_deg"), sum(col("w")).as("out_weight"))
      val in = edges.groupBy(col("dst").as("host"))
        .agg(count(lit(1)).as("in_deg"), sum(col("w")).as("in_weight"))
      out.join(in, Seq("host"), "full_outer")
        .select(col("host"),
          coalesce(col("out_deg"), lit(0L)).as("out_deg"),
          coalesce(col("out_weight"), lit(0L)).as("out_weight"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          coalesce(col("in_weight"), lit(0L)).as("in_weight"))
        .orderBy(col("host"))
    }),

    // Mirror clusters over a corpus with a deterministic re-sourced %3
    // slice (driver docs are all-unique across sources — the d28 lesson:
    // without the synthesized mirrors the edge set is empty forever).
    // Each mirror.srcX shares its 8–9 copied digests with srcX → one
    // 2-cluster per source pair at minShared 5.
    "g03_mirror_sources" -> ((s, d) => {
      val docs = graft.Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("source", concat(lit("mirror."), col("source")))
      mirrorSources(docs.unionByName(mirrored), "doc_id", "text",
        "source", minShared = 5L, maxSources = 16)
    }))

  /** Shared CTE prologue rebuilding the identical graph in DuckDB.
    * Casts: count(*)/sum() land in HUGEINT — pin BIGINT at every
    * aggregate (the standing check.py gotcha). */
  private val graphCtes: String =
    s"""ev AS (
       |  SELECT 'host' || (event_id % 20) || '.example.org' AS src,
       |         'host' || (user_id % 20) || '.example.org' AS dst
       |  FROM events),
       |edges AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
       |  FROM ev WHERE src <> dst GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
       |         FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS host FROM edges
       |          UNION SELECT dst AS host FROM edges)""".stripMargin

  /** The rank oracle: the SAME integer recurrence as [[hostRank]], one
    * chained CTE per iteration (fixed iteration count is what makes the
    * oracle a plain SQL expression — no recursive aggregate needed). */
  private def hostRankSql(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""r$k AS (
         |  SELECT n.host,
         |         CAST($TeleportMicro + ($DampNum * COALESCE(s.c, 0)) // $DampDen
         |              AS BIGINT) AS rank_micro
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS host,
         |           CAST(sum((r.rank_micro // o.ow) * e.w
         |                    + ((r.rank_micro % o.ow) * e.w) // o.ow)
         |                AS BIGINT) AS c
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.host = e.src
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) s ON s.host = n.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |r0 AS (SELECT host, CAST($RankInitMicro AS BIGINT) AS rank_micro
       |       FROM nodes),
       |$iters
       |SELECT host, rank_micro FROM r$iterations
       |ORDER BY rank_micro DESC, host""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "g01_host_rank" -> hostRankSql(HostRankIters),
    // g03: same slice, digest bound, edge threshold; the closure is the
    // d06 recursive-reach recipe over source names.
    "g03_mirror_sources" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, 'mirror.' || source, text
        |  FROM documents WHERE doc_id % 3 = 0),
        |dg AS (
        |  SELECT DISTINCT source, md5(text) AS digest
        |  FROM corpus WHERE text IS NOT NULL),
        |keepd AS (
        |  SELECT digest FROM dg GROUP BY digest HAVING count(*) <= 16),
        |dgf AS (SELECT dg.source, dg.digest FROM dg
        |        JOIN keepd ON keepd.digest = dg.digest),
        |e AS (
        |  SELECT a.source AS src, b.source AS dst
        |  FROM dgf a JOIN dgf b
        |    ON a.digest = b.digest AND a.source < b.source
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |nodes AS (SELECT DISTINCT source FROM corpus),
        |eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, label) AS (
        |  SELECT source, source FROM nodes
        |  UNION
        |  SELECT eb.dst, r.label FROM reach r JOIN eb ON eb.src = r.id)
        |SELECT id AS source, min(label) AS cluster_id,
        |       (id = min(label)) AS is_canonical
        |FROM reach GROUP BY id ORDER BY source""".stripMargin,
    "g02_host_degrees" ->
      s"""WITH $graphCtes,
         |o AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_deg,
         |             CAST(sum(w) AS BIGINT) AS out_weight
         |      FROM edges GROUP BY 1),
         |i AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_deg,
         |             CAST(sum(w) AS BIGINT) AS in_weight
         |      FROM edges GROUP BY 1)
         |SELECT n.host,
         |       COALESCE(o.out_deg, 0) AS out_deg,
         |       COALESCE(o.out_weight, 0) AS out_weight,
         |       COALESCE(i.in_deg, 0) AS in_deg,
         |       COALESCE(i.in_weight, 0) AS in_weight
         |FROM nodes n
         |LEFT JOIN o ON o.host = n.host
         |LEFT JOIN i ON i.host = n.host
         |ORDER BY n.host""".stripMargin)
}
