package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At-ingest pipeline operators over MemoryStream micro-batches: exact
  * dedup keyed on the content digest with watermark-bounded state, and the
  * stateless quality gate.
  */
class PipelineStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def doc(ts: String, text: String) =
    (java.sql.Timestamp.valueOf(ts), text)

  test("streaming dedup: same-batch and cross-batch dups within watermark drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = PipelineStreams.dedupByDigest(
      in.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    try {
      in.addData(
        doc("2021-01-16 17:00:00", "alpha body"),
        doc("2021-01-16 17:01:00", "alpha body"), // same-batch dup
        doc("2021-01-16 17:02:00", "beta body"))
      q.processAllAvailable()
      in.addData( // next batch, still inside the 10-minute watermark
        doc("2021-01-16 17:03:00", "alpha body"), // cross-batch dup
        doc("2021-01-16 17:04:00", "gamma body"))
      q.processAllAvailable()
      val texts = spark.table("sd").select("text").as[String].collect().sorted
      assert(texts === Array("alpha body", "beta body", "gamma body"))
      // exactly one survivor per digest (which copy survives is
      // partition-order-arbitrary by contract — not asserted)
      val perDigest = spark.table("sd").groupBy("digest").count()
        .select("count").as[Long].collect()
      assert(perDigest.length === 3 && perDigest.forall(_ === 1L))
      // the output digest matches the batch d01 definition, so the batch
      // backstop recognizes at-ingest survivors
      val expected = spark.sql("SELECT md5(CAST('alpha body' AS BINARY))")
        .as[String].collect().head
      assert(spark.table("sd").filter(col("text") === "alpha body")
        .select("digest").as[String].collect().head === expected)
    } finally q.stop()
  }

  test("corpus anti-dedup: already-ingested digests drop regardless of age, " +
    "then the watermark pass catches within-horizon copies") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    // the historical corpus: d01's digest index shape (digest only)
    val corpus = Seq("old stored body", "another stored body").toDF("text")
      .select(graft.operators.DedupOps.contentDigest(col("text")).as("digest"))
    val cleaned = PipelineStreams.dedupByDigest(
      PipelineStreams.dedupAgainstCorpus(
        in.toDF().toDF("ts", "text"), corpus, "text"),
      "ts", "text", "10 minutes")
    val q = cleaned.writeStream.format("memory").queryName("cad")
      .outputMode("append").start()
    try {
      in.addData(
        doc("2021-01-16 17:00:00", "old stored body"),  // historical dup → drop
        doc("2021-01-16 17:01:00", "fresh body"),
        doc("2021-01-16 17:02:00", "fresh body"))       // in-stream dup → drop
      q.processAllAvailable()
      val texts = spark.table("cad").select("text").as[String].collect()
      assert(texts.sorted === Array("fresh body"))
      // identical to batch d17 on the same split: the kept set is exactly
      // the docs d17 labels new_unique
      val batch = Seq((0L, "old stored body"), (1L, "fresh body"),
        (2L, "fresh body")).toDF("doc_id", "text")
      val corpusDocs = Seq((100L, "old stored body"),
        (101L, "another stored body")).toDF("doc_id", "text")
      val d17new = graft.operators.DedupOps
        .incrementalDedup(corpusDocs, batch, "doc_id", "text")
        .filter(col("status") === "new_unique")
        .join(batch, Seq("doc_id")).select("text").as[String].collect()
      assert(texts.sorted === d17new.sorted)
    } finally q.stop()
  }

  test("dup rate by window: stacked aggregation emits exact per-window stats") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val rates = PipelineStreams.dupRateByWindow(
      in.toDF().toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
    val q = rates.writeStream.format("memory").queryName("dr")
      .outputMode("append").start()
    try {
      in.addData(
        doc("2021-01-16 17:00:00", "alpha body"),
        doc("2021-01-16 17:01:00", "alpha body"), // dup
        doc("2021-01-16 17:02:00", "beta body"),
        doc("2021-01-16 17:03:00", "alpha body")) // dup
      q.processAllAvailable()
      // append mode: nothing emits until the watermark closes the window
      in.addData(doc("2021-01-16 17:30:00", "closer"))
      q.processAllAvailable()
      val rows = spark.table("dr")
        .filter(col("window_start") === "2021-01-16 17:00:00").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("n_docs") === 4L)
      assert(rows.head.getAs[Long]("n_distinct") === 2L)
      assert(rows.head.getAs[Double]("dup_frac") === 0.5)
    } finally q.stop()
  }

  test("corpus near-dup detector: flags reworded re-crawls, equals batch d18 matches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep green forest to hide from every hunter nearby"
    val corpus = Seq(
      (100L, base),
      (101L, "completely different text about spark catalyst optimizer " +
        "rules and tungsten codegen stages with partitions and joins"))
      .toDF("doc_id", "text")
    val thr = 0.5
    val corpusBands = DedupOps.bandIndex(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleWords = 3)
    val corpusShingles = DedupOps.shingleIndex(corpus, "doc_id", "text",
      shingleWords = 3)
    val arrivals = Seq(
      (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L,
        base.replace("lazy", "sleepy")),          // reworded re-crawl
      (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L, base), // exact
      (java.sql.Timestamp.valueOf("2021-01-16 17:02:00"), 2L,
        "yet another unrelated document mentioning kafka topics offsets " +
          "consumers producers brokers partitions replication and logs"),
      (java.sql.Timestamp.valueOf("2021-01-16 17:03:00"), 3L, "too short"))
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val flags = PipelineStreams.nearDupAgainstCorpus(
      in.toDF().toDF("ts", "doc_id", "text"), corpusBands, corpusShingles,
      "ts", "doc_id", "text", thr, "10 minutes", "10 minutes",
      k = 32, bands = 8, shingleWords = 3)
    val q = flags.writeStream.format("memory").queryName("ndc")
      .outputMode("append").start()
    try {
      arrivals.foreach { d => in.addData(d); q.processAllAvailable() }
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 99L,
        "watermark sentinel advancing past the arrival window"))
      q.processAllAvailable()
      val got = spark.table("ndc").filter(col("doc_id") < 99)
        .select(col("doc_id"), col("dup_of"), col("n_matches"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // the batch d18 pass over the same split is the ledger this
      // detector must agree with: same matched set, same attribution
      val batch = DedupOps.incrementalNearDup(corpus,
          arrivals.toDF("ts", "doc_id", "text"), "doc_id", "text", thr,
          k = 32, bands = 8)
        .filter(col("dup_of").isNotNull)
        .select(col("doc_id"), col("dup_of"), col("n_matches"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got === batch)
      assert(got.map(_._1).toSeq === Seq(0L, 1L), "only the re-crawls flag")
      assert(got.forall(_._2 === 100L), "attribution is the base doc")
    } finally q.stop()
  }

  test("corpus near-dup gate: drops the re-crawls the batch ledger flags, " +
    "keeps novel and shingle-less docs") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep green forest to hide from every hunter nearby"
    val corpus = Seq(
      (100L, base),
      (101L, "completely different text about spark catalyst optimizer " +
        "rules and tungsten codegen stages with partitions and joins"))
      .toDF("doc_id", "text")
    val thr = 0.5
    val corpusBands = DedupOps.bandIndex(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleWords = 3)
    val corpusShingles = DedupOps.shingleIndex(corpus, "doc_id", "text",
      shingleWords = 3)
    val arrivals = Seq(
      (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L,
        base.replace("lazy", "sleepy")),          // reworded re-crawl: DROP
      (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L, base), // DROP
      (java.sql.Timestamp.valueOf("2021-01-16 17:02:00"), 2L,
        "yet another unrelated document mentioning kafka topics offsets " +
          "consumers producers brokers partitions replication and logs"),
      (java.sql.Timestamp.valueOf("2021-01-16 17:03:00"), 3L, "too short"))
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val kept = PipelineStreams.nearDupGate(
      in.toDF().toDF("ts", "doc_id", "text"), corpusBands, corpusShingles,
      "ts", "doc_id", "text", thr, "10 minutes", "10 minutes",
      k = 32, bands = 8, shingleWords = 3)
    assert(kept.columns === Array("window_start", "doc_id", "text"))
    val q = kept.writeStream.format("memory").queryName("ndg")
      .outputMode("append").start()
    try {
      arrivals.foreach { d => in.addData(d); q.processAllAvailable() }
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 99L,
        "watermark sentinel advancing past the arrival window"))
      q.processAllAvailable()
      val got = spark.table("ndg").filter(col("doc_id") < 99)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().sortBy(_._1)
      // the gate's kept set is exactly the complement of the batch d18
      // ledger's matched set over the same arrivals
      val flaggedByBatch = DedupOps.incrementalNearDup(corpus,
          arrivals.toDF("ts", "doc_id", "text"), "doc_id", "text", thr,
          k = 32, bands = 8)
        .filter(col("dup_of").isNotNull)
        .select("doc_id").as[Long].collect().toSet
      val expected = arrivals.collect {
        case (_, id, text) if !flaggedByBatch(id) => (id, text)
      }.sortBy(_._1)
      assert(got === expected)
      assert(got.map(_._1).toSeq === Seq(2L, 3L),
        "novel doc kept, shingle-less doc kept, both re-crawls dropped")
    } finally q.stop()
  }

  test("xent gate: corpus-typical text keeps, shuffled text drops, OOV " +
    "backs off, short docs keep; in-corpus chain equals t23's p") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.RelevanceOps
    val corpusRows = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox sleeps under the old oak tree every day"),
      (102L, "a lazy dog jumps over the quick brown fox every single day"))
    val corpus = corpusRows.toDF("doc_id", "text")
    val lm = RelevanceOps.bigramLm(corpus, "text")
    val arrivals = Seq(
      (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L,
        "the quick brown fox jumps over the lazy dog"),   // typical: KEEP
      (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L,
        "dog the over quick lazy jumps brown fox the"),    // shuffled: DROP
      (java.sql.Timestamp.valueOf("2021-01-16 17:02:00"), 2L,
        "zebra xylophone quantum nebula"),                 // pure OOV: DROP
      (java.sql.Timestamp.valueOf("2021-01-16 17:03:00"), 3L, "word")) // KEEP
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val maxXent = 2.0 // probed: typical 0.65, shuffled 3.58, OOV 5.32
    val kept = PipelineStreams.xentGate(
      in.toDF().toDF("ts", "doc_id", "text"), lm, "ts", "doc_id", "text",
      maxXent, "10 minutes", "10 minutes")
    val q = kept.writeStream.format("memory").queryName("xg")
      .outputMode("append").start()
    try {
      arrivals.foreach { d => in.addData(d); q.processAllAvailable() }
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 99L,
        "watermark sentinel advancing past the arrival window"))
      q.processAllAvailable()
      val got = spark.table("xg").filter(col("doc_id") < 99)
        .select(col("doc_id"), col("xent"))
        .collect().map(r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      // batch recomputation with the SAME shared pieces is the expected
      // decision for every arrival
      val expected = arrivals.map { case (_, id, text) =>
        val one = Seq((id, text)).toDF("doc_id", "text")
        val inst = one
          .withColumn("toks__", graft.functions.TextFns.tokens(col("text")))
          .select(col("doc_id"), explode_outer(when(size(col("toks__")) >= 2,
            expr(RelevanceOps.bigramPairsExpr("toks__")))).as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
          .join(lm.c12, Seq("w1", "w2"), "left")
          .join(lm.c1, Seq("w1"), "left")
          .join(lm.c2, Seq("w2"), "left")
          .crossJoin(broadcast(lm.tot))
          .withColumn("cm", when(col("w1").isNotNull,
            RelevanceOps.interpInstanceCostMicro(col("c12"), col("c1"),
              col("c2"), col("t"), col("v"))))
          .agg(sum(col("cm")).as("nll"), count(col("w1")).as("n"))
          .head()
        val n = inst.getLong(1)
        id -> (if (n == 0) None
        else Some(math.rint(inst.getLong(0).toDouble / 1e6 / n * 1e4) / 1e4))
      }.toMap
      val keepExpected = expected.filter { case (_, x) =>
        x.isEmpty || x.get <= maxXent }
      assert(got.keySet === keepExpected.keySet)
      for ((id, x) <- got) assert(x === expected(id), s"doc $id xent")
      assert(got.keySet === Set(0L, 3L),
        "typical + unscorable keep; shuffled + OOV drop")
      // the OOV-complete cost reduces to t23's p on in-corpus instances:
      // score the corpus docs themselves through the instance chain and
      // compare against interpolatedBigramXent (tf-rounding granularity
      // only — assert within 1e-4 + per-instance slack)
      val t23 = RelevanceOps.interpolatedBigramXent(corpus, "doc_id", "text")
        .select(col("doc_id"), col("xent")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val instAll = corpus
        .withColumn("toks__", graft.functions.TextFns.tokens(col("text")))
        .select(col("doc_id"),
          explode(expr(RelevanceOps.bigramPairsExpr("toks__"))).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .join(lm.c12, Seq("w1", "w2"), "left")
        .join(lm.c1, Seq("w1"), "left")
        .join(lm.c2, Seq("w2"), "left")
        .crossJoin(broadcast(lm.tot))
        .withColumn("cm", RelevanceOps.interpInstanceCostMicro(col("c12"),
          col("c1"), col("c2"), col("t"), col("v")))
        .groupBy(col("doc_id"))
        .agg((sum(col("cm")) / 1e6 / count(lit(1))).as("x"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, x) <- instAll)
        assert(math.abs(x - t23(id)) < 1e-4 + 1e-6,
          s"doc $id instance-chain xent $x vs t23 ${t23(id)}")
    } finally q.stop()
  }

  test("ingest chain: every drop reason exercised, one keeper survives " +
    "the composed gates") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{DedupOps, RelevanceOps}
    def mk(words: Seq[String]) = words.mkString(" ")
    // two 60-word corpus docs (gopher needs >=50 words, >=2 stopwords)
    val wA = Seq("the") ++ (1 to 28).map(i => s"alpha$i") ++
      Seq("and") ++ (29 to 58).map(i => s"alpha$i")
    val wB = Seq("the") ++ (1 to 28).map(i => s"beta$i") ++
      Seq("and") ++ (29 to 58).map(i => s"beta$i")
    val corpus = Seq((100L, mk(wA)), (101L, mk(wB))).toDF("doc_id", "text")
    val lm = RelevanceOps.bigramLm(corpus, "text")
    val digests = corpus
      .select(DedupOps.contentDigest(col("text")).as("digest"))
    val bandsIdx = DedupOps.bandIndex(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleWords = 3)
    val shinglesIdx = DedupOps.shingleIndex(corpus, "doc_id", "text",
      shingleWords = 3)
    // keeper: A's first half + B's second half — every bigram (incl. both
    // junctions: "alpha28 and" from A, "and beta29" from B) is in-corpus,
    // so xent is corpus-typical; shingle overlap with either corpus doc
    // is ~0.3, far under the 0.8 near-dup gate
    val good = mk(wA.take(30) ++ wB.drop(30))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val arrivals = Seq(
      (ts("2021-01-16 17:00:00"), 0L, good),            // KEEP
      (ts("2021-01-16 17:01:00"), 1L, "too short"),     // quality drop
      (ts("2021-01-16 17:02:00"), 2L,                   // 30 words: gopher
        mk(Seq("the", "and") ++ (1 to 28).map(i => s"gamma$i"))),
      (ts("2021-01-16 17:03:00"), 3L, good),            // horizon exact dup
      (ts("2021-01-16 17:04:00"), 4L, mk(wA)),          // corpus exact dup
      (ts("2021-01-16 17:05:00"), 5L,                   // reworded near-dup
        mk(wA.updated(5, "sneaky"))),
      (ts("2021-01-16 17:06:00"), 6L,                   // shuffled: xent
        mk(good.split(" ").reverse.toSeq)))
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val kept = PipelineStreams.ingestChain(
      in.toDF().toDF("ts", "doc_id", "text"), digests, bandsIdx,
      shinglesIdx, lm, "ts", "doc_id", "text", nearDupThreshold = 0.8,
      maxXent = 2.0, "10 minutes", "10 minutes",
      k = 32, bands = 8, shingleWords = 3)
    assert(kept.columns === Array("window_start", "doc_id", "text", "xent"))
    val q = kept.writeStream.format("memory").queryName("ic")
      .outputMode("append").start()
    try {
      arrivals.foreach { d => in.addData(d); q.processAllAvailable() }
      in.addData((ts("2021-01-16 17:40:00"), 99L,
        mk(Seq("the", "and") ++ (1 to 58).map(i => s"omega$i"))))
      q.processAllAvailable()
      val got = spark.table("ic").filter(col("doc_id") < 99)
        .select(col("doc_id"), col("text"), col("xent")).collect()
      assert(got.length === 1, s"kept ${got.length} docs")
      // which of the two identical-text copies (0 or 3) survives the
      // horizon dedup is partition-order-arbitrary by contract
      assert(Set(0L, 3L).contains(got.head.getLong(0)))
      assert(got.head.getString(1) === good)
      val xent = got.head.getDouble(2)
      assert(xent > 0 && xent <= 2.0, s"keeper xent $xent")
    } finally q.stop()
  }

  test("ingest chain: sharded shingle artifact takes the shard-keyed " +
    "join and keeps batch identity") {
    // guards the auto-detect branch: a corpusShingles carrying the
    // DedupOps.shingleShard partition column must join on (shard, cid)
    // with the stream side computing the SAME shard expression — any
    // drift between writer layout and reader key would silently lose
    // near-dup verification (candidates join to nothing) and emit dups
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{DedupOps, RelevanceOps}
    def mk(words: Seq[String]) = words.mkString(" ")
    val wA = Seq("the") ++ (1 to 28).map(i => s"alpha$i") ++
      Seq("and") ++ (29 to 58).map(i => s"alpha$i")
    val corpus = Seq((100L, mk(wA))).toDF("doc_id", "text")
    val lm = RelevanceOps.bigramLm(corpus, "text")
    val digests = corpus
      .select(DedupOps.contentDigest(col("text")).as("digest"))
    val bandsIdx = DedupOps.bandIndex(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleWords = 3)
    val shinglesSharded = DedupOps.shingleIndex(corpus, "doc_id", "text",
        shingleWords = 3)
      .withColumn("shard", DedupOps.shingleShard(col("cid")))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val kept = PipelineStreams.ingestChain(
      in.toDF().toDF("ts", "doc_id", "text"), digests, bandsIdx,
      shinglesSharded, lm, "ts", "doc_id", "text",
      nearDupThreshold = 0.8, maxXent = 20.0, "10 minutes", "10 minutes",
      k = 32, bands = 8, shingleWords = 3)
    val q = kept.writeStream.format("memory").queryName("ics")
      .outputMode("append").start()
    try {
      // a reworded near-dup of the corpus doc MUST be verified through
      // the sharded join and dropped; a genuinely fresh doc keeps
      in.addData((ts("2021-01-16 17:00:00"), 0L,
        mk(wA.updated(5, "sneaky"))))
      q.processAllAvailable()
      in.addData((ts("2021-01-16 17:01:00"), 1L,
        mk(Seq("the", "and") ++ (1 to 58).map(i => s"delta$i"))))
      q.processAllAvailable()
      in.addData((ts("2021-01-16 17:40:00"), 99L,
        mk(Seq("the", "and") ++ (1 to 58).map(i => s"omega$i"))))
      q.processAllAvailable()
      val got = spark.table("ics").filter(col("doc_id") < 99)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted
      assert(got.toSeq === Seq(1L),
        s"sharded-join chain kept ${got.toSeq}; the near-dup (0) must " +
          "drop through the shard-keyed verify and the fresh doc (1) keep")
    } finally q.stop()
  }

  test("ingest chain: both stateful stages survive a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{DedupOps, RelevanceOps}
    def mk(words: Seq[String]) = words.mkString(" ")
    val wA = Seq("the") ++ (1 to 28).map(i => s"alpha$i") ++
      Seq("and") ++ (29 to 58).map(i => s"alpha$i")
    val wB = Seq("the") ++ (1 to 28).map(i => s"beta$i") ++
      Seq("and") ++ (29 to 58).map(i => s"beta$i")
    val corpus = Seq((100L, mk(wA)), (101L, mk(wB))).toDF("doc_id", "text")
    val lm = RelevanceOps.bigramLm(corpus, "text")
    val digests = corpus
      .select(DedupOps.contentDigest(col("text")).as("digest"))
    val bandsIdx = DedupOps.bandIndex(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleWords = 3)
    val shinglesIdx = DedupOps.shingleIndex(corpus, "doc_id", "text",
      shingleWords = 3)
    val good1 = mk(wA.take(30) ++ wB.drop(30))
    val good2 = mk(wB.take(30) ++ wA.drop(30))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val kept = PipelineStreams.ingestChain(
      in.toDF().toDF("ts", "doc_id", "text"), digests, bandsIdx,
      shinglesIdx, lm, "ts", "doc_id", "text", nearDupThreshold = 0.8,
      maxXent = 2.0, "10 minutes", "10 minutes",
      k = 32, bands = 8, shingleWords = 3)
    val ckpt = java.nio.file.Files.createTempDirectory("ic-ckpt").toString
    val buf = new scala.collection.concurrent.TrieMap[
      Long, Array[org.apache.spark.sql.Row]]
    def sink = kept.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => { buf.put(id, b.collect()); () })
      .option("checkpointLocation", ckpt)
      .outputMode("append")
    // before restart: the keeper enters BOTH stateful stages (its digest
    // into the dedup store, its text+counters into the windowed agg) and
    // a same-text copy is deduped
    val q1 = sink.start()
    try {
      in.addData((ts("2021-01-16 17:00:00"), 0L, good1))
      q1.processAllAvailable()
      in.addData((ts("2021-01-16 17:01:00"), 1L, good1))
      q1.processAllAvailable()
      assert(buf.values.flatten.isEmpty, "window must still be open")
    } finally q1.stop()
    // after restart: a further copy must STILL dedup (digest state
    // restored), a fresh doc must still pass, and the window must emit
    // the pre-restart keeper's text (agg state restored)
    val q2 = sink.start()
    try {
      in.addData((ts("2021-01-16 17:02:00"), 2L, good1))
      q2.processAllAvailable()
      in.addData((ts("2021-01-16 17:03:00"), 3L, good2))
      q2.processAllAvailable()
      in.addData((ts("2021-01-16 17:40:00"), 99L,
        mk(Seq("the", "and") ++ (1 to 58).map(i => s"omega$i"))))
      q2.processAllAvailable()
      val got = buf.values.flatten.toArray
        .filter(_.getLong(1) < 99)
        .map(r => r.getLong(1) -> r.getString(2)).sortBy(_._1)
      assert(got.map(_._1).toSeq === Seq(0L, 3L),
        s"expected the pre-restart keeper and the fresh doc, got ${got.toSeq}")
      assert(got.toMap === Map(0L -> good1, 3L -> good2))
    } finally q2.stop()
  }

  test("gate funnel: per-window drop accounting conserves and matches " +
    "the batch gate bits") {
    implicit val sqlCtx = spark.sqlContext
    def mk(prefix: String, n: Int) =
      (Seq("the") ++ (1 to n - 2).map(i => s"$prefix$i") ++ Seq("and"))
        .mkString(" ")
    val good1 = mk("alpha", 60)
    val good2 = mk("beta", 60)
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val funnel = PipelineStreams.funnelByWindow(
      in.toDF().toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
    val q = funnel.writeStream.format("memory").queryName("fw")
      .outputMode("append").start()
    try {
      in.addData(
        doc("2021-01-16 17:00:00", good1),
        doc("2021-01-16 17:01:00", good1),           // window dup
        doc("2021-01-16 17:02:00", good1),           // window dup
        doc("2021-01-16 17:03:00", good2),
        doc("2021-01-16 17:04:00", "too short"),     // quality drop
        doc("2021-01-16 17:05:00", "1234567890 0987654321 #$%"), // quality
        doc("2021-01-16 17:06:00", mk("gamma", 30)), // 30 words: gopher
        doc("2021-01-16 17:07:00", null))            // null text: quality
      q.processAllAvailable()
      in.addData(doc("2021-01-16 17:30:00", "watermark closer"))
      q.processAllAvailable()
      val r = spark.table("fw")
        .filter(col("window_start") === "2021-01-16 17:00:00").collect()
      assert(r.length === 1)
      val row = r.head
      // the null-text doc MUST land in a bucket (quality — the gate
      // drops null text), not vanish from the conservation equation
      assert(row.getAs[Long]("n_arrived") === 8L)
      assert(row.getAs[Long]("n_quality_drop") === 3L)
      assert(row.getAs[Long]("n_gopher_drop") === 1L)
      assert(row.getAs[Long]("n_dup_drop") === 2L)
      assert(row.getAs[Long]("n_kept") === 2L)
      // conservation: every arrival is accounted exactly once
      assert(row.getAs[Long]("n_arrived") ===
        row.getAs[Long]("n_quality_drop") + row.getAs[Long]("n_gopher_drop") +
          row.getAs[Long]("n_dup_drop") + row.getAs[Long]("n_kept"))
    } finally q.stop()
  }

  test("quality gate: short/junk docs filtered, real docs kept") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val gated = PipelineStreams.qualityGate(in.toDF().toDF("ts", "text"), "text")
    val q = gated.writeStream.format("memory").queryName("qg")
      .outputMode("append").start()
    try {
      in.addData(
        doc("2021-01-16 17:00:00", "too short"),                // len < 20
        doc("2021-01-16 17:01:00", "1234567890 0987654321 #$%"), // alpha < 0.5
        doc("2021-01-16 17:02:00",
          "a perfectly reasonable document with enough letters"))
      q.processAllAvailable()
      val kept = spark.table("qg").select("text").as[String].collect()
      assert(kept === Array(
        "a perfectly reasonable document with enough letters"))
    } finally q.stop()
  }

  test("gopher gate: rule-violating docs filtered, schema preserved, " +
    "IDENTICAL to the batch t17 keep bit") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val gated = PipelineStreams.gopherGate(in.toDF().toDF("ts", "text"), "text")
    assert(gated.columns === Array("ts", "text")) // working cols dropped
    val q = gated.writeStream.format("memory").queryName("gg")
      .outputMode("append").start()
    // passer: 60 words, mean len 3.75, 30 stopwords (GopherRulesSpec docA)
    val good = "the data and model " * 15
    val raw = Seq(
      "far too few words",                          // n_words < 50
      good,                                         // keeps
      "data model quick train " * 15)               // no stopwords
    try {
      in.addData(raw.zipWithIndex.map { case (t, i) =>
        doc(s"2021-01-16 17:0$i:00", t) }: _*)
      q.processAllAvailable()
      val kept = spark.table("gg").select("text").as[String].collect()
      assert(kept === Array(good))
      // batch-stream consistency: the same rows through the t17 keep bit
      val batch = graft.operators.PipelineQueries
        .gopherKeep(raw.toDF("text"), "text").as[String].collect()
      assert(kept.sorted === batch.sorted)
    } finally q.stop()
  }

  test("blocklist gate: blocked hosts and their subdomains drop, " +
    "IDENTICAL to the batch t20 match") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val gated = PipelineStreams.blocklistGate(in.toDF().toDF("ts", "host"), "host")
    assert(gated.columns === Array("ts", "host"))
    val q = gated.writeStream.format("memory").queryName("blg")
      .outputMode("append").start()
    val raw = Seq(
      "host3.example.org",       // exact blocklist entry
      "sub1.host3.example.org",  // subdomain inherits the block
      "host4.example.org",       // kept
      "notbad.example.net",      // suffix of an entry WITHOUT the dot — kept
      "a.bad.example.net")       // subdomain of an entry
    try {
      in.addData(raw.zipWithIndex.map { case (h, i) =>
        doc(s"2021-01-16 17:0$i:00", h) }: _*)
      q.processAllAvailable()
      val kept = spark.table("blg").select("host").as[String].collect()
      assert(kept.sorted === Array("host4.example.org", "notbad.example.net"))
      // batch-stream consistency through the shared match expression
      val batch = raw.toDF("host")
        .filter(graft.operators.PipelineQueries.blockedBy(col("host")).isNull)
        .as[String].collect()
      assert(kept.sorted === batch.sorted)
    } finally q.stop()
  }

  test("c4 line gate: per-row cleaning IDENTICAL to batch t29's rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val gated = PipelineStreams.c4LineGate(in.toDF().toDF("ts", "text"), "text")
    assert(gated.columns === Array("ts", "text"))
    val q = gated.writeStream.format("memory").queryName("c4g")
      .outputMode("append").start()
    val raw = Seq(
      "{ x }\nA good long sentence stays here.\n\nEnable JavaScript to continue please\nshort.",
      "menu\nnav",
      "Two keepers live here today.\n   Indented but long enough to stay.")
    try {
      in.addData(raw.zipWithIndex.map { case (t, i) =>
        doc(s"2021-01-16 17:0$i:00", t) }: _*)
      q.processAllAvailable()
      val kept = spark.table("c4g").select("text").as[String].collect().sorted
      val batch = graft.operators.PipelineQueries
        .c4LineStats(raw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text")
        .select("clean_text").as[String].collect().sorted
      assert(kept === batch)
      assert(kept.contains("")) // all-dropped doc emits empty text
    } finally q.stop()
  }

  test("url dedup gate: one capture per canonical URL in-horizon, " +
    "canonicalization IDENTICAL to batch d23's rule list") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val gated = PipelineStreams.urlDedupGate(
      in.toDF().toDF("ts", "url"), "ts", "url", "10 minutes")
    assert(gated.columns === Array("ts", "url", "canon_url"))
    val q = gated.writeStream.format("memory").queryName("udg")
      .outputMode("append").start()
    val raw = Seq(
      "http://A.example.org/x/",      // three spellings,
      "http://a.example.org:80/x",    //   one canonical
      "http://a.example.org/x#frag",
      "http://b.example.org/y?utm_source=feed", // distinct canonical
      "http://b.example.org/y?q=1")   // content query — NOT the same as ^
    try {
      in.addData(raw.zipWithIndex.map { case (u, i) =>
        doc(s"2021-01-16 17:0$i:00", u) }: _*)
      q.processAllAvailable()
      val kept = spark.table("udg").select("canon_url").as[String]
        .collect().sorted
      assert(kept === Array(
        "http://a.example.org/x",
        "http://b.example.org/y",
        "http://b.example.org/y?q=1"))
      // the gate's canonical column equals the batch expression per row
      val batch = raw.toDF("url")
        .select(graft.operators.DedupOps.canonicalUrl(col("url")))
        .as[String].collect().distinct.sorted
      assert(kept === batch)
    } finally q.stop()
  }

  test("mix gate: per-source sampling equals the batch t21 keep set; " +
    "uncalibrated sources keep everything") {
    implicit val sqlCtx = spark.sqlContext
    // corpus: web dominates (n=90), news mid (n=9), rare tiny (n=1 →
    // sqrt-law rate caps at 1). Rates derived ONCE, batch-side.
    val corpus = ((0L until 90L).map(i => (i, "web")) ++
      (90L until 99L).map(i => (i, "news")) :+ (99L, "rare"))
      .toDF("doc_id", "source")
    val rates = graft.operators.PipelineQueries
      .temperatureRates(corpus, "source")
    val thresh = rates.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thresh("rare") === (1L << 24)) // capped: keep-all
    assert(thresh("web") < thresh("news") && thresh("news") < (1L << 24))

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val gated = PipelineStreams.mixGate(
      in.toDF().toDF("ts", "doc_id", "source"), rates, "doc_id", "source")
    assert(gated.columns === Array("ts", "doc_id", "source"))
    val q = gated.writeStream.format("memory").queryName("mxg")
      .outputMode("append").start()
    val rows = (0L until 100L).map(i =>
      (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), i,
        if (i < 90) "web" else if (i < 99) "news" else "rare")) ++
      Seq((java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1000L, "unseen"))
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val kept = spark.table("mxg").select("doc_id").as[Long].collect().sorted
      // identical to the batch application of the same rates
      val batch = corpus.union(Seq((1000L, "unseen")).toDF("doc_id", "source"))
        .join(rates.select("source", "thresh"), Seq("source"), "left")
        .filter(graft.operators.PipelineQueries.draw24(col("doc_id")) <
          coalesce(col("thresh"), lit(1L << 24)))
        .select("doc_id").as[Long].collect().sorted
      assert(kept === batch)
      // policy pins: rare (rate 1) and unseen (no rate) fully kept;
      // web genuinely sampled — kept some, dropped some
      assert(kept.contains(99L) && kept.contains(1000L))
      val webKept = kept.count(_ < 90L)
      assert(webKept > 0 && webKept < 90, s"webKept=$webKept")
    } finally q.stop()
  }

  test("streaming image dup detector: flags exactly the batch ledger's " +
    "radius-3 pairs, multiplicity bounded by the band count") {
    import graft.functions.MediaCodecs
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      MediaRow(1L, "image", MediaCodecs.buildBmp(16, 16, 5L)),
      MediaRow(2L, "image", MediaCodecs.buildBmp(16, 16, 99L)))
    val index = Multimodal.imageBandIndex(corpus.toDS())
    val arrivals = Seq(
      MediaRow(10L, "image", MediaCodecs.buildBmp(16, 16, 5L)), // re-upload
      MediaRow(11L, "image", MediaCodecs.buildBmp(16, 16, 42L)),
      MediaRow(12L, "audio", MediaCodecs.buildWav(8000, 10, 7L))) // not image
    val in = MemoryStream[MediaRow]
    val q = PipelineStreams.imageDupDetector(in.toDS(), index)
      .writeStream.format("memory").queryName("idd")
      .outputMode("append").start()
    try {
      in.addData(arrivals: _*)
      q.processAllAvailable()
      val got = spark.table("idd")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // batch ledger: full cross Hamming over the same hashes
      val sh = Multimodal.imageHash(arrivals.toDS()).collect()
        .map(r => r.media_id -> (r.ha, r.hb)).toMap
      val ch = Multimodal.imageHash(corpus.toDS()).collect()
        .map(r => r.media_id -> (r.ha, r.hb)).toMap
      val expected = for {
        (sid, (sa, sb)) <- sh.toSeq; (cid, (ca, cb)) <- ch.toSeq
        ham = java.lang.Long.bitCount(sa ^ ca) +
          java.lang.Long.bitCount(sb ^ cb)
        if ham <= 3
      } yield (sid, cid, ham)
      assert(got.toSet === expected.toSet)
      assert(expected.exists(p => p._1 == 10L && p._2 == 1L && p._3 == 0),
        "the exact re-upload must be in the ledger at Hamming 0")
      // stateless multiplicity: at most one flag per shared band
      got.groupBy(t => (t._1, t._2)).foreach { case (k, v) =>
        assert(v.length <= 4, s"$k flagged ${v.length} times")
      }
    } finally q.stop()
  }

  test("streaming redaction: stateless, and IDENTICAL to the batch t15 chain") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val clean = PipelineStreams.redactPii(in.toDF().toDF("ts", "text"), "text")
    val q = clean.writeStream.format("memory").queryName("rp")
      .outputMode("append").start()
    val raw = Seq(
      "Contact support@example.com or call 555-123-4567.",
      "Server 10.0.0.254 served invoice 1234567890.",
      "no pii here at all")
    try {
      in.addData(raw.zipWithIndex.map { case (t, i) =>
        doc(s"2021-01-16 17:0$i:00", t) }: _*)
      q.processAllAvailable()
      val got = spark.table("rp").orderBy("ts").select("text")
        .as[String].collect()
      assert(got === Array(
        "Contact <EMAIL> or call <PHONE>.",
        "Server <IP> served invoice <ID>.",
        "no pii here at all"))
      // batch-stream consistency: the same rows through the t15 column
      val batch = raw.toDF("text")
        .select(graft.operators.PipelineQueries.piiRedact(col("text")))
        .as[String].collect()
      assert(got.sorted === batch.sorted)
    } finally q.stop()
  }

  test("streaming line dedup: first arrival per distinct trimmed line wins") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val lines = PipelineStreams.dedupLinesByDigest(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
      "10 minutes")
    val q = lines.writeStream.format("memory").queryName("ld")
      .outputMode("append").start()
    try {
      in.addData(
        (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L,
          "unique opening line\nAll rights reserved.\n\n   "),
        (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L,
          "  All rights reserved.  \nfresh second body"))
      q.processAllAvailable()
      in.addData( // next batch, inside the horizon: boilerplate still dropped
        (java.sql.Timestamp.valueOf("2021-01-16 17:02:00"), 2L,
          "All rights reserved.\nthird body text"))
      q.processAllAvailable()
      val got = spark.table("ld").select("line").as[String].collect().sorted
      // one "All rights reserved." total (doc 1's indented copy trims to
      // the same digest); blank/whitespace lines never emitted
      assert(got === Array("All rights reserved.", "fresh second body",
        "third body text", "unique opening line"))
      // digest canonicalization matches the batch d11 pass (md5 of the
      // trimmed line) — the backstop recognizes streaming survivors
      val expected = spark.sql(
        "SELECT md5(CAST('All rights reserved.' AS BINARY))")
        .as[String].collect().head
      assert(spark.table("ld")
        .filter(col("line") === "All rights reserved.")
        .select("ldigest").as[String].collect() === Array(expected))
    } finally q.stop()
  }

  test("streaming reassembly: rebuilt documents equal the batch d14 pass") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    // doc 2 is ENTIRELY earlier lines — the one contract difference:
    // batch d14 reports its "" row, streaming emits no row for it
    val docs = Seq(
      (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L,
        "alpha line\nshared boilerplate\n\n  beta line  "),
      (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L,
        "shared boilerplate\ngamma line"),
      (java.sql.Timestamp.valueOf("2021-01-16 17:02:00"), 2L,
        "shared boilerplate\nalpha line"))
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val rebuilt = PipelineStreams.rebuildDocs(
      PipelineStreams.dedupLinesByDigest(
        in.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", "10 minutes"),
      "ts", "doc_id", "10 minutes")
    val q = rebuilt.writeStream.format("memory").queryName("rb")
      .outputMode("append").start()
    try {
      // one doc per micro-batch, in doc_id order: cross-batch arrival
      // makes "first arrival" deterministic and equal to the batch
      // min-(doc_id, line_no) rule, so d14 identity is well-defined
      docs.foreach { d => in.addData(d); q.processAllAvailable() }
      // advance the watermark past the docs' window so the rebuild emits
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:25:00"), 99L,
        "watermark sentinel"))
      q.processAllAvailable()
      val got = spark.table("rb").filter(col("doc_id") < 99)
        .select(col("doc_id"), col("clean_text"), col("n_kept"))
        .as[(Long, String, Long)].collect().sortBy(_._1)
      val batch = DedupOps.lineCollapse(
          docs.toDF("ts", "doc_id", "text"), "doc_id", "text")
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("clean_text"), col("n_kept"))
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(got === batch)
      assert(got.map(_._1).toSeq === Seq(0L, 1L)) // doc 2: no row (all dups)
      assert(got(0)._2 === "alpha line\nshared boilerplate\nbeta line")
    } finally q.stop()
  }

  test("session reassembly: a doc split across a tumbling boundary rebuilds whole") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    // doc 7 arrives as TWO chunks 60s apart straddling the 17:05 tumbling
    // boundary; doc 8 is a control single-row doc in one window
    val chunks = Seq(
      (java.sql.Timestamp.valueOf("2021-01-16 17:04:30"), 7L,
        "first line\nsecond line"),
      (java.sql.Timestamp.valueOf("2021-01-16 17:05:30"), 7L,
        "third line\nfourth line"),
      (java.sql.Timestamp.valueOf("2021-01-16 17:06:00"), 8L,
        "control alpha\ncontrol beta"))
    def lines(in: MemoryStream[(java.sql.Timestamp, Long, String)]) =
      PipelineStreams.dedupLinesByDigest(
        in.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", "10 minutes")
    val sentinel = (java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 99L,
      "watermark sentinel")

    // tumbling 5-minute windows: the straddling doc emits TWO partials —
    // the documented caveat this variant exists to close
    val inT = MemoryStream[(java.sql.Timestamp, Long, String)]
    val qT = PipelineStreams.rebuildDocs(lines(inT), "ts", "doc_id",
        "5 minutes")
      .writeStream.format("memory").queryName("rb_tumble")
      .outputMode("append").start()
    try {
      chunks.foreach { d => inT.addData(d); qT.processAllAvailable() }
      inT.addData(sentinel); qT.processAllAvailable()
      val partials = spark.table("rb_tumble").filter(col("doc_id") === 7)
        .select(col("clean_text")).as[String].collect().sorted
      assert(partials.length === 2, partials.mkString("|"))
      assert(partials === Array("first line\nsecond line",
        "third line\nfourth line"))
    } finally qT.stop()

    // session windows at the same 5-minute scale: the 60s chunk gap keeps
    // the session open across the boundary — ONE whole doc, chunk order
    val inS = MemoryStream[(java.sql.Timestamp, Long, String)]
    val qS = PipelineStreams.rebuildDocsSessions(lines(inS), "ts", "doc_id",
        "5 minutes")
      .writeStream.format("memory").queryName("rb_session")
      .outputMode("append").start()
    try {
      chunks.foreach { d => inS.addData(d); qS.processAllAvailable() }
      inS.addData(sentinel); qS.processAllAvailable()
      val got = spark.table("rb_session").filter(col("doc_id") < 99)
        .select(col("doc_id"), col("clean_text"), col("n_kept"))
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq === Seq(7L, 8L))
      assert(got(0) === ((7L,
        "first line\nsecond line\nthird line\nfourth line", 4L)))
      // single-row docs reduce to the SHARED batch rebuild order exactly
      val batch8 = DedupOps.lineCollapse(
          Seq(chunks(2)).toDF("ts", "doc_id", "text"), "doc_id", "text")
        .select(col("doc_id"), col("clean_text"), col("n_kept"))
        .as[(Long, String, Long)].collect().head
      assert(got(1) === batch8)
    } finally qS.stop()
  }

  test("streaming paragraph dedup: blank-line separator, same machinery") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val paras = PipelineStreams.dedupLinesByDigest(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
      "10 minutes", sep = "\n\n")
    val q = paras.writeStream.format("memory").queryName("pd")
      .outputMode("append").start()
    try {
      in.addData(
        (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L,
          "first paragraph\nsecond line of it\n\nshared closing paragraph"),
        (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L,
          "a different opener\n\nshared closing paragraph"))
      q.processAllAvailable()
      val got = spark.table("pd").select("line").as[String].collect().sorted
      // paragraphs keep interior newlines; the shared closer dedups
      assert(got === Array("a different opener",
        "first paragraph\nsecond line of it", "shared closing paragraph"))
    } finally q.stop()
  }

  test("audio dup detector: print matches flag candidates, fresh clips " +
    "pass") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    import graft.functions.MediaCodecs
    val a = MediaCodecs.buildWav(8000, 60, 5L)   // corpus clip
    val b = MediaCodecs.buildWav(8000, 60, 999L) // unrelated seed
    val corpus = Seq(Multimodal.MediaRow(100L, "audio", a)).toDS()
    val index = Multimodal.audioPrintIndex(corpus, windowFrames = 4)
    val in = MemoryStream[Multimodal.MediaRow]
    val flagged = PipelineStreams.audioDupDetector(in.toDS(), index,
      windowFrames = 4)
    val q = flagged.writeStream.format("memory").queryName("ad")
      .outputMode("append").start()
    try {
      in.addData(
        Multimodal.MediaRow(1L, "audio", a), // re-keyed copy -> candidate
        Multimodal.MediaRow(2L, "audio", b))
      q.processAllAvailable()
      val got = spark.table("ad")
        .select("media_id", "candidate_of").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 100L)))
    } finally q.stop()
  }

  test("decode health monitor: per-(window, sniffed-kind) ok/bad rates, " +
    "truncated payloads attribute to their container") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.MediaCodecs
    val goodWav = MediaCodecs.buildWav(8000, 60, 5L)
    val truncWav = goodWav.slice(0, 20) // RIFF magic intact, parse fails
    val goodBmp = MediaCodecs.buildBmp(8, 8, 3L)
    val junk = "not a container at all".getBytes("US-ASCII")
    val t0 = java.sql.Timestamp.valueOf("2021-01-16 17:00:00")
    val in = MemoryStream[(java.sql.Timestamp, Long, String, Array[Byte])]
    val mon = PipelineStreams.decodeHealthByWindow(
      in.toDF().toDF("ts", "media_id", "kind", "payload"),
      "ts", "10 minutes", "5 minutes")
    val q = mon.writeStream.format("memory").queryName("dh")
      .outputMode("append").start()
    try {
      in.addData(
        (t0, 1L, "audio", goodWav),
        (t0, 2L, "audio", truncWav), // poison row: counted, not thrown
        (t0, 3L, "image", goodBmp),
        (t0, 4L, "video", junk))
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"),
        99L, "audio", goodWav))
      q.processAllAvailable()
      val got = spark.table("dh")
        .filter(col("window_start") === t0)
        .select("kind_detected", "n_arrived", "n_ok", "bad_milli")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got === Seq(
        ("audio", 2L, 1L, 500L),
        ("image", 1L, 1L, 0L),
        ("unknown", 1L, 0L, 1000L)))
    } finally q.stop()
  }

  test("leakage monitor: per-(window, source) contamination counts, " +
    "gram-less docs count as arrivals, t36-consistent flags") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val bench = Seq((0L, "a b c d"), (1L, "full copy of item two"))
      .toDF("doc_id", "text")
    val benchSet = DedupOps.benchShingleSet(bench, "text", 3)
    val t0 = java.sql.Timestamp.valueOf("2021-01-16 17:00:00")
    val t1 = java.sql.Timestamp.valueOf("2021-01-16 17:12:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val mon = PipelineStreams.leakageByWindow(
      in.toDF().toDF("doc_id", "ts", "source", "text"), benchSet,
      "ts", "source", "doc_id", "text", "10 minutes", "5 minutes")
    val q = mon.writeStream.format("memory").queryName("lw")
      .outputMode("append").start()
    try {
      in.addData(
        (10L, t0, "web", "x a b c y"),            // 1 leaked gram (a b c)
        (11L, t0, "web", "clean novel words here"), // 0
        (12L, t0, "web", "hi"),                   // gram-less: arrival only
        (13L, t0, "news", "full copy of item two"), // 3 leaked grams
        (14L, t1, "web", "a b c d here"))         // second window
      q.processAllAvailable()
      // advance the watermark so both windows close
      in.addData((99L, java.sql.Timestamp.valueOf("2021-01-16 17:40:00"),
        "late", "x"))
      q.processAllAvailable()
      val got = spark.table("lw")
        .select("window_start", "source", "n_docs", "n_contaminated",
          "n_doc_gram_hits", "contam_milli")
        .as[(java.sql.Timestamp, String, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(r => (r._1.getTime, r._2))
      val w0 = java.sql.Timestamp.valueOf("2021-01-16 17:00:00")
      val w1 = java.sql.Timestamp.valueOf("2021-01-16 17:10:00")
      assert(got === Seq(
        (w0, "news", 1L, 1L, 3L, 1000L),
        (w0, "web", 3L, 1L, 1L, 333L),
        (w1, "web", 1L, 1L, 2L, 1000L)))
    } finally q.stop()
  }

  test("audio NEAR-dup detector: in-stream full-series verify — copies " +
    "and radius-1 flag, print-equal divergers and sub-minBits clips pass") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    import graft.MediaTestBytes.{clip, rising, diverges, oneDip}
    val short = Seq(10, 300, 200, 500, 400) // 4 bits < minBits
    val corpus = Seq(
      Multimodal.MediaRow(100L, "audio", clip(rising)),
      Multimodal.MediaRow(101L, "audio", clip(short))).toDS()
    val index = Multimodal.audioBandIndex(corpus, windowFrames = 4)
    val in = MemoryStream[Multimodal.MediaRow]
    val flagged = PipelineStreams.audioNearDupDetector(in.toDS(), index,
      windowFrames = 4)
    val q = flagged.writeStream.format("memory").queryName("and")
      .outputMode("append").start()
    try {
      in.addData(
        Multimodal.MediaRow(1L, "audio", clip(rising)),   // copy: ham 0
        Multimodal.MediaRow(2L, "audio", clip(oneDip)),   // near: ham 1
        Multimodal.MediaRow(3L, "audio", clip(diverges)), // print-equal only
        Multimodal.MediaRow(4L, "audio", clip(short)))    // below minBits
      q.processAllAvailable()
      val got = spark.table("and")
        .select("media_id", "dup_of", "hamming")
        .distinct() // multi-band copies collapse on read (documented)
        .as[(Long, Long, Int)].collect().toSeq.sorted
      assert(got === Seq((1L, 100L, 0), (2L, 100L, 1)))
      // exactness cross-check: the flags are precisely batch m11's
      // stream-to-corpus edges on the union
      val union = corpus.union(Seq(
        Multimodal.MediaRow(1L, "audio", clip(rising)),
        Multimodal.MediaRow(2L, "audio", clip(oneDip)),
        Multimodal.MediaRow(3L, "audio", clip(diverges)),
        Multimodal.MediaRow(4L, "audio", clip(short))).toDS())
      // stream clips 1 and 2 land in corpus clip 100's cluster
      val clustered = Multimodal.audioClusters(union, windowFrames = 4)
        .select("media_id", "cluster_id").as[(Long, Long)].collect().toMap
      assert(clustered(100L) === clustered(1L))
      assert(clustered(100L) === clustered(2L))
      assert(clustered(3L) !== clustered(100L))
      assert(clustered(4L) !== clustered(101L))
    } finally q.stop()
  }

  test("correlation monitor: windowed r equals the batch moments and " +
    "guards zero variance") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{PipelineQueries, RelevanceOps}
    val lmCorpus = Seq("the quick brown fox jumps",
      "the lazy dog sleeps all day",
      "a fox and a dog ran far").toDF("text")
    val lm = RelevanceOps.bigramLm(lmCorpus, "text")
    val rows = Seq(
      (1L, "varied", "the quick brown fox jumps far today"),
      (2L, "varied", "zz qq ww ee rr tt"),
      (3L, "varied", "the lazy dog sleeps"),
      (4L, "varied", "a fox and a dog"),
      // a source whose docs are identical: both signals constant
      (5L, "const", "the quick brown fox"),
      (6L, "const", "the quick brown fox"))
    val t0 = java.sql.Timestamp.valueOf("2021-01-16 17:00:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val corr = PipelineStreams.corrByWindow(
      in.toDF().toDF("doc_id", "ts", "source", "text"), lm,
      "ts", "doc_id", "source", "text", "10 minutes", "5 minutes")
    val q = corr.writeStream.format("memory").queryName("cw")
      .outputMode("append").start()
    try {
      in.addData(rows.map { case (i, s, t) => (i, t0, s, t) }: _*)
      q.processAllAvailable()
      in.addData((99L, java.sql.Timestamp.valueOf("2021-01-16 17:30:00"),
        "closer", "x y"))
      q.processAllAvailable()
      val got = spark.table("cw").filter(col("window_start") === t0)
        .select("source", "n_docs", "corr")
        .as[(String, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got("const")._1 === 2L && got("const")._2 === None)
      // batch twin from the same shared expressions + t35's moment math
      val perDoc = rows.toDF("doc_id", "source", "text")
        .withColumn("x", PipelineQueries.eduScoreMicro(col("text")))
        .withColumn("toks__", graft.functions.TextFns.tokens(col("text")))
        .filter(size(col("toks__")) >= 2)
        .select(col("doc_id"), col("source"), col("x"),
          explode(org.apache.spark.sql.functions
            .expr(RelevanceOps.bigramPairsExpr("toks__"))).as("p"))
        .select(col("doc_id"), col("source"), col("x"),
          col("p.w1").as("w1"), col("p.w2").as("w2"))
        .join(lm.c12, Seq("w1", "w2"), "left")
        .join(lm.c1, Seq("w1"), "left")
        .join(lm.c2, Seq("w2"), "left")
        .crossJoin(broadcast(lm.tot))
        .withColumn("cm", RelevanceOps.interpInstanceCostMicro(col("c12"),
          col("c1"), col("c2"), col("t"), col("v"), 3, 4))
        .groupBy(col("doc_id"))
        .agg(first(col("source")).as("source"), first(col("x")).as("x"),
          sum(col("cm")).as("s"), count(lit(1)).as("nb"))
        .withColumn("y", expr("s div nb"))
        .select("source", "x", "y").as[(String, Long, Long)].collect()
      val varied = perDoc.filter(_._1 == "varied")
      val nn = varied.length.toDouble
      val (sx, sy) = (varied.map(_._2).sum.toDouble, varied.map(_._3).sum.toDouble)
      val sxy = varied.map(r => r._2.toDouble * r._3).sum
      val sxx = varied.map(r => r._2.toDouble * r._2).sum
      val syy = varied.map(r => r._3.toDouble * r._3).sum
      val expected = BigDecimal((nn * sxy - sx * sy) /
        (math.sqrt(nn * sxx - sx * sx) * math.sqrt(nn * syy - sy * sy)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got("varied")._1 === 4L)
      assert(math.abs(got("varied")._2.get - expected) < 2e-6)
    } finally q.stop()
  }

  test("drift monitor: windowed xent equals the batch form and ranks " +
    "OOV windows above in-corpus ones") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.RelevanceOps
    val corpus = Seq("the quick brown fox", "the lazy dog sleeps",
      "the fox and the dog").toDF("text")
    val lm = RelevanceOps.unigramLm(corpus, "text")
    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    val drift = PipelineStreams.driftByWindow(
      in.toDF().toDF("ts", "source", "text"), "ts", "source", "text",
      "10 minutes", "5 minutes", lm)
    val q = drift.writeStream.format("memory").queryName("dw")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2021-01-16 17:00:00")
      in.addData(
        (t0, "inlang", "the quick dog"),       // all in-reference
        (t0, "gibber", "zxqv wklm pffr"))      // all OOV
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:30:00"),
        "closer", "x")) // close the first window
      q.processAllAvailable()
      val got = spark.table("dw")
        .filter(col("window_start") === t0)
        .select("source", "n_tokens", "xent_micro_per_token")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet === Set("inlang", "gibber"))
      assert(got("inlang")._1 === 3L && got("gibber")._1 === 3L)
      // drift signal: the OOV window must score strictly higher
      assert(got("gibber")._2 > got("inlang")._2)
      // batch identity: same expressions over the same docs
      val batch = Seq(("inlang", "the quick dog"),
        ("gibber", "zxqv wklm pffr")).toDF("source", "text")
        .select(col("source"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
        .join(lm.cw, Seq("w"), "left")
        .crossJoin(broadcast(lm.tot))
        .withColumn("cost_micro", RelevanceOps
          .unigramInstanceCostMicro(col("cw"), col("t"), col("v")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("cost_micro")).as("s"))
        .select(col("source"), col("n"), expr("s div n").as("x"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("edu gate: kept set and scores equal the batch t34 grading") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val rows = Seq(
      (1L, "a clear english sentence with several reasonable words"),
      (2L, "!!!! ???? 1234 %%%%"), // alpha-free noise, low score
      (3L, "another well formed document that should score highly here"))
    val gated = PipelineStreams.eduGate(
      in.toDF().toDF("doc_id", "text"), "text", minMicro = 2000000L)
    val q = gated.writeStream.format("memory").queryName("eg")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("eg").select("doc_id", "score_micro")
        .as[(Long, Long)].collect().toMap
      val batch = graft.operators.PipelineQueries
        .eduScore(rows.toDF("doc_id", "text")
          .withColumn("source", lit("web")), "doc_id", "text", 1L, 0L)
        .select("doc_id", "score_micro").as[(Long, Long)].collect()
        .filter(_._2 >= 2000000L).toMap
      assert(got === batch && got.contains(1L) && !got.contains(2L))
    } finally q.stop()
  }

  test("shot segmentation runs unchanged over a stream of media rows") {
    // m07 is stateless per payload row, so the BATCH operator is its own
    // at-ingest twin — this pins that it actually executes on a
    // streaming Dataset and that the emitted shots equal the batch run
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    def y4m(vals: Seq[Int]): Array[Byte] = {
      val header = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      out ++= header
      vals.foreach { v =>
        out ++= "FRAME\n".getBytes("US-ASCII")
        out ++= Array.fill(16)(v.toByte)
        out ++= new Array[Byte](8)
      }
      out.toArray
    }
    val rowsIn = Seq(
      Multimodal.MediaRow(1L, "video", y4m(Seq(10, 10, 210, 210))),
      Multimodal.MediaRow(2L, "video", y4m(Seq(50))))
    val in = MemoryStream[Multimodal.MediaRow]
    val shots = Multimodal.shotSegments(in.toDS(), stride = 1,
      cutMilli = 100000L)
    val q = shots.writeStream.format("memory").queryName("scd")
      .outputMode("append").start()
    try {
      in.addData(rowsIn: _*)
      q.processAllAvailable()
      val got = spark.table("scd")
        .orderBy("media_id", "shot_id")
        .select("media_id", "shot_id", "start_frame", "end_frame")
        .as[(Long, Int, Int, Int)].collect().toSeq
      val batch = Multimodal.shotSegments(rowsIn.toDS(), 1, 100000L)
        .orderBy("media_id", "shot_id")
        .select("media_id", "shot_id", "start_frame", "end_frame")
        .as[(Long, Int, Int, Int)].collect().toSeq
      assert(got === batch && got.nonEmpty)
    } finally q.stop()
  }

  test("revisit classifier: stream labels equal the batch d27 ledger " +
    "on arriving ids") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val oldSnap = Seq((1L, "same text"), (2L, "old body"),
      (4L, "dropped page")).toDF("doc_id", "text")
    val classified = PipelineStreams.revisitClassifier(
      in.toDF().toDF("doc_id", "ts", "text"),
      graft.operators.DedupOps.snapshotDigestIndex(oldSnap, "doc_id", "text"),
      "doc_id", "text")
    val q = classified.writeStream.format("memory").queryName("rv")
      .outputMode("append").start()
    try {
      val ts = java.sql.Timestamp.valueOf("2021-01-16 17:00:00")
      in.addData((1L, ts, "same text"), (2L, ts, "new body"),
        (5L, ts, "fresh page"))
      q.processAllAvailable()
      val out = spark.table("rv").select("doc_id", "status")
        .as[(Long, String)].collect().toMap
      assert(out === Map(1L -> "unchanged", 2L -> "changed", 5L -> "added"))
      // an unchanged arrival still carries both digests for the ledger
      assert(spark.table("rv").filter(col("doc_id") === 1L)
        .filter(col("old_digest") === col("new_digest")).count() === 1L)
      // batch identity: d27 on the same snapshots, restricted to the
      // arriving ids (`removed` is the batch-only leg by construction —
      // an id-space complement no stream of arrivals can observe)
      val arrivals = Seq((1L, "same text"), (2L, "new body"),
        (5L, "fresh page")).toDF("doc_id", "text")
      val batch = graft.operators.DedupOps
        .snapshotDelta(oldSnap, arrivals, "doc_id", "text")
        .filter(col("status") =!= "removed")
        .select("doc_id", "status").as[(Long, String)].collect().toMap
      assert(out === batch)
    } finally q.stop()
  }

  test("composed media ingest chain: one decision per clip — decode gate, " +
    "visual dup, audio near-dup with in-chain verify") {
    import graft.MediaTestBytes
    import graft.functions.MediaCodecs
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val corpus = Seq(
      MediaRow(1L, "image", MediaCodecs.buildBmp(16, 16, 5L)),
      MediaRow(2L, "image", MediaCodecs.buildBmp(16, 16, 99L)),
      MediaRow(3L, "audio", MediaTestBytes.clip(MediaTestBytes.rising)))
    val iidx = Multimodal.imageBandIndex(
      corpus.filter(_.kind == "image").toDS())
    val aidx = Multimodal.audioBandIndex(
      corpus.filter(_.kind == "audio").toDS(), windowFrames = 4)
    val in = MemoryStream[(java.sql.Timestamp, Long, String, Array[Byte])]
    val decisions = PipelineStreams.mediaIngestChain(
      in.toDF().toDF("ts", "media_id", "kind", "payload"), iidx, aidx,
      "ts", windowFrames = 4, window_ = "10 minutes", delay = "10 minutes")
    val q = decisions.writeStream.format("memory").queryName("mic")
      .outputMode("append").start()
    try {
      in.addData(
        // exact image re-upload of corpus 1 → visual dup
        (ts("2021-01-16 17:00:00"), 10L, "image",
          MediaCodecs.buildBmp(16, 16, 5L)),
        // novel image → ingest
        (ts("2021-01-16 17:00:01"), 11L, "image",
          MediaCodecs.buildBmp(16, 16, 42L)),
        // exact audio re-upload of corpus 3 → audio dup at Hamming 0
        (ts("2021-01-16 17:00:02"), 12L, "audio",
          MediaTestBytes.clip(MediaTestBytes.rising)),
        // one-dip variant → audio near-dup at Hamming 1
        (ts("2021-01-16 17:00:03"), 13L, "audio",
          MediaTestBytes.clip(MediaTestBytes.oneDip)),
        // print-equal but later-divergent (Hamming 6): bands collide,
        // the in-chain full-series verify must REJECT → ingest
        (ts("2021-01-16 17:00:04"), 14L, "audio",
          MediaTestBytes.clip(MediaTestBytes.diverges)),
        // garbage bytes → decode gate
        (ts("2021-01-16 17:00:05"), 15L, "image",
          Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)),
        // clean video: decodes, no dup leg → ingest
        (ts("2021-01-16 17:00:06"), 16L, "video",
          MediaCodecs.buildY4m(8, 8, 3, 7L)),
        // one-window audio: decodes, too short to print → ingest
        (ts("2021-01-16 17:00:07"), 17L, "audio",
          MediaTestBytes.clip(Seq(100))))
      q.processAllAvailable()
      in.addData((ts("2021-01-16 17:40:00"), 99L, "image",
        Array[Byte](0))) // watermark sentinel past the arrival window
      q.processAllAvailable()
      val rows = spark.table("mic")
        .select("media_id", "decision", "visual_dup_of", "audio_dup_of")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
      assert(rows.keySet === Set(10L, 11L, 12L, 13L, 14L, 15L, 16L, 17L))
      assert(rows(10L) === (("drop_visual_dup", Some(1L), None)))
      assert(rows(11L) === (("ingest", None, None)))
      assert(rows(12L) === (("drop_audio_dup", None, Some(3L))))
      assert(rows(13L) === (("drop_audio_dup", None, Some(3L))))
      assert(rows(14L) === (("ingest", None, None)))
      assert(rows(15L) === (("drop_decode", None, None)))
      assert(rows(16L) === (("ingest", None, None)))
      assert(rows(17L) === (("ingest", None, None)))
      // exactly ONE decision row per clip — the stateful rollup collapses
      // multi-band duplicate hits the stateless detectors emit
      assert(spark.table("mic").groupBy("media_id").count()
        .filter(col("count") > 1).count() === 0L)
      // leg agreement: the chain's dup flags equal the standalone
      // detectors' flagged sets on the same arrivals + indexes
      val arrivalRows = Seq(
        MediaRow(10L, "image", MediaCodecs.buildBmp(16, 16, 5L)),
        MediaRow(11L, "image", MediaCodecs.buildBmp(16, 16, 42L)),
        MediaRow(12L, "audio", MediaTestBytes.clip(MediaTestBytes.rising)),
        MediaRow(13L, "audio", MediaTestBytes.clip(MediaTestBytes.oneDip)),
        MediaRow(14L, "audio", MediaTestBytes.clip(MediaTestBytes.diverges)))
      val imgFlags = PipelineStreams
        .imageDupDetector(arrivalRows.toDS(), iidx)
        .select("media_id").as[Long].collect().toSet
      val audFlags = PipelineStreams
        .audioNearDupDetector(arrivalRows.toDS(), aidx, windowFrames = 4)
        .select("media_id").as[Long].collect().toSet
      assert(rows.filter(_._2._1 == "drop_visual_dup").keySet === imgFlags)
      assert(rows.filter(_._2._1 == "drop_audio_dup").keySet === audFlags)
    } finally q.stop()
  }

  test("winnow copy detector: partial copy flagged against the corpus index, equals batch d30") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    // 10-token run shared verbatim → ≥ 2 guaranteed shared fingerprints
    // (5 windows fully inside the 8 shared grams; one min dominates ≤ w)
    val run = "omega kappa sigma delta theta lambda rho mu nu xi"
    val corpusDocs = Seq(
      (100L, s"corpus prefix words here $run corpus suffix words there"),
      (101L, "completely unrelated corpus text about brokers topics and " +
        "offsets and consumer group rebalancing"))
      .toDF("doc_id", "text")
    val idx = DedupOps.winnowFpIndex(corpusDocs, "doc_id", "text",
      k = 3, w = 4, maxDocsPerFp = 8)
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val arrivedCopy = s"fresh intro $run fresh outro closing words"
    val det = PipelineStreams.winnowCopyDetect(
      in.toDF().toDF("ts", "doc_id", "text"), idx, "ts", "doc_id", "text",
      k = 3, w = 4, minShared = 2L, "10 minutes", "5 minutes")
    val q = det.writeStream.format("memory").queryName("wcd")
      .outputMode("append").start()
    try {
      in.addData(
        (java.sql.Timestamp.valueOf("2021-01-16 17:00:00"), 0L, arrivedCopy),
        (java.sql.Timestamp.valueOf("2021-01-16 17:01:00"), 1L,
          "entirely new material sharing nothing with anything stored"))
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:30:00"), 2L,
        "watermark closer row far past the arrival window"))
      q.processAllAvailable()
      val rows = spark.table("wcd").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(0L))
      assert(rows.head.getAs[Long]("copy_of") === 100L)
      assert(rows.head.getAs[Long]("n_sources") === 1L)
      // batch identity: d30 over corpus + arrivals pairs (0, 100) at the
      // SAME shared-fingerprint count the stream probe saw
      val batch = corpusDocs.union(Seq(
        (0L, arrivedCopy),
        (1L, "entirely new material sharing nothing with anything stored"))
        .toDF("doc_id", "text"))
      val pairs = DedupOps.winnowPairs(batch, "doc_id", "text",
          k = 3, w = 4, minShared = 2L, maxDocsPerFp = 8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("shared_fp"))
        .toMap
      assert(pairs.keySet === Set((0L, 100L)))
      assert(pairs((0L, 100L)) === rows.head.getAs[Long]("max_shared"))
    } finally q.stop()
  }

  test("chunk retrieval probe: stream candidates equal batch s29 per arrival") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    val copiedText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // corpus ids are all non-multiples of 97, so in the per-arrival batch
    // twin (union of corpus + ONE arrival, queryMod = 97) the arrival is
    // exactly the query slice
    val corpusDocs = Seq(
      (1L, copiedText),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "entirely different material about nothing shared at all"),
      (4L, "alpha beta gamma unrelated tail words here now then done")
    ).toDF("doc_id", "text")
    val idx = SimilarityOps.chunkSignIndex(corpusDocs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 16)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val probe = PipelineStreams.chunkRetrievalProbe(
      in.toDF().toDF("ts", "doc_id", "text"), idx, "ts", "doc_id", "text",
      dim = 16)
    val q = probe.writeStream.format("memory").queryName("crp")
      .outputMode("append").start()
    val arrivals = Seq(
      (0L, copiedText), // verbatim copy of corpus doc 1: same vector, same bucket
      (97L, "wholly novel arrival speaking about fresh topics only"))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      val got = spark.table("crp").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"),
          r.getAs[Int]("chunk_id")))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
      // the copy's single chunk shares doc 1's bucket
      assert(got.getOrElse(0L, Set.empty[(Long, Int)]).contains((1L, 0)))
      // per arrival, the candidate COUNT equals the batch s29 audit run
      // on corpus + that arrival (the arrival is the only query-mod id)
      arrivals.foreach { case (id, t) =>
        val batch = SimilarityOps.chunkRetrievalLshRecall(
            corpusDocs.union(Seq((id, t)).toDF("doc_id", "text")),
            "doc_id", "text", chunk = 64, stride = 48, dim = 16,
            queryMod = 97, k = 3)
          .filter(col("query_id") === id).collect()
        assert(batch.length === 1)
        val nCand = batch.head.getAs[Long]("n_candidates")
        assert(got.getOrElse(id, Set.empty[(Long, Int)]).size.toLong === nCand,
          s"arrival $id")
      }
      // and the copy arrival is a HIT in the batch audit, so the stream
      // probe handed the reranker a candidate set containing the answer
      val hit = SimilarityOps.chunkRetrievalLshRecall(
          corpusDocs.union(Seq(arrivals.head).toDF("doc_id", "text")),
          "doc_id", "text", 64, 48, 16, 97, 3)
        .filter(col("query_id") === 0L).head()
      assert(hit.getAs[Long]("n_hits") >= 1L)
    } finally q.stop()
  }

  test("chunk retrieve top-k: at-ingest answers equal batch s32 per arrival") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    val copiedText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpusDocs = Seq(
      (1L, copiedText),
      (2L, copiedText + " with a different tail appended here"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "entirely different material about nothing shared at all")
    ).toDF("doc_id", "text")
    val idx = SimilarityOps.chunkVecIndex(corpusDocs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 16)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val top = PipelineStreams.chunkRetrieveTopK(
      in.toDF().toDF("ts", "doc_id", "text"), idx, "ts", "doc_id", "text",
      dim = 16, k = 3, "10 minutes", "5 minutes")
    val q = top.writeStream.format("memory").queryName("crt")
      .outputMode("append").start()
    val arrivals = Seq(
      (0L, copiedText),
      (97L, "wholly novel arrival speaking about fresh topics only"))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      // close the window so the append-mode rollup emits
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 300L,
        "window closer far past the arrivals"))
      q.processAllAvailable()
      val got = spark.table("crt").collect()
        .filter(_.getAs[Long]("query_id") != 300L)
        .map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // batch s32 twin per arrival (the arrival as the only query-mod id)
      arrivals.foreach { case (id, t) =>
        val batch = SimilarityOps.chunkRetrievalLshTopK(
            corpusDocs.union(Seq((id, t)).toDF("doc_id", "text")),
            "doc_id", "text", chunk = 64, stride = 48, dim = 16,
            queryMod = 97, k = 3)
          .collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim"))).toSet
        assert(got.getOrElse(id,
          Set.empty[(Int, Long, Int, Double)]) === batch, s"arrival $id")
      }
      // the verbatim copy's top answer is its source at sim 1.0
      assert(got(0L).exists { case (r, c, _, s) => r == 1 && c == 1L && s == 1.0 })
    } finally q.stop()
  }

  test("chunk retrieve top-k probed: at-ingest answers equal batch s33 per arrival, flips widen past s32") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    // pseudo-random corpus + arrivals from the same token family, so
    // sign patterns land near (but not always in) each other's buckets —
    // the flip-1 tier has real work to do
    def txt(seed: Long): String =
      (0 until 12).map(j => s"w${(seed * 7 + j * 3) % 25}").mkString(" ")
    val corpusDocs = (1L until 30L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    val idx = SimilarityOps.chunkVecIndex(corpusDocs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 16)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val top = PipelineStreams.chunkRetrieveTopKProbed(
      in.toDF().toDF("ts", "doc_id", "text"), idx, "ts", "doc_id", "text",
      dim = 16, k = 3, "10 minutes", "5 minutes")
    val q = top.writeStream.format("memory").queryName("crtp")
      .outputMode("append").start()
    // arrival ids are multiples of 97 (the batch twin's query slice);
    // their texts reuse corpus seeds so buckets collide or near-miss
    val arrivals = Seq((0L, txt(3L)), (97L, txt(40L)), (194L, txt(17L)))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 3 * 97L,
        "window closer far past the arrivals"))
      q.processAllAvailable()
      val got = spark.table("crtp").collect()
        .filter(_.getAs[Long]("query_id") != 3 * 97L)
        .map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var widened = false
      arrivals.foreach { case (id, t) =>
        val joint = corpusDocs.union(Seq((id, t)).toDF("doc_id", "text"))
        val s33 = SimilarityOps.chunkMultiProbeTopK(joint, "doc_id",
            "text", chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3)
          .filter(col("query_id") === id).collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim"))).toSet
        assert(got.getOrElse(id,
          Set.empty[(Int, Long, Int, Double)]) === s33, s"arrival $id")
        val s32 = SimilarityOps.chunkRetrievalLshTopK(joint, "doc_id",
            "text", chunk = 64, stride = 48, dim = 16, queryMod = 97, k = 3)
          .filter(col("query_id") === id).count()
        if (s33.size > s32) widened = true
      }
      // somewhere on this corpus the flip tier must add answers beyond
      // the exact bucket, or the test shows nothing about the dial
      assert(widened)
    } finally q.stop()
  }

  test("chunk retrieve top-k banded: at-ingest answers equal batch s35 per arrival") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    def txt(seed: Long): String =
      (0 until 12).map(j => s"w${(seed * 7 + j * 3) % 25}").mkString(" ")
    val corpusDocs = (1L until 30L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    val bandIdx = SimilarityOps.chunkBandIndex(corpusDocs, "doc_id",
      "text", chunk = 64, stride = 48, dim = 16, bands = 4)
    val vecIdx = SimilarityOps.chunkVecIndex(corpusDocs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 16)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val top = PipelineStreams.chunkRetrieveTopKBanded(
      in.toDF().toDF("ts", "doc_id", "text"), bandIdx, vecIdx, "ts",
      "doc_id", "text", dim = 16, bands = 4, k = 3, "10 minutes",
      "5 minutes")
    val q = top.writeStream.format("memory").queryName("crtb")
      .outputMode("append").start()
    val arrivals = Seq((0L, txt(3L)), (97L, txt(40L)), (194L, txt(17L)))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 3 * 97L,
        "window closer far past the arrivals"))
      q.processAllAvailable()
      val got = spark.table("crtb").collect()
        .filter(_.getAs[Long]("query_id") != 3 * 97L)
        .map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      arrivals.foreach { case (id, t) =>
        val joint = corpusDocs.union(Seq((id, t)).toDF("doc_id", "text"))
        val s35 = SimilarityOps.chunkBandTopK(joint, "doc_id", "text",
            chunk = 64, stride = 48, dim = 16, bands = 4, queryMod = 97,
            k = 3)
          .filter(col("query_id") === id).collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim"))).toSet
        assert(got.getOrElse(id,
          Set.empty[(Int, Long, Int, Double)]) === s35, s"arrival $id")
        // and the banded answer set is at least the flip-1 answer set
        // in size for the same arrival (candidate superset)
        val s33n = SimilarityOps.chunkMultiProbeTopK(joint, "doc_id",
            "text", 64, 48, 16, 97, 3)
          .filter(col("query_id") === id).count()
        assert(s35.size >= s33n, s"arrival $id")
      }
    } finally q.stop()
  }

  test("bitext mine probe: at-ingest forward-best equals batch s41 per arrival") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    // clustered embeddings (dim 20 ≥ sigDim 16) — same shape as the
    // batch BitextMarginSpec fixture, so bands genuinely collide
    def vec(i: Long, shift: Double): Seq[Float] = {
      val c = i % 3
      (0 until 20).map { d =>
        (math.sin(c * 2.1 + d * 0.7 + shift) +
          0.15 * math.cos(i * 1.3 + d * 0.31)).toFloat
      }
    }
    val leftRows = (0L until 6L).map(i => (i, vec(i, 0.0)))
    val rightRows = (0L until 9L).map(i => (i + 100L, vec(i, 0.04)))
    val leftDf = leftRows.toDF("vec_id", "embedding")
    val rightDf = rightRows.toDF("vec_id", "embedding")
    // the three release-time artifacts, built from the SAME two sides
    // the batch comparator sees
    val bandIdx = SimilarityOps.bitextBandIndex(rightDf, 16, 2)
    val vecIdx = SimilarityOps.bitextVecIndex(rightDf)
    val nbrIdx = SimilarityOps.bitextNeighborhoodIndex(
      leftDf, rightDf, 3, 16, 2)

    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    val mined = PipelineStreams.bitextMineProbe(
      in.toDF().toDF("ts", "vec_id", "embedding"), bandIdx, vecIdx,
      nbrIdx, "ts", "vec_id", "embedding", sigDim = 16, bands = 2,
      k = 3, "10 minutes", "5 minutes")
    val q = mined.writeStream.format("memory").queryName("bmp")
      .outputMode("append").start()
    try {
      leftRows.zipWithIndex.foreach { case ((id, v), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"),
          id, v))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"),
        9999L, vec(1L, 0.0)))
      q.processAllAvailable()
      val got = spark.table("bmp").collect()
        .filter(_.getAs[Long]("id_l") != 9999L)
        .map(r => r.getAs[Long]("id_l") ->
          (r.getAs[Long]("id_r"), r.getAs[Double]("sim"),
            r.getAs[Double]("margin")))
        .toMap
      val want = SimilarityOps.bitextForwardBest(leftDf, rightDf, 3,
          sigDim = 16, bands = 2).collect()
        .map(r => r.getAs[Long]("id_l") ->
          (r.getAs[Long]("id_r"), r.getAs[Double]("sim"),
            r.getAs[Double]("margin")))
        .toMap
      assert(got === want)
      assert(got.nonEmpty) // band-miss-everything would prove nothing
    } finally q.stop()
  }

  test("bitext mine probe: novel-arrival candidates without neighborhood entries keep their top-k slots") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    // sign-mask vectors: dim i positive iff bit i set (sigDim 16,
    // 2 bands: key0 = low byte, key1 = high byte of the mask)
    def maskVec(m: Int): Seq[Float] =
      (0 until 16).map(i => if (((m >> i) & 1) == 1) 1f else -1f)
    // release left corpus: sig 0xAA55 — collides with rY on band1
    // (0xAA) but with rX on NEITHER band, so rX has no neighborhood row
    val releaseLeft = Seq(0L -> maskVec(0xAA55), 1L -> maskVec(0xAA55))
      .toDF("vec_id", "embedding")
    val right = Seq(100L -> maskVec(0x00FF) /* rX: novel-only */ ,
        101L -> maskVec(0xAAFF) /* rY: in the release neighborhood */)
      .toDF("vec_id", "embedding")
    val bandIdx = SimilarityOps.bitextBandIndex(right, 16, 2)
    val vecIdx = SimilarityOps.bitextVecIndex(right)
    val nbrIdx = SimilarityOps.bitextNeighborhoodIndex(
      releaseLeft, right, 1, 16, 2)
    // the premise the test rests on: rX is indexed but neighborhood-less
    assert(nbrIdx.collect().map(_.getLong(0)).toSet === Set(101L))

    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    val mined = PipelineStreams.bitextMineProbe(
      in.toDF().toDF("ts", "vec_id", "embedding"), bandIdx, vecIdx,
      nbrIdx, "ts", "vec_id", "embedding", sigDim = 16, bands = 2,
      k = 1, "10 minutes", "5 minutes")
    val q = mined.writeStream.format("memory").queryName("bmpn")
      .outputMode("append").start()
    try {
      // arrival 500 = rX's twin: its top-1 IS rX (sim 1), which has no
      // neighborhood row — the batch-faithful answer is NOTHING (the
      // candidate occupies the slot, then drops at the margin stage);
      // the pre-fix inner join would wrongly promote rY into the top-1
      // and emit it. Arrival 501 = rY's twin: top-1 rY prices normally.
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:00:00"),
        500L, maskVec(0x00FF)))
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:01:00"),
        501L, maskVec(0xAAFF)))
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"),
        9999L, maskVec(0xAA55)))
      q.processAllAvailable()
      val got = spark.table("bmpn").collect()
        .filter(_.getAs[Long]("id_l") != 9999L)
        .map(r => (r.getAs[Long]("id_l"), r.getAs[Long]("id_r"),
          r.getAs[Double]("margin")))
      assert(got.map(_._1).toSet === Set(501L))
      val (_, idR, margin) = got.head
      assert(idR === 101L)
      // sum_l = 1e6 (rY twin), nbr(rY) over the release corpus = 5e5:
      // margin = 2·1e6/(1e6 + 5e5) = 1.333333 exactly at micro scale
      assert(margin === 1.333333)
    } finally q.stop()
  }

  test("bitext mine probe at the wide dial: at-ingest equals the REGISTERED s43 forward leg per arrival") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    // dim 36 ≥ sigDim 32 — artifacts keyed at the scale-true geometry,
    // the exact body of s43_bitext_forward_wide (bitextForwardBest at
    // (32, 2)): stream and batch serve ONE registered dial
    def vec(i: Long, shift: Double): Seq[Float] = {
      val c = i % 3
      (0 until 36).map { d =>
        (math.sin(c * 2.1 + d * 0.7 + shift) +
          0.15 * math.cos(i * 1.3 + d * 0.31)).toFloat
      }
    }
    val leftRows = (0L until 6L).map(i => (i, vec(i, 0.0)))
    val rightRows = (0L until 9L).map(i => (i + 100L, vec(i, 0.04)))
    val leftDf = leftRows.toDF("vec_id", "embedding")
    val rightDf = rightRows.toDF("vec_id", "embedding")
    val bandIdx = SimilarityOps.bitextBandIndex(rightDf, 32, 2)
    val vecIdx = SimilarityOps.bitextVecIndex(rightDf)
    val nbrIdx = SimilarityOps.bitextNeighborhoodIndex(
      leftDf, rightDf, 3, 32, 2)
    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    val mined = PipelineStreams.bitextMineProbe(
      in.toDF().toDF("ts", "vec_id", "embedding"), bandIdx, vecIdx,
      nbrIdx, "ts", "vec_id", "embedding", sigDim = 32, bands = 2,
      k = 3, "10 minutes", "5 minutes")
    val q = mined.writeStream.format("memory").queryName("bmpw")
      .outputMode("append").start()
    try {
      leftRows.zipWithIndex.foreach { case ((id, v), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"),
          id, v))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"),
        9999L, vec(1L, 0.0)))
      q.processAllAvailable()
      val got = spark.table("bmpw").collect()
        .filter(_.getAs[Long]("id_l") != 9999L)
        .map(r => r.getAs[Long]("id_l") ->
          (r.getAs[Long]("id_r"), r.getAs[Double]("sim"),
            r.getAs[Double]("margin")))
        .toMap
      val want = SimilarityOps.bitextForwardBest(leftDf, rightDf, 3,
          sigDim = 32, bands = 2).collect()
        .map(r => r.getAs[Long]("id_l") ->
          (r.getAs[Long]("id_r"), r.getAs[Double]("sim"),
            r.getAs[Double]("margin")))
        .toMap
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("chunk retrieve top-k banded at the wide dial: at-ingest answers equal batch s38 per arrival") {
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    def txt(seed: Long): String =
      (0 until 12).map(j => s"w${(seed * 7 + j * 3) % 25}").mkString(" ")
    val corpusDocs = (1L until 30L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    // the scale-true geometry (s38): 32-bit sig, 2 bands of 16 bits —
    // the at-ingest twin keys the SAME pre-materialized artifacts at
    // the same dial, so streaming and batch can never slice differently
    val bandIdx = SimilarityOps.chunkBandIndex(corpusDocs, "doc_id",
      "text", chunk = 64, stride = 48, dim = 32, bands = 2)
    val vecIdx = SimilarityOps.chunkVecIndex(corpusDocs, "doc_id", "text",
      chunk = 64, stride = 48, dim = 32)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val top = PipelineStreams.chunkRetrieveTopKBanded(
      in.toDF().toDF("ts", "doc_id", "text"), bandIdx, vecIdx, "ts",
      "doc_id", "text", dim = 32, bands = 2, k = 3, "10 minutes",
      "5 minutes")
    val q = top.writeStream.format("memory").queryName("crtbw")
      .outputMode("append").start()
    val arrivals = Seq((0L, txt(3L)), (97L, txt(40L)), (194L, txt(17L)))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 3 * 97L,
        "window closer far past the arrivals"))
      q.processAllAvailable()
      val got = spark.table("crtbw").collect()
        .filter(_.getAs[Long]("query_id") != 3 * 97L)
        .map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var answered = false
      arrivals.foreach { case (id, t) =>
        val joint = corpusDocs.union(Seq((id, t)).toDF("doc_id", "text"))
        val s38 = SimilarityOps.chunkBandTopK(joint, "doc_id", "text",
            chunk = 64, stride = 48, dim = 32, bands = 2, queryMod = 97,
            k = 3)
          .filter(col("query_id") === id).collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
            r.getAs[Int]("chunk_id"), r.getAs[Double]("sim"))).toSet
        assert(got.getOrElse(id,
          Set.empty[(Int, Long, Int, Double)]) === s38, s"arrival $id")
        if (s38.nonEmpty) answered = true
      }
      // the wide dial must actually retrieve something on this corpus,
      // or the identity check shows nothing
      assert(answered)
    } finally q.stop()
  }

  test("substring cut against corpus: at-ingest rows equal batch d33 per arrival") {
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val L = 3
    val run = "one two three four five six"
    val corpusDocs = Seq(
      (1L, s"intro words then $run closing remark"),
      (2L, s"different head but $run and a tail"),
      (3L, "wholly unrelated corpus content sits here quietly")
    ).toDF("doc_id", "text")
    val idx = DedupOps.windowHashIndex(corpusDocs, "doc_id", "text", L)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val cut = PipelineStreams.substringCutAgainstCorpus(
      in.toDF().toDF("ts", "doc_id", "text"), idx, "ts", "doc_id", "text",
      windowTokens = L, "10 minutes", "5 minutes")
    val q = cut.writeStream.format("memory").queryName("scc")
      .outputMode("append").start()
    val arrivals = Seq(
      // copies a corpus run -> those windows cut, fresh frame kept
      (100L, s"fresh frame $run fresh tail words"),
      // repeats ITSELF (no corpus hit): first occurrence survives,
      // the later one is cut — the within-doc half of min-(id, pos)
      (101L, "pq rs tu vw pq rs tu vw"),
      // wholly fresh: nothing cut
      (102L, "completely novel arrival text nothing shared anywhere"),
      // short (< L tokens) and empty: no windows at all
      (103L, "tiny doc"),
      (104L, ""))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 300L,
        "window closer far past the arrivals sits here"))
      q.processAllAvailable()
      val got = spark.table("scc").collect()
        .filter(_.getAs[Long]("doc_id") != 300L)
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("n_covered"), r.getAs[String]("kept_text")))
        .toMap
      assert(got.keySet === arrivals.map(_._1).toSet)
      // batch twin: d33 over corpus ∪ arrivals (arrival ids above every
      // corpus id, no cross-arrival shared windows), arrival rows only
      val joint = corpusDocs.union(arrivals.toDF("doc_id", "text"))
      val batch = DedupOps.substringCutKeepFirst(joint, "doc_id", "text", L)
        .filter(col("doc_id") >= 100L).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("n_covered"), r.getAs[String]("kept_text")))
        .toMap
      assert(got === batch)
      // and the fixture actually exercises both cut sources
      assert(got(100L)._3 > 0L, "corpus-hit windows must cut")
      assert(got(101L)._3 > 0L, "within-doc repeats must cut")
      assert(got(101L)._4.startsWith("pq rs tu vw"),
        "the FIRST within-doc occurrence survives")
      assert(got(102L)._3 === 0L && got(103L)._3 === 0L)
    } finally q.stop()
  }

  test("substring cut against a BENCHMARK index is streaming decontamination: rows equal batch t47 per arrival") {
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val L = 3
    val leak = "q1 q2 q3 q4 q5"
    val bench = Seq(
      (100L, s"eval item asks $leak and expects an answer"),
      (101L, "second benchmark item wholly distinct from everything")
    ).toDF("doc_id", "text")
    val idx = DedupOps.windowHashIndex(bench, "doc_id", "text", L)

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val cut = PipelineStreams.substringCutAgainstCorpus(
      in.toDF().toDF("ts", "doc_id", "text"), idx, "ts", "doc_id", "text",
      windowTokens = L, "10 minutes", "5 minutes")
    val q = cut.writeStream.format("memory").queryName("sdc")
      .outputMode("append").start()
    // arrivals have no within-doc repeats, so the streaming cut's
    // superset divergence (it also cuts within-doc repeats; t47 does
    // not) is vacuous and the two must agree exactly
    val arrivals = Seq(
      (1L, s"training text copied $leak straight from the eval"),
      (2L, "fresh training document sharing nothing with benchmarks"))
    try {
      arrivals.zipWithIndex.foreach { case ((id, t), i) =>
        in.addData((java.sql.Timestamp.valueOf(s"2021-01-16 17:0$i:00"), id, t))
      }
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2021-01-16 17:40:00"), 300L,
        "window closer far past the arrivals sits here"))
      q.processAllAvailable()
      val got = spark.table("sdc").collect()
        .filter(_.getAs[Long]("doc_id") != 300L)
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("n_covered"), r.getAs[String]("kept_text")))
        .toMap
      val batch = DedupOps.decontaminateCut(
          arrivals.toDF("doc_id", "text"), bench, "doc_id", "text", L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("n_covered"), r.getAs[String]("kept_text")))
        .toMap
      assert(got === batch)
      assert(got(1L)._3 > 0L, "the leak must actually cut")
      assert(got(2L)._3 === 0L)
    } finally q.stop()
  }
}
