package graft.plans

import graft.SparkSpec
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join operator (logical node + strategy + exec) — the
  * composed union+window [[AsofJoin.asof]] is the semantics oracle.
  */
class AsofJoinPlanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00")),
    (2L, "k1", ts("2024-01-01 12:00:00")),
    (3L, "k1", ts("2024-01-01 09:00:00")), // before any right row
    (4L, "k2", ts("2024-01-01 12:00:00")), // equality match
    (5L, "k3", ts("2024-01-01 12:00:00"))  // key with no right rows
  ).toDF("id", "k", "ts")

  private lazy val right = Seq(
    ("k1", ts("2024-01-01 09:30:00"), "a"),
    ("k1", ts("2024-01-01 11:00:00"), "b"),
    ("k2", ts("2024-01-01 12:00:00"), "c")
  ).toDF("k", "rts", "payload")

  test("native asof: pinned example incl. strict mode") {
    val got = AsofJoinPlan.asof(left, right, Seq("k"), "ts", "rts",
      Seq("payload")).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_payload")).toMap
    assert(got === Map(1L -> "a", 2L -> "b", 3L -> null, 4L -> "c", 5L -> null))
    val strict = AsofJoinPlan.asof(left, right, Seq("k"), "ts", "rts",
      Seq("payload"), strict = true).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_payload")).toMap
    assert(strict(4L) === null && strict(2L) === "b")
  }

  test("native asof matches composed form on randomized data across partitions") {
    val rnd = new scala.util.Random(42)
    val lRows = Seq.tabulate(400)(i =>
      (i.toLong, s"k${rnd.nextInt(13)}",
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
    // unique (key, ts) right rows: the two forms' duplicate tie-breaks
    // differ by design (stringified-payload max vs last-in-sort-order)
    val rRows = rnd.shuffle(Seq.tabulate(300)(i =>
      (s"k${i % 17}", new java.sql.Timestamp(1700000000000L + (i / 17) * 7919L * 1000L),
        i.toLong * 11, s"p$i")))
    val l = lRows.toDF("id", "k", "ts").repartition(7)
    val r = rRows.toDF("k", "rts", "num", "tag").repartition(5)
    val native = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts",
      Seq("num", "tag")).select(col("id"), col("asof_num"), col("asof_tag"))
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)).map(_.toString).orNull, x.getAs[String](2))).toMap
    val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts",
      Seq("num", "tag")).select(col("id"), col("asof_num"), col("asof_tag"))
      .collect().map(x => x.getLong(0) ->
        (x.getAs[String](1), x.getAs[String](2))).toMap
    assert(native.size === composed.size)
    native.foreach { case (id, v) => assert(v === composed(id), s"id=$id") }
    // typed payload: native keeps the original long type
    val schema = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("num"))
      .schema("asof_num")
    assert(schema.dataType === org.apache.spark.sql.types.LongType)
    assert(schema.nullable)
  }

  test("native asof: null timestamps order nulls-first like the window sort") {
    val l = Seq((1L, "k", Option(ts("2024-01-01 10:00:00"))),
      (2L, "k", None)).toDF("id", "k", "ts")
    val r = Seq(("k", Option(ts("2024-01-01 09:00:00")), "real"),
      ("k", Option.empty[java.sql.Timestamp], "nullts")).toDF("k", "rts", "p")
    val native = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    assert(native === composed)
    assert(native === Seq("real", "nullts")) // null left ts sees only null-ts right
  }

  test("native asof: null keys group and match each other (documented contract)") {
    // null == null for grouping (like groupBy, UNLIKE SQL equality) — both
    // forms agree; SQL semantics callers pre-filter null keys.
    val l = Seq((1L, Option("k"), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq((Option("k"), ts("2024-01-01 09:00:00"), "kk"),
      (Option.empty[String], ts("2024-01-01 09:00:00"), "nn")).toDF("k", "rts", "p")
    val native = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    assert(native === composed)
    assert(native === Seq("kk", "nn")) // the null-key left row matched the null-key right row
    // pre-filtering null keys recovers SQL/DuckDB ASOF equality semantics
    val sqlized = AsofJoinPlan.asof(l.filter(col("k").isNotNull),
      r.filter(col("k").isNotNull), Seq("k"), "ts", "rts", Seq("p"))
      .collect().map(r0 => r0.getLong(0) -> r0.getAs[String]("asof_p")).toMap
    assert(sqlized === Map(1L -> "kk"))
  }

  test("native asof: empty right side and duplicate right (key,ts) rows") {
    val empty = right.filter(col("k") === "nope")
    val got = AsofJoinPlan.asof(left, empty, Seq("k"), "ts", "rts", Seq("payload"))
      .collect().map(_.getAs[String]("asof_payload"))
    assert(got.forall(_ == null) && got.length === 5)
    // duplicates at equal (key, ts): last row in sort order wins —
    // deterministic because ties break on the full right sort (ts equal ⇒
    // arrival within the sorted run); assert it matches single-row dedupe
    val dup = Seq(("k1", ts("2024-01-01 09:30:00"), "x"),
      ("k1", ts("2024-01-01 09:30:00"), "x")).toDF("k", "rts", "payload")
    val one = AsofJoinPlan.asof(left.filter(col("id") === 1), dup,
      Seq("k"), "ts", "rts", Seq("payload")).collect()
    assert(one.head.getAs[String]("asof_payload") === "x")
  }

  test("native asof under AQE coalescing: sides stay co-partitioned (adversarial sizes)") {
    // Two sides of very different byte sizes + tiny advisory size: if AQE
    // coalesced each side's shuffle independently the merge would pair
    // wrong partitions and the differential below would collapse.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "64")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val rnd = new scala.util.Random(7)
      val lRows = Seq.tabulate(20000)(i =>
        (i.toLong, s"key_with_some_width_${rnd.nextInt(50)}",
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(50000) * 1000L),
          "x" * 40))
      val rRows = Seq.tabulate(500)(i =>
        (s"key_with_some_width_${i % 50}",
          new java.sql.Timestamp(1700000000000L + (i / 50) * 4999L * 1000L),
          i.toLong))
      val l = lRows.toDF("id", "k", "ts", "pad")
      val r = rRows.toDF("k", "rts", "num")
      val native = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("num"))
        .select(col("id"), col("asof_num")).collect()
        .map(x => x.getLong(0) -> Option(x.get(1)).map(_.toString).orNull).toMap
      val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("num"))
        .select(col("id"), col("asof_num")).collect()
        .map(x => x.getLong(0) -> x.getAs[String](1)).toMap
      assert(native.size === 20000)
      native.foreach { case (id, v) => assert(v === composed(id), s"id=$id") }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native asof: multi-key join and self-join (fresh exprIds) work") {
    // two keys of different types exercises the composite key ordering
    val l2 = Seq((1L, "a", 1, ts("2024-01-01 10:00:00")),
      (2L, "a", 2, ts("2024-01-01 10:00:00")),
      (3L, "b", 1, ts("2024-01-01 10:00:00"))).toDF("id", "k1", "k2", "ts")
    val r2 = Seq(("a", 1, ts("2024-01-01 09:00:00"), "a1"),
      ("a", 2, ts("2024-01-01 09:00:00"), "a2"),
      ("b", 2, ts("2024-01-01 09:00:00"), "b2")).toDF("k1", "k2", "rts", "p")
    val got = AsofJoinPlan.asof(l2, r2, Seq("k1", "k2"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    assert(got === Seq("a1", "a2", null))
    val native2 = AsofJoin.asof(l2, r2, Seq("k1", "k2"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    assert(got === native2)
    // self-join: same DataFrame both sides — the builder re-aliases the
    // right side so analysis doesn't see conflicting attribute ids
    val events = Seq((1L, "k", ts("2024-01-01 10:00:00")),
      (2L, "k", ts("2024-01-01 11:00:00"))).toDF("id", "k", "ts")
    val self = AsofJoinPlan.asof(events, events.withColumnRenamed("ts", "rts")
        .withColumnRenamed("id", "rid"),
      Seq("k"), "ts", "rts", Seq("rid"), strict = true)
      .orderBy("id").collect().map(r => Option(r.get(r.length - 1))).toSeq
    assert(self === Seq(None, Some(1L))) // row 2's strict predecessor is row 1
  }

  test("native asof: mismatched key types (int vs long) coerce instead of mis-partitioning") {
    val l = Seq((1L, 5, ts("2024-01-01 10:00:00")),
      (2L, 6, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts") // k: int
    val r = Seq((5L, ts("2024-01-01 09:00:00"), "five"),
      (7L, ts("2024-01-01 09:00:00"), "seven")).toDF("k", "rts", "p") // k: long
    val native = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    assert(native === Seq("five", null))
    val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("p"))
      .orderBy("id").collect().map(_.getAs[String]("asof_p")).toSeq
    assert(native === composed)
  }

  test("native asof plan: one exchange+sort per side, no union, no window") {
    val df = AsofJoinPlan.asof(left, right, Seq("k"), "ts", "rts", Seq("payload"))
    // plan-shape snapshot BEFORE execution (the post-run adaptive string
    // repeats the tree as Final + Initial and would double-count)
    val plan = df.queryExecution.executedPlan.toString
    // operator metrics: 5 output rows, 3 with a match (ids 1, 2, 4)
    df.collect()
    // query stages are leaf wrappers — descend into them explicitly
    def findExec(p: org.apache.spark.sql.execution.SparkPlan): Option[AsofJoinExec] = p match {
      case e: AsofJoinExec => Some(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findExec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findExec(q.plan)
      case other => other.children.iterator.flatMap(findExec(_)).nextOption()
    }
    val exec = findExec(df.queryExecution.executedPlan).get
    assert(exec.metrics("numOutputRows").value === 5)
    assert(exec.metrics("numMatched").value === 3)
    assert(plan.contains("AsofJoinExec") || plan.contains("asof"),
      s"custom exec missing from plan:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"), plan)
    val nShuffles = "Exchange hashpartitioning".r
      .findAllIn(plan.replace("\n", " ")).length
    assert(nShuffles <= 2, s"expected ≤2 shuffles:\n$plan")
  }

  test("type alignment widens, never narrows: left DATE vs right TIMESTAMP") {
    // A right row later the same day must NOT match a left DATE row — a
    // narrowing timestamp→date cast would truncate it into equality and
    // leak future data into the temporal join.
    val l = Seq((1L, "k", java.sql.Date.valueOf("2024-01-02")))
      .toDF("id", "k", "ts")
    val r = Seq(("k", ts("2024-01-02 23:00:00"), "future"),
      ("k", ts("2024-01-01 05:00:00"), "past"))
      .toDF("k", "rts", "payload")
    val got = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("payload"))
      .collect().map(_.getAs[String]("asof_payload")).toSeq
    assert(got === Seq("past"))
    // composed form agrees (unionByName promotes to the wider type)
    val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("payload"))
      .collect().map(_.getAs[String]("asof_payload")).toSeq
    assert(composed === Seq("past"))
  }

  test("float keys normalize: -0.0 and 0.0 (and NaNs) meet in one group") {
    val l = Seq((1L, -0.0, ts("2024-01-01 12:00:00")),
      (2L, Double.NaN, ts("2024-01-01 12:00:00")))
      .toDF("id", "k", "ts")
    val r = Seq((0.0, ts("2024-01-01 10:00:00"), "zero"),
      (Double.NaN, ts("2024-01-01 10:00:00"), "nan"))
      .toDF("k", "rts", "payload")
    val got = AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("payload"))
      .orderBy("id").collect().map(_.getAs[String]("asof_payload")).toSeq
    assert(got === Seq("zero", "nan"),
      "float keys must normalize like Spark's own join keys")
  }

  test("duplicate right (key, ts) tie-break is deterministic: greatest payload wins") {
    val l = Seq((1L, "k", ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    // same (key, ts); payloads 9 and 10 — native-type ordering picks 10
    // (the composed form's stringified tiebreak picks "9"; divergence
    // documented on AsofJoin.asof)
    val r = Seq(("k", ts("2024-01-01 10:00:00"), 9L),
      ("k", ts("2024-01-01 10:00:00"), 10L))
      .toDF("k", "rts", "payload").repartition(4) // scatter across tasks
    val runs = (1 to 3).map { _ =>
      AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts", Seq("payload"))
        .collect().map(_.getAs[Long]("asof_payload")).toSeq
    }
    assert(runs.forall(_ === Seq(10L)), s"nondeterministic tie-break: $runs")
  }

  test("API-side validation: duplicate/colliding payloads, unorderable keys") {
    intercept[IllegalArgumentException] {
      AsofJoinPlan.asof(left, right, Seq("k"), "ts", "rts",
        Seq("payload", "payload"))
    }
    intercept[IllegalArgumentException] {
      AsofJoinPlan.asof(left, right, Seq("k"), "ts", "rts", Seq("rts"))
    }
    val mapKeyed = Seq((1L, Map("a" -> 1), ts("2024-01-01 12:00:00")))
      .toDF("id", "k", "ts")
    intercept[IllegalArgumentException] {
      AsofJoinPlan.asof(mapKeyed, mapKeyed
        .withColumnRenamed("ts", "rts").withColumn("payload", lit("x")),
        Seq("k"), "ts", "rts", Seq("payload"))
    }
  }

  test("node stats are linear in the inputs, not the children's product") {
    val df = AsofJoinPlan.asof(left, right, Seq("k"), "ts", "rts", Seq("payload"))
    val node = df.queryExecution.analyzed.collectFirst {
      case n: AsofJoinPlan.AsofJoinNode => n
    }.get
    val l = node.left.stats.sizeInBytes
    val r = node.right.stats.sizeInBytes
    assert(node.stats.sizeInBytes === l + r,
      s"expected linear size estimate, got ${node.stats.sizeInBytes} for children $l × $r")
  }
}
