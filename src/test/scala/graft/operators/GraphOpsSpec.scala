package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** hostRank pinned against an independent driver-side reimplementation of
  * the SAME integer recurrence (Map-fold, no Spark), plus the structural
  * properties the integer discipline guarantees: mass bounds, dangling
  * leak, weight sensitivity, partitioning invariance.
  */
class GraphOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** The recurrence, re-derived by hand: teleport + d·Σ over in-edges of
    * the two-term integer split — an independent second implementation,
    * so a compensating bug in the Spark fold cannot hide. */
  private def rankByHand(links: Seq[(String, String)],
      iterations: Int): Map[String, Long] = {
    val edges = links.filter(e => e._1 != e._2)
      .groupBy(identity).map { case ((s, d), xs) => (s, d, xs.size.toLong) }
      .toSeq
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> GraphOps.RankInitMicro).toMap
    (1 to iterations).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) =>
          (r(s) / ow(s)) * w + ((r(s) % ow(s)) * w) / ow(s)
        }.sum
      }
      r = nodes.map(n => n -> (GraphOps.TeleportMicro +
        GraphOps.DampNum * in.getOrElse(n, 0L) / GraphOps.DampDen)).toMap
    }
    r
  }

  private def runRank(links: Seq[(String, String)], iterations: Int = 10,
      parts: Int = 1): Map[String, Long] = {
    val df0 = links.toDF("src", "dst")
    val df = if (parts > 1) df0.repartition(parts) else df0
    GraphOps.hostRank(df, iterations)
      .as[(String, Long)].collect().toMap
  }

  test("hostRank equals the hand fold on a weighted cyclic graph") {
    // a: two outs (b twice, c once) — weighted split 2/3 vs 1/3;
    // b->a closes a cycle; c dangles (mass leaks by design)
    val links = Seq("a" -> "b", "a" -> "b", "a" -> "c", "b" -> "a")
    val got = runRank(links)
    assert(got === rankByHand(links, 10))
    // the weighted edge matters: b (2/3 of a's mass + cycle) outranks c
    assert(got("b") > got("c"))
    // mass bounds: every rank in [teleport, N·init]; total never grows
    got.values.foreach(v => assert(v >= GraphOps.TeleportMicro))
    assert(got.values.sum <= links.flatMap(e => Seq(e._1, e._2))
      .distinct.size * GraphOps.RankInitMicro)
  }

  test("dangling host keeps exactly teleport + damped inflow; self-loops " +
    "and partitioning change nothing") {
    val links = Seq("a" -> "b", "a" -> "a", "b" -> "b") // a->b plus noise
    val clean = Seq("a" -> "b")
    // self-loops are dropped before weighting: the two graphs are equal
    assert(runRank(links) === runRank(clean))
    // b is dangling: rank(b) = teleport + d·(a's full mass), folded by hand
    assert(runRank(clean) === rankByHand(clean, 10))
    // order/partitioning invariance of the integer fold
    assert(runRank(links, parts = 7) === runRank(links))
  }

  test("mirror sources: shared-content edges cluster, sub-threshold and " +
    "boilerplate-only overlap stay singleton, null text is ignored") {
    val rows = scala.collection.mutable.Buffer[(Long, String, String)]()
    var id = 0L
    def add(src: String, text: String) = { rows += ((id, src, text)); id += 1 }
    // A and B mirror 5 contents; C shares only 1 real doc with A
    (1 to 5).foreach(i => { add("A", s"shared body $i"); add("B", s"shared body $i") })
    add("A", "a-only doc"); add("C", "c-only doc")
    add("A", "ac shared"); add("C", "ac shared")
    // a boilerplate digest on EVERY source incl. D: capped out by
    // maxSources, so D gets no edge despite 6 shared "contents"
    (1 to 6).foreach { i =>
      Seq("A", "B", "C", "D").foreach(s => add(s, s"boilerplate $i"))
    }
    val docs = rows.toSeq.toDF("doc_id", "source", "text")
      .unionByName(Seq((999L, "E", null.asInstanceOf[String]))
        .toDF("doc_id", "source", "text"))
    val got = GraphOps.mirrorSources(docs, "doc_id", "text", "source",
      minShared = 5L, maxSources = 3).as[(String, String, Boolean)]
      .collect().toSet
    assert(got === Set(("A", "A", true), ("B", "A", false),
      ("C", "C", true), ("D", "D", true), ("E", "E", true)))
    // raising the digest cap lets the boilerplate count: D now joins
    val loose = GraphOps.mirrorSources(docs, "doc_id", "text", "source",
      minShared = 5L, maxSources = 10).as[(String, String, Boolean)]
      .collect().toSet
    assert(loose.map(_._2).toSet === Set("A", "E"))
  }

  test("iteration-1 closed form on a star: hub collects damped inflow " +
    "from every leaf") {
    val leaves = (1 to 5).map(i => s"l$i" -> "hub")
    val got = runRank(leaves, iterations = 1)
    // each leaf: one out-edge, full mass flows: contrib = init each
    val expected = GraphOps.TeleportMicro +
      GraphOps.DampNum * (5L * GraphOps.RankInitMicro) / GraphOps.DampDen
    assert(got("hub") === expected)
    leaves.foreach { case (l, _) =>
      assert(got(l) === GraphOps.TeleportMicro)
    }
  }
}
