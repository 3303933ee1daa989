package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph family's GROWTH gate (r14 Next #4). The events ladder only
  * re-phases the fixture's 20-host node set — g01/g03's ScaleGate rows
  * measure the corpus-sized edge/digest aggregate (the dominant 100 TB
  * cost), but the GRAPH itself never grows there. This probe grows the
  * graph two ways and measures the iteration contracts directly:
  *
  *  1. **Path graphs of doubling diameter** — the adversarial case for
  *     label propagation. Records `connectedComponents`' OBSERVED
  *     convergence rounds: the pointer-halving contract says rounds grow
  *     ~log2(diameter), not diameter (plain propagation would need
  *     diameter hops — the r13 10× phash-chain lesson).
  *
  *  2. **Replica-prefixed host graphs** — R copies of the real
  *     events-derived 20-host link graph (every host of replica i
  *     renamed "r{i}.<host>"), chained into ONE component through a
  *     single bridge edge per adjacent replica pair. Nodes and diameter
  *     both grow ~R while per-node degree stays fixed — the shape of a
  *     web-host graph growing horizontally. Records hostRank wall time
  *     (10 fixed iterations; expected ~flat per edge) and CC rounds
  *     (expected ~log2(2R · ring-diameter)).
  *
  *   runMain graft.tools.GraphGrowthProbe /root/testdata/sf0.1 GRAPHGROWTH_r15.json
  */
object GraphGrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: GraphGrowthProbe <sfDir> <outJson>")
    val Array(sfDir, outJson) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the objectHashAggregate fallback raise moved OFF the session
      // builder: it travels with the capped-heap queries through
      // graft.HeapScope's child session (r16 — blast-radius scoping)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{DedupOps, GraphOps}

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def r3(d: Double): String = f"$d%.3f"

    // ---- 1. path graphs: CC rounds vs diameter --------------------
    val pathRows = Seq(16L, 64L, 256L, 1024L).map { d =>
      val nodes = spark.range(0L, d + 1L).select(col("id"))
      val edges = spark.range(0L, d)
        .select(col("id").as("src"), (col("id") + 1L).as("dst"))
      val ((cc, rounds), sec) = timed {
        val (df, r) = DedupOps.ccWithRounds(nodes, edges)
        (df.localCheckpoint(), r) // materialize inside the timer
      }
      val nClusters = cc.select(col("cluster_id")).distinct().count()
      require(nClusters == 1L,
        s"path d=$d: expected one component, got $nClusters")
      println(s"[graph-growth] path d=$d rounds=$rounds " +
        s"log2=${(math.log(d.toDouble) / math.log(2)).round} sec=${r3(sec)}")
      s"""{"diameter":$d,"cc_rounds":$rounds,"sec":${r3(sec)}}"""
    }

    // ---- 2. replica-prefixed host graphs --------------------------
    val base = GraphOps.eventLinks(spark, sfDir).localCheckpoint()
    val baseEdges = base.count()
    val replicaRows = Seq(1, 4, 16, 64).map { r =>
      val reps = spark.range(0, r.toLong).select(col("id").as("rep"))
      val links = base.crossJoin(reps)
        .select(concat(lit("r"), col("rep"), lit("."), col("src")).as("src"),
          concat(lit("r"), col("rep"), lit("."), col("dst")).as("dst"))
      // one bridge per adjacent replica pair chains the copies into a
      // single component whose diameter grows ~linearly in r
      val bridges = spark.range(0, (r - 1).toLong)
        .select(
          concat(lit("r"), col("id"), lit(".host0.example.org")).as("src"),
          concat(lit("r"), col("id") + 1L, lit(".host0.example.org"))
            .as("dst"))
      val all = links.unionByName(bridges).localCheckpoint()
      val nEdges = r.toLong * baseEdges + (r - 1).toLong
      val (_, rankSec) = timed {
        GraphOps.hostRank(all).write.format("noop").mode("overwrite").save()
      }
      val nodes = all.select(col("src").as("id"))
        .unionByName(all.select(col("dst").as("id"))).distinct()
      val nNodes = nodes.count()
      // CC sees the DISTINCT edge set — how every production caller
      // feeds it (g01 aggregates (src, dst) first, g03 emits one row
      // per pair); the raw multigraph (100k link rows over ≤400
      // distinct pairs per replica) would measure duplicate-row join
      // volume, not the operator as used
      val distinctEdges = all.select(col("src"), col("dst"))
        .distinct().localCheckpoint()
      val nDistinct = distinctEdges.count()
      val ((cc, ccRounds), ccSec) = timed {
        val (df, rr) = DedupOps.ccWithRounds(nodes, distinctEdges)
        (df.localCheckpoint(), rr)
      }
      val nClusters = cc.select(col("cluster_id")).distinct().count()
      require(nClusters == 1L,
        s"replicas r=$r: expected one bridged component, got $nClusters")
      println(s"[graph-growth] replicas r=$r nodes=$nNodes " +
        s"edges=$nEdges distinct=$nDistinct cc_rounds=$ccRounds " +
        s"cc_sec=${r3(ccSec)} rank_sec=${r3(rankSec)}")
      s"""{"replicas":$r,"nodes":$nNodes,"edge_rows":$nEdges,""" +
        s""""distinct_edges":$nDistinct,""" +
        s""""cc_rounds":$ccRounds,"cc_sec":${r3(ccSec)},""" +
        s""""rank_sec":${r3(rankSec)}}"""
    }

    val json =
      s"""{"src":"$sfDir","base_link_rows":$baseEdges,""" +
        s""""path":[${pathRows.mkString(",")}],""" +
        s""""host_replicas":[${replicaRows.mkString(",")}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[graph-growth] wrote $outJson")
    spark.stop()
  }
}
