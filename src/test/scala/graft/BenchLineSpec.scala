package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench output line is the driver's only machine-readable performance
  * record (it tail-captures ~2.9 KB of output and line-parses for bare
  * JSON) — pin the protocol: valid single-line JSON, abbreviated unique
  * keys, failure/flaky accounting, and a size budget at full registry
  * scale.
  */
class BenchLineSpec extends AnyFunSuite {

  private def parse(line: String): Map[String, Any] = {
    // dependency-free structural checks: no JSON lib on the main classpath
    assert(!line.contains("\n"))
    assert(line.startsWith("{") && line.endsWith("}"))
    Map.empty
  }

  test("renderLine emits one valid line; failures excluded from total") {
    val line = Bench.renderLine(
      Seq("a01_x" -> 0.5, "b02_y" -> -1.0, "c03_z" -> 0.25),
      flaky = Seq("c03_z"), sfDir = "/sf", key = identity)
    parse(line)
    assert(line.contains(""""value":0.75""")) // 0.5 + 0.25, -1 excluded
    assert(line.contains(""""b02_y":-1"""))
    assert(line.contains(""""failed":["b02_y"]"""))
    assert(line.contains(""""flaky":["c03_z"]"""))
    assert(line.contains(""""sf":"/sf""""))
  }

  test("shortKeys abbreviate uniquely; collisions fall back to full names") {
    val ks = Bench.shortKeys(Seq("a04_counter_map", "a04_cool_mix", "q01_agg"))
    // a04_counter_map and a04_cool_mix share the prefix AND the initials
    // abbreviation (a04cm) → both keep their full names; q01_agg takes
    // the bare prefix (shortest rung of the ladder)
    assert(ks("a04_counter_map") === "a04_counter_map")
    assert(ks("a04_cool_mix") === "a04_cool_mix")
    assert(ks("q01_agg") === "q01")
    assert(ks.values.toSeq.distinct.size === ks.size)
    // prefix collisions that the initials DO separate stay at tier two
    val ks2 = Bench.shortKeys(Seq("a04_counter_map", "a04_per_user", "b01_x"))
    assert(ks2("a04_counter_map") === "a04cm")
    assert(ks2("a04_per_user") === "a04pu")
    assert(ks2("b01_x") === "b01")
  }

  test("full-registry line fits the driver's capture window with margin") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val short = Bench.shortKeys(names)
    assert(short.values.toSeq.distinct.size === names.size, "key collision")
    // worst-case extras block mirroring main()'s audit fields
    val extras = Seq(
      "value_median" -> "9999.999",
      "runs_per_query" -> "3",
      "calib" -> """{"cpu":[99.999,99.999,99.999],"scan":[99.999,99.999,99.999],"cpu_end":99.999,"scan_end":99.999}""",
      "env" -> ("""{"mem_avail_mb":131072,"cached_mb":131072,"uptime_s":9999999,""" +
        """"procs":128,"quota_pct":12800,"load1_x100":12800,""" +
        """"mem_avail_mb_end":131072,"cached_mb_end":131072,"uptime_s_end":9999999,""" +
        """"procs_end":128,"quota_pct_end":12800,"load1_x100_end":12800}"""))
    // Worst case over the DOMINANT value tier: every query at the widest
    // [0.1 s, 10 s) rendering ("9.99", 4 B) — NOT 99.999, whose whole-second
    // "100" is a byte NARROWER and silently under-estimated the budget
    // through r17. (The sub-0.1 s tier is 5 B, but a value below 0.1 s
    // needs a sub-100 ms noop action — under the measured per-action floor
    // at the driver's sf0.1 — and each such query adds only 1 B, so the
    // 4 B tier is the realistic ceiling.) The r17 driver parsed a ~2950 B
    // line, so < 2900 keeps provable margin; at ~13 B per added registry
    // entry this trips after a handful of additions, which is the signal
    // to re-compact.
    val line = Bench.renderLine(names.map(_ -> 9.994), Seq.empty,
      "/root/testdata/sf0.1", short, extras)
    assert(line.length < 2900,
      s"bench line ${line.length} B — too close to the ~2.9 KB tail capture")
  }

  test("renderLine extras append as verbatim JSON fields") {
    val line = Bench.renderLine(Seq("a01_x" -> 0.5), Seq.empty, "/sf",
      identity, Seq("value_median" -> "0.6", "env" -> """{"cached_mb":12}"""))
    parse(line)
    assert(line.contains(""""value_median":0.6"""))
    assert(line.contains(""""env":{"cached_mb":12}"""))
  }

  test("measure: first-run failure is terminal, never retried to success") {
    var calls = 0
    val (t, med, flaky) = Bench.measure(() => { calls += 1; -1.0 })
    assert(t === -1.0 && med === -1.0 && !flaky)
    assert(calls === 1, "a failed first run must not be retried")
  }

  test("measure: clean best-of-three is not flaky; median is the middle run") {
    val runs = Iterator(0.9, 0.4, 0.6)
    val (t, med, flaky) = Bench.measure(() => runs.next())
    assert(t === 0.4 && !flaky)
    assert(med === 0.6, "median of {0.9, 0.4, 0.6} is 0.6")
  }

  test("measure: retry failure after a successful first run marks flaky") {
    val runs = Iterator(0.9, -1.0, 0.5)
    val (t, med, flaky) = Bench.measure(() => runs.next())
    assert(t === 0.5, "best SUCCESSFUL time wins")
    assert(med === 0.9, "upper median of the two successes {0.5, 0.9}")
    assert(flaky, "a post-success failure must surface as flaky")
  }

  test("3dp rendering: rounding and failure sentinel") {
    assert(Bench.r3(1.23456) === "1.235")
    assert(Bench.r3(0.0004) === "0.000")
    assert(Bench.r3(-1.0) === "-1")
  }

  test("relative per-query rendering: 3dp under 0.1 s, 2dp to 10 s, whole seconds above") {
    assert(Bench.rq(0.012345) === "0.012")
    assert(Bench.rq(0.0994) === "0.099")
    assert(Bench.rq(0.0996) === "0.10") // boundary: rounds INTO the 2dp tier
    assert(Bench.rq(0.12345) === "0.12") // r18: the sub-second bulk renders 2dp
    assert(Bench.rq(0.994) === "0.99")
    assert(Bench.rq(0.9994) === "1.00") // 2dp rounds [0.995, 1) up across the 1 s mark
    assert(Bench.rq(1.23456) === "1.23") // raw-value rounding, no 3dp→2dp double-round to "1.24"
    assert(Bench.rq(9.9946) === "9.99") // last value that stays in tier two
    assert(Bench.rq(9.9951) === "10") // 2dp would render "10.00": re-checked into the 0dp tier
    assert(Bench.rq(9.9994) === "10") // ditto — [9.995, 9.9995) no longer flaps as "10.00"
    assert(Bench.rq(9.9996) === "10") // boundary: rounds INTO the 0dp tier
    assert(Bench.rq(10.0) === "10")
    assert(Bench.rq(99.987) === "100")
    assert(Bench.rq(-1.0) === "-1")
  }
}
