package graft.jobs

import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.StreamerMain.{parseArgs, StreamerArgs}

/** StreamerMain CLI contract: explicit `--limit` flag (no digits-only
  * positional heuristic), trailing positional = outDir, and a usage error
  * (not a MatchError) on malformed invocations.
  */
class StreamerArgsSpec extends AnyFunSuite {

  private val base = Seq("in.jsonl", "2026-01-01T00:00:00", "2026-01-02T00:00:00")

  test("three positionals parse with no limit/outDir") {
    assert(parseArgs(base) ===
      Right(StreamerArgs("in.jsonl", base(1), base(2), None, None)))
  }

  test("fewer than three args is a usage error, not a MatchError") {
    assert(parseArgs(Seq.empty).isLeft)
    assert(parseArgs(Seq("in.jsonl", "start")).isLeft)
  }

  test("--limit N parses; bad N is a usage error") {
    assert(parseArgs(base ++ Seq("--limit", "7")) ===
      Right(StreamerArgs("in.jsonl", base(1), base(2), Some(7), None)))
    assert(parseArgs(base ++ Seq("--limit", "7", "out/")) ===
      Right(StreamerArgs("in.jsonl", base(1), base(2), Some(7), Some("out/"))))
    assert(parseArgs(base ++ Seq("--limit", "-3")).isLeft)
    assert(parseArgs(base ++ Seq("--limit", "abc")).isLeft)
  }

  test("a digits-only 4th positional is an outDir, never a limit") {
    assert(parseArgs(base :+ "12345") ===
      Right(StreamerArgs("in.jsonl", base(1), base(2), None, Some("12345"))))
  }

  test("unknown flags and excess positionals are usage errors") {
    assert(parseArgs(base :+ "--frobnicate").isLeft)
    assert(parseArgs(base ++ Seq("a", "b")).isLeft)
  }
}
