package graft.operators

import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Launcher engine tests (SURVEY.md §5.5): schedule predicate differential
  * vs a direct java.time reimplementation over generated (now, schedule)
  * pairs, plus an end-to-end JSONL-spec → launch-message run with injected
  * `now` values, covering every FIXTURES.md §3 case.
  */
class LauncherSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Direct model of reference launcher.py:67-134 + 161-163. */
  private def dueModel(now: LocalDateTime, start: String, end: String,
      freq: String): Boolean = {
    def parse(s: String): Option[LocalDateTime] =
      if (s == null || s.isEmpty) None
      else try Some(LocalDateTime.parse(s, fmt)) catch { case _: Exception => None }
    parse(start) match {
      case None => false
      case Some(sd) =>
        if (now.isBefore(sd)) false
        else if (parse(end).exists(ed => now.isAfter(ed))) false
        else {
          val freqOk = freq match {
            case "DAILY" => true
            case "WEEKLY" => now.getDayOfWeek == sd.getDayOfWeek
            case "MONTHLY" => now.getDayOfMonth == sd.getDayOfMonth
            case "QUARTERLY" => now.getDayOfMonth == sd.getDayOfMonth &&
              now.getMonthValue % 3 == sd.getMonthValue % 3
            case "SIXMONTHLY" => now.getDayOfMonth == sd.getDayOfMonth &&
              now.getMonthValue % 6 == sd.getMonthValue % 6
            case "ANNUAL" => now.getDayOfMonth == sd.getDayOfMonth &&
              now.getMonthValue == sd.getMonthValue
            case _ => false // DOMAINCRAWL / unknown
          }
          freqOk && now.getHour == sd.getHour
        }
    }
  }

  test("F6/F7 property: column predicate agrees with direct model on 2000 random cases") {
    val rnd = new scala.util.Random(7)
    val freqs = Seq("DAILY", "WEEKLY", "MONTHLY", "QUARTERLY", "SIXMONTHLY",
      "ANNUAL", "DOMAINCRAWL", "BOGUS")
    val cases = (0 until 2000).map { i =>
      val start = LocalDateTime.of(2020 + rnd.nextInt(3), 1 + rnd.nextInt(12),
        1 + rnd.nextInt(28), rnd.nextInt(24), 0, 0)
      val now = LocalDateTime.of(2021 + rnd.nextInt(3), 1 + rnd.nextInt(12),
        1 + rnd.nextInt(28), rnd.nextInt(24), rnd.nextInt(60), rnd.nextInt(60))
      val startS = if (i % 23 == 0) "" else start.format(fmt)
      val endS = i % 5 match {
        case 0 => "" // open-ended
        case 1 => start.plusDays(rnd.nextInt(400)).format(fmt) // may be passed
        case _ => "2030-01-01 00:00:00"
      }
      (i, startS, endS, freqs(rnd.nextInt(freqs.length)), Timestamp.valueOf(now))
    }
    val df = cases.map { case (i, s, e, f, n) => (i, s, e, f, n) }
      .toDF("i", "startDate", "endDate", "frequency", "now")
    val got = df.withColumn("due", Launcher.scheduleDue(col("now"),
        col("startDate"), col("endDate"), col("frequency")))
      .select("i", "due").collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (i, s, e, f, n) =>
      val want = dueModel(n.toLocalDateTime, s, e, f)
      assert(got(i) === want, s"case $i: start=$s end=$e freq=$f now=$n")
    }
  }

  test("QUARTERLY congruence: January schedule fires in April, not February") {
    val df = Seq(
      ("2021-04-05 09:00:00"), ("2021-02-05 09:00:00"), ("2021-07-05 09:00:00"))
      .toDF("now")
      .withColumn("due", Launcher.scheduleDue(
        to_timestamp(col("now")), lit("2021-01-05 09:30:00"), lit(""),
        lit("QUARTERLY")))
    assert(df.collect().map(_.getBoolean(1)).toSeq === Seq(true, false, true))
  }

  private def writeSpecs(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("specs").toFile
    val f = new java.io.File(dir, "specs.jsonl")
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  test("end-to-end: JSONL specs → due launch messages with key and JSON value") {
    val path = writeSpecs(Seq(
      // due DAILY at 09: two seeds, subdomains+DEEP+ignoreRobots
      """{"id":1,"title":"daily","seeds":["https://a.example.org/","https://twitter.com/x"],"depth":"DEEP","scope":"subdomains","ignoreRobotsTxt":true,"schedules":[{"startDate":"2021-01-05 09:30:00","endDate":"","frequency":"DAILY"}]}""",
      // not due: wrong hour
      """{"id":2,"title":"wrong-hour","seeds":["https://b.example.org/"],"depth":"CAPPED","scope":"plus1Scope","ignoreRobotsTxt":false,"schedules":[{"startDate":"2021-01-05 10:30:00","endDate":"","frequency":"DAILY"}]}""",
      // malformed: no seeds
      """{"id":3,"title":"no-seeds","seeds":[],"depth":"CAPPED","scope":"","ignoreRobotsTxt":false,"schedules":[{"startDate":"2021-01-05 09:00:00","endDate":"","frequency":"DAILY"}]}""",
      // not due: endDate passed
      """{"id":4,"title":"ended","seeds":["https://c.example.org/"],"depth":"CAPPED","scope":"","ignoreRobotsTxt":false,"schedules":[{"startDate":"2020-01-05 09:30:00","endDate":"2020-06-01 00:00:00","frequency":"DAILY"}]}"""))
    val specs = spark.read.schema(graft.schema.CrawlSchemas.crawlSpecSchema).json(path)
    val now = Timestamp.valueOf("2021-06-10 09:15:00")
    val out = Launcher.dueLaunches(specs, now)
      .orderBy("id", "seed").collect()

    assert(out.length === 2) // target 1's two seeds only
    val first = out(0)
    assert(first.getAs[String]("seed") === "https://a.example.org/")
    assert(first.getAs[String]("source") === "tid:1:https://a.example.org/")
    assert(first.getAs[Seq[String]]("sheets") ===
      Seq("ignoreRobots", "subdomainsScope", "noLimit"))
    assert(first.getAs[String]("launch_ts") === "20210610091500")
    assert(first.getAs[Int]("parallel_queues") === 1)
    assert(out(1).getAs[Int]("parallel_queues") === 2) // twitter.com seed

    // key = murmur3 LE-hex of the raw netloc
    assert(first.getAs[String]("key") ===
      graft.functions.Murmur3.authorityKeyHex(
        org.apache.spark.unsafe.types.UTF8String.fromString("a.example.org")).toString)

    // value JSON: required fields + conditional keys present/absent
    val v = first.getAs[String]("value")
    assert(v.contains(""""url":"https://a.example.org/""""))
    assert(v.contains(""""isSeed":true"""))
    assert(v.contains(""""annotations":["resetQuotas","launchTimestamp:20210610091500"]"""))
    assert(v.contains(""""launch_ts":"20210610091500""""))
    assert(!v.contains("targetSheet")) // parallel_queues == 1 → omitted
    val v2 = out(1).getAs[String]("value")
    assert(v2.contains(""""queueAssignmentPolicy.parallelQueues":2"""))

    // F5 reject stream
    val rejects = Launcher.malformedTargets(specs).collect()
    assert(rejects.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("f07/f06 emit totally ordered output without a top-level ORDER BY") {
    // Both queries sort the NARROW raw columns mid-plan and project the
    // heavy date work above the sort (so the range-sampling pass doesn't
    // run it twice). The oracle compare is ordered, so this pins the
    // order-preservation invariant (Project stays above Sort; coalesce(1)
    // concatenates range partitions in order) against future plan changes.
    for (q <- Seq("f07_schedule_due", "f06_window_filter")) {
      val ids = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"$q output not sorted by event_id")
      assert(ids.nonEmpty)
    }
  }
}
