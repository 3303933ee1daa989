package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass typed aggregator for the A4 per-host stats (SURVEY.md §2.7):
  * produces first/last timestamps, total, and the content-type/status
  * counter maps in a single shuffle, instead of the composed
  * sub-aggregation + `map_from_entries` reassembly (two shuffles).
  *
  * Buffer is a case class merged associatively — partial aggregation
  * happens map-side, so only per-host partial maps cross the wire: the
  * wire volume is O(distinct mimetypes+statuses per host), not O(events).
  */
object HostStatsAgg {

  case class In(tsMicros: Long, mimetype: String, statusCode: Option[Int])

  case class Buf(
      first: Long,
      last: Long,
      total: Long,
      contentTypes: Map[String, Long],
      statusCodes: Map[String, Long])

  case class Out(
      first_ts_micros: Long,
      last_ts_micros: Long,
      total: Long,
      content_types_csv: String, // sorted k:v CSV — deterministic render
      status_codes_csv: String)

  private def mergeMap(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  private def csv(m: Map[String, Long]): String =
    m.toSeq.map { case (k, v) => s"$k:$v" }.sorted.mkString(",")

  val aggregator: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    override def zero: Buf = Buf(Long.MaxValue, Long.MinValue, 0L, Map.empty, Map.empty)

    override def reduce(b: Buf, e: In): Buf = {
      val ct = if (e.mimetype == null) "unknown-content-type" else e.mimetype
      val sc = e.statusCode.map(_.toString).getOrElse("-")
      Buf(math.min(b.first, e.tsMicros), math.max(b.last, e.tsMicros),
        b.total + 1,
        b.contentTypes.updated(ct, b.contentTypes.getOrElse(ct, 0L) + 1L),
        b.statusCodes.updated(sc, b.statusCodes.getOrElse(sc, 0L) + 1L))
    }

    override def merge(a: Buf, b: Buf): Buf =
      Buf(math.min(a.first, b.first), math.max(a.last, b.last),
        a.total + b.total,
        mergeMap(a.contentTypes, b.contentTypes),
        mergeMap(a.statusCodes, b.statusCodes))

    override def finish(b: Buf): Out =
      Out(b.first, b.last, b.total, csv(b.contentTypes), csv(b.statusCodes))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}
