package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-query retrieval top-k: the k best-scored
  * (sim, corpus_id, chunk_id) candidates per query under the retrieval
  * family's total order (sim DESC, corpus_id ASC, chunk_id ASC) — the
  * heap spelling of
  * `row_number() over (partition by query_id order by sim desc, corpus_id,
  * chunk_id) <= k`, the [[TopKAgg]] discipline applied to the executed
  * retrieval rungs' rerank tail.
  *
  * Why not the window (measured, r14): at the 100× slice the s38 rerank
  * window sorted 273M scored candidate rows per-query — ~40 s of a 125 s
  * query and the bulk of its spill. The aggregate's buffer is CAPPED at
  * k: map-side partials carry at most k entries per query, so the
  * post-score exchange moves O(partitions · queries · k) rows instead of
  * every scored candidate, and nothing sorts more than k elements.
  *
  * Determinism: (sim, corpus_id, chunk_id) is a total order because
  * (corpus_id, chunk_id) is unique per query — merge of sorted bounded
  * lists under a total order is associative and commutative, so the kept
  * ranks are independent of partitioning and arrival order (spec-pinned
  * against the window form, ties included). Sims are never NaN here
  * (zero-norm candidates score an explicit 0.0), so primitive double
  * comparison is safe.
  */
object RetrievalTopKAgg {

  /** One scored candidate. Field order gives struct-literal call sites
    * the (sim, corpus, chunk) shape the comparator reads. */
  case class Entry(sim: Double, corpus_id: Long, chunk_id: Int)

  case class Buf(items: List[Entry])

  /** The retrieval total order: better sim first, then the id tiebreak. */
  private def lt(a: Entry, b: Entry): Boolean =
    a.sim > b.sim ||
      (a.sim == b.sim && (a.corpus_id < b.corpus_id ||
        (a.corpus_id == b.corpus_id && a.chunk_id < b.chunk_id)))

  /** Insert preserving the order; caller trims to k. Iterative — the
    * TopKAgg stack-frame rule. */
  private def insert(e: Entry, xs: List[Entry]): List[Entry] = {
    val prefix = List.newBuilder[Entry]
    var rest = xs
    while (rest.nonEmpty && lt(rest.head, e)) {
      prefix += rest.head
      rest = rest.tail
    }
    prefix.result() ::: (e :: rest)
  }

  private def mergeSorted(a: List[Entry], b: List[Entry]): List[Entry] = {
    val out = List.newBuilder[Entry]
    var (x, y) = (a, b)
    while (x.nonEmpty && y.nonEmpty) {
      if (lt(y.head, x.head)) { out += y.head; y = y.tail }
      else { out += x.head; x = x.tail }
    }
    out.result() ::: (if (x.nonEmpty) x else y)
  }

  /** [[insert]] that drops `e` when an EQUAL entry already sits at the
    * insertion point — equal entries are adjacent under the total
    * order, so one comparison decides. */
  private def insertDistinct(e: Entry, xs: List[Entry]): List[Entry] = {
    val prefix = List.newBuilder[Entry]
    var rest = xs
    while (rest.nonEmpty && lt(rest.head, e)) {
      prefix += rest.head
      rest = rest.tail
    }
    if (rest.nonEmpty && !lt(e, rest.head)) xs // neither lt ⇒ equal ⇒ dup
    else prefix.result() ::: (e :: rest)
  }

  private def mergeDistinct(a: List[Entry], b: List[Entry]): List[Entry] = {
    val out = List.newBuilder[Entry]
    var (x, y) = (a, b)
    while (x.nonEmpty && y.nonEmpty) {
      if (lt(x.head, y.head)) { out += x.head; x = x.tail }
      else if (lt(y.head, x.head)) { out += y.head; y = y.tail }
      else { out += x.head; x = x.tail; y = y.tail } // equal: keep one
    }
    out.result() ::: (if (x.nonEmpty) x else y)
  }

  /** [[topK]] over DISTINCT entries — the streaming at-ingest variant.
    * Multi-band / multi-probe agreements deliver the SAME
    * (sim, corpus, chunk) struct several times; the batch plans drop
    * those through a candidate DISTINCT before scoring, but at the
    * door there is no distinct stage, so the heap dedups ON INSERT
    * (one adjacency comparison — equal entries are neighbors under the
    * total order). Dedup happens BEFORE the cap — "k best distinct";
    * a post-cap dedup would under-fill the answer. This is what keeps
    * the streaming state-store row per (window, query) at ≤ k entries:
    * the collect_list→sort→slice form it replaced buffered the WHOLE
    * banded candidate mass per arrival in state (53.6k structs/query
    * at the 100× dial — the r15 ingest probe measured that form
    * failing to drain 20 microbatches in 25 minutes).
    */
  def topKDistinct(k: Int): Aggregator[Entry, Buf, Seq[Entry]] = {
    require(k > 0, s"top-k bound must be positive, got $k")
    new Aggregator[Entry, Buf, Seq[Entry]] {
      override def zero: Buf = Buf(Nil)

      override def reduce(b: Buf, e: Entry): Buf =
        if (b.items.lengthCompare(k) < 0) Buf(insertDistinct(e, b.items))
        else if (lt(e, b.items.last))
          Buf(insertDistinct(e, b.items).take(k))
        else b // e is worse than (or equal to) the current k-th

      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeDistinct(a.items, b.items).take(k))

      override def finish(b: Buf): Seq[Entry] = b.items

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }
  }

  /** The k best entries per query; finish emits them rank-ordered, so a
    * `posexplode` downstream recovers the 1-based rank. */
  def topK(k: Int): Aggregator[Entry, Buf, Seq[Entry]] = {
    require(k > 0, s"top-k bound must be positive, got $k")
    new Aggregator[Entry, Buf, Seq[Entry]] {
      override def zero: Buf = Buf(Nil)

      override def reduce(b: Buf, e: Entry): Buf =
        if (b.items.lengthCompare(k) < 0) Buf(insert(e, b.items))
        else if (lt(e, b.items.last)) Buf(insert(e, b.items).take(k))
        else b

      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeSorted(a.items, b.items).take(k))

      override def finish(b: Buf): Seq[Entry] = b.items

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }
  }
}

/** [[RetrievalTopKAgg]]'s bitext twin — the capped per-arrival k-NN
  * buffer of the at-ingest miner
  * ([[graft.streaming.PipelineStreams.bitextMineProbe]]): entries carry
  * the candidate's integer micro-cosine plus the release-time
  * neighborhood payload (sum_r / cnt_r ride along NULLABLE — a novel
  * arrival's collision may be absent from the neighborhood artifact,
  * and batch `bitextForwardBest` keeps such candidates in the top-k
  * too). Total order (sim_micro DESC, id_r ASC); dedup on insert — a
  * multi-band agreement delivers the identical entry (same id_r ⇒ same
  * artifact payload), and the batch plan's candidate DISTINCT is
  * restated here exactly as in [[RetrievalTopKAgg.topKDistinct]].
  * State per (window, arrival) is ≤ k entries instead of the whole
  * banded collision mass.
  */
object BitextTopKAgg {

  case class Entry(sim_micro: Long, id_r: Long, sum_r: Option[Long],
      cnt_r: Option[Long])

  case class Buf(items: List[Entry])

  private def lt(a: Entry, b: Entry): Boolean =
    a.sim_micro > b.sim_micro ||
      (a.sim_micro == b.sim_micro && a.id_r < b.id_r)

  private def insertDistinct(e: Entry, xs: List[Entry]): List[Entry] = {
    val prefix = List.newBuilder[Entry]
    var rest = xs
    while (rest.nonEmpty && lt(rest.head, e)) {
      prefix += rest.head
      rest = rest.tail
    }
    if (rest.nonEmpty && !lt(e, rest.head)) xs // equal ⇒ duplicate
    else prefix.result() ::: (e :: rest)
  }

  private def mergeDistinct(a: List[Entry], b: List[Entry]): List[Entry] = {
    val out = List.newBuilder[Entry]
    var (x, y) = (a, b)
    while (x.nonEmpty && y.nonEmpty) {
      if (lt(x.head, y.head)) { out += x.head; x = x.tail }
      else if (lt(y.head, x.head)) { out += y.head; y = y.tail }
      else { out += x.head; x = x.tail; y = y.tail }
    }
    out.result() ::: (if (x.nonEmpty) x else y)
  }

  def topKDistinct(k: Int): Aggregator[Entry, Buf, Seq[Entry]] = {
    require(k > 0, s"top-k bound must be positive, got $k")
    new Aggregator[Entry, Buf, Seq[Entry]] {
      override def zero: Buf = Buf(Nil)

      override def reduce(b: Buf, e: Entry): Buf =
        if (b.items.lengthCompare(k) < 0) Buf(insertDistinct(e, b.items))
        else if (lt(e, b.items.last))
          Buf(insertDistinct(e, b.items).take(k))
        else b

      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeDistinct(a.items, b.items).take(k))

      override def finish(b: Buf): Seq[Entry] = b.items

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }
  }
}
