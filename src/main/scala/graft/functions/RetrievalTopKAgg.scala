package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.runtime.universe.TypeTag

/** The ONE capped ordered-heap core behind the retrieval/bitext top-k
  * aggregates — insert/merge over a rank-ordered bounded list,
  * parameterized by the entry type and its strict total-order `lt`
  * (r15 ADVICE: [[BitextTopKAgg]] had duplicated the whole subtle
  * ordered-merge body from [[RetrievalTopKAgg]] verbatim; two copies of
  * merge logic drift).
  *
  * Invariants the instantiations rely on:
  *   - `lt` is a STRICT TOTAL order on the entries that can meet in one
  *     group: `!lt(a,b) && !lt(b,a)` is taken as equality, and the
  *     distinct variants drop such collisions keeping the FIRST-merged
  *     copy. If two distinct payloads can compare equal, the survivor
  *     is arrival-order dependent — so every field NOT in `lt` must be
  *     functionally determined by the fields that are (see
  *     [[BitextTopKAgg]]'s one-row-per-id_r requirement).
  *   - entries are never NaN-keyed (callers score zero-norm vectors as
  *     an explicit 0.0), so primitive comparison is safe.
  *
  * Buffers are CAPPED at k entries, so the ObjectHashAggregate map is
  * bounded by groups/partition × k, map-side partials move
  * O(partitions · groups · k) rows, and streaming state per group is
  * ≤ k entries. Loops are iterative throughout — the TopKAgg
  * stack-frame rule.
  */
private[functions] object CappedHeap {

  /** Insert preserving the order; caller trims to k. */
  def insert[E](e: E, xs: List[E], lt: (E, E) => Boolean): List[E] = {
    val prefix = List.newBuilder[E]
    var rest = xs
    while (rest.nonEmpty && lt(rest.head, e)) {
      prefix += rest.head
      rest = rest.tail
    }
    prefix.result() ::: (e :: rest)
  }

  def mergeSorted[E](a: List[E], b: List[E], lt: (E, E) => Boolean): List[E] = {
    val out = List.newBuilder[E]
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
  def insertDistinct[E](e: E, xs: List[E], lt: (E, E) => Boolean): List[E] = {
    val prefix = List.newBuilder[E]
    var rest = xs
    while (rest.nonEmpty && lt(rest.head, e)) {
      prefix += rest.head
      rest = rest.tail
    }
    if (rest.nonEmpty && !lt(e, rest.head)) xs // neither lt ⇒ equal ⇒ dup
    else prefix.result() ::: (e :: rest)
  }

  def mergeDistinct[E](a: List[E], b: List[E], lt: (E, E) => Boolean): List[E] = {
    val out = List.newBuilder[E]
    var (x, y) = (a, b)
    while (x.nonEmpty && y.nonEmpty) {
      if (lt(x.head, y.head)) { out += x.head; x = x.tail }
      else if (lt(y.head, x.head)) { out += y.head; y = y.tail }
      else { out += x.head; x = x.tail; y = y.tail } // equal: keep one
    }
    out.result() ::: (if (x.nonEmpty) x else y)
  }

  case class Buf[E](items: List[E])

  /** The k best entries per group under `lt`; `distinct` dedups ON
    * INSERT — BEFORE the cap, so "k best distinct" never under-fills
    * (top-k-then-dedup would). finish emits rank order, so a
    * `posexplode` downstream recovers the 1-based rank. */
  def aggregator[E <: Product : TypeTag](k: Int, lt: (E, E) => Boolean,
      distinct: Boolean): Aggregator[E, Buf[E], Seq[E]] = {
    require(k > 0, s"top-k bound must be positive, got $k")
    new Aggregator[E, Buf[E], Seq[E]] {
      override def zero: Buf[E] = Buf(Nil)

      override def reduce(b: Buf[E], e: E): Buf[E] = {
        def ins(xs: List[E]) =
          if (distinct) insertDistinct(e, xs, lt) else insert(e, xs, lt)
        if (b.items.lengthCompare(k) < 0) Buf(ins(b.items))
        else if (lt(e, b.items.last)) Buf(ins(b.items).take(k))
        else b // e is worse than (or equal to) the current k-th
      }

      override def merge(a: Buf[E], b: Buf[E]): Buf[E] =
        Buf((if (distinct) mergeDistinct(a.items, b.items, lt)
             else mergeSorted(a.items, b.items, lt)).take(k))

      override def finish(b: Buf[E]): Seq[E] = b.items

      override def bufferEncoder: Encoder[Buf[E]] = Encoders.product[Buf[E]]
      override def outputEncoder: Encoder[Seq[E]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[E]]()
    }
  }
}

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
  * comparison is safe. Heap mechanics live in [[CappedHeap]].
  */
object RetrievalTopKAgg {

  /** One scored candidate. Field order gives struct-literal call sites
    * the (sim, corpus, chunk) shape the comparator reads. */
  case class Entry(sim: Double, corpus_id: Long, chunk_id: Int)

  type Buf = CappedHeap.Buf[Entry]

  /** The retrieval total order: better sim first, then the id tiebreak.
    * (corpus_id, chunk_id) participates fully, so equality means the
    * IDENTICAL candidate — the distinct variant's dedup is exact. */
  private def lt(a: Entry, b: Entry): Boolean =
    a.sim > b.sim ||
      (a.sim == b.sim && (a.corpus_id < b.corpus_id ||
        (a.corpus_id == b.corpus_id && a.chunk_id < b.chunk_id)))

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
  def topKDistinct(k: Int): Aggregator[Entry, Buf, Seq[Entry]] =
    CappedHeap.aggregator[Entry](k, lt, distinct = true)

  /** The k best entries per query; finish emits them rank-ordered, so a
    * `posexplode` downstream recovers the 1-based rank. */
  def topK(k: Int): Aggregator[Entry, Buf, Seq[Entry]] =
    CappedHeap.aggregator[Entry](k, lt, distinct = false)
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
  *
  * REQUIREMENT — one row per id_r on the joined artifact side: the
  * order (and therefore the dedup key) is (sim_micro, id_r) ONLY;
  * sum_r/cnt_r are excluded from equality, so if the vecIndex/nbrIndex
  * joins ever delivered the same id_r with DIFFERING payloads, the
  * surviving payload would be arrival-order dependent. The invariant
  * holds by construction today —
  * [[graft.operators.SimilarityOps.bitextVecIndex]] is a projection of
  * the unique-keyed embeddings side and
  * [[graft.operators.SimilarityOps.bitextNeighborhoodIndex]] is a
  * per-id_r aggregate — but a future multi-row neighborhood artifact
  * (e.g. per-band sums) MUST either fold to one row per id_r before
  * the probe join or extend `lt` over the payload.
  */
object BitextTopKAgg {

  case class Entry(sim_micro: Long, id_r: Long, sum_r: Option[Long],
      cnt_r: Option[Long])

  type Buf = CappedHeap.Buf[Entry]

  private def lt(a: Entry, b: Entry): Boolean =
    a.sim_micro > b.sim_micro ||
      (a.sim_micro == b.sim_micro && a.id_r < b.id_r)

  def topKDistinct(k: Int): Aggregator[Entry, Buf, Seq[Entry]] =
    CappedHeap.aggregator[Entry](k, lt, distinct = true)
}
