package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's OWN runtime-filter bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * `InjectRuntimeFilter` plants under joins), applied BY HAND where the
  * optimizer can't see the opportunity: graft's incremental-ingest dedup
  * probes a 100 TB corpus scan with a bloom built over the (small) daily
  * batch, so corpus rows that cannot possibly match are dropped at the
  * scan instead of shuffling into the join.
  *
  * Both sides hash with `xxhash64` (LongType — the one input type every
  * Spark version's bloom aggregate accepts); the caller passes the SAME
  * hashed column expression to both functions, which is what makes the
  * no-false-negative property hold end to end.
  */
object BloomFns {

  /** One-row aggregate building the bloom over `hashed` (a LongType
    * column, conventionally `xxhash64(key)`). `nItems`/`nBits` are
    * explicit literals rather than the session's runtime-filter confs:
    * a hand-planted bloom should carry its own sizing (bits/items ≈ 16
    * gives fpp ≈ 4e-4 — generous because a false positive only costs an
    * extra row through the exact join, never a wrong answer).
    */
  def bloomAgg(hashed: Column, nItems: Long, nBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed),
      Literal(nItems), Literal(nBits)).toAggregateExpression())

  /** Membership probe against the single-row bloom DataFrame (the
    * [[bloomAgg]] output), embedded as a scalar subquery —
    * `BloomFilterMightContain` rejects anything else (its filter side
    * must be foldable or a plan expression), and the subquery form is
    * how Spark's own runtime filters execute: the bloom builds once as
    * a subquery stage, then broadcasts into every probe-side task.
    * True = might be present (exact verification still required);
    * false = PROVABLY absent — the side a filter can safely drop.
    */
  def mightContain(bloom: DataFrame, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(ColumnBridge.analyzed(bloom)),
      ColumnBridge.expression(hashed)))
}
