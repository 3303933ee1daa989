package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair left and right rows whose timestamps lie
  * within ±`toleranceSec` of each other — composed as a BUCKETED EQUI-JOIN,
  * not an inequality join.
  *
  * A raw `|l.ts − r.ts| ≤ tol` predicate gives Catalyst nothing to hash on:
  * the plan degenerates to BroadcastNestedLoopJoin / cartesian, O(L·R).
  * Bucketing by `tol`-sized epochs and replicating the left side into its
  * own and adjacent buckets makes every candidate pair co-bucketed, so the
  * join is a plain shuffle-hash/SMJ on (bucket) with an exact residual
  * filter — O(L·3 + R) shuffled rows and per-bucket-local work. This is the
  * standard scale shape for temporal/range predicates (same trick as the
  * LSH band join).
  */
object RangeJoin {

  /** @param left/right  frames with `tsCol` (timestamp) present
    * @param toleranceSec half-window in seconds
    * @return left columns ++ right columns for every in-window pair
    *         (exactly once per pair — replication deduped by construction:
    *         each pair is emitted only from the right row's home bucket)
    */
  def within(left: DataFrame, right: DataFrame, tsCol: String,
      toleranceSec: Long, extraKey: Seq[String] = Nil): DataFrame = {
    require(toleranceSec > 0,
      "toleranceSec must be positive (for exact-timestamp pairing use a plain equi-join on the timestamp)")
    val tol = lit(toleranceSec)
    def bucketOf(c: Column): Column = floor(c.cast("long") / tol)

    // right columns renamed r_* so the output is unambiguous
    val rRenamed = right.columns.foldLeft(right)(
      (df, c) => df.withColumnRenamed(c, "r_" + c))

    // left replicated to 3 buckets; right stays in its home bucket ⇒ every
    // pair within tolerance shares the right row's bucket exactly once.
    val l = left.withColumn("__b",
      explode(array(bucketOf(col(tsCol)) - 1, bucketOf(col(tsCol)),
        bucketOf(col(tsCol)) + 1)))
    val r = rRenamed.withColumn("__b", bucketOf(col("r_" + tsCol)))

    val keys = extraKey.map(k => col(k) === col("r_" + k))
    val joined = l.join(r,
      (Seq(l("__b") === r("__b")) ++ keys).reduce(_ && _))
    joined
      .filter(abs(col(tsCol).cast("long") - col("r_" + tsCol).cast("long")) <= tol)
      .drop(l("__b")).drop(r("__b"))
  }
}
