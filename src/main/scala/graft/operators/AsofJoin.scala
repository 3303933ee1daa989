package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (temporal enrichment): for each left row, the single right row
  * with the greatest timestamp ≤ the left timestamp, per key — the operator
  * behind "enrich each crawl event with the most recent config/launch state"
  * (SURVEY.md §2.5 engine surface).
  *
  * Implementation is the union+window composition, NOT a range join:
  * tag both sides, union them, sort within each key partition by
  * (ts, side), and carry the last-seen right payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame. One shuffle on
  * the key (both sides hashed together), one sort — O((L+R) log) per
  * partition, versus the O(L·R) blowup of an inequality join. This is the
  * plan shape that survives 100 TB; Spark's own AQE cannot save a
  * non-equi-join here because the range predicate defeats hash joins
  * entirely.
  */
object AsofJoin {

  /** @param left      probe side; enriched in the output
    * @param right     reference side; its `payloadCols` are appended
    * @param keys      equi-join key column names (present on both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param payloadCols right columns to carry (must not collide with left).
    *                    NOTE: carried payloads are stringified (the
    *                    union-side schema alignment needs one type); cast
    *                    `asof_<col>` back at the call site when the payload
    *                    is numeric — string ordering is lexicographic.
    *                    Duplicate right rows at the same (key, ts) are
    *                    tie-broken by the stringified payload struct, also
    *                    lexicographically: of two candidate payloads "9"
    *                    and "10", "9" wins (not numeric 10). Deterministic,
    *                    but if numeric-max tie-breaking is wanted, dedupe
    *                    right to unique (key, ts) first — e.g.
    *                    `right.groupBy(keys :+ ts).agg(max_by(...))`.
    * @param strict    if true, require right.ts < left.ts (strictly before);
    *                  default allows equality (≤, matching DuckDB ASOF JOIN)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)

    // side ordinal: right rows sort before left rows at equal timestamps so
    // `last()` sees them first ⇒ equality matches (≤). Strict mode flips it.
    val rightOrd = if (strict) 1 else 0
    val leftOrd = 1 - rightOrd

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftOrd))
      .withColumn("__payload", lit(null).cast(
        s"struct<${payloadCols.map(c => s"$c:string").mkString(",")}>"))
    val lCols = left.columns.toIndexedSeq

    val r = right
      .select((keyCols :+ col(rightTs).as("__ts")) :+
        struct(payloadCols.map(c => col(c).cast("string").as(c)): _*)
          .as("__payload"): _*)
      .withColumn("__side", lit(rightOrd))

    // align schemas: left keeps all its columns, right contributes nulls
    val lNorm = l.select(
      (lCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)
    val rNorm = {
      val nulls = lCols.filterNot(keys.contains).map(c =>
        lit(null).cast(left.schema(c).dataType).as(c))
      r.select((keyCols ++ nulls :+ col("__ts") :+ col("__side") :+
        col("__payload")): _*)
        .select(lCols.map(col) :+ col("__ts") :+ col("__side") :+
          col("__payload"): _*)
    }

    // payload tiebreak keeps duplicate (key, ts) right rows deterministic
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftOrd)
      .drop("__ts", "__side", "__payload")
      .select(lCols.map(col) ++
        payloadCols.map(c => col("__match").getField(c).as(s"asof_$c")): _*)
  }
}
