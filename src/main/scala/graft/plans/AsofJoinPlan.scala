package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native as-of join as a first-class plan: logical node + planner strategy
  * + physical operator, registered per-session (or via [[GraftExtensions]]).
  *
  * Why a custom operator (SURVEY.md §2.5 preference order (c)): the
  * composed form ([[graft.operators.AsofJoin.asof]]) unions both sides and
  * runs a window — one shuffle of L+R rows plus a per-key window buffer,
  * and payloads must be stringified into one schema. The physical operator
  * here keeps the same single co-shuffle (hash on the keys, both sides),
  * but replaces the window with a streaming sorted merge per partition:
  * O(L+R) time, O(1) state (one buffered right row + last payload), typed
  * payloads, no union schema. Both sides arrive sorted by (keys, ts) via
  * requiredChildOrdering, so Spark plans exactly one exchange + sort per
  * side — the plan shape that survives 100 TB.
  *
  * Scale trade, measured (100k rows, local[32]): the composed window form
  * finishes in roughly one exchange+sort's wall time (~0.4 s); the native
  * plan pays ~2-3× that. Component timing attributes the delta to stage
  * COUNT — two shuffle stages plus a separate merge stage versus the
  * union's single shuffle — i.e. fixed per-stage scheduling latency, plus
  * an interpreted (non-codegen) merge. Both costs amortize away at
  * cluster scale, where the native operator wins on what actually limits
  * 100 TB runs: WindowExec buffers each key group in memory (a hot key
  * with 10⁸ rows spills); this exec holds ONE buffered right row
  * regardless of group size, emits via a bitwise UnsafeRow joiner, and
  * AQE cannot mis-coalesce the two sides (pinned by the adversarial
  * differential in AsofJoinPlanSpec).
  *
  * Semantics (pinned by the DuckDB ASOF differential in the q17 oracle):
  * for each left row, the right row with the greatest ts ≤ left.ts
  * (strictly < when `strict`) within the same key group; ties on equal
  * right (key, ts) resolve to the GREATEST payload tuple under native-type
  * ordering (the right sort appends the payload when orderable —
  * deterministic across runs and task retries; unorderable payloads fall
  * back to arrival order). Key/ts types align on the WIDER common type
  * (never narrowing — a right TIMESTAMP is not truncated to a left DATE),
  * and float keys normalize (-0.0 ≡ 0.0, canonical NaN) like Spark's own
  * join keys. Null timestamps order nulls-first (the composed form's
  * asc_nulls_first window sort): a null-ts right row is "before" every
  * timestamp, a null-ts left row only matches null-ts right rows.
  *
  * Null KEYS group and match each other (hash-partition + natural ordering
  * treat null == null) — the same contract as the composed union+window
  * form, and the same as `groupBy` on a null key, but UNLIKE SQL/DuckDB
  * ASOF equality, which null-rejects. Callers needing SQL semantics
  * pre-filter null-key rows (`.filter(keys.map(_.isNotNull).reduce(_ && _))`)
  * on both sides; the q17/q17b oracle keys are non-null so both contracts
  * agree there. Pinned by the null-key spec in AsofJoinPlanSpec.
  */
object AsofJoinPlan {

  /** Logical as-of join. `payload` are resolved right-side expressions;
    * `outAttrs` are the fresh output attributes (`asof_<col>`, nullable)
    * this node produces for them.
    */
  case class AsofJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTs: Expression, rightTs: Expression,
      payload: Seq[Expression], outAttrs: Seq[Attribute],
      strict: Boolean) extends BinaryNode {
    require(leftKeys.nonEmpty, "as-of join requires at least one key")
    override def output: Seq[Attribute] = left.output ++ outAttrs
    override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
    // Output is exactly one row per left row — without this override the
    // generic stats visitor estimates an unknown binary node as the PRODUCT
    // of its children's sizes, which poisons every broadcast/CBO decision
    // above the join (a 1 GB ⋈ 1 MB asof would "weigh" a petabyte). The
    // right side contributes at most the carried payload per row; its full
    // size is a safe linear upper bound for the payload columns.
    override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics =
      org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes,
        rowCount = left.stats.rowCount)
    override def maxRows: Option[Long] = left.maxRows
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Plans [[AsofJoinNode]] → [[AsofJoinExec]]. */
  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinNode(l, r, lk, rk, lts, rts, payload, outAttrs, strict) =>
        AsofJoinExec(lk, rk, lts, rts, payload, outAttrs, strict,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Idempotent per-session registration of the planner strategy and the
    * prune/pushdown optimizer rules ([[AsofJoinOptimizations]]).
    */
  def enable(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
    AsofJoinOptimizations.enable(spark)
  }

  /** As-of join via the native operator; same argument contract as
    * [[graft.operators.AsofJoin.asof]] but payload columns keep their own
    * types (no stringification). Output: all left columns plus
    * `asof_<payloadCol>` (nullable).
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    enable(spark)
    val collisions = payloadCols.map("asof_" + _).toSet
      .intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"output column(s) ${collisions.mkString(", ")} already exist on the left side")
    // Fail API-side with clear messages instead of deep inside planning:
    // duplicate payloads produce ambiguous asof_* columns; a payload that
    // repeats a key or the ts column would duplicate names in the pruned
    // projection; map-typed keys are neither hashable nor orderable.
    require(payloadCols.distinct == payloadCols,
      s"duplicate payload columns: ${payloadCols.diff(payloadCols.distinct).mkString(", ")}")
    require(!payloadCols.contains(rightTs),
      s"payload may not repeat the timestamp column '$rightTs' — alias it on the right side first")
    require(keys.forall(!payloadCols.contains(_)),
      "payload may not repeat a join key — key values are already on every left row")
    keys.foreach { k =>
      require(RowOrdering.isOrderable(left.schema(k).dataType),
        s"join key '$k' has unorderable type ${left.schema(k).dataType} — " +
          "as-of joins hash-partition and sort on the keys")
    }
    // Align each key and the timestamp on the WIDER of the two sides' types
    // (never narrow): casting right timestamps down to a left DATE would
    // truncate them and match right rows that are actually AFTER the left
    // event — the composed form's unionByName promotes to the wider type,
    // and this operator documents the same contract. Mixed types with no
    // common widening are a caller error.
    import org.apache.spark.sql.catalyst.analysis.TypeCoercion
    def wider(a: org.apache.spark.sql.types.DataType,
        b: org.apache.spark.sql.types.DataType, what: String) =
      if (a == b) a
      else TypeCoercion.findWiderTypeForTwo(a, b).getOrElse(
        throw new IllegalArgumentException(
          s"no common type for $what: $a vs $b"))
    val keyTypes = keys.map(k =>
      k -> wider(left.schema(k).dataType, right.schema(k).dataType, s"key '$k'"))
    val tsWide = wider(left.schema(leftTs).dataType,
      right.schema(rightTs).dataType, "timestamp")
    // prune right to keys+ts+payload with fresh exprIds (self-join safe),
    // casting up to the common types; ANSI cast turns an unrepresentable
    // value into a runtime error instead of a wrong answer.
    val keyCasts = keyTypes.map { case (k, wt) =>
      if (right.schema(k).dataType == wt) col(k).as(k) else col(k).cast(wt).as(k)
    }
    val rPruned = right.select(
      (keyCasts :+ col(rightTs).cast(tsWide).as(rightTs)) ++
        payloadCols.map(c => col(c).as(c)): _*)
    val lPlan = plan(left)
    val rPlan = plan(rPruned)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(",")}"))
    // Left-side comparison expressions: cast up where the right was wider,
    // and normalize floating-point keys (-0.0 → 0.0, canonical NaN) on BOTH
    // sides — Spark's NormalizeFloatingNumbers rule covers only its own
    // operators, so without this a DoubleType key of -0.0 would hash to a
    // different partition than 0.0 and silently miss its match. The casts
    // feed only partitioning/ordering/comparison; output columns keep their
    // original left types.
    def widened(a: Attribute, wt: org.apache.spark.sql.types.DataType): Expression =
      if (a.dataType == wt) a
      else org.apache.spark.sql.catalyst.expressions.Cast(a, wt)
    def keyExpr(p: LogicalPlan)(kt: (String, org.apache.spark.sql.types.DataType)): Expression =
      ColumnBridge.normalizeFloats(widened(attr(p, kt._1), kt._2))
    val payload = payloadCols.map(attr(rPlan, _))
    val outAttrs = payload.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    ColumnBridge.ofRows(spark, AsofJoinNode(
      lPlan, rPlan,
      keyTypes.map(keyExpr(lPlan)), keyTypes.map(keyExpr(rPlan)),
      widened(attr(lPlan, leftTs), tsWide), attr(rPlan, rightTs),
      payload, outAttrs, strict))
  }

  private def plan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}

/** Physical as-of join: co-partitioned (hash on keys, both sides), both
  * children sorted by (keys, ts) ascending, then a single-pass merge per
  * partition. The right cursor never rewinds — left rows arrive in the
  * same (key, ts) order, so the last right row at or before the current
  * left timestamp is the only state carried.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Expression], outAttrs: Seq[Attribute],
    strict: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // requireAllClusterKeys: both sides must hash on exactly these keys in
  // this order, so equal key values land in the same partition index —
  // a subset-key partitioning would satisfy a relaxed ClusteredDistribution
  // on one side only and silently mis-align the merge.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  // Right side additionally sorts by the payload when every payload column
  // is orderable: duplicate right (key, ts) rows then resolve "last wins"
  // to the GREATEST payload tuple under native-type ordering — a
  // deterministic answer across runs and task retries, where bare
  // (keys, ts) sorting leaves equal rows in shuffle-arrival order. (With
  // an unorderable payload type the tie-break stays arrival-order;
  // callers wanting determinism pre-dedupe right to unique (key, ts).)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTs) ++
      (if (payload.forall(p => RowOrdering.isOrderable(p.dataType))) payload
       else Nil)).map(SortOrder(_, Ascending)))

  // left rows stream through in order, so the input sort is preserved
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val isStrict = strict
    val nPayload = outAttrs.length
    val leftOutput = left.output
    val rightOutput = right.output
    // local copies so the zipPartitions closure captures plain values, not
    // `this` (which would serialize the whole operator subtree per task) —
    // every operator field referenced below MUST be mirrored here
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val payloadB = payload
    val outAttrsB = outAttrs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // ONE combined (keys, ts) projection per side: the full lexicographic
      // compare IS the advance decision (rKey < lKey, or equal keys with
      // rTs ≤/< lTs, both collapse to fullOrd ≤/< 0), and the keys-only
      // ordering reads the same row's prefix for equality checks.
      val lSortProj = UnsafeProjection.create(lKeysB :+ lTsB, leftOutput)
      val rSortProj = UnsafeProjection.create(rKeysB :+ rTsB, rightOutput)
      val payloadProj = UnsafeProjection.create(payloadB, rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val fullOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes :+ tsType)
      // bitwise row concat (memcpy-style) instead of a field-by-field
      // projection over a JoinedRow — the output-side cost per left row
      val joiner = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateUnsafeRowJoiner.create(
          org.apache.spark.sql.types.StructType(leftOutput.map(a =>
            org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))),
          org.apache.spark.sql.types.StructType(outAttrsB.map(a =>
            org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))))
      // sorts upstream emit UnsafeRow; the projection is a safety net only
      val toUnsafeLeft = UnsafeProjection.create(leftOutput, leftOutput)
      val nullPayload = UnsafeProjection.create(outAttrsB, outAttrsB)(
        new GenericInternalRow(nPayload)).copy()
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        private var matchSort: UnsafeRow = _
        private var matchPayload: UnsafeRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lSort = lSortProj(l)
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val rSort = rSortProj(rBuf.head)
            val cmp = fullOrd.compare(rSort, lSort)
            if (cmp < 0 || (!isStrict && cmp == 0)) {
              if (keyOrd.compare(rSort, lSort) == 0) {
                // newest right row at-or-before the left ts so far; later
                // equal-(key,ts) right rows overwrite → "last wins"
                matchSort = rSort.copy()
                matchPayload = payloadProj(rBuf.head).copy()
              } // else: right key the left has passed — drop and move on
              rBuf.next()
            } else scanning = false
          }
          val matched = matchPayload != null &&
            keyOrd.compare(matchSort, lSort) == 0
          numOutputRows += 1
          if (matched) numMatched += 1
          val lu = l match {
            case u: UnsafeRow => u
            case other => toUnsafeLeft(other)
          }
          joiner.join(lu, if (matched) matchPayload else nullPayload)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
