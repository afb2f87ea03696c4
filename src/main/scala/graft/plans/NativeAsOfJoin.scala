package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.LongType

/** Native sort-merge as-of (backward) join — the whole-operator rendering
  * of [[graft.operators.AsOfJoin.backward]] as a custom
  * [[LogicalPlan]] + [[SparkStrategy]] + [[SparkPlan]] (the extension
  * surface below expressions: Spark has no built-in as-of join operator).
  *
  * Semantics are identical to the compositional form: for every left row,
  * the latest right row of the same key with `rightTs <= leftTs`; ties at
  * equal `rightTs` resolve to the largest tiebreak. Null keys and null
  * right timestamps never match.
  *
  * Why a physical operator when the union-window plan already exists:
  * the union form pads EVERY row with a null struct of the other side's
  * full width, so the single shuffle carries ~2× the bytes, and the
  * window operator buffers the carried struct through its sort. This exec
  * declares `ClusteredDistribution` on the keys and per-partition
  * ordering on (key, ts, tiebreak) — Catalyst inserts one exchange + sort
  * per side at the rows' NATIVE width — then streams both sorted
  * iterators in a single merge pass: O(1) state (the current match), no
  * padding, no window buffering. Same one-shuffle asymptotics, roughly
  * half the shuffled bytes — the difference that matters when the join
  * input is 100 TB.
  *
  * Measured honestly: at sf0.1 (~200k join rows) the two forms are within
  * ~0.15 s of each other — the extra stage's scheduling overhead offsets
  * the byte saving at small scale; the native width advantage is a
  * shuffle-volume property that grows with the data. Both code paths are
  * kept; `ts_asof_join`/`ts_asof_native` hash-check both against the same
  * DuckDB ASOF JOIN oracle.
  */
case class AsOfJoinNode(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    leftTb: Attribute, rightTb: Attribute,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; a no-op on every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lts, rts, ltb, rtb, l, r) =>
      AsOfJoinExec(lk, rk, lts, rts, ltb, rtb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    leftTb: Attribute, rightTb: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides hash-cluster on the equality keys (EnsureRequirements
  // co-partitions them, exactly as for a sort-merge equi-join) …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // … and sort within partitions by (key, ts, tiebreak) so the merge is a
  // single forward pass; right ties on (key, ts) leave the LARGEST
  // tiebreak as the last row scanned, matching the window form's pick
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs :+ leftTb).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ rightTb).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTsBound = BindReferences.bindReference(leftTs: Expression, lOut)
      val rTsBound = BindReferences.bindReference(rightTs: Expression, rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      // bind the result against nullable right attrs so the projection
      // null-checks the all-null padding row
      val resultProj = UnsafeProjection.create(
        output.map(e => e: Expression), lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // rHead/rHeadKey are live buffers (valid until the next advance);
        // matched/matchedKey are copies owned by this iterator
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) { rHead = rIter.next(); rHeadKey = rKeyProj(rHead) }
          else { rHead = null; rHeadKey = null }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsVal = lTsBound.eval(l)
          if (!lKey.anyNull && lTsVal != null) {
            val lTs = lTsVal.asInstanceOf[Long]
            // single forward sweep, one key comparison per right row:
            // drop rows that can never match (earlier key groups, null
            // keys, null timestamps), consume the usable prefix of this
            // key group — the last row consumed is the as-of match
            // (max ts, then max tiebreak) — stop at the first row beyond
            var scanning = true
            while (scanning && rHead != null) {
              if (rHeadKey.anyNull) advanceRight()
              else {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0) advanceRight()
                else if (c > 0) scanning = false
                else {
                  val ts = rTsBound.eval(rHead)
                  if (ts == null) advanceRight()
                  else if (ts.asInstanceOf[Long] <= lTs) {
                    matched = rHead.copy()
                    if (matchedKey == null || keyOrd.compare(matchedKey, lKey) != 0)
                      matchedKey = lKey.copy()
                    advanceRight()
                  } else scanning = false
                }
              }
            }
          }
          val r =
            if (!lKey.anyNull && matched != null &&
                keyOrd.compare(matchedKey, lKey) == 0) matched
            else nullRight
          resultProj(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over [[AsOfJoinNode]]. */
object NativeAsOfJoin {

  /** As-of backward join with the same contract as
    * [[graft.operators.AsOfJoin.backward]]: left columns unchanged, right
    * columns prefixed, null right columns when no right row precedes.
    * `leftTs`/`rightTs`/`tiebreak` must be long-typed (callers cast).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tiebreak: String,
      rightPrefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, AsOfJoinStrategy)
    val r2 = right.select(right.columns.map(c => col(c).as(s"$rightPrefix$c")): _*)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(r2)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    def longAttr(plan: LogicalPlan, name: String): Attribute = {
      val a = attr(plan, name)
      require(a.dataType == LongType, s"$name must be long-typed, got ${a.dataType}")
      a
    }
    val node = AsOfJoinNode(
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"$rightPrefix$k")),
      longAttr(lPlan, leftTs), longAttr(rPlan, s"$rightPrefix$rightTs"),
      longAttr(lPlan, tiebreak), longAttr(rPlan, s"$rightPrefix$tiebreak"),
      lPlan, rPlan)
    PlanBridge.ofRows(spark, node)
  }

  /** Forward variant (earliest right row with `rightTs >= leftTs`, ties to
    * the smallest tiebreak) via the same negation identity the
    * compositional [[graft.operators.AsOfJoin.forward]] uses: run
    * [[backward]] over negated time and tiebreak, un-negate on output.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tiebreak: String,
      rightPrefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.functions.when
    def neg(df: DataFrame, cs: String*): DataFrame =
      cs.foldLeft(df)((d, c) => d.withColumn(c, (-col(c).cast("long")).as(c)))
    val out = backward(neg(left, leftTs, tiebreak), neg(right, rightTs, tiebreak),
      keys, leftTs, rightTs, tiebreak, rightPrefix)
    out.withColumn(leftTs, -col(leftTs))
      .withColumn(tiebreak, -col(tiebreak))
      .withColumn(s"$rightPrefix$rightTs",
        when(col(s"$rightPrefix$rightTs").isNotNull, -col(s"$rightPrefix$rightTs")))
      .withColumn(s"$rightPrefix$tiebreak",
        when(col(s"$rightPrefix$tiebreak").isNotNull, -col(s"$rightPrefix$tiebreak")))
  }
}
