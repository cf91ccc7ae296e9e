package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator (SURVEY.md §2 B10, the
  * full-custom tier): logical node + planner strategy + sort-merge
  * physical exec, registered through SparkSessionExtensions.
  *
  * Semantics: for each left row, attach the right row with the same
  * key and the greatest time <= left time (ties broken by right row
  * order); no match -> nulls. Equivalent to the tagged-union+window
  * composition (Relational.qAsofJoin) but as ONE sort-merge pass:
  * requiredChildDistribution co-partitions both sides on the key and
  * requiredChildOrdering sorts (key, time), so EnsureRequirements
  * plans exactly one exchange per side and the merge itself is
  * streaming per partition — no window buffer, no union blowup. At
  * 100 TB that halves the shuffled volume vs the composition (each
  * side moves once at its own width instead of the padded union
  * width).
  *
  * Keys and times must evaluate to orderable longs (bigint /
  * timestamp internally micros) — the common CDC/event case.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTieBreak: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTieBreak: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // the right side is totally ordered: (key, time, tiebreak) — without
  // the unique tiebreak, rows tied on time arrive in shuffle-dependent
  // order and "last qualifying row wins" is nondeterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTieBreak, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var keySeen = false
      var lastKey = 0L
      var lastRight: InternalRow = null
      var haveLast = false

      lIter.map { lRow =>
        val kAny = lKey.eval(lRow)
        val tAny = lTime.eval(lRow)
        if (kAny == null || tAny == null) {
          // SQL null semantics: a null key or time matches nothing
          // (an unchecked cast would silently unbox null to 0L and
          // join against key 0)
          joined(lRow, nullRight)
          project(joined)
        } else {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          if (!keySeen || k != lastKey) {
            keySeen = true; lastKey = k; lastRight = null; haveLast = false
          }
          // advance the right cursor up to (key, time) and remember the
          // last qualifying row; the cursor is monotone because left is
          // sorted on exactly the same (key, time) order. Right rows
          // with null key/time sort first (nulls-first) and are
          // discarded — they can never qualify.
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hkAny = rKey.eval(head)
            val htAny = if (hkAny == null) null else rTime.eval(head)
            if (hkAny == null || htAny == null) { rBuf.next() }
            else {
              val hk = hkAny.asInstanceOf[Long]
              if (hk < k) { rBuf.next() }
              else if (hk == k && htAny.asInstanceOf[Long] <= t) {
                lastRight = rBuf.next().copy(); haveLast = true
              } else advance = false
            }
          }
          joined(lRow, if (haveLast) lastRight else nullRight)
          project(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rtb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rtb) :: Nil
    case _ => Nil
  }
}

/** Dataset-level entry point. Pass key/time columns resolved against
  * the input frames (`df("col")`, not `col("col")`) so the plan is
  * born resolved and self-joins stay unambiguous.
  */
object AsOfJoin {
  /** `rightTieBreak` must be unique per (key, time) group on the right
    * (an id column): it totalizes the merge order so "last qualifying
    * row" is deterministic under any shuffle layout.
    */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: Column, rightKey: Column,
            leftTime: Column, rightTime: Column,
            rightTieBreak: Column): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = left.sparkSession
    // self-registering: extraStrategies is the public seam for
    // planner strategies on an existing session (GraftExtensions
    // injects the same strategy at build time on clusters)
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    Bridge.ofRows(spark, AsOfJoinPlan(
      Bridge.logicalPlan(left), Bridge.logicalPlan(right),
      Bridge.expression(leftKey), Bridge.expression(rightKey),
      Bridge.expression(leftTime), Bridge.expression(rightTime),
      Bridge.expression(rightTieBreak)))
  }
}
