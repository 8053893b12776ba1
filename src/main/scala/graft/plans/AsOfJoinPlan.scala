package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator: a custom
  * [[AsOfJoin]] logical node, lowered by [[AsOfJoinStrategy]] to
  * [[AsOfJoinExec]] — a co-partitioned sort-merge physical operator.
  *
  * Where [[graft.operators.TemporalJoins.asOf]] composes built-ins
  * (union + window), this is preference-order (c) of SURVEY §7.3:
  * whole-operator semantics as LogicalPlan + Strategy + SparkPlan.
  * The physical shape is the same one Spark plans for sort-merge
  * joins: both children hash-clustered on the key (EnsureRequirements
  * inserts compatible exchanges), sorted within partitions by
  * (key, ts[, tie]), then a single forward merge pass per partition —
  * O(1) state (the latest quote payload), no window buffering, no
  * candidate blowup. Both formulations are verified equal (j01/j03
  * share one oracle; AsOfJoinPlanSpec fuzzes them against each other).
  *
  * Semantics: LEFT as-of — every probe row, plus `payload` columns
  * from the latest quote with equal key and quote.ts <= probe.ts
  * (inclusive); ties on quote ts resolve to the greatest tie-break.
  * Null keys/timestamps never match (SQL join semantics).
  */
object AsOfJoinPlan {

  /** Build the DataFrame. `payload` maps quote-column → output name.
    * Installs [[AsOfJoinStrategy]] on the session (idempotent). */
  def asOf(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
      quoteTieBreak: String, payload: Seq[(String, String)]): DataFrame = {
    val spark = probes.sparkSession
    install(spark)
    val lp = GraftSqlShims.analyzed(probes)
    // Re-alias the quote side with fresh exprIds: probes and quotes
    // usually derive from the same scan (a self-as-of), and duplicate
    // attribute ids across the two children would make binding
    // ambiguous — the same dedup the analyzer does for Join nodes.
    val rp0 = GraftSqlShims.analyzed(quotes)
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"as-of: column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    // The node carries raw right-side attributes (Join-style output);
    // renaming to the requested payload names happens in a Project
    // ABOVE the node — aliases stored inside a custom node would be
    // stripped by the analyzer's CleanupAliases.
    val pay = payload.map { case (src, _) => attr(rp, src) }
    val node = AsOfJoin(lp, rp,
      attr(lp, key), attr(lp, ts),
      attr(rp, key), attr(rp, ts), attr(rp, quoteTieBreak), pay)
    val renamed = lp.output.map(a => a: NamedExpression) ++
      node.payloadOut.zip(payload).map { case (a, (_, out)) => Alias(a, out)() }
    GraftSqlShims.ofRows(spark, Project(renamed, node))
  }

  /** Idempotent runtime registration (mirrors JaccardRewrite.install;
    * works on driver-owned sessions where spark.sql.extensions cannot
    * be set anymore). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}

/** Logical as-of join. Output = probe columns ++ the payload
  * attributes from the quote side, made nullable (a probe may have no
  * quote) — the same output shape a left outer Join has. */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression, rightTie: Expression,
    payload: Seq[Attribute]) extends BinaryNode {

  def payloadOut: Seq[Attribute] = payload.map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[AsOfJoin]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.rightTie,
        j.payload, j.payloadOut,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sort-merge as-of join.
  *
  * Requires both children clustered on the key (the planner inserts
  * compatible hash exchanges) and sorted by (key, ts) / (key, ts,
  * tie). One forward pass per partition: quotes are consumed while
  * (qKey, qTs) <= (pKey, pTs) — quote-before-probe at equal ts gives
  * the inclusive "at or before" bound, and because quotes are sorted
  * by tie within a ts, the last consumed quote is the tie winner.
  * Only the current quote's projected payload is retained (one
  * UnsafeRow), so memory is O(1) regardless of group size.
  */
case class AsOfJoinExec(
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression, rightTie: Expression,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val pKey = BindReferences.bindReference(leftKey, left.output)
    val pTs = BindReferences.bindReference(leftTs, left.output)
    val qKey = BindReferences.bindReference(rightKey, right.output)
    val qTs = BindReferences.bindReference(rightTs, right.output)
    val payloadExprs = payload
    val rightOutput = right.output
    val nPayload = payloadOut.length

    left.execute().zipPartitions(right.execute()) { (pIt, qIt) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rightOutput)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(nPayload)
      var qHead: InternalRow = null
      var qHeadKey: Any = null
      var qHeadTs: Any = null
      def advanceQ(): Unit = {
        qHead = null
        while (qHead == null && qIt.hasNext) {
          val r = qIt.next()
          val k = qKey.eval(r) match {
            // child iterators reuse row buffers; detach EVERY
            // buffer-backed key kind (string, binary, struct, array,
            // map) — retaining one across advanceQ would silently
            // read the next row's bytes
            case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
            case b: Array[Byte] => b.clone()
            case r2: InternalRow => r2.copy()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
            case x => x // primitives and Decimal are value-detached
          }
          val t = qTs.eval(r)
          if (k != null && t != null) { qHead = r; qHeadKey = k; qHeadTs = t }
        }
      }
      advanceQ()
      // latest consumed quote: its key and its projected payload.
      // curPayload references payloadProj's REUSED output buffer with
      // no per-quote copy: the buffer is overwritten only by the next
      // payloadProj call, which happens exactly when a newer quote
      // supersedes this one — i.e. the bytes are stable for precisely
      // the rows that must see them. (Emitted rows may be invalidated
      // by a later next(), the standard SparkPlan iterator contract —
      // buffering consumers copy.) Dropping the copy removes one
      // UnsafeRow allocation per consumed quote, the merge's only
      // per-row allocation when quotes outnumber probes.
      var curKey: Any = null
      var curPayload: InternalRow = null

      pIt.map { p =>
        val pk = pKey.eval(p)
        val pt = pTs.eval(p)
        if (pk != null && pt != null) {
          var cmp = if (qHead == null) 1 else keyOrd.compare(qHeadKey, pk)
          while (qHead != null &&
              (cmp < 0 || (cmp == 0 && tsOrd.compare(qHeadTs, pt) <= 0))) {
            curKey = qHeadKey
            curPayload = payloadProj(qHead)
            advanceQ()
            cmp = if (qHead == null) 1 else keyOrd.compare(qHeadKey, pk)
          }
          if (curKey != null && keyOrd.compare(curKey, pk) == 0)
            joined(p, curPayload)
          else
            joined(p, nullPayload)
        } else joined(p, nullPayload)
      }
    }
  }
}
