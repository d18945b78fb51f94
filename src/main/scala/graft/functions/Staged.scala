package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer fence: the identity function, marked non-deterministic.
  *
  * `CollapseProject` will not inline a non-deterministic alias and
  * `PushDownPredicates` will not push a filter through a projection that
  * contains one, so wrapping an expensive expression pins its projection as
  * an exactly-once evaluation stage. Without the fence, the dead-letter
  * validity filter is pushed below the parse projections and re-derives the
  * full parse per conjunct — `FilterExec`'s generated code does no
  * cross-conjunct subexpression elimination, so a 9-field validity check
  * recomputes the line split up to 9 times per row (measured 3× slowdown on
  * the apache ingest path).
  *
  * The wrapped expression must itself BE deterministic (the flag is a fence,
  * not a semantic claim), which keeps task retries safe.
  *
  * TRADEOFFS of the deterministic=false mechanism (r9 ADVICE, documented
  * deliberately rather than "fixed" — the alternatives are worse here):
  *
  *  - **Exchange reuse is defeated.** `Expression.semanticEquals` requires
  *    both sides deterministic, so two structurally identical subtrees
  *    containing a fence never compare equal and `ReuseExchange`/
  *    `MergeScalarSubqueries` will not dedup them (visible in the committed
  *    d13/d14 plan files: the band-frequency BroadcastExchange appears
  *    twice where an unfenced plan shows a ReusedExchange). Where a fenced
  *    subtree feeds MULTIPLE consumers, prefer a MATERIALIZATION barrier
  *    (cache / localCheckpoint — see docs/PLANS.md §Fences) over a second
  *    fence: it collapses the consumers onto one computed result, which is
  *    strictly better than reuse.
  *  - **Fenced columns cannot be join/group keys.** CheckAnalysis rejects
  *    non-deterministic expressions there; every current call site fences a
  *    PROJECTED value (hash/decode/bits) that is re-aliased before any key
  *    use. Keep it that way: fence the expensive projection, key on the
  *    plain alias downstream.
  *
  * A "perfect" fence (blocks CollapseProject/PushDownPredicates inlining
  * while canonicalizing equal for reuse) has no stable public surface in
  * Spark 4: inlining-avoidance hinges on `CollapseProject.isCheap` /
  * `PushPredicateThroughNonJoin`'s deterministic checks, both of which key
  * off the same flag. The fence stays the one-flag mechanism, with the two
  * costs above as documented usage rules.
  */
case class Staged(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType

  override lazy val deterministic: Boolean = false

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): Staged =
    copy(child = newChild)

  override def prettyName: String = "staged"
}

object Staged {
  def apply(c: Column): Column =
    GraftBridge.column(Staged(GraftBridge.expression(c)))
}
