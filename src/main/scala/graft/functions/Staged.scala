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
