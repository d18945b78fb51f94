package graft.functions

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for mojibake repair (reference
  * `apache_access.py:146-147`: `s.encode("iso-8859-1").decode("utf-8")`).
  *
  * A Scala UDF here costs an InternalRow→Row conversion plus a closure call per
  * value and blocks expression-level codegen; this expression stays inside
  * whole-stage codegen as a static call on UTF8String values. Null-safe:
  * evaluates only on non-null inputs.
  */
case class Reencode(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(StringType)

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"reencode requires STRING input, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Reencode.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Reencode.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): Reencode =
    copy(child = newChild)

  override def prettyName: String = "reencode"
}

object Reencode {
  /** Static entry point shared by interpreted eval and generated code. */
  def repair(s: UTF8String): UTF8String = {
    if (s == null) return null
    UTF8String.fromString(
      new String(s.toString.getBytes(ISO_8859_1), UTF_8))
  }

  def apply(c: Column): Column = GraftBridge.column(
    Reencode(GraftBridge.expression(c)))
}
