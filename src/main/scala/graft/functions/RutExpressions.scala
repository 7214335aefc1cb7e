package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rut_is_valid(col)` — true iff the value is a well-formed Chilean RUT
  * with a correct mod-11 check digit (reference semantics:
  * `etl-gcs-cloudsql/src/utils/validations.ts:54-90`). Null input -> false
  * (the reference rejects non-strings rather than propagating null).
  *
  * Implemented as a native Catalyst expression with `doGenCode` so it
  * stays inside whole-stage codegen (a Scala UDF would break the span).
  */
case class RutIsValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "rut_is_valid"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    RutUtil.isValidUTF8(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} &&
          graft.functions.RutUtil.isValidUTF8(${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RutIsValid =
    copy(child = newChild)
}

/** `rut_format(col)` — canonical `NNNNNNNN-D` (dots stripped, uppercase K)
  * or null when invalid (`validations.ts:92-107`). */
case class RutFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "rut_format"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    RutUtil.formatOrNullUTF8(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      UTF8String ${ev.value} = ${c.isNull} ? null :
        graft.functions.RutUtil.formatOrNullUTF8(${c.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RutFormat =
    copy(child = newChild)
}
