package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for CPython `str.split()` tokenization
  * (SURVEY §4 custom item 1): exact Unicode-whitespace parity (which a
  * `split(col, "\\s+")` regex cannot give — Java \s misses NBSP/NEL/Zs),
  * without the UDF serialization/closure overhead. `doGenCode` emits a
  * static call so the expression stays inside whole-stage-generated code.
  */
case class PyWsTokenize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"py_ws_tokenize requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "py_ws_tokenize"

  override def nullSafeEval(input: Any): Any =
    PyWsTokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PyWsTokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): PyWsTokenize =
    copy(child = newChild)
}

object PyWsTokenize {
  /** Static entry for both interpreted and generated code paths. */
  def tokenize(s: UTF8String): ArrayData = {
    val parts = graft.tokenize.PyTokenize.split(s.toString)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(out)
  }
}
