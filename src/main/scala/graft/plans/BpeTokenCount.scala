package graft.plans

import graft.functions.BpeTable
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact BPE token count of a pre-normalized symbol stream — a native
  * Catalyst expression so tokenization stays inside WholeStageCodegen:
  * the generated code is one virtual call into the compiled
  * [[BpeTable]] (shipped once via the codegen reference array, like a
  * broadcast), no UDF serialization boundary, no per-row closure.
  *
  * The merges table is part of the expression (semantics travel with
  * the plan); [[graft.functions.Bpe.tokenCount]] is the Column face
  * with the default table. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string input, got ${o.sql}")
  }

  @transient private lazy val table = new BpeTable(merges)

  override def nullSafeEval(s: Any): Any =
    table.countTokens(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.countTokens($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
