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
  * with the default table. With `pretok` set (a regex whose matches
  * tile the text — [[graft.functions.Bpe.PretokPattern]]), the count
  * runs per pre-token and sums, so merges never cross pre-token
  * boundaries (the GPT-2 convention); the compiled Pattern rides the
  * reference array next to the table. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)],
    pretok: Option[String] = None, pretokBytes: Boolean = false)
    extends UnaryExpression {

  require(!pretokBytes || pretok.isDefined,
    "pretokBytes composes byte encoding WITH pre-tokenization; set pretok")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string input, got ${o.sql}")
  }

  @transient private lazy val table = new BpeTable(merges)
  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pretok.get)

  override def nullSafeEval(s: Any): Any = pretok match {
    case Some(_) if pretokBytes =>
      table.countTokensPretokBytes(s.asInstanceOf[UTF8String].toString, pattern)
    case Some(_) => table.countTokensPretok(s.asInstanceOf[UTF8String].toString, pattern)
    case None => table.countTokens(s.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    pretok match {
      case Some(_) =>
        val pat = ctx.addReferenceObj("bpePretok", pattern,
          classOf[java.util.regex.Pattern].getName)
        val fn = if (pretokBytes) "countTokensPretokBytes" else "countTokensPretok"
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $tbl.$fn($c.toString(), $pat);")
      case None =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.countTokens($c.toString());")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
