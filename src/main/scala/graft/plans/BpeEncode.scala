package graft.plans

import graft.functions.BpeTable
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The token SEQUENCE of a pre-normalized symbol stream — the encode
  * half of [[BpeTokenCount]]: same compiled [[BpeTable]] riding the
  * codegen reference array, the value is the array of merged symbols
  * instead of its length. This is what sequence packing and
  * vocabulary-index lookup consume; counting stays the cheaper
  * expression when only budgets matter. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    pretok: Option[String] = None, pretokBytes: Boolean = false)
    extends UnaryExpression {

  require(!pretokBytes || pretok.isDefined,
    "pretokBytes composes byte encoding WITH pre-tokenization; set pretok")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string input, got ${o.sql}")
  }

  @transient private lazy val table = new BpeTable(merges)
  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pretok.get)

  override def nullSafeEval(s: Any): Any = pretok match {
    case Some(_) if pretokBytes =>
      BpeEncode.wrap(table.encodePretokBytes(s.asInstanceOf[UTF8String].toString, pattern))
    case Some(_) =>
      BpeEncode.wrap(table.encodePretok(s.asInstanceOf[UTF8String].toString, pattern))
    case None => BpeEncode.encodeData(table, s.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    pretok match {
      case Some(_) =>
        val pat = ctx.addReferenceObj("bpePretok", pattern,
          classOf[java.util.regex.Pattern].getName)
        val fn = if (pretokBytes) "encodePretokBytes" else "encodePretok"
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.plans.BpeEncode.wrap($tbl.$fn($c.toString(), $pat));")
      case None =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.plans.BpeEncode.encodeData($tbl, $c.toString());")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared by interpreted eval and generated code: encode, then wrap
    * as Catalyst array data (one allocation per row beyond the symbol
    * buffer itself). */
  def encodeData(table: BpeTable, s: String): ArrayData = wrap(table.encode(s))

  def wrap(toks: Array[String]): ArrayData = {
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
