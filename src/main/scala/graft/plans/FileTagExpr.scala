package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg partition-dir-qualified FILE TAG of a path column —
  * scheme stripped, suffix after the last `/data/`, optionally
  * URL-decoded first (`_metadata.file_path` reads back URL-encoded;
  * manifest and delete-row paths are raw) — with a LAST-VALUE MEMO:
  * scans and delete relations stream file-at-a-time, so the input is
  * constant for millions of consecutive rows, and the per-row cost
  * degenerates to one UTF8String equality instead of two regex
  * evaluations + a URL decode (the Column-function formulation of this
  * tag was measured at 7.1 s over a 4M-row scan — the dominant term of
  * a delete-applying Iceberg read; this expression removes it).
  *
  * Byte-for-byte the semantics of `IcebergTable.fileTag` (the
  * driver-side evaluator both delete paths match against): literal `+`
  * is pre-encoded before the decode (legal unencoded in URI paths;
  * URLDecoder would eat it), decode follows the same
  * x-www-form-urlencoded rule as Spark's `url_decode`. */
case class FileTagExpr(child: Expression, urlDecode: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"file_tag expects string, got ${o.sql}")
  }

  // last-value memo, DvDeadRow's pattern. The (in, out) pair lives in
  // ONE field so the read is atomic: even if an instance were ever
  // shared across threads, a racing reader sees a consistent pair (or
  // none) and a lost race only recomputes the pure function — it can
  // never pair one input's key with another input's tag.
  @transient private var memo: (UTF8String, UTF8String) = null

  def tag(in: UTF8String): UTF8String = {
    val m = memo
    if (m != null && m._1.equals(in)) return m._2
    val s = in.toString
    val decoded =
      if (urlDecode) java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
      else s
    val out = UTF8String.fromString(graft.sources.IcebergTable.fileTag(decoded))
    memo = (in.clone(), out) // clone: the scan may reuse the backing buffer
    out
  }

  override def nullSafeEval(v: Any): Any = tag(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fileTag", this, classOf[FileTagExpr].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.tag(${childGen.value});
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def sql: String = s"file_tag(${child.sql})"
  override protected def withNewChildInternal(newChild: Expression): FileTagExpr =
    copy(child = newChild)
}
