package graft.plans

import graft.sources.DeletionVectors
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native deletion-vector membership probe: TRUE when `(file name,
  * row index)` names a DEAD row — the read-side primitive of
  * merge-on-read DELETE/UPDATE ([[graft.sources.ManifestTable]] DVs and
  * Delta's `deletionVectors` feature).
  *
  * A join-shaped formulation (scan anti-join positions) breaks
  * WholeStageCodegen at the scan and shuffles or broadcasts millions of
  * expanded positions; this expression keeps the DV check INSIDE the
  * scan's codegen stage as `!dv_dead_row(_metadata.file_name,
  * _metadata.row_index)` — one virtual call + binary search per row, no
  * join, no shuffle, and the one multi-path parquet scan keeps its
  * pushdown and pruning.
  *
  * Transport: the COMPACT serialized bitmaps ride a broadcast
  * (KB-to-MB; positions are never expanded on the driver). Each task
  * lazily decodes ONLY the files it actually reads (`arrFor` fills a
  * per-task cache on first touch — a task reads one file, or a few
  * under coalescing, so decode cost tracks the task's own rows). Scans
  * stream file-at-a-time, so the last (name → positions) pair is
  * memoized and the per-row cost degenerates to one UTF8String equality
  * + one binary search over that file's sorted positions.
  */
case class DvDeadRow(fileName: Expression, rowIndex: Expression,
    dvBlobs: Broadcast[Map[String, Array[Byte]]])
    extends BinaryExpression with Predicate {

  override def left: Expression = fileName
  override def right: Expression = rowIndex
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (fileName.dataType, rowIndex.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (f, r) => TypeCheckResult.TypeCheckFailure(
        s"dv_dead_row expects (string, bigint), got (${f.sql}, ${r.sql})")
    }

  // per-task decode cache: only the files THIS task reads are expanded
  @transient private lazy val decoded = new java.util.HashMap[String, Array[Long]]()
  @transient private var lastName: UTF8String = null
  @transient private var lastArr: Array[Long] = null

  private def arrFor(name: String): Array[Long] = {
    val hit = decoded.get(name)
    if (hit != null || decoded.containsKey(name)) hit
    else {
      val arr = dvBlobs.value.get(name).map(DeletionVectors.positions).orNull
      decoded.put(name, arr)
      arr
    }
  }

  def test(name: UTF8String, pos: Long): Boolean = {
    if (lastName == null || !lastName.equals(name)) {
      lastName = name.clone() // the scan may reuse the backing buffer
      lastArr = arrFor(name.toString)
    }
    lastArr != null && java.util.Arrays.binarySearch(lastArr, pos) >= 0
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = fileName.eval(input)
    val p = rowIndex.eval(input)
    if (n == null || p == null) false
    else test(n.asInstanceOf[UTF8String], p.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvDeadRow", this, classOf[DvDeadRow].getName)
    val nameGen = fileName.genCode(ctx)
    val posGen = rowIndex.genCode(ctx)
    ev.copy(
      code = code"""
        ${nameGen.code}
        ${posGen.code}
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = false;
        if (!${nameGen.isNull} && !${posGen.isNull}) {
          ${ev.value} = $ref.test(${nameGen.value}, ${posGen.value});
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def dataType: DataType = BooleanType
  override def toString: String =
    s"dv_dead_row($fileName, $rowIndex, dv[${dvBlobs.value.size} file(s)])"
  override def sql: String = s"dv_dead_row(${fileName.sql}, ${rowIndex.sql})"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DvDeadRow =
    copy(fileName = newLeft, rowIndex = newRight)
}

object DvDeadRow {
  /** `NOT dv_dead_row(_metadata.file_name, _metadata.row_index)` — the
    * live-rows filter a DV-aware scan applies. `blobs` maps each DV'd
    * file's NAME to its serialized bitmap. */
  def liveFilter(spark: org.apache.spark.sql.SparkSession,
      blobs: Map[String, Array[Byte]]): Column = {
    import org.apache.spark.sql.functions.col
    !GraftSqlBridge.column(DvDeadRow(
      GraftSqlBridge.expression(col("_metadata.file_name")),
      GraftSqlBridge.expression(col("_metadata.row_index")),
      spark.sparkContext.broadcast(blobs)))
  }
}
