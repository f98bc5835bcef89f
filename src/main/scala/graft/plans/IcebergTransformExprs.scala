package graft.plans

import graft.sources.IcebergTransforms
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `iceberg_bucket(n, v)` — the Iceberg spec's `bucket[N]` transform
  * (Appendix B: 32-bit Murmur3 over the single-value serialization,
  * ints/dates promoted to long, `(h & MaxInt) % N`) as a CODEGEN
  * expression: the hash call compiles into the enclosing
  * WholeStageCodegen stage, so a bucket-partitioned write's
  * repartition+split keys stay in the same generated loop as the scan —
  * no UDF serialization boundary per row ([[IcebergTransforms]] holds
  * the shared, spec-vector-pinned hash). */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
         StringType | BinaryType =>
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"bucket width must be positive, got $n")
    case o => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket has no spec serialization for ${o.sql}")
  }

  def ordinalLong(v: Long): Int = {
    val bytes = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    (IcebergTransforms.murmur3x86(bytes) & Int.MaxValue) % n
  }

  def ordinalUtf8(v: UTF8String): Int =
    (IcebergTransforms.murmur3x86(v.getBytes) & Int.MaxValue) % n

  def ordinalBytes(v: Array[Byte]): Int =
    (IcebergTransforms.murmur3x86(v) & Int.MaxValue) % n

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => ordinalLong(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType => ordinalLong(v.asInstanceOf[Long])
    case StringType => ordinalUtf8(v.asInstanceOf[UTF8String])
    case BinaryType => ordinalBytes(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("icebergBucket", this, classOf[IcebergBucketExpr].getName)
    val call = child.dataType match {
      case IntegerType | DateType => (v: String) => s"$ref.ordinalLong((long) $v)"
      case LongType | TimestampType | TimestampNTZType => (v: String) => s"$ref.ordinalLong($v)"
      case StringType => (v: String) => s"$ref.ordinalUtf8($v)"
      case BinaryType => (v: String) => s"$ref.ordinalBytes($v)"
    }
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          ${ev.value} = ${call(childGen.value.toString)};
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def sql: String = s"iceberg_bucket($n, ${child.sql})"
  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}

/** `iceberg_truncate(w, v)` — the spec's `truncate[W]` transform as a
  * codegen expression: integers floor to the containing W-wide
  * interval's start (floored mod, negatives truncate DOWN), strings
  * keep their first W code points. Same per-row cost class as built-in
  * arithmetic — no UDF boundary. */
case class IcebergTruncateExpr(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | StringType =>
      if (w > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"truncate width must be positive, got $w")
    case o => TypeCheckResult.TypeCheckFailure(
      s"iceberg_truncate has no spec rule for ${o.sql}")
  }

  def truncInt(v: Int): Int = (v.toLong - java.lang.Math.floorMod(v.toLong, w.toLong)).toInt
  def truncLong(v: Long): Long = v - java.lang.Math.floorMod(v, w.toLong)
  def truncStr(v: UTF8String): UTF8String = v.substring(0, w)

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType => truncInt(v.asInstanceOf[Int])
    case LongType => truncLong(v.asInstanceOf[Long])
    case StringType => truncStr(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("icebergTruncate", this, classOf[IcebergTruncateExpr].getName)
    val (javaType, call) = child.dataType match {
      case IntegerType => ("int", (v: String) => s"$ref.truncInt($v)")
      case LongType => ("long", (v: String) => s"$ref.truncLong($v)")
      case StringType =>
        ("UTF8String", (v: String) => s"$ref.truncStr($v)")
    }
    val childGen = child.genCode(ctx)
    val default = if (javaType == "UTF8String") "null" else "0"
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        $javaType ${ev.value} = $default;
        if (!${ev.isNull}) {
          ${ev.value} = ${call(childGen.value.toString)};
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def sql: String = s"iceberg_truncate($w, ${child.sql})"
  override protected def withNewChildInternal(newChild: Expression): IcebergTruncateExpr =
    copy(child = newChild)
}

/** `iceberg_temporal(unit, v)` — the spec's `year`/`month`/`day`/`hour`
  * transforms as a codegen expression over the Catalyst-internal value
  * (epoch days for DATE, epoch micros for both timestamp flavors — no
  * session-timezone function may touch this: `year(ts)` through the
  * builtin would shift by the session zone, while the spec transforms
  * the micros themselves). Delegates the ordinal math to
  * [[IcebergTransforms.temporal]] — the same method the PRUNER
  * evaluates, so the write and read sides cannot drift. */
case class IcebergTemporalExpr(child: Expression, unit: String) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType if unit != "hour" => TypeCheckResult.TypeCheckSuccess
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"iceberg $unit transform has no spec rule for ${o.sql}")
  }

  def ordinalDays(days: Int): Int =
    IcebergTransforms.temporal(java.lang.Integer.valueOf(days), DateType, unit)
      .getOrElse(sys.error(s"$unit over date must be defined"))

  def ordinalMicros(us: Long): Int =
    IcebergTransforms.temporal(java.lang.Long.valueOf(us), TimestampType, unit)
      .getOrElse(sys.error(s"$unit over timestamp must be defined"))

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType => ordinalDays(v.asInstanceOf[Int])
    case TimestampType | TimestampNTZType => ordinalMicros(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("icebergTemporal", this, classOf[IcebergTemporalExpr].getName)
    val call = child.dataType match {
      case DateType => (v: String) => s"$ref.ordinalDays($v)"
      case _ => (v: String) => s"$ref.ordinalMicros($v)"
    }
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          ${ev.value} = ${call(childGen.value.toString)};
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def sql: String = s"iceberg_$unit(${child.sql})"
  override protected def withNewChildInternal(newChild: Expression): IcebergTemporalExpr =
    copy(child = newChild)
}

object IcebergTransformExprs {
  /** Column face of the spec's `bucket[N]` over a source column. */
  def bucket(c: Column, n: Int): Column =
    GraftSqlBridge.column(IcebergBucketExpr(GraftSqlBridge.expression(c), n))

  /** Column face of the spec's `truncate[W]` over a source column. */
  def truncate(c: Column, w: Int): Column =
    GraftSqlBridge.column(IcebergTruncateExpr(GraftSqlBridge.expression(c), w))

  /** Column face of the spec's temporal transforms over a source column. */
  def temporal(c: Column, unit: String): Column =
    GraftSqlBridge.column(IcebergTemporalExpr(GraftSqlBridge.expression(c), unit))
}
