package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `array_bisect(boundaries, x)` — the number of elements of the sorted
  * double array `boundaries` that are ≤ x, found by binary search.
  *
  * This is the equi-depth bucket-id primitive: with B−1 sampled quantile
  * boundaries it maps a value to its rank bucket in O(log B) per row,
  * where the built-in alternatives are O(B) per row
  * (`size(filter(bounds, b -> b <= x))` interprets a lambda per element)
  * or linear-only (`width_bucket` assumes equal widths). The boundaries
  * ride the plan as a foldable literal (they come from a 1-row
  * `percentile_approx` aggregate — hundreds of doubles, not data-sized)
  * and are materialized into a plain `double[]` ONCE per task via
  * `addReferenceObj`; each probe compiles into the enclosing
  * WholeStageCodegen stage as a static binary-search call.
  *
  * Null x → null. Null boundary elements are rejected at analysis: a
  * sorted-with-nulls array has no meaningful bisection.
  */
case class ArrayBisect(boundaries: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = boundaries
  override def right: Expression = value
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (boundaries.dataType, value.dataType) match {
      case (ArrayType(DoubleType, false), DoubleType) if boundaries.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, true), _) =>
        TypeCheckResult.TypeCheckFailure(
          "array_bisect needs non-null boundary elements (array<double> with containsNull=false)")
      case (b, v) if !boundaries.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "array_bisect boundaries must be foldable (a literal/aggregated array, not per-row)")
      case (b, v) =>
        TypeCheckResult.TypeCheckFailure(
          s"array_bisect expects (array<double>, double), got (${b.sql}, ${v.sql})")
    }

  /** Boundaries as a primitive array, built once per task-binary instance.
    * Sortedness is validated here, not just in the Scala builder — the SQL
    * path (`array_bisect(array(...), x)` via GraftExtensions) constructs
    * the expression directly, and binary search over an unsorted array
    * returns silently wrong counts. O(B) once per task, not per row. */
  @transient private lazy val bounds: Array[Double] = {
    val a = boundaries.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    var i = 1
    while (i < a.length) {
      if (a(i - 1) > a(i)) throw new IllegalArgumentException(
        s"array_bisect boundaries must be sorted ascending; element $i (${a(i)}) " +
          s"is below its predecessor (${a(i - 1)})")
      i += 1
    }
    a
  }

  def search(x: Double): Int = {
    // count of elements <= x == upper-bound insertion point
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else search(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayBisect", this, classOf[ArrayBisect].getName)
    val childGen = value.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.search(${childGen.value});
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  // boundary arrays are hundreds of doubles — don't dump them into every
  // explain/plan-snapshot string
  override def toString: String = boundaries match {
    case org.apache.spark.sql.catalyst.expressions.Literal(a: ArrayData, _) =>
      s"array_bisect(bounds[${a.numElements()}], $value)"
    case other => s"array_bisect($other, $value)"
  }
  override def sql: String = s"array_bisect(bounds, ${value.sql})"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayBisect =
    copy(boundaries = newLeft, value = newRight)
}

object ArrayBisect {
  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ArrayBisect].getName, "array_bisect")

  /** Column API over a driver-side boundary array (sorted ascending). */
  def apply(bounds: Seq[Double], value: Column): Column = {
    require(bounds == bounds.sorted, "array_bisect boundaries must be sorted ascending")
    GraftSqlBridge.column(ArrayBisect(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        bounds.toArray, ArrayType(DoubleType, containsNull = false)),
      GraftSqlBridge.expression(value)))
  }
}
