package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a serialized Bloom filter — the
  * broadcast-sketch prefilter for 100-TB semi-joins (Bloom, CACM 1970).
  *
  * The filter rides the plan as a foldable binary literal, is
  * deserialized ONCE per task (a `@transient lazy val` on the expression
  * instance, which codegen references via `addReferenceObj` — the same
  * shape as Spark's internal runtime-filter `BloomFilterMightContain`,
  * which Spark only wires into its own join rewrites), and each probe
  * compiles into the enclosing WholeStageCodegen stage as one virtual
  * call + bit test. No shuffle, no UDF boxing.
  *
  * May return false positives, never false negatives — callers follow
  * with an exact join on the survivors, so results stay exact while the
  * big side's shuffle shrinks to the sketch's hit rate.
  */
case class BloomMightContain(value: Expression, bloomBytes: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = value
  override def right: Expression = bloomBytes
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, bloomBytes.dataType) match {
      case (LongType, BinaryType) if bloomBytes.foldable => TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure("bloom_might_contain needs a foldable (literal) sketch")
      case (v, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects (bigint, binary), got (${v.sql}, ${b.sql})")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes.eval(null).asInstanceOf[Array[Byte]])

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else test(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference `this` so the generated code shares the lazily-built
    // filter; the bytes literal itself never evaluates per row
    val ref = ctx.addReferenceObj("bloomMightContain", this, classOf[BloomMightContain].getName)
    val childGen = value.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.test(${childGen.value});
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def dataType: DataType = BooleanType

  // A production sketch is megabytes; Spark renders binary literals as a
  // full hex dump, so the default toString/sql would paste the whole
  // sketch into every explain/plan-snapshot string (and the UI). Print a
  // bounded placeholder instead — the bytes still ride the plan, they
  // just don't render.
  private def sketchDesc: String = bloomBytes match {
    case org.apache.spark.sql.catalyst.expressions.Literal(bytes: Array[Byte], BinaryType) =>
      s"bloom_sketch[${bytes.length}B]"
    case other => other.toString
  }
  override def toString: String = s"bloom_might_contain($value, $sketchDesc)"
  override def sql: String = s"bloom_might_contain(${value.sql}, bloom_sketch)"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(value = newLeft, bloomBytes = newRight)
}

/** [[BloomMightContain]] with the sketch behind a broadcast variable
  * instead of a plan literal — the large-sketch path. A literal sketch is
  * serialized into every task binary twice (once in the plan tree, once in
  * the codegen references array); a broadcast ships it to each executor
  * once over the torrent protocol and the expression carries only the
  * handle. Same probe semantics, same codegen shape.
  */
case class BloomMightContainBcast(value: Expression,
    sketchBytes: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Predicate {

  override def child: Expression = value
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case v => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint probe column, got ${v.sql}")
  }

  // deserialized once per executor JVM per task-binary instance; the
  // broadcast block itself lives once per executor regardless
  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(sketchBytes.value)

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else test(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContainBcast", this,
      classOf[BloomMightContainBcast].getName)
    val childGen = value.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.test(${childGen.value});
        }""",
      isNull = ev.isNull, value = ev.value)
  }

  override def dataType: DataType = BooleanType
  override def toString: String = s"bloom_might_contain($value, broadcast_bloom)"
  override def sql: String = s"bloom_might_contain(${value.sql}, broadcast_bloom)"
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBcast =
    copy(value = newChild)
}

object BloomMightContain {
  /** Sketches at or below this serialized size ride the plan as a literal
    * (simple, no driver broadcast bookkeeping); larger ones go through
    * [[BloomMightContainBcast]] so multi-MB filters aren't duplicated into
    * every task binary. */
  val LiteralMaxBytes: Int = 1 << 20

  private def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Column API: `mightContain(col("h"), bloom)` over a long column —
    * always the literal embedding (callers without a session handy). */
  def apply(value: Column, bloom: BloomFilter): Column =
    literalProbe(value, serialize(bloom))

  /** Column API that picks the sketch transport by size: plan literal up
    * to [[LiteralMaxBytes]], broadcast variable beyond. */
  def apply(value: Column, bloom: BloomFilter,
      spark: org.apache.spark.sql.SparkSession): Column = {
    val bytes = serialize(bloom)
    if (bytes.length <= LiteralMaxBytes) literalProbe(value, bytes)
    else GraftSqlBridge.column(BloomMightContainBcast(
      GraftSqlBridge.expression(value), spark.sparkContext.broadcast(bytes)))
  }

  private def literalProbe(value: Column, bytes: Array[Byte]): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(value),
      org.apache.spark.sql.catalyst.expressions.Literal(bytes, BinaryType)))

  /** Build a Bloom sketch of `df.col(colName)` (long) driver-side — one
    * tree-aggregated pass over the (small) build side. Spark's
    * `stat.bloomFilter` NPEs on zero rows (the aggregate yields null), so
    * emptiness is checked EXPLICITLY and returns an empty filter (matches
    * nothing) — zero-row build sides are routine, and inferring them from
    * a caught NPE would silently convert unrelated failures into a
    * filter-everything sketch. */
  def build(df: DataFrame, colName: String, expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    if (df.isEmpty) BloomFilter.create(math.max(expectedItems, 1L), fpp)
    else df.stat.bloomFilter(colName, expectedItems, fpp)
}
