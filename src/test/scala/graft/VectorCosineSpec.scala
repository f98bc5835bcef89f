package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class VectorCosineSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(2.0f, 3.0f, 4.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 1.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b")
  }

  test("native expression registered and callable from SQL") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT id, vector_cosine(a, b) AS c FROM vecs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(1L) - 20.0 / (math.sqrt(14) * math.sqrt(29))) < 1e-12)
    assert(r(2L) == 0.0)
    assert(math.abs(r(3L) - 1.0) < 1e-12)
  }

  test("native matches HOF formulation bit-for-bit") {
    val native = df.select(call_function("vector_cosine", col("a"), col("b")).as("c")).collect().map(_.getDouble(0))
    val hof = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).collect().map(_.getDouble(0))
    assert(native.toSeq == hof.toSeq)
  }

  test("null and mismatched-length inputs yield null") {
    import spark.implicits._
    val d = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (2L, None: Option[Array[Float]], Some(Array(1.0f)))
    ).toDF("id", "a", "b")
    val out = d.select(call_function("vector_cosine", col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("zero vector yields null, not NaN") {
    import spark.implicits._
    val d = Seq((1L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("id", "a", "b")
    assert(d.select(call_function("vector_cosine", col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("optimizer fuses the HOF cosine pattern into the native expression") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val hof = e.select(VectorOps.cosine(col("embedding"), col("embedding")).as("c"))
    val optimized = hof.queryExecution.optimizedPlan
    val fused = optimized.expressions.flatMap(_.collect {
      case v: graft.plans.VectorCosine => v
    })
    assert(fused.nonEmpty, s"expected VectorCosine in:\n$optimized")
    // and the fusion preserves values
    val a = hof.collect().map(_.getDouble(0))
    assert(a.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("fusion leaves non-cosine divides untouched") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // numerator lambda multiplies x*x, not x*y — must NOT fuse
    val notCos = e.select(
      (aggregate(zip_with(col("embedding"), col("embedding"), (x, _) => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v) /
        (sqrt(VectorOps.dot(col("embedding"), col("embedding"))) *
          sqrt(VectorOps.dot(col("embedding"), col("embedding"))))).as("c"))
    val fused = notCos.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case v: graft.plans.VectorCosine => v
    })
    assert(fused.isEmpty)
  }

  test("null array element yields null in both native and HOF forms") {
    val d = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)) AS b")
    assert(d.selectExpr("vector_cosine(a, b)").collect()(0).isNullAt(0))
    assert(d.select(VectorOps.cosine(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("fusion refuses integer-array dot patterns") {
    import spark.implicits._
    val d = Seq((Array(1, 2, 3), Array(2, 3, 4))).toDF("ia", "ib")
    val hofOverInts = d.select(VectorOps.cosine(col("ia"), col("ib")).as("c"))
    val fused = hofOverInts.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case v: graft.plans.VectorCosine => v
    })
    assert(fused.isEmpty, "int arrays must not fuse into VectorCosine")
    // the HOF path still computes correctly via casts
    val v = hofOverInts.collect()(0).getDouble(0)
    assert(math.abs(v - 20.0 / (math.sqrt(14) * math.sqrt(29))) < 1e-12)
  }

  test("participates in whole-stage codegen") {
    // a real scan (LocalTableScan never codegens): embeddings vs themselves
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = e.select(call_function("vector_cosine", col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined,
      s"expected a WholeStageCodegen span in:\n$plan")
  }
}
