package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session extension registering graft's native expressions, activated via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions`). Adds `vector_cosine(a, b)` to the function
  * registry so SQL, `expr(...)`, and `call_function` all resolve it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_cosine"),
      VectorCosine.info,
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"vector_cosine expects exactly 2 arguments, got ${children.size}")
        VectorCosine(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("array_bisect"),
      ArrayBisect.info,
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"array_bisect expects exactly 2 arguments, got ${children.size}")
        ArrayBisect(children.head, children(1))
      }))
    // OPTIMIZE / VACUUM / DESCRIBE HISTORY — statements outside Spark's
    // grammar, recognized by a delegating parser (Delta's pattern)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectPostHocResolutionRule(_ => DeclaredOrderRule)
    // DML first: it consumes DeleteFromTable/UpdateTable while the v2
    // relation underneath is still intact; the read conversion then only
    // sees plain reads
    ext.injectPostHocResolutionRule(_ => GraftDmlRule)
    ext.injectPostHocResolutionRule(_ => GraftTableResolution)
    ext.injectOptimizerRule(_ => CosineFusionRule)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
