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
    // Row-local web-pipeline primitives (r15): the COMPOSITE expressions
    // behind graft.functions.TextOps, registered so SQL users get URL
    // canonicalization / HTML extraction / model scoring without the
    // Scala API — the analyzer resolves the composed builtin tree like
    // any view body, and everything stays codegen'd (no UDF).
    def injectComposite(name: String, arity: Int,
        build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        (children: Seq[Expression]) => {
          if (children.size != arity)
            throw new IllegalArgumentException(
              s"$name expects exactly $arity argument(s), got ${children.size}")
          org.apache.spark.sql.GraftSqlBridge.catalystTree(
            build(children.map(org.apache.spark.sql.GraftSqlBridge.column)))
        }))
    injectComposite("url_canonicalize", 1,
      cs => graft.functions.TextOps.canonicalUrl(cs.head))
    injectComposite("html_main_text", 1,
      cs => graft.functions.TextOps.htmlMainText(cs.head))
    injectComposite("html_visible_text", 1,
      cs => graft.functions.TextOps.htmlVisibleText(cs.head))
    // text_model_score(text) = md5 pseudo-weights; a real artifact goes
    // through the Scala API (TextOps.modelScore(c, Some(weights))) — an
    // array-literal SQL argument would re-broadcast per call site anyway
    injectComposite("text_model_score", 1,
      cs => graft.functions.TextOps.modelScore(cs.head))
    // BPE under the default demo merges table — SQL users tokenize /
    // budget without the Scala API; arbitrary (trained) tables go
    // through Bpe.encodeTokens/tokenCount(merges), which carry the
    // table inside the expression rather than re-parsing it per call
    injectComposite("bpe_token_count", 1,
      cs => graft.functions.Bpe.tokenCount(cs.head))
    injectComposite("bpe_encode", 1,
      cs => graft.functions.Bpe.encodeTokens(cs.head))
    // the full GPT-2 shape (regex pre-tokenization + byte-level BPE)
    // under the demo byte table — same expressions, flags set
    injectComposite("bpe_token_count_gpt2", 1,
      cs => graft.functions.Bpe.tokenCountGpt2(cs.head))
    injectComposite("bpe_encode_gpt2", 1,
      cs => graft.functions.Bpe.encodeTokensGpt2(cs.head))
    injectComposite("text_quality_score", 1,
      cs => graft.functions.TextOps.qualityScore(cs.head))
    // table_changes('<table>', startingVersion [, endingVersion]) —
    // Delta's SQL change-data-feed face as a table-valued function:
    // SELECT * FROM table_changes('graft.`/path`', 2, 5). Arguments must
    // be literals (the table identity decides the PLAN); versions follow
    // the reader-option contract (startingVersion inclusive,
    // endingVersion inclusive and defaulting to the latest commit).
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "table_changes"),
      (children: Seq[Expression]) => {
        def lit(e: Expression, what: String): Any = {
          require(e.foldable, s"table_changes needs a literal $what, got ${e.sql}")
          e.eval(null)
        }
        require(children.size == 2 || children.size == 3,
          s"table_changes(table, startingVersion[, endingVersion]) takes 2 or 3 " +
            s"arguments, got ${children.size}")
        val spark = org.apache.spark.sql.SparkSession.active
        val table = String.valueOf(lit(children.head, "table name"))
        val root = GraftSqlParser.rootOf(
          if (table.startsWith("graft.") || table.startsWith("'")) table else s"graft.$table")
        val starting = lit(children(1), "startingVersion").asInstanceOf[Number].longValue
        val endingOpt = children.lift(2)
          .map(e => lit(e, "endingVersion").asInstanceOf[Number].longValue)
        if (graft.sources.ManifestTable.currentVersion(spark, root).isDefined) {
          val ending = endingOpt
            .orElse(graft.sources.ManifestTable.currentVersion(spark, root))
            .getOrElse(throw new IllegalStateException(s"no committed version at $root"))
          org.apache.spark.sql.GraftSqlBridge.analyzedPlan(
            graft.sources.ManifestTable.readChangeFeed(
              spark, root, math.max(0L, starting - 1), ending))
        } else
          // a foreign Delta lake: the same SQL face over its cdc trail
          org.apache.spark.sql.GraftSqlBridge.analyzedPlan(
            graft.sources.DeltaLake.readChangeFeed(spark, root, starting, endingOpt))
      }))
    // OPTIMIZE / VACUUM / DESCRIBE HISTORY / DESCRIBE DETAIL / RESTORE /
    // SHALLOW CLONE / FSCK — statements outside Spark's grammar,
    // recognized by a delegating parser (Delta's pattern)
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
