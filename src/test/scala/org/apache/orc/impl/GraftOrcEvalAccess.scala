package org.apache.orc.impl

import org.apache.hadoop.hive.ql.io.sarg.{PredicateLeaf, SearchArgument}
import org.apache.orc.{OrcFile, OrcProto, TypeDescription}

/** Test-only same-package accessor for orc-core's package-private
  * `RecordReaderImpl.evaluatePredicateProto` — the exact row-group
  * decision seam a heritage file presents. graft's ORC pushdown legs
  * rely on this method's writer-version guards (pre-ORC-135
  * timestamps, ORC-135-era decimal64) refusing to evaluate; the
  * IcebergOrcSpec heritage fixture pins that behavior here because no
  * current writer can produce such a file for an end-to-end case. */
object GraftOrcEvalAccess {
  def evaluate(stats: OrcProto.ColumnStatistics, leaf: PredicateLeaf,
      version: OrcFile.WriterVersion, typ: TypeDescription): SearchArgument.TruthValue =
    RecordReaderImpl.evaluatePredicateProto(stats, leaf, null, null, null, version, typ)
}
