package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types._

/** Footer-level statistics for ADOPTED data files — the shared leg of
  * [[IcebergWriter.addFiles]] and [[DeltaLake.convertToDelta]] (r19,
  * the r18 verdict's "stats at adoption"). Both migration verbs already
  * open every file's footer DISTRIBUTED for its record count; with
  * stats collection on, the SAME open also translates the footer's
  * per-column min/max/null-count into the engine-neutral string
  * rendering graft's manifests use everywhere (dates ISO, numerics
  * `toString`), so the Iceberg side turns them into Appendix-D bounds
  * via the existing `statBound` and the Delta side feeds the existing
  * `deltaStatsJson` — one extraction, two faces, zero extra I/O.
  *
  * Soundness contract: a bound is emitted ONLY when the footer states
  * it exactly —
  *   - column types outside {int, long, float, double, string, date}
  *     are skipped (timestamps deliberately: parquet INT96 stats are
  *     deprecated junk and ORC timestamp stats are writer-zone-relative
  *     pre-ORC-135 — adoption reads files from ARBITRARY writers, the
  *     exact population the r18 SARG work showed is zone-hazardous);
  *   - a NaN-polluted float/double footer stat yields no bound (NaN
  *     compares poison range pruning);
  *   - missing/invalid footer statistics (old writers, suppressed
  *     stats) yield no bound and, when the null count is unset, no
  *     null count — the file simply never prunes, it never mis-prunes.
  *
  * Runs on EXECUTORS (one task per adopted file): everything here is
  * static, the returned maps are small (one tuple per stat column). */
private[graft] object AdoptStats extends Serializable {

  /** The recursive data-file walk every adoption surface shares
    * (convertToDelta, the add_files CALL face, the board key): hidden
    * entries skip whether dir OR file — a stray `.part-…-retry`
    * artifact from an aborted committer is invisible to every other
    * reader of the directory, so registering it would serve rows
    * nobody else sees (review r18); `_`-prefixed entries are metadata
    * (`_delta_log`, `_SUCCESS`). */
  private[graft] def listDataFiles(fs: org.apache.hadoop.fs.FileSystem, root: HPath,
      exts: Seq[String]): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(root).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) listDataFiles(fs, st.getPath, exts)
      else if (exts.exists(name.endsWith)) Seq(st) else Nil
    }

  /** (min, max, nullCount) — any piece may be individually absent. */
  type ColStats = Map[String, (Option[String], Option[String], Option[Long])]

  /** Table columns eligible for footer-stat translation. */
  def statTypes(schema: StructType): Map[String, DataType] =
    schema.fields.collect {
      case f if f.dataType == IntegerType || f.dataType == LongType ||
        f.dataType == FloatType || f.dataType == DoubleType ||
        f.dataType == StringType || f.dataType == DateType =>
        f.name -> f.dataType
    }.toMap

  private def renderNum(v: Any): Option[String] = v match {
    case f: java.lang.Float if f.isNaN => None
    case d: java.lang.Double if d.isNaN => None
    case n => Some(n.toString)
  }

  /** (recordCount, per-column stats) from one parquet footer. `want`
    * empty ⇒ count only (the stats-off fast path). */
  def parquet(conf: Configuration, p: HPath, want: Map[String, DataType])
      : (Long, ColStats) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val n = r.getRecordCount
      if (want.isEmpty) return (n, Map.empty)
      import scala.jdk.CollectionConverters._
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      // a zero-row-group file (Spark writes one for an empty frame)
      // has nothing to state — never let the vacuous-forall path below
      // reach stats.head (review r19)
      if (blocks.isEmpty) return (n, Map.empty)
      val out = want.flatMap { case (name, dt) =>
        // top-level flat columns only: dotted paths are nested fields
        val chunks = blocks.flatMap(_.getColumns.asScala.find(
          c => c.getPath.size == 1 && c.getPath.toDotString == name))
        if (chunks.size != blocks.size) None // column absent from some block
        else {
          val stats = chunks.map(_.getStatistics)
          // the FILE type must state the TABLE type's value space
          // exactly: an unsigned INT_32 footer min/max would render
          // signed-negative for values above 2^31 and mis-prune
          // (review r19) — incompatible physical types keep their
          // null counts (type-free) but never publish bounds
          val typeOk = typeCompatible(chunks.head.getPrimitiveType, dt)
          // every block must carry valid stats or the column yields
          // nothing — parquet-mr hands corrupted legacy binary stats
          // (PARQUET-251) back as empty Statistics, so this guard also
          // refuses those
          val boundsOk = typeOk && stats.forall(s => s != null && s.hasNonNullValue)
          val nullsOk = stats.forall(s => s != null && s.isNumNullsSet)
          val nulls = if (nullsOk) Some(stats.map(_.getNumNulls).sum) else None
          val (mn, mx) =
            if (!boundsOk) (None, None)
            else {
              val ord = Ordering.comparatorToOrdering(
                stats.head.comparator.asInstanceOf[java.util.Comparator[AnyRef]])
              val lo = stats.map(_.genericGetMin.asInstanceOf[AnyRef]).min(ord)
              val hi = stats.map(_.genericGetMax.asInstanceOf[AnyRef]).max(ord)
              (renderParquet(lo, dt), renderParquet(hi, dt))
            }
          if (mn.isEmpty && mx.isEmpty && nulls.isEmpty) None
          else Some(name -> ((mn, mx, nulls)))
        }
      }
      (n, out)
    } finally r.close()
  }

  /** Does the parquet physical+logical type state exactly the table
    * type's value space? Anything else — unsigned ints, enums, UUIDs,
    * json-annotated binaries — refuses bounds (counts stay). */
  private def typeCompatible(pt: org.apache.parquet.schema.PrimitiveType,
      dt: DataType): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val lt = pt.getLogicalTypeAnnotation
    def signedInt = lt match {
      case null => true
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
      case _ => false
    }
    dt match {
      case IntegerType => pt.getPrimitiveTypeName == INT32 && signedInt
      case LongType =>
        (pt.getPrimitiveTypeName == INT64 || pt.getPrimitiveTypeName == INT32) && signedInt
      case FloatType => pt.getPrimitiveTypeName == FLOAT && lt == null
      case DoubleType => pt.getPrimitiveTypeName == DOUBLE && lt == null
      case StringType => pt.getPrimitiveTypeName == BINARY &&
        lt.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case DateType => pt.getPrimitiveTypeName == INT32 &&
        lt.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
      case _ => false
    }
  }

  private def renderParquet(v: AnyRef, dt: DataType): Option[String] = dt match {
    case StringType => v match {
      case b: org.apache.parquet.io.api.Binary => Some(b.toStringUsingUTF8)
      case _ => None
    }
    case DateType => v match {
      // DATE annotates INT32 epoch days
      case n: java.lang.Integer =>
        Some(java.time.LocalDate.ofEpochDay(n.longValue).toString)
      case _ => None
    }
    case IntegerType | LongType | FloatType | DoubleType => renderNum(v)
    case _ => None
  }

  /** (recordCount, per-column stats) from one ORC footer. */
  def orc(conf: Configuration, p: HPath, want: Map[String, DataType])
      : (Long, ColStats) = {
    val r = org.apache.orc.OrcFile.createReader(p,
      org.apache.orc.OrcFile.readerOptions(conf))
    try {
      val n = r.getNumberOfRows
      if (want.isEmpty) return (n, Map.empty)
      val sch = r.getSchema
      if (sch.getCategory != org.apache.orc.TypeDescription.Category.STRUCT)
        return (n, Map.empty)
      import scala.jdk.CollectionConverters._
      val names = sch.getFieldNames.asScala.toSeq
      val kids = sch.getChildren.asScala.toSeq
      val all = r.getStatistics // indexed by type id; root struct is 0
      // a foreign/minimal footer may carry a short statistics array —
      // an inconsistent footer contributes NO stats rather than
      // crashing the registration (review r19)
      if (kids.exists(_.getId >= all.length)) return (n, Map.empty)
      val out = names.zip(kids).flatMap { case (name, kid) =>
        want.get(name).flatMap { dt =>
          val cs = all(kid.getId)
          // top-level flat columns: one value per non-null row, so the
          // footer's value count states the null count exactly —
          // UNLESS the stats are absent/defaulted (numberOfValues 0,
          // hasNull false, rows present is self-contradictory): proto
          // defaults would then claim "all n values are null" and an
          // IS NOT NULL prune would silently drop the file's rows
          // (review r19)
          val statsPlausible = cs.getNumberOfValues > 0L || cs.hasNull || n == 0L
          val nulls =
            if (!statsPlausible) None
            else Some(n - cs.getNumberOfValues).filter(_ >= 0L)
          val (mn, mx) =
            if (cs.getNumberOfValues == 0L) (None, None) // all-null: no bounds
            else (cs, dt) match {
              case (s: org.apache.orc.IntegerColumnStatistics,
                  IntegerType | LongType) =>
                (Some(s.getMinimum.toString), Some(s.getMaximum.toString))
              case (s: org.apache.orc.DoubleColumnStatistics,
                  FloatType | DoubleType) =>
                // re-render through the TABLE type so the string parses
                // back to the same value statBound encodes
                if (dt == FloatType)
                  (renderNum(s.getMinimum.toFloat: java.lang.Float),
                    renderNum(s.getMaximum.toFloat: java.lang.Float))
                else
                  (renderNum(s.getMinimum: java.lang.Double),
                    renderNum(s.getMaximum: java.lang.Double))
              case (s: org.apache.orc.StringColumnStatistics, StringType) =>
                // truncated footers return null minimum/maximum — omit
                (Option(s.getMinimum), Option(s.getMaximum))
              case (s: org.apache.orc.DateColumnStatistics, DateType) =>
                // render via epoch day: ChronoLocalDate.toString is
                // chronology-dependent; LocalDate's ISO form is what
                // statBound parses back
                (Option(s.getMinimumLocalDate).map(d =>
                  java.time.LocalDate.ofEpochDay(d.toEpochDay).toString),
                  Option(s.getMaximumLocalDate).map(d =>
                    java.time.LocalDate.ofEpochDay(d.toEpochDay).toString))
              case _ => (None, None)
            }
          if (mn.isEmpty && mx.isEmpty && nulls.isEmpty) None
          else Some(name -> ((mn, mx, nulls)))
        }
      }.toMap
      (n, out)
    } finally r.close()
  }
}
