package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or => CatalystOr}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[FileIndex]] over one Iceberg snapshot — ONE stock parquet scan
  * whose files are pruned at the index from the MANIFEST's per-file
  * facts, before any file opens:
  *
  *   - identity-transform partition values (exact: min = max);
  *   - `lower_bounds` / `upper_bounds` (spec Appendix D single-value
  *     serialization, decoded for the orderable primitives);
  *   - `null_value_counts` / `value_counts` for IS NULL / IS NOT NULL.
  *
  * The partition schema is EMPTY on purpose: Iceberg data files carry
  * every column (identity-partitioned ones included), so all columns
  * read from the files and every filter reaches [[listFiles]] as a data
  * filter — where file skipping happens against manifest facts, the
  * exact shape [[GraftFileIndex]] and [[DeltaFileIndex]] use. Pruning is
  * sound-only: any bound we cannot decode or compare keeps the file.
  *
  * Scale: the index holds one in-memory entry per live file (manifest
  * scale); the planner sees a single relation so pushdown, column
  * pruning, and codegen stay stock, and hidden-partition transforms we
  * don't evaluate (bucket, truncate, day…) cost nothing but a wider
  * scan. */
final class IcebergFileIndex(spark: SparkSession, root: String,
    snap: IcebergTable.IcebergSnapshot,
    partSchema: StructType = new StructType()) extends FileIndex {

  import IcebergTable.{DataFileEntry, FieldIdKey}

  /** Non-empty only for hive-style layouts whose files LACK the
    * identity-partitioned columns (graft mirrors, migrated tables) —
    * their values are served typed from the manifest. Iceberg-written
    * files carry every column, so this is empty and all filters arrive
    * as data filters. */
  override val partitionSchema: StructType = partSchema
  val dataSchema: StructType =
    StructType(snap.schema.filterNot(f => partSchema.fieldNames.contains(f.name)))

  /** Declared column order, for [[graft.plans.DeclaredOrderRule]]. */
  def declaredFieldOrder: Seq[String] = snap.schema.fieldNames.toIndexedSeq

  /** Top-level column name → Iceberg field id (stats key). */
  private val idOf: Map[String, Int] = snap.schema.fields.flatMap { f =>
    if (f.metadata.contains(FieldIdKey)) Some(f.name -> f.metadata.getLong(FieldIdKey).toInt)
    else None
  }.toMap
  private val typeOf: Map[String, DataType] =
    snap.schema.fields.map(f => f.name -> f.dataType).toMap

  /** Columns whose Iceberg source type is `uuid`: they surface as
    * strings, but their manifest bounds are 16-byte big-endian UUIDs —
    * decoding them as UTF-8 would compare garbage, so these columns
    * never prune. */
  private val uuidCols: Set[String] = snap.schema.fields.collect {
    case f if f.metadata.contains(IcebergTable.UuidKey) => f.name
  }.toSet
  private val nameOfId: Map[Int, String] = idOf.map(_.swap)

  /** Source column name → the spec field carrying its IDENTITY value. */
  private val identityFieldOf: Map[String, String] = snap.partitionFields
    .filter(_.transform == "identity")
    .flatMap(pf => nameOfId.get(pf.sourceId).map(_ -> pf.name)).toMap

  /** Source column name → (spec field, N) for `bucket[N]` transforms. */
  private val bucketFieldOf: Map[String, (String, Int)] = snap.partitionFields
    .flatMap(pf => IcebergTransforms.bucketWidth(pf.transform)
      .flatMap(n => nameOfId.get(pf.sourceId).map(_ -> (pf.name, n)))).toMap

  /** Source column name → (spec field, W) for `truncate[W]` transforms. */
  private val truncFieldOf: Map[String, (String, Int)] = snap.partitionFields
    .flatMap(pf => IcebergTransforms.truncateWidth(pf.transform)
      .flatMap(w => nameOfId.get(pf.sourceId).map(_ -> (pf.name, w)))).toMap

  override def rootPaths: Seq[Path] = Seq(new Path(root.stripSuffix("/")))
  override def refresh(): Unit = ()
  override def inputFiles: Array[String] = snap.dataFiles.map(_.path).toArray
  override lazy val sizeInBytes: Long = statusOf.values.map(_.getLen).sum

  // one listStatus per distinct parent dir (same cost any hive listing pays)
  private lazy val statusOf: Map[String, FileStatus] = {
    snap.dataFiles.map(_.path).groupBy(p => p.substring(0, p.lastIndexOf('/')))
      .flatMap { case (dir, inDir) =>
        val d = new Path(dir)
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val listed = fs.listStatus(d).map(st => st.getPath.getName -> st).toMap
        inDir.map { p =>
          val name = p.substring(p.lastIndexOf('/') + 1)
          p -> listed.getOrElse(name, throw new IllegalStateException(
            s"file $p is live in snapshot ${snap.snapshotId} but missing on disk (expired?)"))
        }
      }
  }

  /** Effective (min, max) for a column of `e`: an identity partition
    * value is exact; otherwise decoded manifest bounds. */
  private def boundsFor(e: DataFileEntry, name: String): (Option[Any], Option[Any]) =
    if (uuidCols.contains(name)) (None, None)
    else identityFieldOf.get(name).flatMap(e.partition.get) match {
      case Some(v) => (Some(v), Some(v))
      case None => idOf.get(name) match {
        case None => (None, None)
        case Some(id) =>
          val dt = typeOf(name)
          (e.lower.get(id).flatMap(IcebergTable.decodeBound(_, dt)),
           e.upper.get(id).flatMap(IcebergTable.decodeBound(_, dt)))
      }
    }

  /** Whether `e` MAY hold a row with `name = value` under a `bucket[N]`
    * or `truncate[W]` partition on `name`: false only when the file's
    * declared transform value provably differs from the filter value's.
    * The bucket prune is the one min/max cannot provide on
    * hash-distributed keys. */
  private def bucketMay(e: DataFileEntry, name: String, value: Any): Boolean = {
    if (uuidCols.contains(name)) return true // uuid hashes over raw bytes, not the string form
    val byBucket = bucketFieldOf.get(name) match {
      case None => true
      case Some((pfName, n)) =>
        (e.partition.get(pfName), IcebergTransforms.bucket(value, typeOf(name), n)) match {
          case (Some(declared: java.lang.Number), Some(expected)) =>
            declared.intValue == expected
          case _ => true
        }
    }
    val byTrunc = truncFieldOf.get(name) match {
      case None => true
      case Some((pfName, w)) =>
        (e.partition.get(pfName), IcebergTransforms.truncate(value, typeOf(name), w)) match {
          case (Some(declared: java.lang.Number), Some(expected: Long)) =>
            declared.longValue == expected
          case (Some(declared: String), Some(expected: String)) => declared == expected
          case _ => true
        }
    }
    byBucket && byTrunc
  }

  /** Compare a decoded manifest value with a literal's INTERNAL value
    * under the column type; None = incomparable (no pruning). Internal
    * reps line up with the decoded ones: dates are days (Int),
    * timestamps micros (Long), strings UTF8String. */
  private def cmp(stat: Any, litInternal: Any, dt: DataType): Option[Int] = dt match {
    case FloatType | DoubleType =>
      // ±Infinity is a legitimate bound per the spec (only NaN is
      // excluded) — Double.compare total-orders it soundly; NaN has no
      // usable order, so it never prunes. BigDecimal(toString) would
      // throw on either.
      (stat, litInternal) match {
        case (a: java.lang.Number, b: java.lang.Number) =>
          val (x, y) = (a.doubleValue, b.doubleValue)
          if (x.isNaN || y.isNaN) None else Some(java.lang.Double.compare(x, y))
        case _ => None
      }
    case IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | ShortType | ByteType =>
      (stat, litInternal) match {
        case (a: java.lang.Number, b: java.lang.Number) =>
          Some(java.lang.Long.compare(a.longValue, b.longValue))
        case _ => None
      }
    case StringType => (stat, litInternal) match {
      case (a: String, b: UTF8String) => Some(UTF8String.fromString(a).compareTo(b))
      case (a: String, b: String) => Some(a.compareTo(b))
      case _ => None
    }
    case BooleanType => (stat, litInternal) match {
      case (a: Boolean, b: Boolean) => Some(a.compareTo(b))
      case _ => None
    }
    case _ => None
  }

  /** Whether `file` MAY contain a matching row — false only on proof. */
  private def mayMatch(expr: Expression, e: DataFileEntry): Boolean = {
    def attr(x: Expression): Option[(String, DataType)] = x match {
      case a: AttributeReference => Some((a.name, a.dataType))
      case _ => None
    }
    def litOf(x: Expression): Option[Any] = x match {
      case l: Literal if l.value != null => Some(l.value)
      case _ => None
    }
    def nullsOf(name: String): Option[Long] = idOf.get(name).flatMap(e.nullCounts.get)
    def rangeMay(name: String, dt: DataType, lo: Option[Any], hi: Option[Any],
        loOpen: Boolean, hiOpen: Boolean): Boolean = {
      val (mn, mx) = boundsFor(e, name)
      val belowHi = (hi, mn) match {
        case (Some(h), Some(m)) => cmp(m, h, dt).forall(c => if (hiOpen) c < 0 else c <= 0)
        case _ => true
      }
      val aboveLo = (lo, mx) match {
        case (Some(l), Some(m)) => cmp(m, l, dt).forall(c => if (loOpen) c > 0 else c >= 0)
        case _ => true
      }
      belowHi && aboveLo
    }
    expr match {
      case CatalystAnd(l, r) => mayMatch(l, e) && mayMatch(r, e)
      case CatalystOr(l, r) => mayMatch(l, e) || mayMatch(r, e)
      case EqualTo(a, v) => (attr(a), litOf(v), attr(v), litOf(a)) match {
        case (Some((n, dt)), Some(value), _, _) =>
          rangeMay(n, dt, Some(value), Some(value), loOpen = false, hiOpen = false) &&
            bucketMay(e, n, value)
        case (_, _, Some((n, dt)), Some(value)) =>
          rangeMay(n, dt, Some(value), Some(value), loOpen = false, hiOpen = false) &&
            bucketMay(e, n, value)
        case _ => true
      }
      case LessThan(a, v) => (attr(a), litOf(v), attr(v), litOf(a)) match {
        case (Some((n, dt)), Some(value), _, _) =>
          rangeMay(n, dt, None, Some(value), loOpen = false, hiOpen = true)
        case (_, _, Some((n, dt)), Some(value)) =>
          rangeMay(n, dt, Some(value), None, loOpen = true, hiOpen = false)
        case _ => true
      }
      case LessThanOrEqual(a, v) => (attr(a), litOf(v), attr(v), litOf(a)) match {
        case (Some((n, dt)), Some(value), _, _) =>
          rangeMay(n, dt, None, Some(value), loOpen = false, hiOpen = false)
        case (_, _, Some((n, dt)), Some(value)) =>
          rangeMay(n, dt, Some(value), None, loOpen = false, hiOpen = false)
        case _ => true
      }
      case GreaterThan(a, v) => (attr(a), litOf(v), attr(v), litOf(a)) match {
        case (Some((n, dt)), Some(value), _, _) =>
          rangeMay(n, dt, Some(value), None, loOpen = true, hiOpen = false)
        case (_, _, Some((n, dt)), Some(value)) =>
          rangeMay(n, dt, None, Some(value), loOpen = false, hiOpen = true)
        case _ => true
      }
      case GreaterThanOrEqual(a, v) => (attr(a), litOf(v), attr(v), litOf(a)) match {
        case (Some((n, dt)), Some(value), _, _) =>
          rangeMay(n, dt, Some(value), None, loOpen = false, hiOpen = false)
        case (_, _, Some((n, dt)), Some(value)) =>
          rangeMay(n, dt, None, Some(value), loOpen = false, hiOpen = false)
        case _ => true
      }
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        attr(a) match {
          case Some((n, dt)) => vs.exists { case l: Literal =>
            litOf(l).forall(v =>
              rangeMay(n, dt, Some(v), Some(v), loOpen = false, hiOpen = false) &&
                bucketMay(e, n, v))
          }
          case None => true
        }
      case IsNull(a) => attr(a) match {
        case Some((n, _)) => !nullsOf(n).contains(0L)
        case None => true
      }
      case IsNotNull(a) => attr(a) match {
        case Some((n, _)) =>
          !(nullsOf(n).isDefined && e.recordCount >= 0 && nullsOf(n).contains(e.recordCount))
        case None => true
      }
      case _ => true
    }
  }

  /** The manifest's typed partition value for `f` on `e`, in Catalyst
    * internal form (Avro already hands dates as epoch days and
    * timestamps as micros; only strings need wrapping). */
  private def internalPartValue(e: DataFileEntry, name: String): Any =
    identityFieldOf.get(name).flatMap(e.partition.get).map {
      case s: String => UTF8String.fromString(s)
      case o => o
    }.orNull

  private def partTuple(e: DataFileEntry): Seq[Any] =
    partSchema.fields.map(f => internalPartValue(e, f.name)).toSeq

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // partition-value pruning rides the same bounds evaluator: an
    // identity value IS an exact (min = max) bound, so both filter
    // lists prune files before any opens
    val filters = (partitionFilters ++ dataFilters).filter(_.deterministic)
    val survivors =
      if (filters.isEmpty) snap.dataFiles
      else snap.dataFiles.filter(e => filters.forall(f => mayMatch(f, e)))
    if (partSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, survivors.map(e => statusOf(e.path)).toArray))
    else survivors.groupBy(partTuple).toSeq.map { case (vals, group) =>
      PartitionDirectory(InternalRow.fromSeq(vals),
        group.map(e => statusOf(e.path)).toArray)
    }
  }
}
