package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, AttributeReference, BasePredicate, BoundReference, Cast, Expression, Literal, PlanExpression, Predicate => CatalystPredicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}

/** [[FileIndex]] over one Delta snapshot — the batch face of
  * `format("graft-delta")`, mirroring [[GraftFileIndex]]'s shape: ONE
  * stock parquet scan whose partition values come from the LOG's
  * `partitionValues` (the protocol's source of truth, never directory
  * names), with partition filters evaluated completely through
  * Catalyst's interpreted predicate before any file opens. Compared to
  * [[DeltaLake.read]]'s per-partition-tuple union of literal-tagged
  * scans, this is the shape that holds at thousands of partitions: the
  * planner sees one relation, prunes at the index, and the vectorized
  * reader / column pruning / codegen stay stock.
  *
  * Column-mapped and deletion-vectored snapshots are NOT representable
  * here (physical-name translation and row-level anti-joins don't fit a
  * file index) — callers route those through [[DeltaLake.read]]. */
final class DeltaFileIndex(spark: SparkSession, root: String,
    snap: DeltaLake.DeltaSnapshot) extends FileIndex {

  require(!snap.columnMapping,
    s"column-mapped Delta table at $root cannot ride the file-index scan — use DeltaLake.read")
  require(snap.files.forall(_.dv.isEmpty),
    s"Delta table at $root carries deletion vectors — use DeltaLake.read, which honors them")

  private val base = root.stripSuffix("/")

  override val partitionSchema: StructType =
    StructType(snap.partitionColumns.map(c => snap.schema(c)))

  /** Non-partition columns in declared order — read from the files. */
  val dataSchema: StructType =
    StructType(snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))

  /** Declared column order, for [[graft.plans.DeclaredOrderRule]]. */
  def declaredFieldOrder: Seq[String] = snap.schema.fieldNames.toIndexedSeq

  private def abs(p: String): String =
    if (p.matches("^[A-Za-z][A-Za-z0-9+.-]*:/.*") || p.startsWith("/")) p else s"$base/$p"

  override def rootPaths: Seq[Path] = Seq(new Path(base))
  override def refresh(): Unit = ()
  override def inputFiles: Array[String] = snap.files.map(f => abs(f.path)).toArray
  override lazy val sizeInBytes: Long = statusOf.values.map(_.getLen).sum

  // one listStatus per distinct parent dir, as any hive listing pays
  private lazy val statusOf: Map[String, FileStatus] = {
    snap.files.map(_.path).groupBy(p => abs(p).substring(0, abs(p).lastIndexOf('/')))
      .flatMap { case (dir, inDir) =>
        val d = new Path(dir)
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val listed = fs.listStatus(d).map(st => st.getPath.getName -> st).toMap
        inDir.map { rel =>
          val name = rel.substring(rel.lastIndexOf('/') + 1)
          rel -> listed.getOrElse(name, throw new IllegalStateException(
            s"file $rel is live at v${snap.version} of $root but missing on disk (vacuumed?)"))
        }
      }
  }

  private val tz = spark.conf.get("spark.sql.session.timeZone")

  private def partitionRow(vals: Seq[Option[String]]): InternalRow =
    InternalRow.fromSeq(vals.zip(partitionSchema.fields).map {
      case (None, _) => null
      case (Some(s), f) => Cast(Literal.create(s, StringType), f.dataType, Option(tz)).eval(null)
    })

  private def tupleOf(e: DeltaLake.AddEntry): Seq[Option[String]] =
    snap.partitionColumns.map(c => e.partitionValues.getOrElse(c, None))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val survivors =
      if (snap.partitionColumns.isEmpty || partitionFilters.isEmpty) snap.files
      else {
        val usable = partitionFilters.filter { f =>
          f.deterministic &&
            f.find(_.isInstanceOf[PlanExpression[_]]).isEmpty &&
            f.references.forall(a => partitionSchema.fieldNames.contains(a.name))
        }
        if (usable.isEmpty) snap.files
        else {
          val bound = usable.reduce[Expression](CatalystAnd(_, _)).transform {
            case a: AttributeReference =>
              BoundReference(partitionSchema.fieldIndex(a.name), a.dataType, a.nullable)
          }
          val pred: BasePredicate = CatalystPredicate.createInterpreted(bound)
          pred.initialize(0)
          val verdict = scala.collection.mutable.Map.empty[Seq[Option[String]], Boolean]
          snap.files.filter(e =>
            verdict.getOrElseUpdate(tupleOf(e), pred.eval(partitionRow(tupleOf(e)))))
        }
      }
    if (snap.partitionColumns.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, survivors.map(e => statusOf(e.path)).toArray))
    else survivors.groupBy(tupleOf).toSeq.map { case (vals, group) =>
      PartitionDirectory(partitionRow(vals), group.map(e => statusOf(e.path)).toArray)
    }
  }
}
