package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 reader for the metric catalog — SURVEY.md §4's optional
  * "native index source". The general parquet source already pushes
  * predicates down, but this source makes the catalog's contract
  * explicit: equality/IN/range predicates on the glob columns
  * (`p0..pN`, `depth`, `name`, `parent`) become parquet row-group
  * statistics filters, so a 3-wildcard glob over a billion-name catalog
  * opens only the row groups whose [min,max] component ranges can match
  * — the Spark analog of the reference's SASI per-component index scans
  * (drivers/cassandra_sasi.py:67-272) and of the ES terms queries
  * (drivers/elasticsearch.py:382-441).
  *
  * Pushed filters are used for PRUNING only: every accepted filter is
  * also returned as a post-scan residual, so Spark re-applies it exactly
  * and correctness never depends on statistics. Each catalog parquet
  * file is one [[InputPartition]] (catalog files are
  * metric-metadata-sized; row groups are the pruning unit inside).
  *
  * Usage: `spark.read.format("graft-catalog").load(dir)`, or
  * `Bgutil.Db.catalog` with `spark.graft.catalog.v2=true`.
  *
  * The same source also serves the POINTS store
  * (`PointsStore.read` with `spark.graft.points.v2=true`): hive-style
  * `stage=…/bucket=…` path segments surface as typed partition columns,
  * pushed filters on them prune whole files at plan time, and pushed
  * `metric_id` IN / `ts` range filters prune row groups inside the
  * surviving files via stats + dictionary — so a few-metric fetch reads
  * a handful of row groups out of a bucket holding millions of points
  * (the intra-partition analog of the reference's clustering-key slice,
  * drivers/cassandra.py:796-809).
  */
object GraftCatalogSource {
  val ShortName = "graft-catalog"

  /** Row groups actually read by the most recent scans (test observability
    * for pruning; single-JVM local mode shares this counter). */
  val rowGroupsRead = new AtomicLong(0)
  val rowGroupsTotal = new AtomicLong(0)

  private[sources] def sparkType(pt: PrimitiveType): DataType =
    pt.getPrimitiveTypeName match {
      case BINARY => StringType
      case INT32 => IntegerType
      case INT64 => LongType
      case DOUBLE => DoubleType
      case FLOAT => FloatType
      case BOOLEAN => BooleanType
      case other =>
        throw new IllegalArgumentException(
          s"graft-catalog: unsupported parquet type $other for ${pt.getName}")
    }

  private[sources] def listFiles(dir: String): Seq[String] =
    listFilesWithPartitions(dir).map(_.path)

  /** One data file plus the hive-style partition values (`k=v` path
    * segments, decoded from Spark's %XX escaping) accumulated on the way
    * down — how the source understands the points store's
    * `stage=…/bucket=…` layout without a metastore. */
  final case class PartitionedFile(path: String, values: Seq[(String, String)])

  private[sources] def listFilesWithPartitions(dir: String): Seq[PartitionedFile] = {
    val root = new java.io.File(dir)
    val out = ArrayBuffer.empty[PartitionedFile]
    def walk(f: java.io.File, values: Seq[(String, String)]): Unit =
      if (f.isDirectory) {
        val vs = f.getName.split("=", 2) match {
          case Array(k, v) if f != root =>
            values :+ (k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => values
        }
        Option(f.listFiles()).getOrElse(Array.empty).foreach(walk(_, vs))
      } else if (f.getName.endsWith(".parquet") && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")) out += PartitionedFile(f.getPath, values)
    walk(root, Nil)
    out.toSeq
  }

  /** Partition columns in path order, typed Long when every observed value
    * parses (bucket), String otherwise (stage). */
  private[sources] def partitionSchema(files: Seq[PartitionedFile]): StructType = {
    val names = files.flatMap(_.values.map(_._1)).distinct
    StructType(names.map { n =>
      val vals = files.flatMap(_.values.collect { case (`n`, v) => v })
      val isLong = vals.forall(v => scala.util.Try(v.toLong).isSuccess)
      StructField(n, if (isLong) LongType else StringType, nullable = true)
    })
  }

  /** Can `file` possibly satisfy `f`? Exact on partition-column leaves,
    * conservative `true` on anything else — pruning never loses a row
    * because every pushed filter is re-applied post-scan anyway, but a
    * pruned file must be DEFINITELY excluded. */
  private[sources] def partitionKeeps(values: Map[String, String],
      ptypes: Map[String, DataType], f: Filter): Boolean = {
    def cmp(c: String, v: Any): Option[Int] = // sign of (fileValue - v)
      values.get(c).flatMap { fv =>
        ptypes.get(c) match {
          case Some(LongType) =>
            scala.util.Try(java.lang.Long.compare(fv.toLong, v.toString.toLong))
              .toOption
          case _ => Some(fv.compareTo(v.toString))
        }
      }
    f match {
      case EqualTo(c, v) if v != null && values.contains(c) =>
        cmp(c, v).forall(_ == 0)
      case Not(EqualTo(c, v)) if v != null && values.contains(c) =>
        cmp(c, v).forall(_ != 0)
      case In(c, vs) if values.contains(c) && vs.forall(_ != null) =>
        vs.exists(v => cmp(c, v).forall(_ == 0))
      case GreaterThan(c, v) if values.contains(c) => cmp(c, v).forall(_ > 0)
      case GreaterThanOrEqual(c, v) if values.contains(c) =>
        cmp(c, v).forall(_ >= 0)
      case LessThan(c, v) if values.contains(c) => cmp(c, v).forall(_ < 0)
      case LessThanOrEqual(c, v) if values.contains(c) => cmp(c, v).forall(_ <= 0)
      case And(l, r) =>
        partitionKeeps(values, ptypes, l) && partitionKeeps(values, ptypes, r)
      case Or(l, r) =>
        partitionKeeps(values, ptypes, l) || partitionKeeps(values, ptypes, r)
      case _ => true
    }
  }

  /** Spark source filters → a parquet stats predicate over the columns we
    * index (string/int/long equality, IN, and ranges). Filters that don't
    * translate simply contribute no pruning (they still run post-scan). */
  private[sources] def toParquetPredicate(schema: StructType,
      filters: Seq[Filter]): Option[FilterPredicate] = {
    def typeOf(col: String): Option[DataType] =
      schema.fields.find(_.name == col).map(_.dataType)
    def eq(col: String, v: Any): Option[FilterPredicate] = typeOf(col).flatMap {
      case StringType => Some(FilterApi.eq(FilterApi.binaryColumn(col),
        Binary.fromString(v.toString)))
      case IntegerType => Some(FilterApi.eq(FilterApi.intColumn(col),
        java.lang.Integer.valueOf(v.toString.toInt)))
      case LongType => Some(FilterApi.eq(FilterApi.longColumn(col),
        java.lang.Long.valueOf(v.toString.toLong)))
      case _ => None
    }
    def convert(f: Filter): Option[FilterPredicate] = f match {
      case EqualTo(c, v) if v != null => eq(c, v)
      case In(c, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        val parts = vs.toSeq.flatMap(v => eq(c, v))
        if (parts.size == vs.length) Some(parts.reduce(FilterApi.or)) else None
      case GreaterThan(c, v: Integer) if typeOf(c).contains(IntegerType) =>
        Some(FilterApi.gt(FilterApi.intColumn(c), v))
      case GreaterThanOrEqual(c, v: Integer) if typeOf(c).contains(IntegerType) =>
        Some(FilterApi.gtEq(FilterApi.intColumn(c), v))
      case LessThan(c, v: Integer) if typeOf(c).contains(IntegerType) =>
        Some(FilterApi.lt(FilterApi.intColumn(c), v))
      case LessThanOrEqual(c, v: Integer) if typeOf(c).contains(IntegerType) =>
        Some(FilterApi.ltEq(FilterApi.intColumn(c), v))
      case GreaterThan(c, v: java.lang.Long) if typeOf(c).contains(LongType) =>
        Some(FilterApi.gt(FilterApi.longColumn(c), v))
      case GreaterThanOrEqual(c, v: java.lang.Long) if typeOf(c).contains(LongType) =>
        Some(FilterApi.gtEq(FilterApi.longColumn(c), v))
      case LessThan(c, v: java.lang.Long) if typeOf(c).contains(LongType) =>
        Some(FilterApi.lt(FilterApi.longColumn(c), v))
      case LessThanOrEqual(c, v: java.lang.Long) if typeOf(c).contains(LongType) =>
        Some(FilterApi.ltEq(FilterApi.longColumn(c), v))
      case And(l, r) =>
        (convert(l), convert(r)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (one, other) => one.orElse(other) // AND may prune on either side
        }
      case Or(l, r) =>
        for (a <- convert(l); b <- convert(r)) yield FilterApi.or(a, b)
      case _ => None
    }
    val preds = filters.flatMap(convert(_))
    preds.reduceOption(FilterApi.and)
  }

  /** Which filters we accept for pruning (everything convertible; the
    * rest is Spark's problem post-scan — and so are the accepted ones,
    * since we re-emit them as residuals). */
  private[sources] def prunable(schema: StructType, f: Filter): Boolean =
    toParquetPredicate(schema, Seq(f)).isDefined
}

class GraftCatalogSource extends TableProvider with DataSourceRegister {
  import GraftCatalogSource._

  override def shortName(): String = ShortName

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-catalog: missing path"))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = listFilesWithPartitions(path(options))
    require(files.nonEmpty, s"graft-catalog: no parquet files under ${path(options)}")
    val in = HadoopInputFile.fromPath(new Path(files.head.path), new Configuration())
    val reader = ParquetFileReader.open(in)
    val dataFields = try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      msg.getFields.asScala.toSeq.map { f =>
        StructField(f.getName, sparkType(f.asPrimitiveType()), nullable = true)
      }
    } finally reader.close()
    // hive-layout partition dirs (stage=/bucket=) surface as trailing
    // columns, exactly like Spark's own partition discovery
    StructType(dataFields ++ partitionSchema(files))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftCatalogTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

class GraftCatalogTable(dir: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_catalog(`$dir`)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCatalogScanBuilder(dir, schema)
}

class GraftCatalogScanBuilder(dir: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import GraftCatalogSource._

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => prunable(fullSchema, f))
    // ALL filters stay post-scan residuals (stats pruning is best-effort)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftCatalogScan(dir, fullSchema, required, pushed)
}

class GraftCatalogScan(dir: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  import GraftCatalogSource._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCatalogScan ${dir} PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** One InputPartition per surviving data file: pushed filters on
    * partition columns (stage/bucket) are evaluated against each file's
    * path values here, so a time-range point fetch plans ONLY the bucket
    * directories in range — the v2 analog of the generic source's
    * partition pruning, with row-group pruning still to come inside. */
  override def planInputPartitions(): Array[InputPartition] = {
    val files = listFilesWithPartitions(dir)
    val ptypes = partitionSchema(files).fields.map(f => f.name -> f.dataType).toMap
    files
      .filter(f => pushed.forall(partitionKeeps(f.values.toMap, ptypes, _)))
      .map(f => GraftCatalogPartition(f.path, required.json, fullSchema.json,
        pushed, f.values): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCatalogReaderFactory
}

final case class GraftCatalogPartition(file: String, requiredJson: String,
    fullJson: String, pushed: Array[Filter],
    partitionValues: Seq[(String, String)]) extends InputPartition

class GraftCatalogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftCatalogPartitionReader(
      partition.asInstanceOf[GraftCatalogPartition])
}

/** Reads one catalog parquet file: row groups are pruned by the pushed
  * predicates' column statistics (parquet-mr's stats + dictionary
  * filters via readNextFilteredRowGroup); surviving groups are fully
  * materialized and Spark's residual Filter finishes the job. */
class GraftCatalogPartitionReader(p: GraftCatalogPartition)
    extends PartitionReader[InternalRow] {
  import GraftCatalogSource._

  private val required = DataType.fromJson(p.requiredJson).asInstanceOf[StructType]
  private val full = DataType.fromJson(p.fullJson).asInstanceOf[StructType]

  private val inputFile =
    HadoopInputFile.fromPath(new Path(p.file), new Configuration())
  private val partValues: Map[String, String] = p.partitionValues.toMap
  // the stats predicate may only mention columns that exist IN THE FILE —
  // partition-column filters were already consumed by file pruning
  private val predicate = toParquetPredicate(full,
    p.pushed.toSeq.filter(_.references.forall(r => !partValues.contains(r))))
  private val options = {
    val b = ParquetReadOptions.builder()
    predicate.foreach(pr => b.withRecordFilter(FilterCompat.get(pr)))
    b.useStatsFilter(true).useDictionaryFilter(true).build()
  }
  private val reader = new ParquetFileReader(inputFile, options)
  private val fileSchema: MessageType =
    reader.getFooter.getFileMetaData.getSchema
  GraftCatalogSource.rowGroupsTotal.addAndGet(
    reader.getFooter.getBlocks.size().toLong)

  // request only the required columns plus any column a pushed predicate
  // needs (record assembly is per-column; pruning is orthogonal)
  private val requestedNames: Seq[String] = {
    val filterCols = p.pushed.toSeq.flatMap(_.references).distinct
    (required.fieldNames.toSeq ++ filterCols).distinct
      .filter(fileSchema.containsField)
  }
  private val requestedSchema = new MessageType("catalog",
    requestedNames.map(n => fileSchema.getType(Seq(n): _*)): _*)
  reader.setRequestedSchema(requestedSchema)

  private val colIdx: Array[Int] =
    required.fieldNames.map(n => requestedNames.indexOf(n))

  private var recordReader: org.apache.parquet.io.RecordReader[
    org.apache.parquet.example.data.Group] = null
  private var rowsLeft: Long = 0L
  private var current: InternalRow = null

  private def advanceRowGroup(): Boolean = {
    val pages = reader.readNextFilteredRowGroup()
    if (pages == null) false
    else {
      GraftCatalogSource.rowGroupsRead.incrementAndGet()
      val columnIO = new ColumnIOFactory().getColumnIO(requestedSchema)
      recordReader = columnIO.getRecordReader(
        pages, new GroupRecordConverter(requestedSchema))
      rowsLeft = pages.getRowCount
      true
    }
  }

  override def next(): Boolean = {
    while (rowsLeft == 0L) if (!advanceRowGroup()) return false
    val g = recordReader.read()
    rowsLeft -= 1
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val fi = colIdx(i)
      if (fi >= 0 && g.getFieldRepetitionCount(fi) > 0) {
        vals(i) = required.fields(i).dataType match {
          case StringType =>
            UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
          case IntegerType => g.getInteger(fi, 0)
          case LongType => g.getLong(fi, 0)
          case DoubleType => g.getDouble(fi, 0)
          case FloatType => g.getFloat(fi, 0)
          case BooleanType => g.getBoolean(fi, 0)
          case other =>
            throw new IllegalArgumentException(s"graft-catalog: $other")
        }
      } else if (fi < 0) {
        // not in the file: a partition column — constant for every row
        vals(i) = partValues.get(required.fields(i).name).map { v =>
          required.fields(i).dataType match {
            case StringType => UTF8String.fromString(v)
            case LongType => v.toLong
            case IntegerType => v.toInt
            case other =>
              throw new IllegalArgumentException(
                s"graft-catalog: partition column type $other")
          }
        }.orNull
      }
      i += 1
    }
    current = new GenericInternalRow(vals)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
