package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over the [[graft.tsdb.TimeSeriesStore]] tier
  * layout (`<nsRoot>/{hot,cold}/tag=<t>/partition_start=<p>/` parquet files).
  *
  * The store's Spark-facing reads normally go through
  * `spark.read.parquet(tierDir)` with Hive partition discovery
  * (TimeSeriesStore.tierDF). That works, but it rediscovers partitions
  * through the generic file index and cannot express store-specific
  * knowledge. This connector is the engine-native read path:
  *
  *  - **Partition pruning at plan time**: `tag = 'x'` / `tag IN (...)`
  *    prunes tag directories, bounds on `partition_start` prune window
  *    directories directly, and bounds on `ts` prune window directories
  *    through the store's width invariant (a row with timestamp t lives in
  *    the directory with `partition_start = t - t % width` — reference
  *    index.js:127-130's partition math). Only surviving directories are
  *    ever listed for files; at 100 TB a one-tag two-day query opens a few
  *    dozen directories out of millions.
  *  - **Column pruning to the parquet footer**: the projected schema is
  *    pushed into the parquet read schema (`parquet.read.schema`), so
  *    unrequested columns are never decoded; directory-encoded columns
  *    (`tag`, `partition_start`) are synthesized per-partition for free.
  *  - **One InputPartition per (tier, tag, window) directory**: reads are
  *    embarrassingly parallel across directories and never shuffle.
  *
  * Exactly-handled filters (tag / partition_start predicates — constant
  * per directory) are consumed by the source; `ts` bounds are used for
  * pruning but handed back to Spark as residuals since rows inside a
  * surviving directory still need the row-level check.
  *
  * Registered as `graft-tsdb` (META-INF/services). Options: `path` (the
  * store namespace root), `tier` (`hot` | `cold` | `all`, default `hot`),
  * `partitionWidth` (ms, must match the store settings' width).
  */
class TsdbTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-tsdb"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsdbSource.Schema

  override def supportsExternalMetadata(): Boolean = false

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-tsdb requires option 'path' (the store namespace root)"))
    val tier = Option(opts.get("tier")).getOrElse("hot").toLowerCase
    require(Set("hot", "cold", "all")(tier),
      s"graft-tsdb: tier must be hot|cold|all, got '$tier'")
    val width = Option(opts.get("partitionWidth")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        "graft-tsdb requires option 'partitionWidth' (the store's partition width, ms)"))
    new TsdbTable(path, tier, width)
  }
}

object TsdbSource {
  /** Logical schema: the store sample schema plus the directory-encoded
    * window column (useful for window-aligned aggregation without
    * recomputing `ts - ts % width`).
    */
  val Schema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("partition_start", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("ingestTs", LongType, nullable = false),
    StructField("writerId", StringType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Columns physically present in tier parquet files, in file order. */
  val PhysicalOrder: Seq[String] = Seq("ts", "value", "ingestTs", "writerId", "seq")
}

final class TsdbTable(nsRoot: String, tier: String, width: Long)
    extends Table with SupportsRead {

  override def name(): String = s"graft-tsdb(`$nsRoot`, tier=$tier)"

  override def schema(): StructType = TsdbSource.Schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsdbScanBuilder(nsRoot, tier, width)
}

final class TsdbScanBuilder(nsRoot: String, tier: String, width: Long)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = TsdbSource.Schema
  private var pushed: Array[Filter] = Array.empty

  /** A predicate on a directory-encoded column holds for every row of a
    * surviving directory, so the source evaluates it exactly; `ts` bounds
    * only prune directories and stay residual.
    */
  private def exactlyHandled(f: Filter): Boolean = f match {
    case IsNotNull(a) => TsdbSource.Schema.fieldNames.contains(a) // all non-null
    case EqualTo("tag", _: String) => true
    case In("tag", vs) => vs.forall(_.isInstanceOf[String])
    case EqualTo("partition_start", _) | GreaterThan("partition_start", _) |
         GreaterThanOrEqual("partition_start", _) | LessThan("partition_start", _) |
         LessThanOrEqual("partition_start", _) => true
    case _ => false
  }

  private def pruningAid(f: Filter): Boolean = f match {
    case EqualTo("ts", _) | GreaterThan("ts", _) | GreaterThanOrEqual("ts", _) |
         LessThan("ts", _) | LessThanOrEqual("ts", _) => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => exactlyHandled(f) || pruningAid(f))
    filters.filterNot(exactlyHandled)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TsdbScan(nsRoot, tier, width, required, pushed)
}

final class TsdbScan(
    nsRoot: String,
    tier: String,
    width: Long,
    required: StructType,
    pushed: Array[Filter]) extends Scan with Batch with SupportsRuntimeFiltering {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  // ---------------------------------------------- runtime re-pruning
  // Dynamic partition pruning, DSv2-style: when this table joins a small
  // dimension on a directory-encoded column, Spark hands the broadcast
  // side's key set here at RUNTIME (an `In` filter) and the directory
  // prune re-runs with it — a 100 TB fact scan driven by a dim filter
  // never lists the unmatched tag/window directories.

  @volatile private var runtimeFilters: Array[Filter] = Array.empty
  @volatile private var plannedCache: (Array[TsdbInputPartition], Int) = _

  /** Only attributes surviving column pruning — Spark resolves these
    * against the scan's OUTPUT, so naming a pruned column is an analysis
    * error, not a no-op.
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Seq("tag", "partition_start")
      .filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(filters: Array[Filter]): Unit = {
    runtimeFilters = filters
    plannedCache = null
  }

  // -------------------------------------------------- directory pruning

  private def asLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other => other.toString.toLong
  }

  /** (surviving partitions, total window directories seen). Driver-side,
    * recomputed when runtime filters arrive; only surviving directories
    * are file-listed.
    */
  private def planned: (Array[TsdbInputPartition], Int) = {
    val cached = plannedCache
    if (cached != null) return cached
    val computed = computePlanned()
    plannedCache = computed
    computed
  }

  private def computePlanned(): (Array[TsdbInputPartition], Int) = {
    var tsLo = Long.MinValue; var tsHi = Long.MaxValue
    var psLo = Long.MinValue; var psHi = Long.MaxValue
    var psIn: Option[Set[Long]] = None
    var tags: Option[Set[String]] = None
    def addTags(s: Set[String]): Unit =
      tags = Some(tags.fold(s)(_ intersect s))
    (pushed ++ runtimeFilters).foreach {
      case In("partition_start", vs) =>
        val s = vs.map(asLong).toSet
        psIn = Some(psIn.fold(s)(_ intersect s))
      // runtime filter values may arrive as UTF8String — normalize via
      // toString (dropping a value here would WRONGLY prune its directory)
      case EqualTo("tag", v) if v != null => addTags(Set(v.toString))
      case In("tag", vs) => addTags(vs.filter(_ != null).map(_.toString).toSet)
      case EqualTo("ts", v) => tsLo = math.max(tsLo, asLong(v)); tsHi = math.min(tsHi, asLong(v))
      case GreaterThan("ts", v) => tsLo = math.max(tsLo, Math.addExact(asLong(v), 1))
      case GreaterThanOrEqual("ts", v) => tsLo = math.max(tsLo, asLong(v))
      case LessThan("ts", v) => tsHi = math.min(tsHi, Math.subtractExact(asLong(v), 1))
      case LessThanOrEqual("ts", v) => tsHi = math.min(tsHi, asLong(v))
      case EqualTo("partition_start", v) => psLo = math.max(psLo, asLong(v)); psHi = math.min(psHi, asLong(v))
      case GreaterThan("partition_start", v) => psLo = math.max(psLo, Math.addExact(asLong(v), 1))
      case GreaterThanOrEqual("partition_start", v) => psLo = math.max(psLo, asLong(v))
      case LessThan("partition_start", v) => psHi = math.min(psHi, Math.subtractExact(asLong(v), 1))
      case LessThanOrEqual("partition_start", v) => psHi = math.min(psHi, asLong(v))
      case _ => ()
    }
    // ts bounds → window bounds via the width invariant
    if (tsHi != Long.MaxValue) psHi = math.min(psHi, tsHi)
    if (tsLo != Long.MinValue) psLo = math.max(psLo, tsLo - math.floorMod(tsLo, width))

    def subDirs(d: Path, prefix: String): Seq[Path] =
      if (!Files.isDirectory(d)) Seq.empty
      else {
        val s = Files.list(d)
        try s.iterator().asScala
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
          .toSeq
        finally s.close()
      }

    val tierNames = if (tier == "all") Seq("hot", "cold") else Seq(tier)
    val parts = ArrayBuffer.empty[TsdbInputPartition]
    var total = 0
    tierNames.foreach { tn =>
      subDirs(Paths.get(nsRoot, tn), "tag=").foreach { tagDir =>
        val tag = ExternalCatalogUtils.unescapePathName(
          tagDir.getFileName.toString.stripPrefix("tag="))
        val tagOk = tags.forall(_.contains(tag))
        subDirs(tagDir, "partition_start=").foreach { pd =>
          total += 1
          val ps = pd.getFileName.toString.stripPrefix("partition_start=").toLong
          if (tagOk && ps >= psLo && ps <= psHi && psIn.forall(_.contains(ps))) {
            val s = Files.list(pd)
            val files =
              try s.iterator().asScala.map(_.toString)
                .filter(_.endsWith(".parquet")).toArray
              finally s.close()
            if (files.nonEmpty) parts += TsdbInputPartition(tag, ps, files)
          }
        }
      }
    }
    (parts.toArray, total)
  }

  override def planInputPartitions(): Array[InputPartition] =
    planned._1.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    TsdbReaderFactory(required)

  override def description(): String = {
    val (kept, total) = (planned._1.length, planned._2)
    s"TsdbScan tier=$tier dirs=$kept/$total " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  }
}

/** One store directory = one Spark partition: (tag, window, its files). */
final case class TsdbInputPartition(
    tag: String, partitionStart: Long, files: Array[String]) extends InputPartition

final case class TsdbReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TsdbPartitionReader(partition.asInstanceOf[TsdbInputPartition], schema)
}

/** Executor-side reader: streams the directory's parquet files through a
  * projection-pushed `GroupReadSupport` (only requested columns are
  * decoded) and synthesizes the directory-encoded `tag`/`partition_start`
  * values without touching the file bytes.
  */
final class TsdbPartitionReader(p: TsdbInputPartition, schema: StructType)
    extends PartitionReader[InternalRow] {

  private val physical: Seq[String] =
    TsdbSource.PhysicalOrder.filter(schema.fieldNames.contains)
  // a pure-count or dir-column-only projection still needs one physical
  // column to drive row iteration; `seq` is a fixed-width int64
  private val readCols = if (physical.isEmpty) Seq("seq") else physical
  private val conf = new Configuration()

  /** Per-file projection: parquet's schema-containment check requires the
    * requested repetition to match the file's, and a store legitimately
    * mixes `required` files (the serving-path writer,
    * ParquetIO.partFileSchema) with `optional` ones (the distributed bulk
    * lane writes Spark-nullable columns) — so the projection is built from
    * each file's own footer, selecting just the requested fields.
    */
  private def withProjection(file: String): Configuration = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new HPath(file), conf)
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val fileSchema = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    val proj = new org.apache.parquet.schema.MessageType(
      "sample", readCols.map(c => fileSchema.getType(Seq(c): _*)): _*)
    val c = new Configuration(conf)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    c
  }

  private val tagU8 = UTF8String.fromString(p.tag)
  private var fileIdx = 0
  private var reader: ParquetReader[Group] = _
  private var current: Group = _

  override def next(): Boolean = {
    while (true) {
      if (reader == null) {
        if (fileIdx >= p.files.length) return false
        reader = ParquetReader
          .builder(new GroupReadSupport(), new HPath(p.files(fileIdx)))
          .withConf(withProjection(p.files(fileIdx)))
          .build()
        fileIdx += 1
      }
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
    }
    false
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    schema.fields.foreach { f =>
      vals(i) = f.name match {
        case "tag"             => tagU8
        case "partition_start" => p.partitionStart
        case "ts"              => current.getLong("ts", 0)
        case "value"           => UTF8String.fromString(current.getString("value", 0))
        case "ingestTs"        => current.getLong("ingestTs", 0)
        case "writerId"        => UTF8String.fromString(current.getString("writerId", 0))
        case "seq"             => current.getLong("seq", 0)
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }
}
