package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over a store root: every namespace directory (one per
  * [[graft.tsdb.StoreSettings]] hash) becomes a SQL namespace, its tiers
  * become tables — so a store written by ANY process is queryable from
  * pure SQL with zero Scala:
  *
  * {{{
  *   SET spark.sql.catalog.tsdb      = graft.sources.TsdbCatalog  (or conf)
  *   SET spark.sql.catalog.tsdb.root = /data/stores
  *   SELECT * FROM tsdb.`<settingsHash>`.hot
  *   WHERE tag = 'click' AND ts BETWEEN …       -- dirs pruned at plan time
  *   INSERT INTO tsdb.`<settingsHash>`.hot …    -- two-phase-commit append
  * }}}
  *
  * Each table is the full [[TsdbTable]]: pruned + runtime-filtered reads,
  * statistics, batch/streaming writes. `partitionWidth` comes from the
  * namespace's write-once `settings.json` (TimeSeriesStore.initialize) —
  * the catalog needs no per-table configuration. The catalog is
  * read-structure-only: namespaces are created by store initialization,
  * so `CREATE/DROP/ALTER TABLE` are refused.
  */
class TsdbCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var graceMs: Option[Long] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'root' (the store root directory)"))
    graceMs = Option(options.get("graceMs")).map(_.toLong)
  }

  override def name(): String = catalogName

  private val Tiers = Seq("hot", "cold", "all")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1 || !Files.isDirectory(Paths.get(root, namespace(0))))
      throw new NoSuchNamespaceException(namespace)
    Tiers.map(t => Identifier.of(namespace, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && Tiers.contains(ident.name) &&
      Files.isDirectory(Paths.get(root, ident.namespace()(0)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val nsRoot = Paths.get(root, ident.namespace()(0))
    val settingsFile = nsRoot.resolve("settings.json")
    val width = {
      // write-once canonical record (StoreSettings.canonicalJson)
      val json =
        if (Files.exists(settingsFile))
          new String(Files.readAllBytes(settingsFile), "UTF-8")
        else throw new NoSuchTableException(ident)
      """"partitionWidth"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(
          s"settings.json in $nsRoot has no partitionWidth: $json"))
    }
    new TsdbTable(nsRoot.toString, ident.name, width)
  }

  // ------------------------------------------------- SQL time travel
  // Delta's `table_changes` sibling surface (VERDICT r16 next #4): the
  // store's asOf snapshot from PURE SQL —
  //   SELECT * FROM tsdb.`<ns>`.hot VERSION AS OF 1500          (store clock, ms)
  //   SELECT * FROM tsdb.`<ns>`.hot TIMESTAMP AS OF '1970-01-01 00:00:01.5'
  // The returned table is the COMPLETE snapshot (tier files by the
  // GC-ledger retirement rule + the bounded L0 tier + the
  // `ingestTs <= asOf` row bound — TsdbTable's snapshot mode), so a SQL
  // consumer needs no post-read fix-up. The retention-horizon guard
  // needs the DEPLOYED grace (not part of the hashed settings), declared
  // once as the catalog option `graceMs` — the same contract the CDF
  // source's option carries.

  /** `VERSION AS OF <clock>` — the version IS the store mutation clock
    * in epoch millis (the clock domain every ledger/snapshot API uses).
    */
  override def loadTable(ident: Identifier, version: String): Table =
    timeTravel(ident,
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"tsdb VERSION AS OF takes the store mutation clock in epoch " +
            s"millis, got '$version'")
      })

  /** `TIMESTAMP AS OF <expr>` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    timeTravel(ident, Math.floorDiv(timestamp, 1000L))

  private def timeTravel(ident: Identifier, asOfMs: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val grace = graceMs.getOrElse(throw new IllegalArgumentException(
      s"catalog $catalogName: time travel needs the deployed retention " +
        s"window — SET spark.sql.catalog.$catalogName.graceMs to the " +
        "store's obsoleteGraceMs"))
    val nsRoot = Paths.get(root, ident.namespace()(0)).toString
    // the shared horizon guard (refuses a snapshot old enough that
    // grace-swept files could serve it incomplete)
    graft.tsdb.TimeSeriesStore.openNamespace(
      org.apache.spark.sql.SparkSession.active, nsRoot, grace)
      .guardHorizon(asOfMs)
    val base = loadTable(ident).asInstanceOf[TsdbTable]
    base.withSnapshot(asOfMs)
  }

  override def createTable(
      ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "tsdb namespaces are created by TimeSeriesStore.initialize, not CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("tsdb tables are not alterable")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "tsdb tables are dropped through the store's purge lifecycle, not DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("tsdb tables are not renameable")
}
