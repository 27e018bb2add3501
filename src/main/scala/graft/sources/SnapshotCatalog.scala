package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 CATALOG over [[SnapshotStore]] tables — the piece
  * that makes time travel a PLAIN SQL construct instead of a reader
  * option:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_snap",
  *     "graft.sources.SnapshotCatalog")
  *   spark.conf.set("spark.sql.catalog.graft_snap.base", storesDir)
  *
  *   spark.sql("SELECT * FROM graft_snap.my_store")                   -- current
  *   spark.sql("SELECT * FROM graft_snap.my_store VERSION AS OF 1")   -- snapshot id
  *   spark.sql("SELECT * FROM graft_snap.my_store VERSION AS OF 'audited'") -- tag
  *   spark.sql("SELECT * FROM graft_snap.my_store TIMESTAMP AS OF ...")
  *   spark.sql("INSERT INTO graft_snap.my_store SELECT ...")          -- CAS commit
  * }}}
  *
  * Identifier → store mapping is directory-shaped: table `name` lives
  * at `<base>/<name>` (one level, the layout [[SnapshotStore]] itself
  * writes). `VERSION AS OF` resolves a numeric literal as a snapshot
  * id and any other string as a TAG name; `TIMESTAMP AS OF` arrives
  * from Spark as MICROseconds and resolves through
  * [[SnapshotStore.snapshotAsOf]]. Loaded tables are the ordinary
  * [[SnapshotTable]], so every connector capability rides along:
  * manifest-stats file pruning, metadata-answered aggregates, reported
  * statistics, runtime filtering, and the CAS-committed write path
  * (`INSERT INTO` is an append commit — concurrent inserters
  * serialize through the claim CAS like any writer).
  *
  * Catalog mutations (CREATE/DROP/ALTER/RENAME) are refused: store
  * lifecycle belongs to the engine's commit protocol, not to SQL DDL —
  * a dropped table would bypass the expire/vacuum retention contract.
  */
class SnapshotCatalog extends TableCatalog {
  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = options.get("base")
    require(base != null && base.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.base = <stores dir>")
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String = {
    require(ident.namespace.isEmpty ||
      (ident.namespace.length == 1 && ident.namespace()(0) == "default"),
      s"graft snapshot catalog is single-level: ${ident.namespace.mkString(".")}")
    require(ident.name.matches("[A-Za-z0-9._\\-]+"),
      s"invalid store name: ${ident.name}")
    s"$base/${ident.name}"
  }

  private def spark: SparkSession = SparkSession.active

  private def tableAt(root: String, k: Long): Table =
    new SnapshotTable(root, k,
      SnapshotTableSource.publicTableSchema(spark, root, k))

  override def tableExists(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    val f = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    f.exists(new Path(s"$root/manifests")) &&
      SnapshotStore.currentSnapshot(spark, root) > 0L
  }

  override def loadTable(ident: Identifier): Table = {
    // the INSPECTION surface as nested SQL tables, the Iceberg shape:
    //   SELECT * FROM graft_snap.<store>.snapshots   (files | refs)
    if (ident.namespace.length == 1 &&
      SnapshotCatalog.MetaNames(ident.name)) {
      val storeRoot = s"$base/${ident.namespace()(0)}"
      if (SnapshotStore.currentSnapshot(spark, storeRoot) > 0L)
        return new SnapshotMetaTable(storeRoot, ident.name)
    }
    val root = rootOf(ident)
    val k = SnapshotStore.currentSnapshot(spark, root)
    if (k == 0L) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException(ident)
    tableAt(root, k)
  }

  /** `VERSION AS OF <v>`: a numeric literal is a snapshot id, any
    * other string resolves as a TAG name — so an auditor can read
    * `VERSION AS OF 'validated'` without knowing ids.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val k = version.trim.toLongOption
      .getOrElse(SnapshotStore.resolveTag(spark, root, version.trim))
    require(k >= 1 && k <= SnapshotStore.currentSnapshot(spark, root),
      s"VERSION AS OF $version: snapshot $k is not committed")
    tableAt(root, k)
  }

  /** `TIMESTAMP AS OF <t>`: Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    tableAt(root, SnapshotStore.snapshotAsOf(spark, root, timestamp / 1000L))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty ||
      (namespace.length == 1 && namespace(0) == "default"),
      s"graft snapshot catalog is single-level: ${namespace.mkString(".")}")
    val p = new Path(base)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Array.empty
    f.listStatus(p).toSeq
      .filter(st => st.isDirectory &&
        f.exists(new Path(st.getPath, "manifests")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft snapshot stores are created by their first commit " +
        "(SnapshotStore.append / df.write), not by DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolution goes through SnapshotStore commits (renameColumn, " +
        "additive append), not ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "store retirement goes through expire/vacuum, not DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("stores are directory-addressed")
}

object SnapshotCatalog {
  /** The nested metadata-table names (`<store>.snapshots` etc.). */
  val MetaNames: Set[String] = Set("snapshots", "files", "refs")
}

/** A METADATA table of the catalog (`<store>.snapshots` / `.files` /
  * `.refs`): driver-computed rows served through a [[LocalScan]] —
  * correct altitude, because these ARE metadata-scale relations
  * (O(#snapshots) / O(#files) / O(#refs) rows); shipping them through
  * executor partitions would serialize a driver listing anyway.
  */
final class SnapshotMetaTable(storeRoot: String, which: String)
    extends Table with SupportsRead {
  private def spark = SparkSession.active

  private def frame: org.apache.spark.sql.DataFrame = which match {
    case "snapshots" => SnapshotStore.metaSnapshots(spark, storeRoot)
    case "files" => SnapshotStore.metaFiles(spark, storeRoot,
      SnapshotStore.currentSnapshot(spark, storeRoot))
    case "refs" => SnapshotStore.metaRefs(spark, storeRoot)
  }

  override def name(): String = s"graft_snapshot_meta($storeRoot#$which)"
  override def schema(): StructType = frame.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          private val df = frame
          override def readSchema(): StructType = df.schema
          override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
            df.queryExecution.executedPlan.executeCollect()
          override def description(): String = name()
        }
    }
}
