package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier,
  NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions,
  Transform}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NAME-BASED SQL access to sharded tables — a DataSource V2
  * `TableCatalog` over the `graft-sharded` format, so the table layer
  * stops being path-only:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft-warehouse
  *
  *   CREATE NAMESPACE graft.corpus;
  *   CREATE TABLE graft.corpus.docs (doc_id BIGINT, t STRING)
  *     USING graft-sharded
  *     TBLPROPERTIES (idCol 'doc_id', numShards '8');
  *   INSERT INTO graft.corpus.docs SELECT ...;
  *   SELECT * FROM graft.corpus.docs WHERE doc_id BETWEEN 10 AND 99;
  *   SELECT * FROM graft.corpus.docs VERSION AS OF 3;      -- time travel
  *   SELECT * FROM graft.corpus.docs TIMESTAMP AS OF '...';
  *   ALTER TABLE graft.corpus.docs RENAME COLUMN t TO txt; -- metadata-only
  *   DROP TABLE graft.corpus.docs;
  * }}}
  *
  * LAYOUT. The catalog is directory-backed (zero new services, same
  * trust model as the table format itself): a namespace is a
  * directory under the warehouse, a table is a directory holding a
  * `_graft.json` descriptor (declared schema, partition columns,
  * properties). MANAGED tables keep their snapshots inside that same
  * directory; `LOCATION '...'` makes the table EXTERNAL — the
  * descriptor stays in the warehouse, data lives at the location, and
  * DROP removes only the descriptor.
  *
  * WRITE KNOBS ride as table properties (`idCol`, `orderCol`,
  * `numShards`, `statsCols`) — a SQL `INSERT INTO` carries no writer
  * options, so [[GraftShardedTable]] fills them from these defaults.
  * Everything else — optimistic commit, schema checks, widening,
  * partition inheritance, manifest pruning, aggregate pushdown — is
  * the same machinery every other surface uses; the catalog adds only
  * name resolution.
  *
  * SCALE. Catalog calls are metadata-only: a listing or a KB-sized
  * descriptor read; no data file is ever touched by resolution. The
  * reference (`core.cljc:15-43`) has no catalog — this is part of the
  * engine's beyond-reference Spark surface. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  private def hconf =
    spark.sparkContext.hadoopConfiguration

  private def fsOf(p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(hconf)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.error(s"catalog $name: set spark.sql.catalog.$name" +
        ".warehouse to a directory"))
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): String =
    (warehouse +: namespace.toSeq).mkString("/")

  private def tableDir(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name())
      .mkString("/")

  private def descriptorPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_graft.json")

  // ---- descriptor (de)serialization --------------------------------

  private final case class Descriptor(schema: StructType,
                                      partCols: Seq[String],
                                      properties: Map[String, String])

  private def writeDescriptor(dir: String, d: Descriptor,
                              overwrite: Boolean): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val fs = fsOf(dir)
    val json = compact(render(
      ("schema" -> d.schema.json) ~
      ("partCols" -> d.partCols) ~
      ("properties" -> d.properties)))
    val out = fs.create(descriptorPath(dir), overwrite)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  private def readDescriptor(dir: String): Option[Descriptor] = {
    import org.json4s.jackson.JsonMethods.parse
    import org.json4s.DefaultFormats
    implicit val fmts: DefaultFormats.type = DefaultFormats
    val fs = fsOf(dir)
    val p = descriptorPath(dir)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString finally in.close()
    val j = parse(text)
    Some(Descriptor(
      DataType.fromJson((j \ "schema").extract[String])
        .asInstanceOf[StructType],
      (j \ "partCols").extract[Seq[String]],
      (j \ "properties").extract[Map[String, String]]))
  }

  private def dataPathOf(dir: String, d: Descriptor): String =
    d.properties.getOrElse(TableCatalog.PROP_LOCATION, dir)

  // ---- TableCatalog -------------------------------------------------

  override def listTables(namespace: Array[String])
      : Array[Identifier] = {
    val fs = fsOf(warehouse)
    val dir = new org.apache.hadoop.fs.Path(nsDir(namespace))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => fs.exists(descriptorPath(s"${nsDir(namespace)}/$n")))
      .map(n => Identifier.of(namespace, n))
  }

  override def tableExists(ident: Identifier): Boolean =
    readDescriptor(tableDir(ident)).isDefined

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** `VERSION AS OF <n>` — the snapshot pin, by name. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.trim.toLong))

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val d = readDescriptor(tableDir(ident)).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name())))
    val path = dataPathOf(tableDir(ident), d)
    loadAt(ident, Some(
      Sources.shardedVersionAt(spark, path, timestamp / 1000L)))
  }

  private def loadAt(ident: Identifier, version: Option[Long])
      : Table = {
    val dir = tableDir(ident)
    val d = readDescriptor(dir).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name())))
    val path = dataPathOf(dir, d)
    val live = Sources.shardedVersions(spark, path).nonEmpty
    // A CATALOG table's schema is the user-facing contract: the
    // DECLARED column order (INSERT INTO is positional), live TYPES
    // (widening), any evolved live-only columns appended — and never
    // the writer's `shard` layout column (path-based format reads
    // keep it; a named table hides it). A version-pinned load keeps
    // its era's live names — time travel shows the names of its time.
    val schema =
      if (!live) d.schema
      else {
        val liveSchema = StructType(
          GraftSharded.tableSchema(spark, path, version)
            .fields.filter(_.name != "shard"))
        if (version.isDefined) liveSchema
        else {
          val byName = liveSchema.fields.map(f => f.name -> f).toMap
          StructType(
            d.schema.fields.map(f => byName.getOrElse(f.name, f)) ++
              liveSchema.fields.filterNot(f =>
                d.schema.fieldNames.contains(f.name)))
        }
      }
    val transforms: Array[Transform] =
      d.partCols.map(c => Expressions.identity(c)).toArray
    new GraftShardedTable(path, schema, version, transforms,
      writeDefaults = d.properties.filter { case (k, _) =>
        Set("idCol", "orderCol", "numShards", "statsCols")(k) })
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String])
      : Table = {
    val dir = tableDir(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      (catalogName +: ident.namespace().toSeq :+ ident.name()))
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"graft catalog: only identity partitioning, got ${t.describe()}")
      t.references().head.fieldNames.mkString(".")
    }
    import scala.jdk.CollectionConverters._
    val props = properties.asScala.toMap
      .filterNot { case (k, _) => k == TableCatalog.PROP_PROVIDER }
    fsOf(dir).mkdirs(new org.apache.hadoop.fs.Path(dir))
    writeDescriptor(dir, Descriptor(schema, partCols, props),
      overwrite = false)
    loadTable(ident)
  }

  /** Metadata-only ALTERs: RENAME COLUMN rides the table format's
    * rename history; SET/UNSET TBLPROPERTIES update the descriptor.
    * Physical-shape changes (type/position/drop) are not supported —
    * the format's evolution surface is add-only + widening + rename. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val d = readDescriptor(dir).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name())))
    val path = dataPathOf(dir, d)
    var cur = d
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "graft catalog: nested column renames are not supported")
        val from = rc.fieldNames()(0)
        if (Sources.shardedVersions(spark, path).nonEmpty)
          Sources.renameShardedTableColumn(spark, path, from,
            rc.newName())
        cur = cur.copy(schema = StructType(cur.schema.fields.map(f =>
          if (f.name == from) f.copy(name = rc.newName()) else f)))
      case sp: TableChange.SetProperty =>
        cur = cur.copy(properties =
          cur.properties + (sp.property() -> sp.value()))
      case rp: TableChange.RemoveProperty =>
        cur = cur.copy(properties = cur.properties - rp.property())
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported table change $other")
    }
    writeDescriptor(dir, cur, overwrite = true)
    loadTable(ident)
  }

  /** DROP: managed tables (no LOCATION) lose their data with the
    * descriptor; external tables keep the data, lose the name. */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    readDescriptor(dir) match {
      case None => false
      case Some(d) =>
        val external = d.properties.contains(TableCatalog.PROP_LOCATION)
        if (!external) Sources.dropShardedTable(spark, dir)
        fsOf(dir).delete(new org.apache.hadoop.fs.Path(dir), true)
        true
    }
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!tableExists(oldIdent)) throw new NoSuchTableException(
      (catalogName +: oldIdent.namespace().toSeq :+ oldIdent.name()))
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(
      (catalogName +: newIdent.namespace().toSeq :+ newIdent.name()))
    require(fsOf(from).rename(new org.apache.hadoop.fs.Path(from),
      new org.apache.hadoop.fs.Path(to)),
      s"graft catalog: rename failed $from -> $to")
    Sources.invalidateShardedMeta(from)
  }

  // ---- SupportsNamespaces ------------------------------------------

  private def isTableDir(p: String): Boolean =
    fsOf(p).exists(descriptorPath(p))

  override def listNamespaces(): Array[Array[String]] = {
    val fs = fsOf(warehouse)
    val root = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => isTableDir(s"$warehouse/$n"))
      .map(n => Array(n))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val fs = fsOf(warehouse)
    val dir = new org.apache.hadoop.fs.Path(nsDir(namespace))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => isTableDir(s"${nsDir(namespace)}/$n"))
      .map(n => namespace :+ n)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fsOf(warehouse).exists(
        new org.apache.hadoop.fs.Path(nsDir(namespace))) &&
        !isTableDir(nsDir(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String])
      : Unit = {
    fsOf(warehouse).mkdirs(
      new org.apache.hadoop.fs.Path(nsDir(namespace)))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val fs = fsOf(warehouse)
    val dir = new org.apache.hadoop.fs.Path(nsDir(namespace))
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(dir, true)
  }
}
