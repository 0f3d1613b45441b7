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
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

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
        // partition columns cannot be renamed (the physical layout is
        // named after them) — the table format rejects this once
        // snapshots exist; mirror the guard here so an EMPTY catalog
        // table can't smuggle a renamed partition column into its
        // descriptor (the identity transform would then reference a
        // column that no longer exists and the first INSERT would
        // fail confusingly)
        require(!cur.partCols.contains(from),
          s"graft catalog: cannot rename partition column $from")
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
    val d = readDescriptor(from).get
    val external = d.properties.contains(TableCatalog.PROP_LOCATION)
    require(fsOf(from).rename(new org.apache.hadoop.fs.Path(from),
      new org.apache.hadoop.fs.Path(to)),
      s"graft catalog: rename failed $from -> $to")
    // EXTERNAL tables: only the descriptor directory moved; the data
    // (and its manifests) live at LOCATION and are untouched. MANAGED
    // tables: snapshots moved WITH the directory, but manifest and
    // bloom rows store absolute data_dir paths under the old root —
    // rewrite them or every snapshot would still point at the old,
    // now-nonexistent (or worse, later-recreated) location.
    if (!external) Sources.relocateShardedTable(spark, from, to)
    else Sources.invalidateShardedMeta(from)
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

  // ---- ProcedureCatalog: SQL maintenance surface --------------------
  //
  //   CALL graft.system.compact(table => 'ns.t', small_dir_rows => 500)
  //   CALL graft.system.expire_snapshots(table => 'ns.t', keep => 3)
  //   CALL graft.system.vacuum(table => 'ns.t', grace_ms => 0)
  //   CALL graft.system.rewrite_zorder(table => 'ns.t',
  //                                    z_cols => 'x,y', bits => 8)
  //   CALL graft.system.build_bloom(table => 'ns.t', col => 'doc_id')
  //
  // Each is the catalog-name form of the corresponding library
  // maintenance op — same commit protocol (compact/rewrite abort on a
  // concurrent commit rather than losing it), same metadata-scale
  // driver cost; knobs the call omits (idCol, numShards, ...) come
  // from the table's TBLPROPERTIES exactly as INSERT's do.

  import org.apache.spark.sql.connector.catalog.procedures.{
    BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  private val procedureNames =
    Seq("compact", "expire_snapshots", "vacuum", "rewrite_zorder",
      "build_bloom")

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      procedureNames.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  /** Resolve a procedure's 'ns.table' argument to (data path, write
    * knobs from TBLPROPERTIES — same defaults as a SQL INSERT). */
  private def procTable(tname: String)
      : (String, String, String, Int, Seq[String]) = {
    val parts = tname.split('.').toSeq.filter(_.nonEmpty)
    require(parts.nonEmpty, s"graft procedure: empty table name")
    val ident = Identifier.of(parts.dropRight(1).toArray, parts.last)
    val dir = tableDir(ident)
    val d = readDescriptor(dir).getOrElse(
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name())))
    val path = dataPathOf(dir, d)
    val idCol = d.properties.getOrElse("idCol", d.schema.fields.head.name)
    val orderCol = d.properties.getOrElse("orderCol", idCol)
    val numShards = d.properties.get("numShards")
      .map(_.trim.toInt).getOrElse(16)
    val statsCols = d.properties.get("statsCols")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq(idCol))
    (path, idCol, orderCol, numShards, statsCols)
  }

  private def in(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def inDefault(n: String, dt: DataType,
                        sql: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(sql).build()

  /** One class per concern would be ceremony: a graft procedure is a
    * (name, params, out schema, row function). Bound and unbound are
    * the same object — binding is trivial because every parameter is
    * IN with an exact type. */
  private final class GProc(pname: String,
                            params: Array[ProcedureParameter],
                            outSchema: StructType,
                            run: InternalRow => Seq[Seq[Any]])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String =
      s"graft table maintenance: $pname"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow)
        : java.util.Iterator[Scan] = {
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(outSchema)
      val irows = run(input).map(r =>
        conv(org.apache.spark.sql.Row.fromSeq(r))
          .asInstanceOf[InternalRow]).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = irows
        override def readSchema(): StructType = outSchema
      }).iterator()
    }
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    import org.apache.spark.sql.functions.col
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"graft catalog: procedures live in the system namespace, got " +
        ident.namespace().mkString("."))
    def str(r: InternalRow, i: Int): String =
      r.getUTF8String(i).toString
    ident.name() match {
      case "compact" => new GProc("compact",
        Array(in("table", StringType),
          inDefault("small_dir_rows", LongType, "10000")),
        StructType(Seq(StructField("version", LongType))),
        r => {
          val (path, idc, oc, n, sc) = procTable(str(r, 0))
          Seq(Seq(Sources.compactShardedTable(spark, path, col(idc),
            col(oc), n, sc, smallDirRows = r.getLong(1))))
        })
      case "expire_snapshots" => new GProc("expire_snapshots",
        Array(in("table", StringType),
          inDefault("keep", org.apache.spark.sql.types.IntegerType,
            "3")),
        StructType(Seq(StructField("expired_version", LongType))),
        r => {
          val (path, _, _, _, _) = procTable(str(r, 0))
          Sources.expireShardedSnapshots(spark, path, r.getInt(1))
            .map(v => Seq(v))
        })
      case "vacuum" => new GProc("vacuum",
        Array(in("table", StringType),
          inDefault("grace_ms", LongType, "86400000")),
        StructType(Seq(StructField("deleted", StringType))),
        r => {
          val (path, _, _, _, _) = procTable(str(r, 0))
          Sources.vacuumShardedTable(spark, path, r.getLong(1))
            .map(p => Seq(p.split('/').last))
        })
      case "rewrite_zorder" => new GProc("rewrite_zorder",
        Array(in("table", StringType), in("z_cols", StringType),
          inDefault("bits", org.apache.spark.sql.types.IntegerType,
            "8")),
        StructType(Seq(StructField("version", LongType))),
        r => {
          val (path, idc, _, n, _) = procTable(str(r, 0))
          val zc = str(r, 1).split(",").map(_.trim).toSeq
          Seq(Seq(Sources.rewriteShardedTableZOrdered(spark, path,
            idc, zc, n, bitsPerCol = r.getInt(2))))
        })
      case "build_bloom" => new GProc("build_bloom",
        Array(in("table", StringType), in("col", StringType),
          inDefault("bits", org.apache.spark.sql.types.IntegerType,
            "1048576")),
        StructType(Seq(StructField("version", LongType))),
        r => {
          val (path, _, _, _, _) = procTable(str(r, 0))
          Seq(Seq(Sources.buildShardedBloom(spark, path, str(r, 1),
            bits = r.getInt(2))))
        })
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unknown procedure $other (have " +
          s"${procedureNames.mkString(", ")})")
    }
  }
}
