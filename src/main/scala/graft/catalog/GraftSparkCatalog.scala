package graft.catalog

import graft.core.{IcebergTypes, SnapshotLookup, TableMetadata}
import graft.read.ReadOptions
import graft.sources.GraftTable
import graft.write.Evolution
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.jdk.CollectionConverters._

/**
 * Spark SQL catalog front-end (`CatalogPlugin`): lets users type the SQL the
 * reference's users type (`ATTACH ... TYPE iceberg` then `SELECT * FROM
 * cat.ns.t` — src/iceberg_extension.cpp:135-162, iceberg_attach.cpp:14-175),
 * Spark-style:
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftSparkCatalog")
 *   spark.conf.set("spark.sql.catalog.graft.uri", "http://rest-catalog:8181")   // REST-backed
 *   // and/or spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")   // path-backed
 *   spark.sql("SELECT * FROM graft.db.tbl VERSION AS OF 123456789")
 *   spark.sql("SELECT * FROM graft.`/abs/path/to/table`")                        // direct path
 * }}}
 *
 * Resolution order: a name containing `/` is a direct table path; otherwise
 * REST (`uri`) when configured, else `warehouse/ns.../name` on the
 * filesystem. All reads route through the same DSv2 [[GraftTable]] scan
 * (filter pushdown → manifest/file/stats pruning), so SQL entry costs
 * nothing over the library API. `VERSION AS OF` binds a snapshot id;
 * `TIMESTAMP AS OF` an as-of timestamp — both resolved against table
 * metadata at analysis time (snapshot-specific schema included).
 */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {
  private var catalogName: String = _
  private var rest: Option[RestCatalog] = None
  private var warehouse: Option[String] = None

  override def name(): String = catalogName

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
    // AWS convenience (reference endpoint_type, iceberg_attach.cpp:14-175):
    // `endpoint-type=glue` with `warehouse` a Glue catalog id, or
    // `endpoint-type=s3_tables` with `warehouse` a table-bucket ARN,
    // synthesizes the REST endpoint and SigV4 signing scope. An explicit
    // `uri` overrides the synthesized endpoint but keeps the service/region.
    val aws = Option(options.get("endpoint-type")).map { et =>
      require(options.get("token") == null && options.get("credential") == null,
        "'endpoint-type' cannot be combined with bearer/OAuth2 auth — AWS endpoints use SigV4")
      val wh = Option(options.get("warehouse")).getOrElse(throw new IllegalArgumentException(
        s"'endpoint-type=$et' requires a 'warehouse' (Glue catalog id or S3 Tables ARN)"))
      warehouse = None // it's a catalog id, not a filesystem path
      AwsEndpoints.resolve(et, wh,
        Option(options.get("sigv4.region")).orElse(Option(options.get("client.region"))))
    }
    val uriOpt = Option(options.get("uri")).orElse(aws.map(_.endpoint))
    rest = uriOpt.map { uri =>
      val sigv4 = Option(options.get("sigv4.access-key")).map { ak =>
        SigV4Credentials(ak,
          Option(options.get("sigv4.secret-key")).getOrElse(""),
          Option(options.get("sigv4.region")).orElse(aws.map(_.region)).getOrElse("us-east-1"),
          Option(options.get("sigv4.service")).orElse(aws.map(_.service)).getOrElse("execute-api"),
          Option(options.get("sigv4.session-token")))
      }
      new RestCatalog(uri, CatalogOptions(
        warehouse = Option(options.get("rest-warehouse")).orElse(aws.map(_.warehouse)),
        token = Option(options.get("token")),
        oauth2ServerUri = Option(options.get("oauth2-server-uri")),
        clientId = Option(options.get("credential")).map(_.split(":")(0))
          .orElse(Option(options.get("client-id"))),
        clientSecret = Option(options.get("credential")).filter(_.contains(":"))
          .map(_.split(":", 2)(1)).orElse(Option(options.get("client-secret"))),
        scope = Option(options.get("scope")),
        sigv4 = sigv4))
    }
  }

  private def spark: SparkSession = SparkSession.active
  private def hconf = spark.sessionState.newHadoopConf()

  private def isPathIdent(ident: Identifier): Boolean =
    ident.name.contains("/") && ident.namespace.isEmpty

  /** Resolve an identifier to a loadable location: a direct path, a REST
    * table's metadata location, or `warehouse/ns.../name`. For REST tables
    * also returns the already-parsed metadata from the LoadTableResult (the
    * catalog server is the source of truth — no second fetch, and the
    * metadata location need not be client-readable). */
  private def resolve(ident: Identifier): (String, Option[TableMetadata]) = {
    if (isPathIdent(ident)) (ident.name, None)
    else rest match {
      case Some(r) =>
        try {
          val t = r.loadTable(ident.namespace.toSeq, ident.name)
          (t.metadataLocation, Some(t.metadata))
        } catch {
          case e: RestCatalogException if e.status == 404 => throw new NoSuchTableException(ident)
        }
      case None =>
        val wh = warehouse.getOrElse(throw new NoSuchTableException(ident))
        ((wh +: ident.namespace.toSeq :+ ident.name).mkString("/"), None)
    }
  }

  private def tableFor(ident: Identifier, opts: ReadOptions): Table = {
    val (loc, preloaded) = resolve(ident)
    val meta = preloaded.getOrElse {
      try TableMetadata.load(loc, hconf, opts.metadataVersion)
      catch { case _: Exception if !isPathIdent(ident) => throw new NoSuchTableException(ident) }
    }
    val schema = opts.lookup match {
      case SnapshotLookup.Latest => meta.currentSchema
      case lk => meta.schemaFor(meta.selectSnapshot(lk))
    }
    val restNamed = rest.filter(_ => !isPathIdent(ident))
    val appendFn = restNamed.map { r =>
      (df: org.apache.spark.sql.DataFrame) =>
        { r.appendDF(df, ident.namespace.toSeq, ident.name); () }
    }
    val restDml = restNamed.map(_.tableOps(ident.namespace.toSeq, ident.name))
    new GraftTable(loc, schema.toSpark, opts,
      Some((catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")), preloaded,
      appendFn, restDml)
  }

  /** Metadata tables, SQL-addressable as `<table>.<kind>` — the Spark-SQL
    * face of the reference's `iceberg_snapshots()` / `iceberg_metadata()` /
    * `iceberg_column_stats()` / `iceberg_partition_stats()` table functions
    * (src/iceberg_functions.cpp). Reached only when `ident` doesn't resolve
    * as a real table, so a genuine table named `snapshots` still wins. */
  private val metadataTables: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "snapshots" -> ((s, p) => graft.IcebergTable.snapshots(s, p)),
    "manifest_entries" -> ((s, p) => graft.IcebergTable.manifestEntries(s, p)),
    "entries" -> ((s, p) => graft.IcebergTable.manifestEntries(s, p)),
    "column_stats" -> ((s, p) => graft.IcebergTable.columnStats(s, p)),
    "files" -> ((s, p) => graft.IcebergTable.files(s, p)),
    "manifests" -> ((s, p) => graft.IcebergTable.manifests(s, p)),
    "partitions" -> ((s, p) => graft.IcebergTable.partitions(s, p)),
    "partition_stats" -> ((s, p) => graft.IcebergTable.partitionStats(s, p)),
    "properties" -> ((s, p) => graft.IcebergTable.tableProperties(s, p)),
    "refs" -> ((s, p) => graft.IcebergTable.refs(s, p)),
    "history" -> ((s, p) => graft.IcebergTable.history(s, p)),
    "changes" -> ((s, p) => graft.streaming.Streams.changes(s, p)))

  private def metadataTableFor(ident: Identifier): Option[Table] = {
    if (ident.namespace.isEmpty) return None
    metadataTables.get(ident.name.toLowerCase(java.util.Locale.ROOT)).flatMap { fn =>
      val base = Identifier.of(ident.namespace.dropRight(1), ident.namespace.last)
      if (!tableExists(base)) None
      else {
        val (loc, _) = resolve(base)
        Some(new DataFrameBackedTable(
          (catalogName +: ident.namespace.toSeq :+ ident.name).mkString("."),
          () => fn(spark, loc)))
      }
    }
  }

  override def loadTable(ident: Identifier): Table =
    try tableFor(ident, ReadOptions())
    catch {
      case e: NoSuchTableException => metadataTableFor(ident).getOrElse(throw e)
    }

  /** `VERSION AS OF <snapshot-id | 'branch-or-tag-name'>` — a numeric
    * version binds a snapshot id, anything else a named ref. */
  override def loadTable(ident: Identifier, version: String): Table =
    tableFor(ident, version.toLongOption match {
      case Some(id) => ReadOptions(snapshotId = Some(id))
      case None => ReadOptions(refName = Some(version))
    })

  /** `TIMESTAMP AS OF` — Spark passes microseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    tableFor(ident, ReadOptions(asOfTimestampMs = Some(timestamp / 1000)))

  override def tableExists(ident: Identifier): Boolean =
    try {
      val (loc, preloaded) = resolve(ident)
      preloaded.isDefined ||
        (try { TableMetadata.load(loc, hconf); true } catch { case _: Exception => false })
    } catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = rest match {
    case Some(r) => r.listTables(namespace.toSeq).map(t => Identifier.of(namespace, t)).toArray
    case None =>
      val wh = warehouse.getOrElse(return Array.empty)
      val dir = new Path((wh +: namespace.toSeq).mkString("/"))
      val fs = dir.getFileSystem(hconf)
      if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace.toSeq)
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
        .filter(n => fs.exists(new Path(dir, s"$n/metadata")))
        .map(n => Identifier.of(namespace, n))
  }

  /** `PARTITIONED BY` transform → graft partition transform. Spark parses
    * `months(ts)`, `bucket(16, id)`, `truncate(4, name)` etc. as generic
    * named transforms; the int argument (bucket count / truncate width) can
    * appear on either side of the column reference. */
  private def toGraftPartition(t: Transform): (String, graft.core.Transform) = {
    import graft.core.{Transforms => GT}
    val refs = t.references()
    require(refs.length == 1, s"partition transform ${t.describe()} must reference exactly one column")
    val colName = refs(0).fieldNames.mkString(".")
    lazy val intArg = t.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] => l.value().asInstanceOf[Number].intValue()
    }.getOrElse(throw new IllegalArgumentException(
      s"partition transform ${t.describe()} needs an integer argument"))
    t.name().toLowerCase(java.util.Locale.ROOT) match {
      case "identity" => (colName, GT.Identity)
      case "years" | "year" => (colName, GT.Year)
      case "months" | "month" => (colName, GT.Month)
      case "days" | "day" | "date" => (colName, GT.Day)
      case "hours" | "hour" | "date_hour" => (colName, GT.Hour)
      case "bucket" => (colName, GT.Bucket(intArg))
      case "truncate" => (colName, GT.Truncate(intArg))
      case "void" => (colName, GT.Void)
      case other => throw new UnsupportedOperationException(s"Unsupported partition transform $other")
    }
  }

  /** `'sort-order'` table property → sort fields: `col [ASC|DESC]
    * [NULLS FIRST|LAST], ...`. Defaults follow Iceberg: ASC → NULLS FIRST,
    * DESC → NULLS LAST. */
  private def parseSortOrderSpec(s: String): Seq[(String, Boolean, Boolean)] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      val toks = part.split("\\s+").toSeq
      val up = toks.map(_.toUpperCase(java.util.Locale.ROOT))
      require(up.tail.forall(Set("ASC", "DESC", "NULLS", "FIRST", "LAST")),
        s"Bad sort-order term '$part' (expected: col [ASC|DESC] [NULLS FIRST|LAST])")
      val asc = !up.contains("DESC")
      val nullsFirst =
        if (up.containsSlice(Seq("NULLS", "LAST"))) false
        else if (up.containsSlice(Seq("NULLS", "FIRST"))) true
        else asc
      (toks.head, asc, nullsFirst)
    }

  /** CREATE TABLE — REST-backed creates through the catalog; path-backed
    * writes an empty Iceberg table at `warehouse/ns/name`, honoring
    * `PARTITIONED BY` (identity + year/month/day/hour/bucket/truncate)
    * and `TBLPROPERTIES` (incl. `sort-order` and `format-version`). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    rest match {
      case Some(r) if !isPathIdent(ident) =>
        require(partitions.isEmpty,
          "partitioned CREATE TABLE on a REST catalog is not supported yet — use the library API (IcebergWrite + RestCatalog)")
        val loc = Option(properties.get(TableCatalog.PROP_LOCATION))
          .getOrElse((warehouse.getOrElse("/tmp/graft-wh") +: ident.namespace.toSeq :+ ident.name).mkString("/"))
        r.createTable(ident.namespace.toSeq, ident.name, IcebergTypes.fromSpark(schema), loc)
      case _ =>
        val loc =
          if (isPathIdent(ident)) ident.name
          else (warehouse.getOrElse(throw new IllegalStateException(
            s"catalog $catalogName has neither uri nor warehouse")) +: ident.namespace.toSeq :+ ident.name).mkString("/")
        val props = {
          import scala.jdk.CollectionConverters._
          properties.asScala.toMap - TableCatalog.PROP_LOCATION - "provider" - "owner"
        }
        // Spark SQL has no native Iceberg-style `SORTED BY` / format-version
        // clause, so both ride TBLPROPERTIES (the reference's CREATE accepts
        // them inline — iceberg_table.cpp:292-465 BuildSortOrder):
        //   TBLPROPERTIES ('sort-order'='c1 ASC NULLS FIRST, c2 DESC',
        //                  'format-version'='3')
        graft.write.IcebergWrite.createTable(spark, loc, schema,
          graft.write.TableWriteOptions(
            partitionBy = partitions.toSeq.map(toGraftPartition),
            sortBy = props.get("sort-order").toSeq.flatMap(parseSortOrderSpec),
            properties = props - "sort-order" - "format-version",
            formatVersion = props.get("format-version").map(_.toInt).getOrElse(2)))
    }
    loadTable(ident)
  }

  /** ALTER TABLE over path/warehouse tables — metadata-only schema evolution
    * through [[graft.write.Evolution]] (add/drop/rename column, widening
    * type promotion, nullability, properties). REST-named tables must evolve
    * through the catalog transaction — refused here. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange._
    require(rest.isEmpty || isPathIdent(ident),
      "ALTER TABLE on a REST-catalog table must commit through the REST transaction path — use graft.write.Evolution + RestCatalog")
    val (loc, _) = resolve(ident)
    def single(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"ALTER on nested field ${fieldNames.mkString(".")} is not supported via SQL")
      fieldNames(0)
    }
    def iceType(dt: org.apache.spark.sql.types.DataType): String =
      IcebergTypes.fromSpark(new StructType().add("x", dt)).fields.head.fieldType.typeJsonString
    changes.foreach {
      case a: AddColumn =>
        require(a.position() == null, "ALTER TABLE ADD COLUMN ... FIRST/AFTER is not supported")
        Evolution.addColumn(spark, loc, single(a.fieldNames()), iceType(a.dataType()),
          required = !a.isNullable())
      case d: DeleteColumn =>
        try Evolution.dropColumn(spark, loc, single(d.fieldNames()))
        catch {
          case e: IllegalArgumentException
              if java.lang.Boolean.TRUE.equals(d.ifExists()) &&
                e.getMessage.startsWith("No column") => // DROP COLUMN IF EXISTS: no-op
        }
      case rn: RenameColumn =>
        Evolution.renameColumn(spark, loc, single(rn.fieldNames()), rn.newName())
      case u: UpdateColumnType =>
        Evolution.updateColumnType(spark, loc, single(u.fieldNames()), iceType(u.newDataType()))
      case n: UpdateColumnNullability =>
        Evolution.setRequired(spark, loc, single(n.fieldNames()), required = !n.nullable())
      case c: UpdateColumnComment =>
        Evolution.setColumnDoc(spark, loc, single(c.fieldNames()),
          Option(c.newComment()).filter(_.nonEmpty))
      case p: SetProperty if p.property() == "format-version" =>
        Evolution.upgradeFormatVersion(spark, loc, p.value().toInt)
      case p: SetProperty if p.property() == "sort-order" =>
        // The reference's ALTER TABLE ... SET SORTED BY, Spark-style: the
        // same 'sort-order' spec string accepted at CREATE becomes a real
        // sort-order evolution (new default order id), not a property.
        Evolution.setSortOrder(spark, loc, parseSortOrderSpec(p.value()))
      case p: SetProperty if p.property() == "partition-spec" =>
        // The reference's ALTER TABLE ... SET/RESET PARTITIONED BY:
        // 'a, bucket(8, id)' replaces the default spec (reverting reuses
        // the original spec id); empty string resets to unpartitioned.
        Evolution.setPartitionSpec(spark, loc,
          Evolution.parsePartitionSpecString(p.value()))
      case p: SetProperty =>
        Evolution.setProperties(spark, loc, Map(p.property() -> p.value()))
      case p: RemoveProperty =>
        Evolution.removeProperties(spark, loc, Seq(p.property()))
      case other => throw new UnsupportedOperationException(
        s"Unsupported ALTER TABLE change: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = rest match {
    case Some(r) =>
      try { r.dropTable(ident.namespace.toSeq, ident.name); true }
      catch { case e: RestCatalogException if e.status == 404 => false }
    case None =>
      if (!tableExists(ident)) false
      else {
        val p = new Path(resolve(ident)._1)
        p.getFileSystem(hconf).delete(p, true)
      }
  }

  /** DROP TABLE ... PURGE — REST: `purgeRequested=true` (the catalog deletes
    * data; reference attach option `purge_requested`); path tables already
    * delete the directory on drop. */
  override def purgeTable(ident: Identifier): Boolean = rest match {
    case Some(r) if !isPathIdent(ident) =>
      try { r.dropTable(ident.namespace.toSeq, ident.name, purge = true); true }
      catch { case e: RestCatalogException if e.status == 404 => false }
    case _ => dropTable(ident)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = rest match {
    case Some(r) =>
      require(oldIdent.namespace.sameElements(newIdent.namespace),
        "rename across namespaces not supported")
      r.renameTable(oldIdent.namespace.toSeq, oldIdent.name, newIdent.name)
    case None => throw new UnsupportedOperationException("rename requires a REST catalog")
  }

  // ---------- SupportsNamespaces ----------

  override def listNamespaces(): Array[Array[String]] = rest match {
    case Some(r) => r.listNamespaces().map(_.toArray).toArray
    case None =>
      val wh = warehouse.getOrElse(return Array.empty)
      val dir = new Path(wh)
      val fs = dir.getFileSystem(hconf)
      if (!fs.exists(dir)) Array.empty
      else fs.listStatus(dir).filter(_.isDirectory).map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else rest match {
      case Some(r) =>
        r.listNamespaces().filter(ns => ns.length > namespace.length &&
          ns.take(namespace.length) == namespace.toSeq).map(_.toArray).toArray
      case None => Array.empty
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    rest match {
      case Some(r) =>
        try r.namespaceProperties(namespace.toSeq).asJava
        catch { case e: RestCatalogException if e.status == 404 =>
          throw new NoSuchNamespaceException(namespace.toSeq) }
      case None =>
        val wh = warehouse.getOrElse(throw new NoSuchNamespaceException(namespace.toSeq))
        val dir = new Path((wh +: namespace.toSeq).mkString("/"))
        if (!dir.getFileSystem(hconf).exists(dir)) throw new NoSuchNamespaceException(namespace.toSeq)
        Map.empty[String, String].asJava
    }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = rest match {
    case Some(r) => r.createNamespace(namespace.toSeq, metadata.asScala.toMap)
    case None =>
      val wh = warehouse.getOrElse(throw new IllegalStateException("no warehouse configured"))
      val dir = new Path((wh +: namespace.toSeq).mkString("/"))
      dir.getFileSystem(hconf).mkdirs(dir)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    rest match {
      case Some(r) =>
        val sets = changes.collect { case s: NamespaceChange.SetProperty => s.property -> s.value }.toMap
        val removes = changes.collect { case rm: NamespaceChange.RemoveProperty => rm.property }
        r.updateNamespaceProperties(namespace.toSeq, sets, removes)
      case None => throw new UnsupportedOperationException("namespace properties require a REST catalog")
    }

  // ---------- ProcedureCatalog ----------

  /** Maintenance procedures live under the Iceberg-conventional `system`
    * namespace: `CALL <cat>.system.rewrite_data_files(table => 'db.t')`. */
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace.sameElements(Array("system")))
      throw new RuntimeException(
        s"Procedure ${ident} not found — graft procedures live under `system`")
    ident.name.toLowerCase(java.util.Locale.ROOT) match {
      case "rewrite_data_files" => new RewriteDataFilesProcedure(this)
      case "expire_snapshots" => new ExpireSnapshotsProcedure(this)
      case "remove_orphan_files" => new RemoveOrphanFilesProcedure(this)
      case "create_ref" => new CreateRefProcedure(this)
      case "drop_ref" => new DropRefProcedure(this)
      case "rollback_to_snapshot" => new RollbackToSnapshotProcedure(this)
      case "set_current_snapshot" => new SetCurrentSnapshotProcedure(this)
      case "fast_forward" => new FastForwardProcedure(this)
      case "add_partition_field" => new AddPartitionFieldProcedure(this)
      case "drop_partition_field" => new DropPartitionFieldProcedure(this)
      case "create_changelog_view" => new CreateChangelogViewProcedure(this)
      case "compute_table_stats" => new ComputeTableStatsProcedure(this)
      case "compute_partition_stats" => new ComputePartitionStatsProcedure(this)
      case "rewrite_manifests" => new RewriteManifestsProcedure(this)
      case "rewrite_position_delete_files" => new RewritePositionDeletesProcedure(this)
      case "register_table" => new RegisterTableProcedure(this)
      case other => throw new RuntimeException(s"Procedure system.$other not found")
    }
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array("rewrite_data_files", "expire_snapshots", "remove_orphan_files",
        "create_ref", "drop_ref", "rollback_to_snapshot", "set_current_snapshot",
        "fast_forward", "add_partition_field", "drop_partition_field",
        "create_changelog_view", "compute_table_stats", "compute_partition_stats",
        "rewrite_manifests", "register_table", "rewrite_position_delete_files")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  /** A procedure's `table` argument: `'ns.t'` (optionally
    * catalog-qualified) or a direct `/path`. */
  private def parseTableArg(table: String): Identifier =
    if (table.contains("/")) Identifier.of(Array.empty, table)
    else {
      val parts = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseMultipartIdentifier(table)
      val noCat =
        if (parts.length > 1 && parts.head.equalsIgnoreCase(catalogName)) parts.tail
        else parts
      Identifier.of(noCat.dropRight(1).toArray, noCat.last)
    }

  /** Resolve a procedure's `table` argument to committable
    * [[graft.write.Dml.TableOps]]: REST-catalog tables commit through the
    * REST transaction, everything else through atomic metadata publish at
    * the table location. */
  private[catalog] def dmlOpsFor(table: String): graft.write.Dml.TableOps = {
    val ident = parseTableArg(table)
    if (!isPathIdent(ident) && rest.isDefined)
      rest.get.tableOps(ident.namespace.toSeq, ident.name)
    else graft.write.Dml.PathOps(resolve(ident)._1)
  }

  /** compute_table_stats routing: REST tables register the statistics file
    * via the `set-statistics` update action; path tables commit the next
    * metadata version directly. */
  private[catalog] def computeStatsFor(spark: SparkSession, table: String)
      : graft.write.TableStats.Result = {
    val ident = parseTableArg(table)
    if (!isPathIdent(ident) && rest.isDefined) {
      val r = rest.get
      val (ns, name) = (ident.namespace.toSeq, ident.name)
      val meta = r.loadTable(ns, name).metadata
      graft.write.TableStats.computeWith(spark, meta,
        entry => r.setStatistics(ns, name, entry).metadata)
    } else graft.write.TableStats.computeTableStats(spark, resolve(ident)._1)
  }

  /** Resolve a procedure's `table` argument to a filesystem table location,
    * refusing REST-named tables (their metadata lifecycle belongs to the
    * catalog server, so trimming snapshots behind its back is unsafe). */
  private[catalog] def pathTableLocation(table: String, proc: String): String = {
    val ident = parseTableArg(table)
    if (!isPathIdent(ident) && rest.isDefined)
      throw new UnsupportedOperationException(
        s"$proc on a REST-catalog table is not supported — the catalog server owns its metadata lifecycle")
    resolve(ident)._1
  }

  /** register_table: REST-backed catalogs only — a path/warehouse catalog
    * already addresses tables by location, there is nothing to register. */
  private[catalog] def registerRestTable(table: String,
      metadataLocation: String): RestCatalog#LoadedTable = {
    val ident = parseTableArg(table)
    rest match {
      case Some(r) if !isPathIdent(ident) =>
        r.registerTable(ident.namespace.toSeq, ident.name, metadataLocation)
      case _ => throw new UnsupportedOperationException(
        "register_table requires a REST-backed catalog")
    }
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = rest match {
    case Some(r) =>
      try { r.dropNamespace(namespace.toSeq); true }
      catch { case e: RestCatalogException if e.status == 404 => false }
    case None =>
      val wh = warehouse.getOrElse(return false)
      val dir = new Path((wh +: namespace.toSeq).mkString("/"))
      val fs = dir.getFileSystem(hconf)
      fs.exists(dir) && fs.delete(dir, cascade)
  }
}

/** A read-only DSv2 table backed by a lazily-built DataFrame — used for the
  * SQL metadata tables (`cat.db.t.snapshots` etc.). Bridged through V1Scan:
  * the DataFrame's own plan IS the scan. */
private[graft] class DataFrameBackedTable(tableName: String,
    build: () => org.apache.spark.sql.DataFrame) extends Table with SupportsRead {
  private lazy val df = build()
  override def name(): String = tableName
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.V1Scan {
      override def readSchema(): StructType = df.schema
      override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan](
          ctx: org.apache.spark.sql.SQLContext): T =
        new org.apache.spark.sql.sources.BaseRelation with org.apache.spark.sql.sources.TableScan {
          override def sqlContext: org.apache.spark.sql.SQLContext = ctx
          override def schema: StructType = df.schema
          override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = df.rdd
        }.asInstanceOf[T]
    }
}
