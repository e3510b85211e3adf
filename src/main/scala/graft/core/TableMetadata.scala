package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{BufferedInputStream, InputStream}
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._

/**
 * Iceberg table metadata model + JSON (de)serialization + version discovery
 * + snapshot lookup.
 *
 * Mirrors the capabilities of the reference metadata layer
 * (reference: src/core/metadata/iceberg_table_metadata.cpp:354-475 parse,
 * :157-282 version discovery incl. version-hint + gzip, :15-57,129-151
 * snapshot lookup incl. timestamp-via-snapshot-log, :557-667 JSON write).
 */
case class SnapshotInfo(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int],
    firstRowId: Option[Long] = None,
    /** Deprecated v1 layout: manifests embedded directly in the snapshot
      * (no manifest list file). */
    embeddedManifests: Seq[String] = Nil) {
  def operation: String = summary.getOrElse("operation", "")
}

/** A named snapshot reference (Iceberg spec "refs"): a BRANCH moves with
  * writes committed to it; a TAG is an immutable bookmark. */
case class SnapshotRef(snapshotId: Long, isBranch: Boolean) {
  def refType: String = if (isBranch) "branch" else "tag"
}

/** Blob descriptor inside a table-statistics file entry (Iceberg spec
  * "Table statistics" — blob-metadata). `properties("ndv")` is the
  * convention readers use for per-column distinct counts (the reference
  * round-trips the field via its REST bindings,
  * src/rest_catalog/objects/statistics_file.cpp). */
case class BlobMetadata(
    blobType: String,
    snapshotId: Long,
    sequenceNumber: Long,
    fields: Seq[Int],
    properties: Map[String, String])

/** A table-statistics (Puffin) file registered in table metadata. */
case class StatisticsFile(
    snapshotId: Long,
    path: String,
    fileSizeInBytes: Long,
    fileFooterSizeInBytes: Long,
    blobMetadata: Seq[BlobMetadata])

/** A partition-statistics file registered in table metadata. */
case class PartitionStatisticsFile(snapshotId: Long, path: String, fileSizeInBytes: Long)

case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: Transform)
case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.forall(_.transform == Transforms.Void) || fields.isEmpty
}
case class SortField(sourceId: Int, transform: Transform, ascending: Boolean, nullsFirst: Boolean)
case class SortOrder(orderId: Int, fields: Seq[SortField])

case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    currentSchemaId: Int,
    schemas: Seq[IcebergSchema],
    defaultSpecId: Int,
    specs: Seq[PartitionSpec],
    lastPartitionId: Int,
    defaultSortOrderId: Int,
    sortOrders: Seq[SortOrder],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[SnapshotInfo],
    snapshotLog: Seq[(Long, Long)], // (timestampMs, snapshotId)
    metadataLog: Seq[(Long, String)], // (timestampMs, metadataFile)
    refs: Map[String, SnapshotRef], // ref name -> (snapshot id, branch|tag)
    nextRowId: Option[Long] = None,
    /** Table-statistics (Puffin) files keyed by snapshot; carry per-column
      * NDV used for CBO column statistics. */
    statistics: Seq[StatisticsFile] = Nil,
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil,
    /** Version number of the metadata FILE this was loaded from (path
      * tables). Commits target loadedVersion+1, so two writers that loaded
      * the same version collide on publish instead of silently leapfrogging
      * each other's snapshots. None for REST-served / synthetic metadata. */
    loadedVersion: Option[Int] = None) {

  def schema(id: Int): IcebergSchema =
    schemas.find(_.schemaId == id).getOrElse(throw new IllegalArgumentException(s"No schema with id $id"))
  def currentSchema: IcebergSchema = schema(currentSchemaId)
  def spec(id: Int): PartitionSpec =
    specs.find(_.specId == id).getOrElse(PartitionSpec(id, Nil))
  def defaultSpec: PartitionSpec = spec(defaultSpecId)
  def currentSnapshot: Option[SnapshotInfo] = currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  def sortOrder(id: Int): Option[SortOrder] = sortOrders.find(_.orderId == id)

  /** Snapshot lookup: latest / by id / by timestamp. Timestamp lookup walks
    * the snapshot-log (not the snapshots list) so side branches are ignored —
    * matches reference GetSnapshotByTimestamp semantics. */
  def selectSnapshot(lookup: SnapshotLookup): Option[SnapshotInfo] = lookup match {
    case SnapshotLookup.Latest => currentSnapshot
    case SnapshotLookup.ById(id) =>
      Some(snapshots.find(_.snapshotId == id)
        .getOrElse(throw new IllegalArgumentException(s"Snapshot $id not found")))
    case SnapshotLookup.ByTimestamp(ts) =>
      val candidates = snapshotLog.filter(_._1 <= ts)
      if (candidates.isEmpty)
        throw new IllegalArgumentException(s"No snapshot at or before timestamp $ts")
      val id = candidates.maxBy(_._1)._2
      Some(snapshots.find(_.snapshotId == id)
        .getOrElse(throw new IllegalArgumentException(s"Snapshot $id from snapshot-log not found")))
    case SnapshotLookup.ByRef(name) =>
      val ref = refs.getOrElse(name,
        throw new IllegalArgumentException(s"No branch or tag named '$name'"))
      Some(snapshots.find(_.snapshotId == ref.snapshotId)
        .getOrElse(throw new IllegalArgumentException(
          s"Ref '$name' targets snapshot ${ref.snapshotId}, which is not in table metadata")))
  }

  /** Walk parent pointers from `from` (inclusive) to the root; used by
    * fast-forward / rollback ancestry checks. */
  def ancestorIds(from: Long): Set[Long] = {
    val byId = snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(byId.get(from))(_.flatMap(s => s.parentSnapshotId.flatMap(byId.get)))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
  }

  /** Schema bound to a snapshot (falls back to current). */
  def schemaFor(snap: Option[SnapshotInfo]): IcebergSchema =
    snap.flatMap(_.schemaId).map(schema).getOrElse(currentSchema)

  /** Per-field NDV from the statistics file registered for `snapshotId`
    * (exact-snapshot match only — stats computed on another snapshot can
    * both over- and under-count this one). Blob type is not checked: the
    * `ndv` property carries the estimate whether the payload is a real
    * theta sketch (other engines' ANALYZE) or graft's own ndv blob. */
  def ndvFor(snapshotId: Long): Map[Int, Long] =
    statistics.find(_.snapshotId == snapshotId).map { sf =>
      sf.blobMetadata.flatMap { b =>
        for {
          fieldId <- b.fields.headOption if b.fields.size == 1
          ndv <- b.properties.get("ndv").flatMap(s => scala.util.Try(s.toLong).toOption)
        } yield fieldId -> ndv
      }.toMap
    }.getOrElse(Map.empty)
}

sealed trait SnapshotLookup
object SnapshotLookup {
  case object Latest extends SnapshotLookup
  case class ById(id: Long) extends SnapshotLookup
  case class ByTimestamp(tsMs: Long) extends SnapshotLookup
  case class ByRef(name: String) extends SnapshotLookup
}

object TableMetadata {
  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  // ---------- path utilities ----------

  /** Resolve a path recorded inside table metadata against the actual table
    * location. Handles moved tables (reference allow_moved_paths): grafts
    * the "/metadata/" or "/data/" suffix onto the real location, and for
    * working-dir-relative recorded paths (fixtures written with cwd-relative
    * locations, possibly OUTSIDE the table root) probes ancestors of the
    * table location, caching the discovered base per table so the probe cost
    * is O(1) amortized across a snapshot's files. */
  def resolvePath(tableLocation: String, recorded: String): String =
    resolvePath(tableLocation, recorded, null)

  private val baseCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stripScheme(s: String): String = s.replaceFirst("^file:/+", "/")

  def resolvePath(tableLocation: String, recorded: String, conf: Configuration): String = {
    val loc = tableLocation.stripSuffix("/")
    // Fast path: recorded already under the table location (scheme-insensitive).
    if (stripScheme(recorded).startsWith(stripScheme(loc) + "/")) return recorded
    def exists(p: String): Boolean =
      conf != null && (try fs(p, conf).exists(new Path(p)) catch { case _: Exception => false })
    val cached = baseCache.get(loc)
    if (cached != null && exists(s"$cached/$recorded")) return s"$cached/$recorded"
    def graft(marker: String): Option[String] = {
      val i = recorded.lastIndexOf(s"/$marker/")
      if (i >= 0) Some(loc + recorded.substring(i)) else None
    }
    val grafted = graft("metadata").orElse(graft("data"))
    grafted match {
      case Some(g) if conf == null || exists(g) => return g
      case _ =>
    }
    if (conf != null && !recorded.startsWith("/") && !recorded.contains("://")) {
      var anc = new Path(loc).getParent
      while (anc != null) {
        val cand = new Path(anc, recorded).toString
        if (exists(cand)) { baseCache.put(loc, anc.toString); return cand }
        anc = anc.getParent
      }
    }
    grafted.getOrElse {
      if (recorded.startsWith("/") || recorded.contains("://")) recorded
      else s"$loc/$recorded"
    }
  }

  def fs(path: String, conf: Configuration): FileSystem = new Path(path).getFileSystem(conf)

  private def openMaybeGz(fsys: FileSystem, p: Path): InputStream = {
    val raw = new BufferedInputStream(fsys.open(p))
    if (p.getName.endsWith(".gz") || p.getName.endsWith(".gz.metadata.json")) new GZIPInputStream(raw) else raw
  }

  /** Find the metadata JSON file for a table root (or accept a direct path to
    * a metadata.json). Order: explicit file > version-hint.text > newest
    * v*.metadata.json / *.metadata.json by version number. Gzip variants
    * (vN.gz.metadata.json / vN.metadata.json.gz) supported. */
  /** Validate a custom `version_name_format` (reference iceberg_options.cpp:
    * exactly two `%s` substitutions — version, then compression suffix). */
  def validateVersionNameFormat(fmt: String): Unit = {
    val n = fmt.sliding(2).count(_ == "%s")
    if (n != 2) throw new IllegalArgumentException(
      s"'version_name_format' has to contain two occurrences of '%s' in it, found $n")
  }

  def findMetadataFile(tablePath: String, conf: Configuration, version: Option[String] = None,
      versionNameFormat: Option[String] = None): String = {
    val fsys = fs(tablePath, conf)
    val root = new Path(tablePath)
    if (tablePath.endsWith(".metadata.json") || tablePath.endsWith(".metadata.json.gz")) return tablePath
    val metaDir = new Path(root, "metadata")
    versionNameFormat.foreach(validateVersionNameFormat)
    // Comma-separated try-in-order formats, each `%s` (version) + `%s`
    // (compression suffix) — reference DEFAULT_TABLE_VERSION_FORMAT
    // "v%s%s.metadata.json,%s%s.metadata.json" / GenerateMetaDataUrl.
    val formats: Seq[String] =
      versionNameFormat.map(_.split(",").toSeq)
        .getOrElse(Seq("v%s%s.metadata.json", "%s%s.metadata.json"))
    def rendered(fmt: String, v: String, suffix: String): String = {
      val i = fmt.indexOf("%s")
      val once = fmt.substring(0, i) + v + fmt.substring(i + 2)
      val j = once.indexOf("%s")
      once.substring(0, j) + suffix + once.substring(j + 2)
    }
    def existing(cands: Seq[Path]): Option[Path] = cands.find(fsys.exists)
    def candidatesFor(v: String): Seq[Path] = {
      val fromFormats = for (f <- formats; suffix <- Seq("", ".gz"))
        yield new Path(metaDir, rendered(f, v, suffix))
      // Legacy trailing-.gz layout kept for default-format tables.
      val legacy = if (versionNameFormat.isEmpty)
        Seq(new Path(metaDir, s"v$v.metadata.json.gz")) else Nil
      fromFormats ++ legacy
    }
    version.foreach { v =>
      return existing(candidatesFor(v))
        .getOrElse(throw new java.io.FileNotFoundException(s"No metadata for version $v under $metaDir"))
        .toString
    }
    val hint = new Path(metaDir, "version-hint.text")
    if (fsys.exists(hint)) {
      val v = scala.io.Source.fromInputStream(fsys.open(hint)).mkString.trim
      existing(candidatesFor(v)) match {
        case Some(p) => return p.toString
        case None => // stale hint: fall through to listing
      }
    }
    // Guess: list metadata dir, pick highest numeric version prefix among
    // names matching the format(s).
    val patterns: Seq[scala.util.matching.Regex] = versionNameFormat match {
      case None => Seq("""v?(\d+)(?:-[-\w]+)?(?:\.gz)?\.metadata\.json(?:\.gz)?""".r)
      case Some(_) => formats.map { f =>
        val i = f.indexOf("%s")
        val pre = java.util.regex.Pattern.quote(f.substring(0, i))
        val rest = f.substring(i + 2)
        val j = rest.indexOf("%s")
        val mid = java.util.regex.Pattern.quote(rest.substring(0, j))
        val post = java.util.regex.Pattern.quote(rest.substring(j + 2))
        (pre + """(\d+)(?:-[-\w]+)?""" + mid + """(?:\.gz)?""" + post).r
      }
    }
    val listed = if (fsys.exists(metaDir)) fsys.listStatus(metaDir).toSeq else Seq.empty
    val versioned = listed.flatMap { st =>
      val name = st.getPath.getName
      patterns.view.flatMap(p => name match {
        case p(n) => Some((n.toLong, st.getPath))
        case _ => None
      }).headOption
    }
    if (versioned.nonEmpty) versioned.maxBy(_._1)._2.toString
    else throw new java.io.FileNotFoundException(s"No Iceberg metadata found under $metaDir")
  }

  // ---------- JSON parse ----------

  def parse(json: String, actualLocation: Option[String] = None): TableMetadata =
    parseNode(mapper.readTree(json), actualLocation)

  def load(tablePath: String, conf: Configuration, version: Option[String] = None,
      versionNameFormat: Option[String] = None): TableMetadata = {
    val metaFile = findMetadataFile(tablePath, conf, version, versionNameFormat)
    val fsys = fs(metaFile, conf)
    val in = openMaybeGz(fsys, new Path(metaFile))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val tableRoot =
      if (tablePath.endsWith(".metadata.json") || tablePath.endsWith(".metadata.json.gz"))
        new Path(tablePath).getParent.getParent.toString
      else tablePath
    val VRe = """.*?v?(\d+)[^/]*\.metadata\.json.*""".r
    val fileVersion = new Path(metaFile).getName match {
      case VRe(n) => Some(n.toInt)
      case _ => None
    }
    parse(txt, Some(tableRoot)).copy(loadedVersion = fileVersion)
  }

  private def strMap(n: JsonNode): Map[String, String] =
    if (n == null) Map.empty
    else n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  private def arr(n: JsonNode): Seq[JsonNode] =
    if (n == null) Seq.empty else n.elements().asScala.toSeq

  def parseNode(root: JsonNode, actualLocation: Option[String]): TableMetadata = {
    val formatVersion = root.get("format-version").asInt()
    val recordedLocation = Option(root.get("location")).map(_.asText()).getOrElse("")
    val location = actualLocation.getOrElse(recordedLocation)

    // v1 compat: single "schema" + "partition-spec"; v2+: arrays.
    val schemas: Seq[IcebergSchema] =
      if (root.has("schemas")) arr(root.get("schemas")).map(IcebergTypes.parseSchema)
      else Seq(IcebergTypes.parseSchema(root.get("schema")))
    val currentSchemaId = Option(root.get("current-schema-id")).map(_.asInt())
      .getOrElse(schemas.head.schemaId)

    def parseSpec(n: JsonNode): PartitionSpec = PartitionSpec(
      Option(n.get("spec-id")).map(_.asInt()).getOrElse(0),
      arr(n.get("fields")).map { f =>
        PartitionField(f.get("source-id").asInt(), Option(f.get("field-id")).map(_.asInt()).getOrElse(1000),
          f.get("name").asText(), Transforms.parse(f.get("transform").asText()))
      })
    val specs: Seq[PartitionSpec] =
      if (root.has("partition-specs")) arr(root.get("partition-specs")).map(parseSpec)
      else if (root.has("partition-spec"))
        Seq(PartitionSpec(0, arr(root.get("partition-spec")).map { f =>
          PartitionField(f.get("source-id").asInt(), Option(f.get("field-id")).map(_.asInt()).getOrElse(1000),
            f.get("name").asText(), Transforms.parse(f.get("transform").asText()))
        }))
      else Seq(PartitionSpec(0, Nil))
    val defaultSpecId = Option(root.get("default-spec-id")).map(_.asInt()).getOrElse(specs.head.specId)

    val sortOrders = arr(root.get("sort-orders")).map { n =>
      SortOrder(n.get("order-id").asInt(), arr(n.get("fields")).map { f =>
        SortField(f.get("source-id").asInt(), Transforms.parse(f.get("transform").asText()),
          f.get("direction").asText("asc") == "asc", f.get("null-order").asText("nulls-first") == "nulls-first")
      })
    }

    val snapshots = arr(root.get("snapshots")).map { s =>
      SnapshotInfo(
        snapshotId = s.get("snapshot-id").asLong(),
        parentSnapshotId = Option(s.get("parent-snapshot-id")).map(_.asLong()),
        sequenceNumber = Option(s.get("sequence-number")).map(_.asLong()).getOrElse(0L),
        timestampMs = s.get("timestamp-ms").asLong(),
        manifestList = Option(s.get("manifest-list")).map(_.asText()).getOrElse(""),
        summary = strMap(s.get("summary")),
        schemaId = Option(s.get("schema-id")).map(_.asInt()),
        firstRowId = Option(s.get("first-row-id")).map(_.asLong()),
        embeddedManifests = arr(s.get("manifests")).map(_.asText()))
    }

    TableMetadata(
      formatVersion = formatVersion,
      tableUuid = Option(root.get("table-uuid")).map(_.asText()).getOrElse(""),
      location = location,
      lastSequenceNumber = Option(root.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
      lastUpdatedMs = Option(root.get("last-updated-ms")).map(_.asLong()).getOrElse(0L),
      lastColumnId = Option(root.get("last-column-id")).map(_.asInt()).getOrElse(0),
      currentSchemaId = currentSchemaId,
      schemas = schemas,
      defaultSpecId = defaultSpecId,
      specs = specs,
      lastPartitionId = Option(root.get("last-partition-id")).map(_.asInt()).getOrElse(999),
      defaultSortOrderId = Option(root.get("default-sort-order-id")).map(_.asInt()).getOrElse(0),
      sortOrders = sortOrders,
      properties = strMap(root.get("properties")),
      currentSnapshotId = Option(root.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L),
      snapshots = snapshots,
      snapshotLog = arr(root.get("snapshot-log")).map(n => (n.get("timestamp-ms").asLong(), n.get("snapshot-id").asLong())),
      metadataLog = arr(root.get("metadata-log")).map(n => (n.get("timestamp-ms").asLong(), n.get("metadata-file").asText())),
      refs = Option(root.get("refs")).map(_.properties().asScala.map(e => e.getKey -> SnapshotRef(
        e.getValue.get("snapshot-id").asLong(),
        isBranch = Option(e.getValue.get("type")).forall(_.asText() != "tag"))).toMap).getOrElse(Map.empty),
      nextRowId = Option(root.get("next-row-id")).map(_.asLong()),
      statistics = arr(root.get("statistics")).map(parseStatisticsFile),
      partitionStatistics = arr(root.get("partition-statistics")).map { s =>
        PartitionStatisticsFile(
          snapshotId = s.get("snapshot-id").asLong(),
          path = s.get("statistics-path").asText(),
          fileSizeInBytes = Option(s.get("file-size-in-bytes")).map(_.asLong()).getOrElse(0L))
      })
  }

  /** Parse one `statistics` entry (also the payload of a REST
    * `set-statistics` update). */
  def parseStatisticsFile(s: JsonNode): StatisticsFile =
    StatisticsFile(
      snapshotId = s.get("snapshot-id").asLong(),
      path = s.get("statistics-path").asText(),
      fileSizeInBytes = Option(s.get("file-size-in-bytes")).map(_.asLong()).getOrElse(0L),
      fileFooterSizeInBytes = Option(s.get("file-footer-size-in-bytes")).map(_.asLong()).getOrElse(0L),
      blobMetadata = arr(s.get("blob-metadata")).map { b =>
        BlobMetadata(
          blobType = Option(b.get("type")).map(_.asText()).getOrElse(""),
          snapshotId = Option(b.get("snapshot-id")).map(_.asLong()).getOrElse(-1L),
          sequenceNumber = Option(b.get("sequence-number")).map(_.asLong()).getOrElse(-1L),
          fields = arr(b.get("fields")).map(_.asInt()),
          properties = strMap(b.get("properties")))
      })

  /** Serialize one `statistics` entry (shared by metadata JSON write and
    * the REST `set-statistics` update body). */
  def statisticsFileToJson(sf: StatisticsFile): ObjectNode = {
    val so = F.objectNode()
    so.put("snapshot-id", sf.snapshotId)
    so.put("statistics-path", sf.path)
    so.put("file-size-in-bytes", sf.fileSizeInBytes)
    so.put("file-footer-size-in-bytes", sf.fileFooterSizeInBytes)
    val ba = so.putArray("blob-metadata")
    sf.blobMetadata.foreach { b =>
      val bo = F.objectNode()
      bo.put("type", b.blobType)
      bo.put("snapshot-id", b.snapshotId)
      bo.put("sequence-number", b.sequenceNumber)
      val fa = bo.putArray("fields"); b.fields.foreach(fa.add)
      val pr = bo.putObject("properties"); b.properties.foreach { case (k, v) => pr.put(k, v) }
      ba.add(bo)
    }
    so
  }

  // ---------- JSON write ----------

  def toJson(m: TableMetadata): String = {
    val o = F.objectNode()
    o.put("format-version", m.formatVersion)
    o.put("table-uuid", m.tableUuid)
    o.put("location", m.location)
    o.put("last-sequence-number", m.lastSequenceNumber)
    o.put("last-updated-ms", m.lastUpdatedMs)
    o.put("last-column-id", m.lastColumnId)
    o.put("current-schema-id", m.currentSchemaId)
    val sArr = o.putArray("schemas"); m.schemas.foreach(s => sArr.add(s.toJson))
    o.put("default-spec-id", m.defaultSpecId)
    val pArr = o.putArray("partition-specs")
    m.specs.foreach { sp =>
      val so = F.objectNode(); so.put("spec-id", sp.specId)
      val fa = so.putArray("fields")
      sp.fields.foreach { f =>
        val fo = F.objectNode()
        fo.put("name", f.name); fo.put("transform", f.transform.toString)
        fo.put("source-id", f.sourceId); fo.put("field-id", f.fieldId)
        fa.add(fo)
      }
      pArr.add(so)
    }
    o.put("last-partition-id", m.lastPartitionId)
    o.put("default-sort-order-id", m.defaultSortOrderId)
    val soArr = o.putArray("sort-orders")
    m.sortOrders.foreach { ord =>
      val oo = F.objectNode(); oo.put("order-id", ord.orderId)
      val fa = oo.putArray("fields")
      ord.fields.foreach { f =>
        val fo = F.objectNode()
        fo.put("transform", f.transform.toString); fo.put("source-id", f.sourceId)
        fo.put("direction", if (f.ascending) "asc" else "desc")
        fo.put("null-order", if (f.nullsFirst) "nulls-first" else "nulls-last")
        fa.add(fo)
      }
      soArr.add(oo)
    }
    val props = o.putObject("properties"); m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(id => o.put("current-snapshot-id", id))
    val refs = o.putObject("refs")
    m.refs.foreach { case (name, ref) =>
      val r = refs.putObject(name); r.put("snapshot-id", ref.snapshotId); r.put("type", ref.refType)
    }
    val snaps = o.putArray("snapshots")
    m.snapshots.foreach { s =>
      val so = F.objectNode()
      so.put("sequence-number", s.sequenceNumber)
      so.put("snapshot-id", s.snapshotId)
      s.parentSnapshotId.foreach(p => so.put("parent-snapshot-id", p))
      so.put("timestamp-ms", s.timestampMs)
      val sum = so.putObject("summary"); s.summary.foreach { case (k, v) => sum.put(k, v) }
      so.put("manifest-list", s.manifestList)
      s.schemaId.foreach(id => so.put("schema-id", id))
      s.firstRowId.foreach(r => so.put("first-row-id", r))
      snaps.add(so)
    }
    val slog = o.putArray("snapshot-log")
    m.snapshotLog.foreach { case (ts, id) =>
      val n = F.objectNode(); n.put("timestamp-ms", ts); n.put("snapshot-id", id); slog.add(n)
    }
    val mlog = o.putArray("metadata-log")
    m.metadataLog.foreach { case (ts, pth) =>
      val n = F.objectNode(); n.put("timestamp-ms", ts); n.put("metadata-file", pth); mlog.add(n)
    }
    m.nextRowId.foreach(r => o.put("next-row-id", r))
    if (m.statistics.nonEmpty) {
      val stArr = o.putArray("statistics")
      m.statistics.foreach(sf => stArr.add(statisticsFileToJson(sf)))
    }
    if (m.partitionStatistics.nonEmpty) {
      val psArr = o.putArray("partition-statistics")
      m.partitionStatistics.foreach { sf =>
        val so = F.objectNode()
        so.put("snapshot-id", sf.snapshotId)
        so.put("statistics-path", sf.path)
        so.put("file-size-in-bytes", sf.fileSizeInBytes)
        psArr.add(so)
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }
}
