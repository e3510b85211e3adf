package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.core._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * Minimal in-process Iceberg REST catalog (config, OAuth2 token, namespaces,
 * table lifecycle, optimistic commits) backed by in-memory TableMetadata —
 * the offline test double for RestCatalog.
 */
class TestRestServer {
  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance
  @volatile var token = "test-token"
  /** Simulate server-side token revocation/rotation: the old bearer 401s,
    * a fresh client-credentials exchange yields the new token. */
  def rotateToken(): Unit = token = "rotated-" + java.util.UUID.randomUUID().toString.take(8)

  case class Ns(props: TrieMap[String, String] = TrieMap.empty,
      tables: TrieMap[String, TableMetadata] = TrieMap.empty,
      /** stage-create'd tables: invisible to GET/HEAD/list until a commit
        * carrying assert-create materializes them into `tables`. */
      staged: TrieMap[String, TableMetadata] = TrieMap.empty)
  val namespaces = new TrieMap[String, Ns]()

  private var server: HttpServer = _
  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", handler)
    server.start()
  }
  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: String = "",
      headers: Map[String, String] = Map.empty): Unit = {
    // Gateway-drop simulation: the route has ALREADY executed (state
    // mutated server-side) but the client sees an injected gateway error
    // instead of the success body — the commit-state-unknown scenario.
    if (status < 300) {
      successMangler(ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case Some((st, h)) =>
          h.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
          val b = s"""{"error":"gateway dropped response ($st)"}""".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(st, b.length)
          val os = ex.getResponseBody; os.write(b); os.close(); ex.close()
          return
        case None =>
      }
    }
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
    ex.close()
  }

  /** Fault injection: consulted after request logging, before routing.
    * Some((status, headers)) short-circuits the response — profiles use
    * counter-based 503 storms, commit-targeted 5xx, throttling 429s with
    * Retry-After, etc. */
  @volatile var failInjector: (String, String) => Option[(Int, Map[String, String])] =
    (_, _) => None

  /** Fault injection AFTER routing: the handler ran (server state already
    * mutated) but the response is replaced with the injected status —
    * models a gateway that dropped the backend's success response. */
  @volatile var successMangler: (String, String) => Option[(Int, Map[String, String])] =
    (_, _) => None

  /** When non-empty, served in every LoadTableResult `config` — simulates a
    * catalog vending scoped storage credentials per table. With
    * `requireDelegationHeader`, credentials are vended ONLY to requests
    * carrying `X-Iceberg-Access-Delegation` (how Polaris-style catalogs
    * behave). */
  @volatile var vendedConfig: Map[String, String] = Map.empty
  @volatile var requireDelegationHeader: Boolean = false

  /** When set, `GET /v1/config` vends this prefix in `overrides` and every
    * catalog route REQUIRES it (`/v1/{prefix}/namespaces/...`), 404-ing
    * bare `/v1/namespaces/...` paths — simulates Polaris/Glue/S3 Tables,
    * which all vend a prefix. May contain '/' (multi-component). */
  @volatile var prefix: Option[String] = None

  /** When set, `GET /v1/config` vends this as an `overrides.uri` — the
    * client must send every subsequent request to THAT endpoint. */
  @volatile var uriOverride: Option[String] = None

  /** When set, served as the config response's `endpoints` array — the
    * client must honor exactly these routes (HEAD probes are opt-in via
    * advertisement; un-advertised ops are refused client-side). */
  @volatile var advertisedEndpoints: Option[Seq[String]] = None

  /** Every request's (method, raw path) in arrival order — lets specs pin
    * exactly which routes a client operation issued. */
  val requestLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  def clearLog(): Unit = requestLog.clear()
  def loggedRequests: Seq[(String, String)] = requestLog.asScala.toSeq

  /** When set, list endpoints page their results `listPageSize` at a time
    * with integer-offset `next-page-token`s — exercises client pagination. */
  @volatile var listPageSize: Option[Int] = None

  /** Scan-planning behavior: "sync" answers POST /plan with a completed
    * result inline; "async" answers `submitted` + plan-id and serves the
    * completed result on GET /plan/{id} (second poll); "shard" answers
    * completed but ships every file-scan-task through `plan-tasks`
    * fetched via POST /tasks; "406" declines planning for the table. */
  @volatile var planMode: String = "sync"
  private val pendingPlans = new TrieMap[String, ObjectNode]()
  private val pendingPlanPolls = new TrieMap[String, Int]()
  private val pendingShards = new TrieMap[String, ObjectNode]()
  /** Plan ids the client cancelled via DELETE /plan/{id}. */
  val cancelledPlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** When true (with listPageSize set), the paginator echoes the offset it
    * was GIVEN as the next-page-token instead of advancing — a broken/
    * truncating server. Exercises the client's pagination loop guard
    * (terminate with a warning, don't spin). */
  @volatile var brokenPageToken: Boolean = false

  /** When true (with listPageSize set), the paginator CYCLES tokens
    * (0→1→0→1…) instead of advancing — a broken server the simple
    * echoed-token guard can't catch; the client must track all seen
    * tokens to terminate. */
  @volatile var cyclePageTokens: Boolean = false

  /** Slice a sorted listing into (page, nextPageToken) per listPageSize. */
  private def page[T](all: Seq[T], query: String): (Seq[T], Option[String]) =
    listPageSize match {
      case None => (all, None)
      case Some(sz) =>
        val off = Option(query).flatMap(_.split("&").collectFirst {
          case kv if kv.startsWith("pageToken=") => kv.drop("pageToken=".length).toInt
        }).getOrElse(0)
        val slice = all.slice(off, off + sz)
        if (brokenPageToken) (slice, Some(off.toString))
        else if (cyclePageTokens) (slice, Some(((off + 1) % 2).toString))
        else (slice, if (off + sz < all.size) Some((off + sz).toString) else None)
    }

  private def loadResult(meta: TableMetadata, delegated: Boolean = true): String = {
    val o = F.objectNode()
    o.put("metadata-location", s"${meta.location}/metadata/v-rest.metadata.json")
    o.set[JsonNode]("metadata", mapper.readTree(TableMetadata.toJson(meta)))
    val cfg = o.putObject("config")
    if (!requireDelegationHeader || delegated)
      vendedConfig.foreach { case (k, v) => cfg.put(k, v) }
    mapper.writeValueAsString(o)
  }

  private def parseSnapshot(n: JsonNode): SnapshotInfo = SnapshotInfo(
    snapshotId = n.get("snapshot-id").asLong(),
    parentSnapshotId = Option(n.get("parent-snapshot-id")).map(_.asLong()),
    sequenceNumber = Option(n.get("sequence-number")).map(_.asLong()).getOrElse(0L),
    timestampMs = n.get("timestamp-ms").asLong(),
    manifestList = n.get("manifest-list").asText(),
    summary = Option(n.get("summary")).map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
    schemaId = Option(n.get("schema-id")).map(_.asInt()))

  /** Do `requirements` hold against `meta`? */
  private def requirementsOk(b: JsonNode, meta: TableMetadata): Boolean =
    Option(b.get("requirements")).forall(_.elements().asScala.forall { r =>
      r.get("type").asText() match {
        case "assert-ref-snapshot-id" =>
          val expected = Option(r.get("snapshot-id")).filter(!_.isNull).map(_.asLong())
          meta.refs.get(r.get("ref").asText()).map(_.snapshotId) == expected
        case "assert-table-uuid" => r.get("uuid").asText() == meta.tableUuid
        case _ => true
      }
    })

  /** Apply `updates` to `meta`, returning the new metadata. */
  private def applyUpdates(b: JsonNode, meta: TableMetadata): TableMetadata = {
    var m = meta
    Option(b.get("updates")).foreach(_.elements().asScala.foreach { u =>
      u.get("action").asText() match {
        case "add-snapshot" =>
          val s = parseSnapshot(u.get("snapshot"))
          m = m.copy(snapshots = m.snapshots :+ s,
            lastSequenceNumber = math.max(m.lastSequenceNumber, s.sequenceNumber),
            snapshotLog = m.snapshotLog :+ (s.timestampMs, s.snapshotId))
        case "set-snapshot-ref" =>
          val id = u.get("snapshot-id").asLong()
          m = m.copy(refs = m.refs + (u.get("ref-name").asText() ->
              graft.core.SnapshotRef(id, isBranch = true)),
            currentSnapshotId = Some(id))
        case "set-properties" =>
          val up = u.get("updates").properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
          m = m.copy(properties = m.properties ++ up)
        case "remove-properties" =>
          val rm = u.get("removals").elements().asScala.map(_.asText()).toSeq
          m = m.copy(properties = m.properties -- rm)
        case "set-statistics" =>
          val sf = TableMetadata.parseStatisticsFile(u.get("statistics"))
          m = m.copy(statistics =
            m.statistics.filterNot(_.snapshotId == sf.snapshotId) :+ sf)
        case "remove-statistics" =>
          val sid = u.get("snapshot-id").asLong()
          m = m.copy(statistics = m.statistics.filterNot(_.snapshotId == sid))
        // Initial-metadata actions (staged-create commits): a compliant
        // server rebuilds the table entirely from these — staged state is
        // NOT persisted server-side (REST spec; Polaris/Lakekeeper behave
        // this way).
        case "assign-uuid" => m = m.copy(tableUuid = u.get("uuid").asText())
        case "upgrade-format-version" =>
          m = m.copy(formatVersion = u.get("format-version").asInt())
        case "add-schema" =>
          val sch = IcebergTypes.parseSchema(u.get("schema"))
          val lci = Option(u.get("last-column-id")).map(_.asInt())
            .getOrElse(math.max(sch.lastColumnId, sch.maxFieldId))
          m = m.copy(schemas = m.schemas :+ sch, lastColumnId = math.max(m.lastColumnId, lci))
        case "set-current-schema" =>
          val id = u.get("schema-id").asInt()
          m = m.copy(currentSchemaId = if (id == -1) m.schemas.last.schemaId else id)
        case "add-spec" =>
          val sn = u.get("spec")
          val sp = PartitionSpec(Option(sn.get("spec-id")).map(_.asInt()).getOrElse(0),
            sn.get("fields").elements().asScala.map { f =>
              PartitionField(f.get("source-id").asInt(), f.get("field-id").asInt(),
                f.get("name").asText(), Transforms.parse(f.get("transform").asText()))
            }.toSeq)
          m = m.copy(specs = m.specs :+ sp,
            lastPartitionId = math.max(m.lastPartitionId,
              sp.fields.map(_.fieldId).maxOption.getOrElse(999)))
        case "set-default-spec" =>
          val id = u.get("spec-id").asInt()
          m = m.copy(defaultSpecId = if (id == -1) m.specs.last.specId else id)
        case "add-sort-order" =>
          val on = u.get("sort-order")
          val ord = SortOrder(on.get("order-id").asInt(),
            Option(on.get("fields")).map(_.elements().asScala.map { f =>
              SortField(f.get("source-id").asInt(),
                Transforms.parse(f.get("transform").asText()),
                f.get("direction").asText() == "asc",
                f.get("null-order").asText() == "nulls-first")
            }.toSeq).getOrElse(Nil))
          m = m.copy(sortOrders = m.sortOrders :+ ord)
        case "set-default-sort-order" =>
          val id = u.get("sort-order-id").asInt()
          m = m.copy(defaultSortOrderId = if (id == -1) m.sortOrders.last.orderId else id)
        case "set-location" => m = m.copy(location = u.get("location").asText())
        case _ =>
      }
    })
    m
  }

  /** JSON single-value serialization of a raw manifest partition value
    * (what the REST spec's PrimitiveTypeValue carries in plan results). */
  private def jsonSingle(raw: Any, t: IcebergType): JsonNode = {
    import IcebergTypes._
    if (raw == null) F.nullNode()
    else t match {
      case DateT => F.textNode(
        java.time.LocalDate.ofEpochDay(raw.asInstanceOf[Number].longValue()).toString)
      case TimestampT | TimestampTzT =>
        val micros = raw.asInstanceOf[Number].longValue()
        F.textNode(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toString)
      case IntT => F.numberNode(raw.asInstanceOf[Number].intValue())
      case LongT => F.numberNode(raw.asInstanceOf[Number].longValue())
      case BooleanT => F.booleanNode(raw.asInstanceOf[Boolean])
      case FloatT | DoubleT => F.numberNode(raw.asInstanceOf[Number].doubleValue())
      case DecimalT(_, s) => F.textNode(raw match {
        case b: Array[Byte] => new java.math.BigDecimal(new java.math.BigInteger(b), s).toPlainString
        case d: java.math.BigDecimal => d.toPlainString
        case o => String.valueOf(o)
      })
      case _ => raw match {
        case b: Array[Byte] => F.textNode(b.map("%02x".format(_)).mkString)
        case o => F.textNode(String.valueOf(o))
      }
    }
  }

  /** The spec-shaped CompletedPlanningResult for a table's current
    * snapshot: `file-scan-tasks` referencing a TOP-LEVEL `delete-files`
    * list by index, ContentFile `content` as the spec's string enum,
    * partition values in JSON single-value form. */
  private def buildCompletedPlan(meta: TableMetadata): ObjectNode = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val o = F.objectNode()
    o.put("status", "completed")
    val deleteArr = o.putArray("delete-files")
    val tasks = o.putArray("file-scan-tasks")
    meta.currentSnapshot.foreach { snap =>
      val manifests = graft.manifest.ManifestIO.readManifestList(
        TableMetadata.resolvePath(meta.location, snap.manifestList, conf), conf)
      def fileNode(e: graft.manifest.ManifestEntry, m: graft.manifest.ManifestFile): ObjectNode = {
        val f = F.objectNode()
        f.put("file-path", e.dataFile.filePath)
        f.put("file-format", e.dataFile.fileFormat)
        f.put("content", e.dataFile.content match {
          case 1 => "position-deletes"
          case 2 => "equality-deletes"
          case _ => "data"
        })
        f.put("record-count", e.dataFile.recordCount)
        f.put("file-size-in-bytes", e.dataFile.fileSizeInBytes)
        f.put("spec-id", m.partitionSpecId)
        val spec = meta.spec(m.partitionSpecId)
        val schema = meta.currentSchema
        val part = f.putArray("partition")
        spec.fields.zipWithIndex.foreach { case (pf, i) =>
          val raw = e.dataFile.partitionValues.lift(i).orNull
          val srcType = schema.idToField.get(pf.sourceId).map(_.fieldType)
          part.add(srcType.map(st => jsonSingle(raw, pf.transform.resultType(st)))
            .getOrElse(F.nullNode()))
        }
        e.dataFile.referencedDataFile.foreach(r => f.put("referenced-data-file", r))
        e.dataFile.contentOffset.foreach(v => f.put("content-offset", v))
        e.dataFile.contentSizeInBytes.foreach(v => f.put("content-size-in-bytes", v))
        if (e.dataFile.equalityIds.nonEmpty) {
          val a = f.putArray("equality-ids"); e.dataFile.equalityIds.foreach(a.add)
        }
        f
      }
      val entries = manifests.flatMap { m =>
        graft.manifest.ManifestIO.readManifest(
          TableMetadata.resolvePath(meta.location, m.path, conf), conf, m)
          .filter(_.isLive).map(e => (m, e))
      }
      val (delEntries, dataEntries) = entries.partition(_._1.content == 1)
      delEntries.foreach { case (dm, de) => deleteArr.add(fileNode(de, dm)) }
      dataEntries.foreach { case (m, e) =>
        val task = F.objectNode()
        task.set[JsonNode]("data-file", fileNode(e, m))
        val refs = task.putArray("delete-file-references")
        delEntries.indices.foreach(refs.add)
        tasks.add(task)
      }
    }
    o
  }

  private val handler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try route(ex) catch {
      case e: Exception => respond(ex, 500, s"""{"error":"${e.getMessage}"}""")
    }

    private def route(ex: HttpExchange): Unit = {
      // URI.getPath decodes %1F to the raw unit separator; normalize
      // multi-level namespace segments to the dotted internal key.
      val rawPath = ex.getRequestURI.getPath.replace('\u001f', '.')
      val method = ex.getRequestMethod
      requestLog.add((method, ex.getRequestURI.getPath))
      failInjector(method, ex.getRequestURI.getPath) match {
        case Some((status, headers)) =>
          return respond(ex, status, s"""{"error":"injected $status"}""", headers)
        case None =>
      }
      // Prefix enforcement: with a vended prefix, every route except
      // /v1/config and /v1/oauth/tokens must carry it -- strip it before
      // matching; bare paths 404 like a real prefixed catalog would.
      val path = prefix match {
        case Some(p) if rawPath != "/v1/config" && rawPath != "/v1/oauth/tokens" =>
          val pp = "/v1/" + p
          if (rawPath == pp) "/v1"
          else if (rawPath.startsWith(pp + "/")) "/v1" + rawPath.drop(pp.length)
          else return respond(ex, 404, s"""{"error":"missing prefix '$p' in path $rawPath"}""")
        case _ => rawPath
      }
      def body: JsonNode = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

      if (path == "/v1/oauth/tokens" && method == "POST") {
        return respond(ex, 200, s"""{"access_token":"$token","token_type":"bearer","expires_in":3600}""")
      }
      // auth for everything else
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $token")) return respond(ex, 401, """{"error":"unauthorized"}""")

      val TablesRe = "/v1/namespaces/([^/]+)/tables".r
      val TableRe = "/v1/namespaces/([^/]+)/tables/([^/]+)".r
      val PlanRe = "/v1/namespaces/([^/]+)/tables/([^/]+)/plan".r
      val PlanIdRe = "/v1/namespaces/([^/]+)/tables/([^/]+)/plan/([^/]+)".r
      val TasksRe = "/v1/namespaces/([^/]+)/tables/([^/]+)/tasks".r
      val NsPropsRe = "/v1/namespaces/([^/]+)/properties".r
      val RegisterRe = "/v1/namespaces/([^/]+)/(register)".r
      val NsRe = "/v1/namespaces/([^/]+)".r

      (method, path) match {
        case ("POST", PlanRe(ns, t)) => // server-side scan planning
          namespaces.get(ns).flatMap(_.tables.get(t)) match {
            case None => respond(ex, 404, """{"error":"no such table"}""")
            case Some(_) if planMode == "406" =>
              respond(ex, 406, """{"error":"scan planning not supported"}""")
            case Some(meta) =>
              val completed = buildCompletedPlan(meta)
              planMode match {
                case "async" | "fail" =>
                  val id = "plan-" + java.util.UUID.randomUUID().toString.take(8)
                  val result = if (planMode == "fail") {
                    val failed = F.objectNode(); failed.put("status", "failed"); failed
                  } else completed
                  pendingPlans.put(id, result)
                  pendingPlanPolls.put(id, 1) // first poll answers submitted again
                  val o = F.objectNode()
                  o.put("status", "submitted"); o.put("plan-id", id)
                  respond(ex, 200, mapper.writeValueAsString(o))
                case "shard" =>
                  val tasks = completed.get("file-scan-tasks")
                  val o = F.objectNode()
                  o.put("status", "completed")
                  o.set[JsonNode]("delete-files", completed.get("delete-files"))
                  val pt = o.putArray("plan-tasks")
                  val it = tasks.elements()
                  var i = 0
                  while (it.hasNext) {
                    val shardId = s"shard-$i"
                    val shard = F.objectNode()
                    // Shards must be self-contained: reference delete files
                    // by index into the SHARD's own delete-files list.
                    shard.set[JsonNode]("delete-files", completed.get("delete-files"))
                    shard.putArray("file-scan-tasks").add(it.next())
                    pendingShards.put(shardId, shard)
                    pt.add(shardId)
                    i += 1
                  }
                  o.putArray("file-scan-tasks")
                  respond(ex, 200, mapper.writeValueAsString(o))
                case _ =>
                  respond(ex, 200, mapper.writeValueAsString(completed))
              }
          }

        case ("GET", PlanIdRe(ns, t, id)) =>
          pendingPlans.get(id) match {
            case None => respond(ex, 404, """{"error":"no such plan"}""")
            case Some(completed) =>
              val polls = pendingPlanPolls.getOrElse(id, 0)
              if (polls > 0) {
                pendingPlanPolls.put(id, polls - 1)
                val o = F.objectNode()
                o.put("status", "submitted"); o.put("plan-id", id)
                respond(ex, 200, mapper.writeValueAsString(o))
              } else respond(ex, 200, mapper.writeValueAsString(completed))
          }

        case ("DELETE", PlanIdRe(ns, t, id)) =>
          cancelledPlans.add(id)
          pendingPlans.remove(id)
          respond(ex, 204)

        case ("POST", TasksRe(ns, t)) =>
          val taskId = Option(body.get("plan-task")).map(_.asText()).getOrElse("")
          pendingShards.get(taskId) match {
            case None => respond(ex, 404, s"""{"error":"no such plan task '$taskId'"}""")
            case Some(shard) => respond(ex, 200, mapper.writeValueAsString(shard))
          }
        case ("GET", "/v1/config") =>
          val o = F.objectNode()
          o.putObject("defaults").put("warehouse", "memory")
          val ovr = o.putObject("overrides")
          prefix.foreach(p => ovr.put("prefix", p))
          uriOverride.foreach(u => ovr.put("uri", u))
          advertisedEndpoints.foreach { eps =>
            val arr = o.putArray("endpoints"); eps.foreach(arr.add)
          }
          respond(ex, 200, mapper.writeValueAsString(o))

        case ("GET", "/v1/namespaces") =>
          val o = F.objectNode()
          val arr = o.putArray("namespaces")
          val (pg, next) = page(namespaces.keys.toSeq.sorted, ex.getRequestURI.getQuery)
          pg.foreach { ns =>
            val a = F.arrayNode(); ns.split("\\.").foreach(a.add); arr.add(a)
          }
          next.foreach(o.put("next-page-token", _))
          respond(ex, 200, mapper.writeValueAsString(o))

        case ("POST", "/v1/namespaces") =>
          val b = body
          val ns = b.get("namespace").elements().asScala.map(_.asText()).mkString(".")
          if (namespaces.contains(ns)) respond(ex, 409, """{"error":"namespace exists"}""")
          else {
            val n = Ns()
            Option(b.get("properties")).foreach(_.properties().asScala.foreach(e => n.props.put(e.getKey, e.getValue.asText())))
            namespaces.put(ns, n)
            respond(ex, 200, mapper.writeValueAsString(b))
          }

        case ("POST", NsPropsRe(ns)) =>
          namespaces.get(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(n) =>
              val b = body
              Option(b.get("removals")).foreach(_.elements().asScala.foreach(k => n.props.remove(k.asText())))
              Option(b.get("updates")).foreach(_.properties().asScala.foreach(e => n.props.put(e.getKey, e.getValue.asText())))
              respond(ex, 200, """{"updated":[],"removed":[]}""")
          }

        case ("GET", TablesRe(ns)) =>
          namespaces.get(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(n) =>
              val o = F.objectNode()
              val arr = o.putArray("identifiers")
              val (pg, next) = page(n.tables.keys.toSeq.sorted, ex.getRequestURI.getQuery)
              pg.foreach { t =>
                val io = F.objectNode(); val na = io.putArray("namespace"); na.add(ns); io.put("name", t); arr.add(io)
              }
              next.foreach(o.put("next-page-token", _))
              respond(ex, 200, mapper.writeValueAsString(o))
          }

        case ("POST", TablesRe(ns)) =>
          namespaces.get(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(n) =>
              val b = body
              val name = b.get("name").asText()
              val stage = Option(b.get("stage-create")).exists(_.asBoolean())
              if (n.tables.contains(name)) return respond(ex, 409, """{"error":"table exists"}""")
              val schema = IcebergTypes.parseSchema(b.get("schema"))
              val spec = Option(b.get("partition-spec")).map { sn =>
                PartitionSpec(Option(sn.get("spec-id")).map(_.asInt()).getOrElse(0),
                  sn.get("fields").elements().asScala.map { f =>
                    PartitionField(f.get("source-id").asInt(), f.get("field-id").asInt(),
                      f.get("name").asText(), Transforms.parse(f.get("transform").asText()))
                  }.toSeq)
              }.getOrElse(PartitionSpec(0, Nil))
              val props = Option(b.get("properties")).map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
              val meta = TableMetadata(
                formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
                location = b.get("location").asText(), lastSequenceNumber = 0L,
                lastUpdatedMs = System.currentTimeMillis(),
                lastColumnId = math.max(schema.lastColumnId, schema.maxFieldId),
                currentSchemaId = schema.schemaId, schemas = Seq(schema),
                defaultSpecId = spec.specId, specs = Seq(spec),
                lastPartitionId = spec.fields.map(_.fieldId).maxOption.getOrElse(999),
                defaultSortOrderId = 0, sortOrders = Seq(SortOrder(0, Nil)),
                properties = props, currentSnapshotId = None,
                snapshots = Nil, snapshotLog = Nil, metadataLog = Nil, refs = Map.empty)
              // Spec-compliant staging: the server does NOT persist staged
              // metadata — only the reservation. The assert-create commit
              // must rebuild the table from its initial-metadata updates
              // (assign-uuid/add-schema/...); storing a blank skeleton here
              // makes a client that omits them fail visibly.
              if (stage) n.staged.put(name, TableMetadata(
                formatVersion = 1, tableUuid = "", location = "",
                lastSequenceNumber = 0L, lastUpdatedMs = System.currentTimeMillis(),
                lastColumnId = 0, currentSchemaId = -1, schemas = Nil,
                defaultSpecId = -1, specs = Nil, lastPartitionId = 999,
                defaultSortOrderId = -1, sortOrders = Nil, properties = Map.empty,
                currentSnapshotId = None, snapshots = Nil, snapshotLog = Nil,
                metadataLog = Nil, refs = Map.empty))
              else n.tables.put(name, meta)
              respond(ex, 200, loadResult(meta))
          }

        case ("GET", TableRe(ns, t)) =>
          namespaces.get(ns).flatMap(_.tables.get(t)) match {
            case None => respond(ex, 404, """{"error":"no such table"}""")
            case Some(meta) =>
              val delegated = Option(ex.getRequestHeaders
                .getFirst("X-Iceberg-Access-Delegation")).isDefined
              respond(ex, 200, loadResult(meta, delegated))
          }

        case ("POST", RegisterRe(ns, _)) =>
          namespaces.get(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(n) =>
              val b = body
              val name = b.get("name").asText()
              if (n.tables.contains(name)) respond(ex, 409, """{"error":"table exists"}""")
              else {
                val loc = b.get("metadata-location").asText()
                val meta = TableMetadata.load(loc, new org.apache.hadoop.conf.Configuration())
                n.tables.put(name, meta)
                respond(ex, 200, loadResult(meta))
              }
          }

        case ("POST", TableRe(ns, t)) => // commit
          namespaces.get(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(n) =>
              val b = body
              val hasAssertCreate = Option(b.get("requirements")).exists(
                _.elements().asScala.exists(_.get("type").asText() == "assert-create"))
              (n.tables.get(t), n.staged.get(t)) match {
                case (Some(_), _) if hasAssertCreate =>
                  respond(ex, 409, """{"error":"assert-create failed: table exists"}""")
                case (Some(meta), _) =>
                  if (!requirementsOk(b, meta))
                    respond(ex, 409, """{"error":"requirement failed"}""")
                  else {
                    val m = applyUpdates(b, meta)
                    n.tables.put(t, m)
                    respond(ex, 200, loadResult(m))
                  }
                case (None, Some(stagedMeta)) if hasAssertCreate =>
                  val m = applyUpdates(b, stagedMeta)
                  n.staged.remove(t)
                  n.tables.put(t, m)
                  respond(ex, 200, loadResult(m))
                case _ => respond(ex, 404, """{"error":"no such table"}""")
              }
          }

        case ("POST", "/v1/transactions/commit") => // atomic multi-table commit
          val b = body
          val changes = Option(b.get("table-changes"))
            .map(_.elements().asScala.toSeq).getOrElse(Nil)
          // Resolve every table and check every requirement BEFORE applying
          // anything — all-or-nothing semantics.
          val resolved = changes.map { c =>
            val ident = c.get("identifier")
            val ns = ident.get("namespace").elements().asScala.map(_.asText()).mkString("")
            val t = ident.get("name").asText()
            (c, ns, t, namespaces.get(ns).flatMap(_.tables.get(t)))
          }
          if (resolved.exists(_._4.isEmpty))
            respond(ex, 404, """{"error":"no such table"}""")
          else if (resolved.exists { case (c, _, _, m) => !requirementsOk(c, m.get) })
            respond(ex, 409, """{"error":"requirement failed"}""")
          else {
            resolved.foreach { case (c, ns, t, m) =>
              namespaces(ns).tables.put(t, applyUpdates(c, m.get))
            }
            respond(ex, 204)
          }

        case ("HEAD", TableRe(ns, t)) =>
          respond(ex, if (namespaces.get(ns).exists(_.tables.contains(t))) 200 else 404)

        case ("HEAD", NsRe(ns)) =>
          respond(ex, if (namespaces.contains(ns)) 200 else 404)

        case ("DELETE", TableRe(ns, t)) =>
          namespaces.get(ns).flatMap(_.tables.remove(t)) match {
            case None => respond(ex, 404, """{"error":"no such table"}""")
            case Some(_) => respond(ex, 204)
          }

        case ("DELETE", NsRe(ns)) =>
          namespaces.remove(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(_) => respond(ex, 204)
          }

        case ("GET", NsRe(ns)) =>
          namespaces.get(ns) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(n) =>
              val o = F.objectNode()
              val na = o.putArray("namespace"); na.add(ns)
              val p = o.putObject("properties"); n.props.foreach { case (k, v) => p.put(k, v) }
              respond(ex, 200, mapper.writeValueAsString(o))
          }

        case ("POST", "/v1/tables/rename") =>
          val b = body
          val srcNs = b.get("source").get("namespace").elements().asScala.map(_.asText()).mkString(".")
          val from = b.get("source").get("name").asText()
          val to = b.get("destination").get("name").asText()
          namespaces.get(srcNs).flatMap(n => n.tables.remove(from).map(m => n.tables.put(to, m))) match {
            case None => respond(ex, 404, """{"error":"no such table"}""")
            case Some(_) => respond(ex, 204)
          }

        case _ => respond(ex, 404, s"""{"error":"no route $method $path"}""")
      }
    }
  }
}
