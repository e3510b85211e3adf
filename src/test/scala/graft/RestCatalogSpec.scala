package graft

import graft.catalog.{CatalogOptions, RestCatalog, RestCatalogException}
import graft.core.IcebergTypes
import org.scalatest.BeforeAndAfterAll

/** REST catalog end-to-end against the in-process test server: OAuth2,
  * namespaces, table lifecycle, DataFrame append/read, commit conflicts. */
class RestCatalogSpec extends SparkSpec with BeforeAndAfterAll {
  private val server = new TestRestServer
  private lazy val catalog = new RestCatalog(server.uri,
    CatalogOptions(clientId = Some("id"), clientSecret = Some("secret")))

  override def beforeAll(): Unit = server.start()
  override def afterAll(): Unit = server.stop()

  test("oauth2 + config + namespace lifecycle") {
    assert(catalog.config()("warehouse") == "memory")
    catalog.createNamespace(Seq("db"), Map("owner" -> "graft"))
    assert(catalog.listNamespaces() == Seq(Seq("db")))
    assert(catalog.namespaceProperties(Seq("db"))("owner") == "graft")
    catalog.updateNamespaceProperties(Seq("db"), Map("x" -> "1"), Seq("owner"))
    val props = catalog.namespaceProperties(Seq("db"))
    assert(props.get("x").contains("1") && !props.contains("owner"))
  }

  test("create table via catalog, append + read DataFrames, snapshot accumulates") {
    catalog.createNamespace(Seq("etl"))
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpDir("graft_rest_tbl")
    val schema = IcebergTypes.fromSpark(src.schema)
    catalog.createTable(Seq("etl"), "region", schema, loc)
    assert(catalog.listTables(Seq("etl")) == Seq("region"))
    assert(catalog.tableExists(Seq("etl"), "region"))
    assert(!catalog.tableExists(Seq("etl"), "nope"))

    catalog.appendDF(src, Seq("etl"), "region")
    assertSameResult(src, catalog.loadDF(spark, Seq("etl"), "region"))
    catalog.appendDF(src, Seq("etl"), "region")
    assert(catalog.loadDF(spark, Seq("etl"), "region").count() == 2 * src.count())
    val t = catalog.loadTable(Seq("etl"), "region")
    assert(t.metadata.snapshots.size == 2)
    assert(t.metadata.currentSnapshot.get.operation == "append")
  }

  test("commit with stale expected snapshot is rejected with 409") {
    val t = catalog.loadTable(Seq("etl"), "region")
    val snap = t.metadata.currentSnapshot.get
    val stale = snap.copy(snapshotId = snap.snapshotId + 1)
    val ex = intercept[RestCatalogException] {
      catalog.commitSnapshot(Seq("etl"), "region", Some(123456789L), stale)
    }
    assert(ex.status == 409)
  }

  test("server-side scan planning returns the same rows as client planning") {
    val src = spark.read.parquet(s"$sfDir/nation.parquet")
    val loc = tmpDir("graft_rest_planned")
    catalog.createNamespace(Seq("planned"))
    catalog.createTable(Seq("planned"), "nation", IcebergTypes.fromSpark(src.schema), loc)
    catalog.appendDF(src, Seq("planned"), "nation")
    val serverPlanned = catalog.loadDFServerPlanned(spark, Seq("planned"), "nation")
    assertSameResult(src, serverPlanned)
    // filters still apply on top of server-planned scans
    val filtered = catalog.loadDFServerPlanned(spark, Seq("planned"), "nation",
      graft.read.ReadOptions(filterSql = Some("n_regionkey = 2")))
    assertSameResult(src.filter("n_regionkey = 2"), filtered)
  }

  test("iceberg_load_table_response parses a LoadTableResult JSON into rows") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val t = catalog.loadTable(Seq("etl"), "region")
    // round-trip the LoadTableResult through the raw JSON debug function
    val json = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val o = m.createObjectNode()
      o.put("metadata-location", t.metadataLocation)
      o.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
        m.readTree(graft.core.TableMetadata.toJson(t.metadata)))
      val c = o.putObject("config"); c.put("k", "v")
      m.writeValueAsString(o)
    }
    val rows = IcebergTable.loadTableResponse(spark, json).collect()
    assert(rows.nonEmpty)
    assert(rows(0).getAs[String]("table_uuid") == t.metadata.tableUuid)
    assert(rows(0).getAs[Int]("format_version") == t.metadata.formatVersion)
    assert(rows.exists(r => r.getAs[String]("config_key") == "k" && r.getAs[String]("config_value") == "v"))
  }

  test("rename + drop table") {
    catalog.renameTable(Seq("etl"), "region", "region2")
    assert(catalog.listTables(Seq("etl")) == Seq("region2"))
    catalog.dropTable(Seq("etl"), "region2")
    assert(catalog.listTables(Seq("etl")).isEmpty)
  }
}
