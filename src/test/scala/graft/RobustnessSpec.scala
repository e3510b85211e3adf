package graft

import graft.read.ReadOptions
import org.apache.spark.sql.functions._

/**
 * Robustness goldens: metadata-only pruning at scale, v1 manifest defaults,
 * null-stats filters, ns-timestamp schemas, and bad-metadata errors.
 * Expectations from the cited reference tests.
 */
class RobustnessSpec extends SparkSpec {
  private val P = "/root/reference/data/persistent"

  test("generated_bounds: 3000+ files all pruned by stats, count 0 without touching storage (generated_bounds.test:12-20)") {
    val path = s"$P/generated_bounds"
    val filter = "block_number >= 5000000 AND block_number <= 5000100"
    val p = IcebergTable.plan(spark, path, ReadOptions(filterSql = Some(filter)))
    assert(p.totalDataFiles >= 3000, s"fixture should have thousands of files, got ${p.totalDataFiles}")
    assert(p.dataFiles.isEmpty, s"stats pruning must drop every file, kept ${p.dataFiles.size}")
    // The data files only exist on s3 — counting still works because the
    // pruned plan never opens them.
    assert(IcebergTable.load(spark, path, ReadOptions(filterSql = Some(filter))).count() == 0)
  }

  test("generated_bounds: column_stats surfaces deserialized bounds (generated_bounds.test:22-27)") {
    val stats = IcebergTable.columnStats(spark, s"$P/generated_bounds")
      .filter(col("column_name") === "block_number")
    val bounds = stats.select("lower_bound").collect().map(_.getString(0)).toSet
    assert(bounds.contains("299901") && bounds.contains("300001"))
  }

  test("iceberg_v1_repro: v1 manifests omit content/sequence fields; defaults supplied (iceberg_v1_existing_manifest_entry.test:10-30)") {
    val path = s"$P/iceberg_v1_repro/repro/merch_v1/metadata/00003-8d01e4aa-d143-49c9-898e-b5e477577b70.metadata.json"
    val rows = IcebergTable.load(spark, path).orderBy("id").collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getString(1), r.getAs[Number](2).intValue()))
    assert(rows.toSeq == Seq((2, "nba", 20), (3, "mlb", 30), (4, "nhl", 40), (6, "nba", 60)))
    val seqs = IcebergTable.manifestEntries(spark, path)
      .select("data_sequence_number", "file_sequence_number").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(seqs == Seq((0L, 0L)))
    // v3-upgraded metadata still referencing the v1 manifest list
    val v3 = s"$P/iceberg_v1_repro/repro/merch_v1/metadata/00004-v3-upgraded-v1-null-counts.metadata.json"
    assert(IcebergTable.load(spark, v3).count() == 4)
  }

  test("is_null_is_not_null: null-stats filters (is_not_null.test:24-44)") {
    val path = s"$P/is_null_is_not_null"
    val df = IcebergTable.load(spark, path)
    assert(df.count() == 8)
    assert(IcebergTable.load(spark, path, ReadOptions(filterSql = Some("value IS NULL"))).count() == 4)
    assert(IcebergTable.load(spark, path, ReadOptions(filterSql = Some("value IS NOT NULL"))).count() == 4)
    // the IS NULL filter prunes at least the all-non-null file (record_count 3)
    val pruned = IcebergTable.plan(spark, path, ReadOptions(filterSql = Some("value IS NULL")))
    val full = IcebergTable.plan(spark, path)
    assert(pruned.dataFiles.size < full.dataFiles.size,
      s"null-count pruning expected: ${pruned.dataFiles.size} < ${full.dataFiles.size}")
  }

  test("timestamptz_ns: ns-timestamp schema surfaces, zero rows (timestamptz_ns_type.test:17-24)") {
    val df = IcebergTable.load(spark, s"$P/timestamptz_ns/metadata/v1.metadata.json")
    assert(df.count() == 0)
    assert(df.schema("val").dataType.typeName == "timestamp")
  }

  test("bad_data: corrupt metadata fails with an error, not a crash") {
    intercept[Exception] {
      IcebergTable.load(spark, s"$P/bad_data/bad_iceberg_metadata.json").count()
    }
  }

  test("nested warehouse layouts load: partition_time and map_stats") {
    val time = IcebergTable.load(spark, s"$P/partition_time/default.db/partition_time")
    assert(time.count() >= 2)
    val ms = IcebergTable.load(spark, s"$P/map_stats/default.db/map_stats")
    assert(ms.count() >= 1)
  }

  test("variant column: write + load + filter roundtrip, conservative pruning") {
    import spark.implicits._
    val path = tmpDir("graft_variant")
    val df = spark.range(10).toDF("id")
      .withColumn("v", parse_json(concat(lit("{\"a\": "), col("id"), lit(", \"s\": \"x\"}"))))
    IcebergTable.write(df, path)
    // Schema maps through Iceberg `variant` and back to Spark VariantType.
    val meta = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    assert(meta.currentSchema.fields.find(_.name == "v")
      .exists(_.fieldType == graft.core.IcebergTypes.VariantT))
    val back = IcebergTable.load(spark, path)
    assert(back.schema("v").dataType.typeName == "variant")
    assert(back.count() == 10)
    // Filters over variant_get run (no pruning assumptions on variant bounds).
    assert(back.filter("variant_get(v, '$.a', 'int') >= 5").count() == 5)
    val js = back.select(to_json(col("v"))).collect().map(_.getString(0)).sorted.toSeq
    assert(js == (0 until 10).map(i => s"""{"a":$i,"s":"x"}""").sorted)
  }

  test("geometry/geography types: crs parses, round-trips, and surfaces as column metadata") {
    import graft.core.IcebergTypes._
    assert(parsePrimitive("geometry") == GeometryT(None))
    assert(parsePrimitive("geometry(srid:3857)") == GeometryT(Some("srid:3857")))
    assert(parsePrimitive("geography(srid:4326)") == GeometryT(Some("srid:4326"), geography = true))
    assert(GeometryT(Some("srid:3857")).typeJsonString == "geometry(srid:3857)")
    assert(parsePrimitive(GeometryT(Some("srid:4326"), geography = true).typeJsonString)
      == GeometryT(Some("srid:4326"), geography = true))
    val f = NestedField(7, "geom", required = false, GeometryT(Some("srid:3857"))).toSpark
    assert(f.dataType.typeName == "binary")
    assert(f.metadata.getString("iceberg.crs") == "srid:3857")
    assert(f.metadata.getString("iceberg.type") == "geometry")
  }

  test("map-typed column: bounds-less map stats scan AND filter with map access " +
      "stay exact (missing_map_bounds.test:17-28)") {
    val df = IcebergTable.load(spark, s"$P/map_stats/default.db/map_stats")
    assert(df.count() == 2)
    // The reference's filtered read: timestamp range + map-key access —
    // maps carry no usable bounds, pruning must stay conservative, rows
    // exact.
    val got = df.filter(
      col("timestamp") >= lit("2026-01-01").cast("timestamp") &&
      col("timestamp") < lit("2026-01-02").cast("timestamp") &&
      col("metadata").getItem("key") === "value1")
    assert(got.count() == 1, "timestamp range + map['key'] filter must keep exactly one row")
  }

  test("empty INSERT: an append of zero rows commits a snapshot that changes nothing " +
      "(test_read_empty_insert.test shape)") {
    import spark.implicits._
    val path = tmpDir("graft_empty_insert")
    IcebergTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    val before = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    IcebergTable.append(Seq.empty[(Int, String)].toDF("id", "v"), path)
    val after = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    assert(after.snapshots.size == before.snapshots.size + 1,
      "the empty append is still a committed snapshot (engines do this; readers must cope)")
    assert(IcebergTable.load(spark, path).count() == 2)
    // and the incremental/stream read of the empty snapshot yields no rows
    val appended = graft.streaming.Streams.appendsBetween(spark, path,
      before.currentSnapshotId, after.currentSnapshotId.get)
    assert(appended.count() == 0)
  }

  test("two-writer commit race on the path-table publish: one winner per metadata " +
      "version, losers retry onto the next, no snapshot lost (HadoopTableOperations semantics)") {
    import spark.implicits._
    val path = tmpDir("graft_commit_race")
    IcebergTable.write(Seq((0, "init")).toDF("id", "v"), path)
    def listVersions() = new java.io.File(s"$path/metadata").listFiles.map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.drop(1).takeWhile(_.isDigit).toInt).sorted.toSeq
    val beforeMax = listVersions().max
    val perWriter = 4
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(base: Int) = new Thread(() => {
      try {
        barrier.await() // release both writers into the race together
        (1 to perWriter).foreach { i =>
          IcebergTable.append(Seq((base + i, s"w$base-$i")).toDF("id", "v"), path)
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    val t1 = writer(100); val t2 = writer(200)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek()).map(_.getMessage)}")

    val total = 1 + 2 * perWriter
    val meta = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    // Every commit survived, with a LINEAR history: unique contiguous
    // sequence numbers and a parent chain covering every snapshot (a lost
    // publish would orphan a snapshot or fork the chain).
    assert(meta.snapshots.size == total, "every commit must produce a surviving snapshot")
    assert(meta.snapshots.map(_.sequenceNumber).sorted == (1L to total.toLong),
      "sequence numbers must be unique and contiguous")
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    var cur = meta.currentSnapshot
    var chain = 0
    while (cur.isDefined) { chain += 1; cur = cur.get.parentSnapshotId.flatMap(byId.get) }
    assert(chain == total, s"parent chain covers $chain of $total snapshots")
    // One winner per metadata version; losers republished at the NEXT free
    // version — contiguous, no gaps, no overwrites: exactly one new version
    // per racing commit on top of the initial write's versions.
    val versions = listVersions()
    assert(versions == (1 to versions.max),
      s"metadata versions must be contiguous, got $versions")
    assert(versions.max == beforeMax + 2 * perWriter,
      s"expected ${beforeMax + 2 * perWriter} versions (one per commit), got ${versions.max}")
    assert(IcebergTable.load(spark, path).count() == total.toLong)
    // Caveat this pins: the createLink/rename publish is atomic per-version
    // on local and HDFS-like filesystems; plain object stores without
    // atomic create-if-absent need a catalog (RestCatalog) instead.
  }
}
