package graft

import graft.read.ReadOptions
import org.apache.spark.sql.functions._

/**
 * Golden reads of the reference repo's committed Iceberg fixtures
 * (read-only, /root/reference/data/persistent). Expected values come from
 * the reference's own sqllogictests (cited per test) — the strongest
 * cross-engine correctness oracle available offline.
 */
class GoldenFixturesSpec extends SparkSpec {
  private val P = "/root/reference/data/persistent"

  test("lineitem_iceberg: current snapshot 51793 rows, v1 60175 (iceberg_metadata.test:18-31)") {
    val path = s"$P/iceberg/lineitem_iceberg"
    assert(IcebergTable.count(spark, path) == 51793L)
    val v1 = IcebergTable.plan(spark, path, ReadOptions(metadataVersion = Some("1")))
    assert(v1.fastRowCount.contains(60175L))
    // The DELETED entry in v2 must not be scanned.
    val v2 = IcebergTable.plan(spark, path)
    assert(v2.dataFiles.map(_.recordedPath).forall(_.contains("dad9988f")))
  }

  test("lineitem_iceberg gz + no-hint variants resolve metadata (GuessTableVersion/gzip)") {
    assert(IcebergTable.count(spark, s"$P/iceberg/lineitem_iceberg_no_hint") == 51793L)
    // gz fixtures hold a different dataset: one append of 111968 rows.
    assert(IcebergTable.count(spark, s"$P/iceberg/lineitem_iceberg_gz") == 111968L)
    assert(IcebergTable.count(spark, s"$P/iceberg/lineitem_iceberg_gz_no_hint") == 111968L)
  }

  test("equality_deletes/mytable: 6 snapshots of eq-deletes leave (4,d),(5,e) (equality_deletes.test:41-47)") {
    val df = IcebergTable.load(spark, s"$P/equality_deletes/warehouse/mydb/mytable")
    val rows = df.orderBy("id").collect().map(r => (r.getAs[Number](0).intValue(), r.getString(1), String.valueOf(r.get(2))))
    assert(rows.toSeq == Seq((4, "d", "2025-01-04"), (5, "e", "2025-01-05")))
  }

  test("equality_delete_cross_partition: delete in part=0 must not hit part=1 (equality_delete_cross_partition.test:19-26)") {
    val df = IcebergTable.load(spark, s"$P/equality_delete_cross_partition/warehouse/ns/t/metadata/vfinal.metadata.json")
    val rows = df.orderBy("part", "key").collect().map(r => (r.getAs[Number](0).intValue(), r.getAs[Number](1).intValue(), r.getString(2)))
    assert(rows.toSeq == Seq((0, 999, "p0-k999"), (1, 100, "p1-k100"), (1, 888, "p1-k888")))
  }

  test("equality_delete_extra_column: eq-delete with extra columns on a bucket-partitioned table (equality_delete_extra_column.test:14-31)") {
    val path = s"$P/equality_delete_extra_column/warehouse/ns/t/metadata/vfinal.metadata.json"
    val df = IcebergTable.load(spark, path)
    val rows = df.select("id", "val").orderBy("id").collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a"), (3, "c")))
    assert(IcebergTable.load(spark, path).count() == 2)
    // projecting only a non-key column must still apply the delete
    assert(IcebergTable.load(spark, path).select("val").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
  }

  test("legacy_bare_deletion_vector (v3): DV removes row 2 (legacy_bare_deletion_vector.test:37-44)") {
    val df = IcebergTable.load(spark, s"$P/legacy_bare_deletion_vector/warehouse/default/legacy_bare_deletion_vector")
    val rows = df.select("id", "source").orderBy("id").collect().map(r => (r.getAs[Number](0).intValue(), r.getString(1)))
    assert(rows.toSeq == Seq((1, "legacy"), (3, "legacy")))
  }

  test("column_mapping: nested struct/list/map read by field id (column_mapping.test:24-30)") {
    val df = IcebergTable.load(spark, s"$P/column_mapping/warehouse/default.db/my_table")
    assert(df.count() == 3)
    val flat = df.select("id", "name", "age").orderBy("id").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1), r.getAs[Number](2).intValue()))
    assert(flat.toSeq == Seq((1L, "Alice", 25), (2L, "Bob", 30), (3L, "Charlie", 35)))
  }

  test("null_stats: IS NULL / IS NOT NULL with null-count pruning (null_stats.test:15-45)") {
    val path = s"$P/null_stats/default/test_nulls"
    val opts = ReadOptions(metadataVersion = Some("00003-9d6a621e-8a72-4190-a880-f6ca02e32b86"))
    val df = IcebergTable.load(spark, path, opts)
    assert(df.count() == 9)
    assert(IcebergTable.load(spark, path, opts.copy(filterSql = Some("flag IS NULL"))).count() == 5)
    assert(IcebergTable.load(spark, path, opts.copy(filterSql = Some("flag IS NOT NULL"))).count() == 4)
  }

  test("add_columns_with_defaults: initial-default fill for files predating columns (initial_default_all_types.test:23-27)") {
    val df = IcebergTable.load(spark,
      s"$P/add_columns_with_defaults/default.db/add_columns_with_defaults/metadata/00003-3f1801a5-7dfb-4072-b14a-39cd12f9279b.metadata.json")
    assert(df.count() == 3)
    val rows = df.select("col_integer", "col_long", "col_string", "col_boolean")
      .collect().map(r => (r.getAs[Number](0).intValue(), r.getAs[Number](1).longValue(), r.getString(2), r.getBoolean(3))).toSeq
    assert(rows.count(_ == (342342, Long.MinValue, "HELLO", true)) == 2)
    assert(rows.contains((453243, 328725092345834L, "World", false)))
  }

  test("initial-defaults INSIDE structs fill for files predating the subfields (initial_default_in_struct_all_types.test:13-18)") {
    val df = IcebergTable.load(spark,
      s"$P/add_columns_with_defaults_in_struct/default.db/add_columns_with_defaults_in_struct/metadata/00003-21a957f9-c2ee-431a-9d18-bf257b561198.metadata.json")
    val rows = df.select(
        col("a.col1"), col("a.col_boolean"), col("a.col_integer"),
        col("a.col_long"), col("a.col_string"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getInt(2), r.getLong(3), r.getString(4))).toSeq
    assert(rows.size == 2)
    assert(rows.contains(("test", true, 342342, Long.MinValue, "HELLO")), s"defaulted row missing in $rows")
    assert(rows.contains(("test", false, 453243, 328725092345834L, "World")))
    // Nested uuid/fixed: the defaulted (older-file) row fills the declared
    // initial-defaults; the newer file stores physical NULLs (reference
    // initial_default_in_struct_all_types.test expected output).
    val uf = df.select(col("a.col_string"), col("a.col_uuid"), col("a.col_fixed"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getAs[Array[Byte]](2)).map(_.toSeq))).toSeq
    assert(uf.contains(("HELLO", "f79c3e09-677c-4bbd-a479-3f349cb785e7",
      Some(Seq[Byte](1, 2, 3, 0xFF.toByte, 3)))), s"nested uuid/fixed defaults wrong: $uf")
    assert(uf.contains(("World", null, None)))
  }

  test("uuid type: fixed[16] read as canonical strings + eq filter (uuid_type.test:16-37)") {
    val df = IcebergTable.load(spark, s"$P/uuid")
    assert(df.count() == 10)
    val one = IcebergTable.load(spark, s"$P/uuid",
      ReadOptions(filterSql = Some("uuid = '1571effb-facd-42a3-90e9-0af522e9b6c2'")))
    assert(one.collect().map(_.getString(0)).toSeq == Seq("1571effb-facd-42a3-90e9-0af522e9b6c2"))
  }

  test("case_sensitive_names: exact-case schema preserved (case_sensitive_names.test:12-35)") {
    val df = IcebergTable.load(spark,
      s"$P/case_sensitive_names/default.db/case_sensitive_names/metadata/00001-a7a3a44c-4aac-4619-bebd-11be37b27351.metadata.json")
    // The schema columns are (user_id, uSeR_Id) — DuckDB's describe shows
    // "uSeR_Id_1" only because of its own duplicate-name dedup rename; we
    // keep exact names (spark.sql.caseSensitive=true required).
    assert(df.schema.fieldNames.toSet == Set("uSeR_Id", "user_id"))
    assert(df.count() == 3)
    assert(df.select("uSeR_Id").orderBy("uSeR_Id").collect().map(_.getString(0)).toSeq ==
      Seq("user_1", "user_2", "user_3"))
  }

  test("name_mapping: files without field ids resolve via schema.name-mapping.default (column_mapping_delete.test:13-23)") {
    val path = s"$P/name_mapping/warehouse_1/mydb/t1"
    val opts = ReadOptions(metadataVersion = Some("3"), snapshotId = Some(6597550917742534971L))
    val df = IcebergTable.load(spark, path, opts)
    assert(df.filter(col("b").isNull).count() == 0)
    assert(df.filter(col("b").isNotNull).count() == 10000)
    // v3.1 drops 'b' from the mapping: all b become NULL despite the file column.
    val df31 = IcebergTable.load(spark, path, opts.copy(metadataVersion = Some("3.1")))
    assert(df31.filter(col("b").isNull).count() == 10000)
  }

  test("iceberg_v1_deprecated: embedded manifests, bare spec field list (iceberg_v1_deprecated_metadata.test:10-36)") {
    val path = s"$P/iceberg_v1_deprecated/default/legacy_v1"
    val df = IcebergTable.load(spark, path)
    val rows = df.orderBy("id").collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Number].intValue())))
    assert(rows.toSeq == Seq((1, "alpha", Some(10)), (2, "beta", Some(20)), (3, "alpha", None)))
    val filtered = IcebergTable.load(spark, path, ReadOptions(filterSql = Some("category = 'beta'")))
      .select("id", "amount").collect().map(r => (r.getAs[Number](0).intValue(), r.getAs[Number](1).intValue()))
    assert(filtered.toSeq == Seq((2, 20)))
    // embedded manifests: sequence numbers default to 0, no manifest list
    val entries = IcebergTable.manifestEntries(spark, path)
      .select("data_sequence_number").distinct().collect().map(_.getLong(0)).toSeq
    assert(entries == Seq(0L))
    val snaps = IcebergTable.snapshots(spark, path).select("manifest_list").collect()
    assert(snaps.forall(_.isNullAt(0)))
  }

  test("custom_write_paths: empty table with write.data/metadata.path properties (test_custom_write_paths.test:14-22)") {
    val path = s"$P/custom_write_paths"
    assert(IcebergTable.load(spark, path).count() == 0)
    assert(IcebergTable.manifestEntries(spark, path).count() == 0)
  }

  test("expression_filter: computed-expression filters never prune wrongly (expression_filter.test:20-40)") {
    val path = s"$P/expression_filter"
    val df = IcebergTable.load(spark, path)
    assert(df.count() == 3)
    val role = when(col("value") === "foo", "not null").otherwise(lit(null))
    assert(df.withColumn("role", role).filter(col("role").isNull).count() == 2)
    assert(df.withColumn("role", role).filter(col("role").isNotNull).count() == 1)
  }

  test("partition_integer: identity partition pruning plans 1 of 2 files") {
    val path = s"$P/partition_integer"
    val full = IcebergTable.plan(spark, path)
    assert(full.dataFiles.size == 2)
    val vals = IcebergTable.load(spark, path).select("partition_col").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val pruned = IcebergTable.plan(spark, path,
      ReadOptions(filterSql = Some(s"partition_col = ${vals.head}")))
    assert(pruned.dataFiles.size == 1)
  }

  test("version_name_format: custom pattern resolves, malformed errors (iceberg_scan.cpp:40-48, version_name_format_error.test)") {
    val path = s"$P/iceberg/lineitem_iceberg"
    // The standard pattern, passed explicitly, resolves like the default.
    assert(IcebergTable.count(spark, path,
      ReadOptions(versionNameFormat = Some("v%s%s.metadata.json"))) == 51793L)
    // Malformed: not exactly two %s -> reference error-message parity
    // (a comma list is only legal as the internal default; a user value
    // with 4 substitutions fails the same check, like the reference).
    val e = intercept[IllegalArgumentException] {
      IcebergTable.plan(spark, path, ReadOptions(versionNameFormat = Some("%s")))
    }
    assert(e.getMessage ==
      "'version_name_format' has to contain two occurrences of '%s' in it, found 1")
    val e4 = intercept[IllegalArgumentException] {
      IcebergTable.plan(spark, path, ReadOptions(
        versionNameFormat = Some("nope_%s%s.json,v%s%s.metadata.json")))
    }
    assert(e4.getMessage.endsWith("found 4"))
    // A pattern that matches nothing fails loudly, not silently-latest.
    intercept[Exception] {
      IcebergTable.plan(spark, path, ReadOptions(versionNameFormat = Some("x%s%s.json")))
    }
    // DSv2 option spelling (both kebab and reference underscore forms).
    val viaOpt = spark.read.format("graft")
      .option("version_name_format", "v%s%s.metadata.json").load(path)
    assert(viaOpt.count() == 51793L)
  }

  test("big_query_error: BigQuery-written metadata (epoch-numbered version file) reads " +
      "value-exact (big_query_read.test:3-7)") {
    val df = IcebergTable.load(spark, s"$P/big_query_error")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), String.valueOf(r.get(2)))).sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "Alice", "2024-01-01T10:00"),
      (2L, "Bob", "2024-02-01T11:30")),
      s"got $rows")
  }
}
