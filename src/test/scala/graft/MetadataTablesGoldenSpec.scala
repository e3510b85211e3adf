package graft

import graft.read.ReadOptions

/** Value-by-value verification of the metadata table functions against the
  * reference's own static fixtures and published expectations — the DuckDB
  * SQL oracle cannot express these (it has no iceberg extension offline),
  * so the golden numbers ARE the oracle here.
  *
  * Expectations transcribed from:
  *  - reference test/sql/local/iceberg_scans/iceberg_metadata.test:18-31
  *  - reference test/sql/local/iceberg_scans/iceberg_partition_stats.test:17-24
  *  - reference test/sql/local/iceberg_scans/iceberg_column_stats.test:17-36
  *  - lineitem_iceberg/metadata/v2.metadata.json (snapshot log)
  */
class MetadataTablesGoldenSpec extends SparkSpec {

  private val P = "/root/reference/data/persistent"
  private val lineitem = s"$P/iceberg/lineitem_iceberg"
  private val hive = s"$P/hive_partitioned_table"

  test("iceberg_snapshots(lineitem_iceberg): both snapshots, exact ids/seqs/ops/timestamps") {
    val rows = IcebergTable.snapshots(spark, lineitem)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toInstant.toEpochMilli, r.getString(3).split('/').last, r.getString(4)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, 7817332053627255703L, 1746188479060L,
        "snap-7817332053627255703-1-787a5996-87e9-4d93-b258-066d524e82cc.avro", "append"),
      (2L, 2354745328521181395L, 1746188480005L,
        "snap-2354745328521181395-1-179b4fb1-0366-4f7d-ad35-99ee8da0abf5.avro", "overwrite")))
  }

  test("iceberg_metadata(lineitem_iceberg): entry rows match iceberg_metadata.test:18-31") {
    def entries(opts: ReadOptions) =
      IcebergTable.manifestEntries(spark, lineitem, opts).collect().map { r =>
        (r.getString(0).split('/').last, r.getLong(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5).split('/').last, r.getString(6).toUpperCase,
          r.getLong(7), r.getLong(9), r.getLong(10))
      }.sortBy(t => (t._4, t._6)).toSeq

    // Current version (v2): one ADDED 51793-row file at seq 2, the v1 file
    // DELETED (still listed in m0 at seq 1 data / values per the fixture).
    assert(entries(ReadOptions()) == Seq(
      ("179b4fb1-0366-4f7d-ad35-99ee8da0abf5-m1.avro", 2L, "DATA", "ADDED", "DATA",
        "00000-5-dad9988f-2a3b-464c-adb6-6034de93da19-00001.parquet", "PARQUET", 51793L, 2L, 2L),
      ("179b4fb1-0366-4f7d-ad35-99ee8da0abf5-m0.avro", 2L, "DATA", "DELETED", "DATA",
        "00000-1-66fee7c2-c97c-4af9-963d-930afd99ace4-00001.parquet", "PARQUET", 60175L, 1L, 1L)))

    // Time travel to version 1: the original 60175-row file, ADDED.
    assert(entries(ReadOptions(metadataVersion = Some("1"))) == Seq(
      ("787a5996-87e9-4d93-b258-066d524e82cc-m0.avro", 1L, "DATA", "ADDED", "DATA",
        "00000-1-66fee7c2-c97c-4af9-963d-930afd99ace4-00001.parquet", "PARQUET", 60175L, 1L, 1L)))
  }

  test("iceberg_partition_stats(hive_partitioned_table): 3 summary rows match iceberg_partition_stats.test:17-24") {
    val rows = IcebergTable.partitionStats(spark, hive)
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(2), r.getInt(3),
        r.getString(4), r.getInt(5), r.getBoolean(6), r.getString(7), r.getString(8)))
      .sortBy(t => (t._3, t._5)).toSeq
    assert(rows == Seq(
      ("8f7c6cdd-f7e6-4743-857e-021adfe0b999-m0.avro", 2541674261311761067L, 0,
        "event_date", 1000, false, "2024-01-01", "2024-01-02"),
      ("fee93099-6425-4d83-bd7c-0aa646533090-m0.avro", 5128628767169163501L, 1,
        "event_date", 1000, false, "2024-01-03", "2024-01-04"),
      ("fee93099-6425-4d83-bd7c-0aa646533090-m0.avro", 5128628767169163501L, 1,
        "event_type", 1001, false, "click", "view")))
  }

  test("iceberg_column_stats(hive_partitioned_table): 18 rows match iceberg_column_stats.test:17-36") {
    val df = IcebergTable.columnStats(spark, hive)
    val rows = df.collect().map { r =>
      (r.getString(0).split('/').takeRight(2).mkString("/"), r.getString(2),
        r.getString(4), r.getString(5), r.getLong(6), r.getLong(7), r.getLong(8),
        Option(r.get(9)), r.getLong(10))
    }.toSet
    assert(rows.size == 18, s"expected 18 stats rows, got ${rows.size}")
    // Every file has exactly one row per column, value_count 1, no nulls,
    // no nan counts (non-floating columns).
    assert(rows.forall { case (_, _, _, _, _, vc, nc, nan, _) => vc == 1L && nc == 0L && nan.isEmpty })
    // Exact expectations for the four single-partition files' bounds
    // (transcribed; column sizes included — they pin the footer parse).
    val expect = Set(
      ("event_date=2024-01-01/00000-3-249d8105-f013-47e6-8600-a855387633e5-00001.parquet",
        "event_date", "2024-01-01", "2024-01-01", 36L, 1L),
      ("event_date=2024-01-01/00000-3-249d8105-f013-47e6-8600-a855387633e5-00001.parquet",
        "event_type", "click", "click", 41L, 1L),
      ("event_date=2024-01-01/00000-3-249d8105-f013-47e6-8600-a855387633e5-00001.parquet",
        "user_id", "12345", "12345", 40L, 1L),
      ("event_date=2024-01-02/00000-3-249d8105-f013-47e6-8600-a855387633e5-00002.parquet",
        "event_date", "2024-01-02", "2024-01-02", 36L, 1L),
      ("event_date=2024-01-02/00000-3-249d8105-f013-47e6-8600-a855387633e5-00002.parquet",
        "event_type", "purchase", "purchase", 43L, 1L),
      ("event_date=2024-01-02/00000-3-249d8105-f013-47e6-8600-a855387633e5-00002.parquet",
        "user_id", "67890", "67890", 40L, 1L))
    val got = rows.filter(_._1.startsWith("event_date=2024-01-0") )
      .filter(r => r._1.contains("-01/") || r._1.contains("-02/"))
      .map(r => (r._1, r._2, r._3, r._4, r._5, r._9))
    assert(expect.subsetOf(got), s"missing: ${expect -- got}\n got: $got")
    // The two-level spec files carry file_sequence_number 2.
    assert(rows.filter(_._1.contains("event_type=")).forall(_._9 == 2L))
  }
}
