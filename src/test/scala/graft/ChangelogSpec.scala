package graft

import graft.core.TableMetadata
import graft.streaming.Streams
import graft.write.TableWriteOptions
import org.apache.spark.sql.functions._

/** CDC changelog read (Streams.changesBetween): inserts, deletes, updates
  * as delete+insert, compaction invisibility, DV and equality variants. */
class ChangelogSpec extends SparkSpec {

  private def hconf = spark.sessionState.newHadoopConf()
  private def headId(path: String): Long =
    TableMetadata.load(path, hconf).currentSnapshotId.get

  test("append, delete, update, and compaction produce the right change rows") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val open = src.filter(col("o_orderstatus") === "O")
    val fin = src.filter(col("o_orderstatus") === "F")
    val path = tmpDir("graft_cdc")
    IcebergTable.write(open, path); val s1 = headId(path)
    IcebergTable.append(fin, path); val s2 = headId(path)
    IcebergTable.delete(spark, path, "o_orderpriority = '5-LOW'"); val s3 = headId(path)
    IcebergTable.update(spark, path, "o_orderstatus = 'F'",
      Map("o_totalprice" -> "o_totalprice * 2")); val s4 = headId(path)
    IcebergTable.rewriteDataFiles(spark, path, rewriteAll = true); val s5 = headId(path)

    val ch = Streams.changesBetween(spark, path, None, s5).cache()
    try {
      // Compaction contributes nothing.
      assert(ch.filter(col("_commit_snapshot_id") === s5).count() == 0)
      // s1/s2: pure inserts of each half.
      assert(ch.filter(col("_commit_snapshot_id") === s1).count() == open.count())
      val s2rows = ch.filter(col("_commit_snapshot_id") === s2)
      assert(s2rows.count() == fin.count())
      assert(s2rows.filter(col("_change_type") =!= "insert").count() == 0)
      // s3: pure deletes, exactly the 5-LOW rows live at s2.
      val s3rows = ch.filter(col("_commit_snapshot_id") === s3)
      assert(s3rows.filter(col("_change_type") =!= "delete").count() == 0)
      assertSameResult(s3rows.drop("_change_type", "_commit_snapshot_id", "_change_ordinal"),
        open.union(fin).filter(col("o_orderpriority") === "5-LOW"))
      // s4 (update): delete+insert pairs of equal cardinality, prices doubled.
      val s4rows = ch.filter(col("_commit_snapshot_id") === s4)
      val s4byType = s4rows.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val updated = fin.filter(col("o_orderpriority") =!= "5-LOW").count()
      assert(s4byType == Map("insert" -> updated, "delete" -> updated), s"got $s4byType")
      val insSum = s4rows.filter(col("_change_type") === "insert")
        .agg(sum("o_totalprice")).head.getDouble(0)
      val delSum = s4rows.filter(col("_change_type") === "delete")
        .agg(sum("o_totalprice")).head.getDouble(0)
      assert(math.abs(insSum - delSum * 2) < 0.01, s"$insSum vs 2*$delSum")

      // Net-applying the changelog reproduces the final table.
      val net = ch.filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_snapshot_id", "_change_ordinal")
        .exceptAll(ch.filter(col("_change_type") === "delete")
          .drop("_change_type", "_commit_snapshot_id", "_change_ordinal"))
      assertSameResult(net, IcebergTable.load(spark, path))

      // Ordinals are the commit positions 0..3 (s5 absent).
      assert(ch.select("_change_ordinal").distinct().collect().map(_.getInt(0)).sorted.toSeq
        == Seq(0, 1, 2, 3))
    } finally ch.unpersist()

    // Bounded range (s2, s4]: only the delete and the update.
    val part = Streams.changesBetween(spark, path, Some(s2), s4)
    assert(part.select("_commit_snapshot_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(s3, s4))
    // From a non-ancestor fails loudly.
    intercept[Exception](Streams.changesBetween(spark, path, Some(999L), s4))
  }

  test("DSv2 options: changelog=true and start/end-snapshot-id ranges") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val open = src.filter(col("o_orderstatus") === "O")
    val fin = src.filter(col("o_orderstatus") === "F")
    val path = tmpDir("graft_cdc_dsv2")
    IcebergTable.write(open, path); val s1 = headId(path)
    IcebergTable.append(fin, path); val s2 = headId(path)
    IcebergTable.delete(spark, path, "o_orderpriority = '5-LOW'")

    // Full-history CDC through the reader option.
    val cdc = spark.read.format("graft").option("changelog", "true").load(path)
    assert(cdc.columns.takeRight(3).toSeq
      == Seq("_change_type", "_commit_snapshot_id", "_change_ordinal"))
    assert(cdc.filter(col("_change_type") === "insert").count() == open.count() + fin.count())
    assertSameResult(
      cdc.filter(col("_change_type") === "delete")
        .drop("_change_type", "_commit_snapshot_id", "_change_ordinal"),
      src.filter(col("o_orderstatus").isin("O", "F") && col("o_orderpriority") === "5-LOW"))

    // Bounded CDC: only the append lands in (s1, s2].
    val mid = spark.read.format("graft").option("changelog", "true")
      .option("start-snapshot-id", s1.toString)
      .option("end-snapshot-id", s2.toString).load(path)
    assertSameResult(mid.drop("_change_type", "_commit_snapshot_id", "_change_ordinal"), fin)

    // Incremental (appends-only) read: no CDC columns, just the new rows.
    val inc = spark.read.format("graft")
      .option("start-snapshot-id", s1.toString)
      .option("end-snapshot-id", s2.toString).load(path)
    assert(!inc.columns.contains("_change_type"))
    assertSameResult(inc, fin)

    // Range and point-in-time options contradict each other.
    intercept[Exception](spark.read.format("graft")
      .option("changelog", "true").option("snapshot-id", s1.toString).load(path))
  }

  test("SQL surface: <table>.changes and partition-evolution procedures") {
    val wh = tmpDir("graft_cdc_wh")
    spark.conf.set("spark.sql.catalog.cdcat", classOf[graft.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdcat.warehouse", wh)
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus") === "O")
    val path = s"$wh/db/orders_c"
    IcebergTable.write(src, path)
    IcebergTable.delete(spark, path, "o_orderpriority = '5-LOW'")

    val ch = spark.sql("SELECT * FROM cdcat.db.orders_c.changes")
    assert(ch.filter(col("_change_type") === "insert").count() == src.count())
    assert(ch.filter(col("_change_type") === "delete").count()
      == src.filter(col("o_orderpriority") === "5-LOW").count())

    // ADD PARTITION FIELD month(o_orderdate) via CALL; the next append
    // writes month-partitioned files under the new spec.
    val add = spark.sql(
      "CALL cdcat.system.add_partition_field(table => 'db.orders_c', " +
        "column => 'o_orderdate', transform => 'month')").collect()(0)
    assert(add.getInt(0) == 1 && add.getString(1) == "o_orderdate_month")
    IcebergTable.append(src.limit(100), path)
    val specs = IcebergTable.plan(spark, path).dataFiles.map(_.specId).distinct.sorted
    assert(specs == Seq(0, 1), s"expected files under both specs, got $specs")

    val drop = spark.sql(
      "CALL cdcat.system.drop_partition_field(table => 'db.orders_c', " +
        "name => 'o_orderdate_month')").collect()(0)
    assert(drop.getInt(0) == 2 && drop.getString(1) == "")
  }

  test("create_changelog_view pairs delete+insert into update pre/post images") {
    val wh = tmpDir("graft_clv_wh")
    spark.conf.set("spark.sql.catalog.clvcat", classOf[graft.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.clvcat.warehouse", wh)
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus") === "O")
    val path = s"$wh/db/orders_u"
    IcebergTable.write(src, path); val s1 = headId(path)
    IcebergTable.update(spark, path, "o_orderpriority = '5-LOW'",
      Map("o_totalprice" -> "o_totalprice + 1"))

    // Without identifier columns: raw delete+insert rows.
    spark.sql("CALL clvcat.system.create_changelog_view(table => 'db.orders_u', " +
      s"start_snapshot_id => $s1)")
    val raw = spark.sql("SELECT _change_type, count(*) AS n FROM orders_u_changes GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val touched = src.filter(col("o_orderpriority") === "5-LOW").count()
    assert(raw == Map("insert" -> touched, "delete" -> touched), s"got $raw")

    // With identifier columns: the same rows, relabelled as an update pair.
    spark.sql("CALL clvcat.system.create_changelog_view(table => 'db.orders_u', " +
      s"changelog_view => 'orders_u_cdc', identifier_columns => 'o_orderkey', " +
      s"start_snapshot_id => $s1)")
    val upd = spark.sql("SELECT _change_type, count(*) AS n FROM orders_u_cdc GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(upd == Map("update_preimage" -> touched, "update_postimage" -> touched), s"got $upd")
    // Post-image prices are exactly pre-image + 1, per key.
    val delta = spark.sql(
      """SELECT count(*) AS n FROM orders_u_cdc pre JOIN orders_u_cdc post
        |  ON pre.o_orderkey = post.o_orderkey
        | WHERE pre._change_type = 'update_preimage'
        |   AND post._change_type = 'update_postimage'
        |   AND abs(post.o_totalprice - pre.o_totalprice - 1) < 1e-6""".stripMargin)
      .head.getLong(0)
    assert(delta == touched, s"expected $touched matched update pairs, got $delta")

    // Full-history view: initial inserts stay plain inserts (no delete to
    // pair with in ordinal 0), update pair appears in ordinal 1.
    spark.sql("CALL clvcat.system.create_changelog_view(table => 'db.orders_u', " +
      "changelog_view => 'orders_u_all', identifier_columns => 'o_orderkey')")
    val all = spark.sql("SELECT _change_type, count(*) AS n FROM orders_u_all GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("insert" -> src.count(),
      "update_preimage" -> touched, "update_postimage" -> touched), s"got $all")
  }

  test("changesBetween plans each snapshot once, not twice (manifest-read probe)") {
    import graft.manifest.ManifestIO
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_cdc_memo")
    IcebergTable.write(src, path)
    (1 to 5).foreach(_ => IcebergTable.append(src, path))
    val head = headId(path)
    val meta = TableMetadata.load(path, hconf)
    val chainIds = meta.snapshots.map(_.snapshotId)

    // Baseline: manifest reads to plan every snapshot in the chain exactly
    // once — the information-theoretic floor for a full-history changelog.
    val before = ManifestIO.manifestReads.get()
    chainIds.foreach(id => IcebergTable.plan(spark, path,
      graft.read.ReadOptions(snapshotId = Some(id))))
    val baseline = ManifestIO.manifestReads.get() - before

    val t0 = ManifestIO.manifestReads.get()
    Streams.changesBetween(spark, path, None, head).count()
    val used = ManifestIO.manifestReads.get() - t0
    // Unmemoized walking reads ~2x baseline (each commit plans s AND s-1);
    // the single-entry memo must keep it at the floor.
    assert(used <= baseline,
      s"changelog read $used manifests for a chain whose one-pass floor is $baseline " +
        "— adjacent-plan memoization regressed")
  }

  test("changelog sees v3 deletion-vector and equality deletes") {
    val src = spark.read.parquet(s"$sfDir/customer.parquet")
    val path = tmpDir("graft_cdc_v3")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3))
    val s1 = headId(path)
    // v3 DELETE writes deletion vectors.
    IcebergTable.delete(spark, path, "c_custkey % 10 = 0"); val s2 = headId(path)
    // Equality delete on a key column.
    import spark.implicits._
    val keys = src.filter(col("c_custkey") % 7 === 1).select("c_custkey")
    IcebergTable.deleteEquality(spark, path, keys); val s3 = headId(path)

    val ch = Streams.changesBetween(spark, path, Some(s1), s3)
    val dels = ch.filter(col("_change_type") === "delete")
    assert(ch.count() == dels.count(), "only deletes in this range")
    val expected2 = src.filter(col("c_custkey") % 10 === 0)
    val expected3 = src.filter(col("c_custkey") % 7 === 1 && col("c_custkey") % 10 =!= 0)
    assertSameResult(
      dels.filter(col("_commit_snapshot_id") === s2)
        .drop("_change_type", "_commit_snapshot_id", "_change_ordinal"), expected2)
    assertSameResult(
      dels.filter(col("_commit_snapshot_id") === s3)
        .drop("_change_type", "_commit_snapshot_id", "_change_ordinal"), expected3)
  }
}
