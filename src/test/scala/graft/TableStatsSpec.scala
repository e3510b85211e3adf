package graft

import graft.core._
import graft.write.TableWriteOptions
import org.apache.spark.sql.functions._

/** Table-statistics (ANALYZE) roundtrip + CBO column-statistics surface:
  * compute_table_stats writes a Puffin NDV file and registers it in the
  * `statistics` metadata field; GraftScan then reports column statistics
  * (NDV / null count / min / max from manifests) that Catalyst attaches to
  * the scan relation when CBO is enabled. */
class TableStatsSpec extends SparkSpec {

  private def ordersTable(): String = {
    val path = tmpDir("graft_stats_orders")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    IcebergTable.write(orders, path)
    path
  }

  test("compute_table_stats writes a statistics file and registers exact small-cardinality NDV") {
    val path = ordersTable()
    val r = IcebergTable.computeTableStats(spark, path)
    assert(r.ndv.nonEmpty)

    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    assert(meta.statistics.size == 1)
    val sf = meta.statistics.head
    assert(sf.snapshotId == meta.currentSnapshot.get.snapshotId)
    val fsys = TableMetadata.fs(sf.path, conf)
    val st = fsys.getFileStatus(new org.apache.hadoop.fs.Path(sf.path))
    assert(st.getLen == sf.fileSizeInBytes,
      s"recorded file size ${sf.fileSizeInBytes} != actual ${st.getLen}")

    // Small cardinalities are HLL-exact: compare to exact distinct counts.
    val schema = meta.currentSchema
    val ndvById = meta.ndvFor(sf.snapshotId)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    for (c <- Seq("o_orderstatus", "o_orderpriority")) {
      val exact = orders.select(countDistinct(col(c))).collect()(0).getLong(0)
      val fid = schema.fields.find(_.name == c).get.id
      assert(ndvById.get(fid).contains(exact), s"$c: ndv ${ndvById.get(fid)} != exact $exact")
    }

    // Re-analyzing the same snapshot replaces, not appends.
    IcebergTable.computeTableStats(spark, path)
    assert(TableMetadata.load(path, conf).statistics.size == 1)
  }

  test("CBO sees NDV, null count, and min/max through the scan's column statistics") {
    val path = tmpDir("graft_stats_cbo")
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10, Some(1.5)),
      (2L, "b", 20, None),
      (3L, "a", 30, Some(2.5)),
      (4L, "c", 40, Some(9.0))
    ).toDF("id", "cat", "qty", "score")
    IcebergTable.write(df, path)
    IcebergTable.computeTableStats(spark, path)

    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val scanned = spark.read.format("graft").load(path)
      val stats = scanned.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(4)))
      val byName = stats.attributeStats.map { case (attr, cs) => attr.name -> cs }
      val idStats = byName("id")
      assert(idStats.distinctCount.contains(BigInt(4)))
      assert(idStats.min.contains(1L) && idStats.max.contains(4L))
      assert(idStats.nullCount.contains(BigInt(0)))
      val catStats = byName("cat")
      assert(catStats.distinctCount.contains(BigInt(3)))
      val scoreStats = byName("score")
      assert(scoreStats.nullCount.contains(BigInt(1)))
      assert(scoreStats.min.contains(1.5) && scoreStats.max.contains(9.0))

      // Post-pruning: a partition/stats filter narrows the advertised range.
      val filtered = spark.read.format("graft").load(path).where($"id" >= 3L)
      val fStats = filtered.queryExecution.optimizedPlan.collectLeaves().head.stats
      val fByName = fStats.attributeStats.map { case (a, cs) => a.name -> cs }
      // Single-file table: bounds stay table-wide; the assertion here is
      // only that stats still surface under a pushed filter.
      assert(fByName.contains("id"))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("NDV-driven selectivity flips a filtered join to broadcast under CBO") {
    // The 100 TB posture this feature exists for: an equality filter on a
    // low-NDV column shrinks the ESTIMATED size of the dimension side by
    // 1/ndv, electing a broadcast join at plan time. Without column stats
    // the filter keeps the full relation size and the join shuffles.
    val dimPath = tmpDir("graft_cbo_dim")
    val factPath = tmpDir("graft_cbo_fact")
    import spark.implicits._
    // 200 categories over 40k rows; category is a string so the ONLY
    // stats signal an equality filter can use is the NDV from the
    // statistics file (graft reports no string min/max).
    val dim = spark.range(40000).select(
      $"id", concat(lit("cat_"), ($"id" % 200).cast("string")).as("cat"),
      concat(lit("payload-"), $"id".cast("string"), lit("-XXXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX")).as("pad"))
    IcebergTable.write(dim.toDF(), dimPath)
    IcebergTable.computeTableStats(spark, dimPath)
    val fact = spark.range(200000).select($"id", ($"id" % 40000).as("dim_id"))
    IcebergTable.write(fact.toDF(), factPath)

    val dimBytes = graft.core.TableMetadata.load(dimPath, spark.sessionState.newHadoopConf())
      .currentSnapshot.get.summary.get("total-files-size").map(_.toLong)
      .getOrElse(1000000L)
    def joinPlan(cbo: Boolean): String = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      // Threshold between full dim size and dim/200: only the NDV-scaled
      // estimate clears it.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (dimBytes / 4).toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val d = spark.read.format("graft").load(dimPath).where($"cat" === "cat_7")
        val f = spark.read.format("graft").load(factPath)
        f.join(d, f("dim_id") === d("id")).groupBy(d("cat")).count()
          .queryExecution.executedPlan.toString
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
    val withCbo = joinPlan(cbo = true)
    val withoutCbo = joinPlan(cbo = false)
    assert(withCbo.contains("BroadcastHashJoin"),
      s"CBO + NDV stats should broadcast the filtered dim side:\n$withCbo")
    assert(!withoutCbo.contains("BroadcastHashJoin"),
      s"without CBO the full-size estimate must not broadcast:\n$withoutCbo")
  }

  test("expire_snapshots drops statistics entries and files with their snapshot") {
    val path = tmpDir("graft_stats_expire")
    import spark.implicits._
    IcebergTable.write(Seq((1, "x")).toDF("id", "v"), path)
    IcebergTable.computeTableStats(spark, path)
    val conf = spark.sessionState.newHadoopConf()
    val statsPath = TableMetadata.load(path, conf).statistics.head.path

    // Second snapshot (append) makes the first expirable.
    IcebergTable.append(Seq((2, "y")).toDF("id", "v"), path)
    val r = IcebergTable.expireSnapshots(spark, path, olderThanMs = None, retainLast = 1)
    assert(r.expiredSnapshots == 1)
    val after = TableMetadata.load(path, conf)
    assert(after.statistics.isEmpty)
    val fsys = TableMetadata.fs(statsPath, conf)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(statsPath)), "stats puffin not deleted")
  }

  test("DSv2 scan-plan cache: same metadata version re-plans zero manifests; a commit invalidates") {
    val path = tmpDir("graft_plan_cache")
    import spark.implicits._
    IcebergTable.write((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"), path)

    def manifestReads[A](f: => A): Long = {
      val before = graft.manifest.ManifestIO.manifestReads.get()
      f
      graft.manifest.ManifestIO.manifestReads.get() - before
    }
    val first = manifestReads(spark.read.format("graft").load(path).count())
    assert(first > 0, "first read must plan manifests")
    // Second scan — and a self-join, which materializes several scan
    // instances — reuse the cached plan: zero manifest IO.
    assert(manifestReads(spark.read.format("graft").load(path).count()) == 0)
    val d = spark.read.format("graft").load(path)
    assert(manifestReads(d.as("a").join(d.as("b"), "id").count()) == 0)

    // A commit publishes the next metadata version -> cache key changes.
    IcebergTable.append(Seq((101, "x")).toDF("id", "v"), path)
    val fresh = spark.read.format("graft").load(path)
    assert(manifestReads(fresh.count()) > 0, "post-commit read must re-plan")
    assert(fresh.count() == 101)
  }

  test("DSv2 scan-plan cache: DROP + re-CREATE at the same location is not served the stale plan") {
    // Path-table metadata files have deterministic NAMES (v1.metadata.json),
    // so a dropped-and-recreated table reproduces the old cache key's path;
    // the file's (length, mtime) freshness token must still invalidate —
    // serving the old plan would silently read the deleted table's files.
    val path = tmpDir("graft_plan_cache_recreate")
    import spark.implicits._
    IcebergTable.write((1 to 50).map(i => (i, "old")).toDF("id", "v"), path)
    assert(spark.read.format("graft").load(path).count() == 50) // populate cache

    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, true)
    IcebergTable.write((1 to 7).map(i => (i, "new")).toDF("id", "v"), path)

    val again = spark.read.format("graft").load(path)
    assert(again.count() == 7, "recreated table served the dropped table's cached plan")
    assert(again.where($"v" === "new").count() == 7)
  }

  test("compute_partition_stats writes a spec-schema file aggregated from manifests") {
    val path = tmpDir("graft_pstats")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    IcebergTable.write(orders, path, TableWriteOptions(
      partitionBy = Seq(("o_orderstatus", graft.core.Transforms.Identity))))
    // MoR delete in one partition exercises the delete-count columns.
    IcebergTable.delete(spark, path, "o_orderstatus = 'F' AND o_orderkey % 2 = 0")

    val r = IcebergTable.computePartitionStats(spark, path)
    val conf = spark.sessionState.newHadoopConf()
    val after = TableMetadata.load(path, conf)
    assert(after.partitionStatistics.size == 1)
    assert(after.partitionStatistics.head.path == r.statisticsPath)

    val stats = spark.read.parquet(r.statisticsPath)
    assert(stats.columns.toSeq == Seq("partition", "spec_id", "data_record_count",
      "data_file_count", "total_data_file_size_in_bytes", "position_delete_record_count",
      "position_delete_file_count", "equality_delete_record_count",
      "equality_delete_file_count", "total_record_count"))
    // Per-partition data_record_count matches the source GROUP BY.
    val got = stats.selectExpr("partition.o_orderstatus AS s", "data_record_count")
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    val exp = orders.groupBy("o_orderstatus").count()
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(got == exp, s"partition record counts $got != $exp")
    // The deleted partition reports its position-delete rows; post-delete
    // total_record_count reconciles with an actual read.
    val fRow = stats.filter(org.apache.spark.sql.functions.expr("partition.o_orderstatus = 'F'"))
      .selectExpr("position_delete_record_count", "total_record_count").collect()(0)
    assert(fRow.getLong(0) > 0)
    val fLive = IcebergTable.load(spark, path).filter("o_orderstatus = 'F'").count()
    assert(fRow.getLong(1) == fLive, s"total_record_count ${fRow.getLong(1)} != live $fLive")
  }

  test("NDV statistics survive a column rename (field-id keyed, not name keyed)") {
    val path = tmpDir("graft_stats_rename")
    import spark.implicits._
    IcebergTable.write(Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "cat"), path)
    IcebergTable.computeTableStats(spark, path)
    IcebergTable.renameColumn(spark, path, "cat", "category")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("graft").load(path)
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
      assert(byName("category").distinctCount.contains(BigInt(2)),
        s"renamed column should keep its NDV: ${byName.get("category")}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("statistics field round-trips through metadata JSON") {
    val sf = StatisticsFile(42L, "/t/metadata/42-x.stats", 100L, 30L,
      Seq(BlobMetadata("graft-ndv-v1", 42L, 7L, Seq(3), Map("ndv" -> "19"))))
    val meta = TableMetadata.parse(
      """{"format-version":2,"table-uuid":"u","location":"/t","last-column-id":1,
        |"current-schema-id":0,"schemas":[{"schema-id":0,"type":"struct","fields":[
        |{"id":1,"name":"a","required":false,"type":"int"}]}],
        |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}]}""".stripMargin)
      .copy(statistics = Seq(sf), partitionStatistics = Seq(PartitionStatisticsFile(42L, "/t/metadata/ps.parquet", 9L)))
    val back = TableMetadata.parse(TableMetadata.toJson(meta))
    assert(back.statistics == Seq(sf))
    assert(back.partitionStatistics == meta.partitionStatistics)
    assert(back.ndvFor(42L) == Map(3 -> 19L))
    assert(back.ndvFor(41L).isEmpty)
  }
}
