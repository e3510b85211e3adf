package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("graft")` micro-batch source: snapshot-cursor offsets,
  * incremental batches across appends, exactly-once file delivery via the
  * checkpointed offset log. */
class StreamingSourceSpec extends SparkSpec {

  test("micro-batch source processes two appends incrementally") {
    val dir = tmpDir("graft_stream_tbl")
    val out = tmpDir("graft_stream_out")
    val ckpt = tmpDir("graft_stream_ckpt")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch1 = orders.filter(col("o_orderkey") % 2 === 0)
    val batch2 = orders.filter(col("o_orderkey") % 2 =!= 0)
    IcebergTable.write(batch1, dir)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.Once()).start()
      q.awaitTermination()
    }

    runOnce()
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.count() == batch1.count())

    IcebergTable.append(batch2, dir)
    runOnce()
    val afterSecond = spark.read.parquet(out)
    // second run delivered ONLY the appended files — no re-read of batch1
    assert(afterSecond.count() == batch1.count() + batch2.count())
    assertSameResult(afterSecond.select("o_orderkey"), orders.select("o_orderkey"))

    // a third run with no new snapshot delivers nothing
    runOnce()
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("maxFilesPerTrigger: capped cursor admits whole snapshots within the file budget") {
    import spark.implicits._
    val dir = tmpDir("graft_stream_capped")
    // 5 snapshots x 2 files = 10 files.
    def batch(tag: Int) = (1 to 10).map(i => (tag * 100 + i, s"v$tag")).toDF("id", "v").repartition(2)
    IcebergTable.write(batch(0), dir)
    (1 to 4).foreach(t => IcebergTable.append(batch(t), dir))

    val meta = graft.core.TableMetadata.load(dir, spark.sessionState.newHadoopConf())
    val chain = meta.snapshots.map(_.snapshotId)
    assert(chain.size == 5)
    assert(meta.snapshots.forall(_.summary.get("added-data-files").contains("2")))

    // cap 4 = 2 snapshots per step: None -> s2 -> s4 -> s5 (head) -> s5.
    val s = graft.streaming.Streams
    assert(s.cappedCursor(spark, dir, None, 4).map(_._1).contains(chain(1)))
    assert(s.cappedCursor(spark, dir, Some(chain(1)), 4).map(_._1).contains(chain(3)))
    assert(s.cappedCursor(spark, dir, Some(chain(3)), 4).map(_._1).contains(chain(4)))
    // caught up: head reported unchanged -> engine sees no new batch
    assert(s.cappedCursor(spark, dir, Some(chain(4)), 4).map(_._1).contains(chain(4)))
    // cap smaller than one snapshot still admits one (progress guarantee)
    assert(s.cappedCursor(spark, dir, None, 1).map(_._1).contains(chain(0)))

    // End-to-end: with the option, the backlog drains over 3 bounded
    // batches instead of one 10-file batch; the graft table sink makes the
    // batch boundary observable as one APPEND snapshot per micro-batch.
    val tmp = tmpDir("graft_stream_capped_run")
    val dst = s"$tmp/dst"
    graft.write.IcebergWrite.createTable(spark, dst,
      spark.read.format("graft").load(dir).schema)
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "4").load(dir)
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.ProcessingTime(0L)).start()
    val deadline = System.currentTimeMillis() + 120000
    def dstCount() =
      try IcebergTable.load(spark, dst).count() catch { case _: Exception => 0L }
    while (dstCount() < 50 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop(); q.awaitTermination()
    assert(dstCount() == 50, s"expected all 50 rows, got ${dstCount()}")
    val dstMeta = graft.core.TableMetadata.load(dst, spark.sessionState.newHadoopConf())
    val appends = dstMeta.snapshots.filter(_.summary.get("added-records").exists(_ != "0"))
    assert(appends.size == 3,
      s"cap 4 over 10 files should make 3 micro-batches, made ${appends.size}: " +
        dstMeta.snapshots.map(_.summary.get("added-records")).mkString(","))
  }

  test("Trigger.AvailableNow + maxFilesPerTrigger: backlog drains in bounded batches " +
      "to the query-start offset, then the query terminates (DSv2 admission-control contract)") {
    import spark.implicits._
    val dir = tmpDir("graft_stream_availnow")
    def batch(tag: Int) = (1 to 10).map(i => (tag * 100 + i, s"v$tag")).toDF("id", "v").repartition(2)
    IcebergTable.write(batch(0), dir)
    (1 to 4).foreach(t => IcebergTable.append(batch(t), dir))

    val tmp = tmpDir("graft_stream_availnow_run")
    val dst = s"$tmp/dst"
    graft.write.IcebergWrite.createTable(spark, dst,
      spark.read.format("graft").load(dir).schema)
    // AvailableNow: the source fixes its target at query start, drains the
    // 10-file backlog over cap-bounded batches, and the query STOPS on its
    // own — no manual stop, the public SupportsTriggerAvailableNow path.
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "4").load(dir)
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(IcebergTable.load(spark, dst).count() == 50)
    val dstMeta = graft.core.TableMetadata.load(dst, spark.sessionState.newHadoopConf())
    val appends = dstMeta.snapshots.filter(_.summary.get("added-records").exists(_ != "0"))
    assert(appends.size == 3,
      s"cap 4 over 10 files should drain in 3 bounded batches, made ${appends.size}")
  }

  test("offset json roundtrip") {
    val o = graft.sources.GraftStreamOffset(123456789L, 7L)
    assert(graft.sources.GraftStreamOffset.fromJson(o.json()) == o)
  }

  test("streaming sink: table-to-table incremental pipeline commits APPEND snapshots") {
    val src = tmpDir("graft_sink_src")
    val dst = tmpDir("graft_sink_dst")
    val ckpt = tmpDir("graft_sink_ckpt")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch1 = orders.filter(col("o_orderkey") % 2 === 0)
    val batch2 = orders.filter(col("o_orderkey") % 2 =!= 0)
    IcebergTable.write(batch1, src)
    // Sink target must pre-exist (like INSERT INTO); create it empty.
    graft.write.IcebergWrite.createTable(spark, dst, orders.schema)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(Trigger.Once()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(IcebergTable.load(spark, dst).count() == batch1.count())

    IcebergTable.append(batch2, src)
    runOnce()
    val after = IcebergTable.load(spark, dst)
    assert(after.count() == orders.count()) // increment only — no re-delivery
    assertSameResult(after.select("o_orderkey"), orders.select("o_orderkey"))

    // Each delivered batch is one APPEND snapshot stamped with the
    // exactly-once watermark (queryId + epochId).
    val meta = graft.core.TableMetadata.load(dst, spark.sessionState.newHadoopConf())
    val streamSnaps = meta.snapshots.filter(_.summary.contains("spark.sql.streaming.epochId"))
    assert(streamSnaps.size == 2)
    assert(streamSnaps.forall(_.summary.get("operation").contains("append")))
  }

  test("streaming sink: replayed batch id is skipped (exactly-once)") {
    val dst = tmpDir("graft_sink_replay")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").limit(100)
    graft.write.IcebergWrite.createTable(spark, dst, orders.schema)
    val sink = new graft.sources.GraftStreamSink(spark, dst)
    // Simulate the post-recovery replay: same batch id delivered twice.
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "test-query-1")
    try {
      sink.addBatch(0, orders)
      sink.addBatch(0, orders) // replay — must be a no-op
      sink.addBatch(1, orders) // next batch — must commit
    } finally spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    assert(IcebergTable.load(spark, dst).count() == 200)
    val meta = graft.core.TableMetadata.load(dst, spark.sessionState.newHadoopConf())
    assert(meta.snapshots.count(_.summary.contains("spark.sql.streaming.epochId")) == 2)
    // A different query's batch 0 is NOT deduped against ours.
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "test-query-2")
    try sink.addBatch(0, orders)
    finally spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    assert(IcebergTable.load(spark, dst).count() == 300)
  }
}
