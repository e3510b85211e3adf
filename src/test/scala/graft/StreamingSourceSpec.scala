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
