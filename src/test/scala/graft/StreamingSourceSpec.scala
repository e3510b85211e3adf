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
}
