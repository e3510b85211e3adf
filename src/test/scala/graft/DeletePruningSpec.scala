package graft

import graft.read.{IcebergRead, ReadOptions}
import graft.write.TableWriteOptions
import org.apache.spark.sql.functions._

/** Probe-counted delete-file pruning: delete files that cannot affect the
  * scanned rows must never be handed to a reader (reference
  * benchmark/file_pruning_benchmarks/prune_equality_deletes.benchmark and
  * prune_positional_deletes_from_unread_partitions.benchmark — the 365->1
  * shapes). `IcebergRead.deleteFileReads` counts delete-file opens the way
  * `ManifestIO.manifestReads` counts manifest opens. */
class DeletePruningSpec extends SparkSpec {

  test("equality-delete files disjoint from surviving data bounds are never opened (prune_equality_deletes.benchmark)") {
    import spark.implicits._
    val path = tmpDir("graft_eqprune")
    val lo = (0 until 1000).map(i => (i.toLong, s"e$i")).toDF("id", "event").coalesce(1)
    val hi = (1000 until 2000).map(i => (i.toLong, s"e$i")).toDF("id", "event").coalesce(1)
    IcebergTable.write(lo, path)
    IcebergTable.append(hi, path)
    IcebergTable.deleteEquality(spark, path,
      Seq(1L, 2L, 3L, 10L, 20L).toDF("id"))

    // Sanity: the unfiltered read opens the delete file and applies it.
    val before = IcebergRead.deleteFileReads.get()
    assert(IcebergTable.load(spark, path).count() == 1995)
    assert(IcebergRead.deleteFileReads.get() - before >= 1,
      "unfiltered read should have opened the equality-delete file")

    // id = 1500 stats-prunes the low data file; the delete file's id bounds
    // [1, 20] are disjoint from the surviving file's [1000, 1999], so the
    // delete is skipped before any reader touches it (reference
    // iceberg_file_pruner.cpp EqualityDeleteMatchesDataFile).
    val t0 = IcebergRead.deleteFileReads.get()
    val df = IcebergTable.load(spark, path, ReadOptions(filterSql = Some("id = 1500")))
    assert(df.count() == 1)
    assert(IcebergRead.deleteFileReads.get() - t0 == 0,
      "equality-delete file opened despite disjoint bounds")
    // ... and the plan carries no anti-join subtree at all.
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"),
      "pruned equality delete still left a join in the plan")

    // A filter that lands in the delete's range must still open it.
    val t1 = IcebergRead.deleteFileReads.get()
    val hit = IcebergTable.load(spark, path, ReadOptions(filterSql = Some("id = 10")))
    assert(hit.count() == 0, "id=10 was equality-deleted")
    assert(IcebergRead.deleteFileReads.get() - t1 >= 1)
  }

  test("equality-delete stats pruning requires a known-zero null count (reference guard)") {
    import spark.implicits._
    // A delete whose key column contains NULLs can match NULL data values
    // regardless of bounds: bounds exclude NULLs, so pruning must not fire
    // unless null_value_counts is present and zero.
    val path = tmpDir("graft_eqprune_null")
    val data = Seq((Some(1000L), "keep"), (None: Option[Long], "nullrow"))
      .toDF("id", "event").coalesce(1)
    IcebergTable.write(data, path)
    IcebergTable.deleteEquality(spark, path, Seq(Option.empty[Long]).toDF("id"))
    // Delete file bounds on id: none or [null]; its null count is 1 != 0, so
    // the delete must be applied even though the surviving file's id bounds
    // don't intersect anything.
    val got = IcebergTable.load(spark, path).collect()
    assert(got.length == 1 && got.head.getString(1) == "keep",
      s"NULL-key equality delete must remove the NULL row, got ${got.mkString(",")}")
  }

  test("positional delete files of unread partitions are never opened (prune_positional_deletes_from_unread_partitions.benchmark)") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val path = tmpDir("graft_posprune")
    IcebergTable.write(src, path, TableWriteOptions(
      partitionBy = Seq(("o_orderstatus", graft.core.Transforms.Identity))))
    // Touches every partition -> one delete entry per data file.
    IcebergTable.delete(spark, path, "o_orderkey % 7 = 0")
    val all = IcebergTable.plan(spark, path)
    val delCount = all.deleteFiles.size
    assert(delCount >= 3, s"expected a delete file per partition, got $delCount")

    val kept = IcebergTable.plan(spark, path,
      ReadOptions(filterSql = Some("o_orderstatus = 'O'"))).deleteFiles.size
    assert(kept < delCount,
      s"partition filter should prune delete files: kept $kept of $delCount")

    val t0 = IcebergRead.deleteFileReads.get()
    val df = IcebergTable.load(spark, path, ReadOptions(filterSql = Some("o_orderstatus = 'O'")))
    val opened = IcebergRead.deleteFileReads.get() - t0
    assert(opened == kept,
      s"opened $opened delete files, planner kept $kept — opens must match the pruned plan")
    assertSameResult(
      src.filter("o_orderstatus = 'O' AND o_orderkey % 7 <> 0"), df)
  }
}
