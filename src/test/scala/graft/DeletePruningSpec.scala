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

  test("float eq-delete: NaN-free keys prune on bounds; NaN keys block pruning (test_equality_delete_float_data_file_pruning)") {
    import spark.implicits._
    // Non-NaN float delete key disjoint from data bounds: pruned, never read.
    val path = tmpDir("graft_eqprune_float")
    IcebergTable.write((0 until 10).map(_.toFloat).toDF("value").coalesce(1), path)
    IcebergTable.deleteEquality(spark, path, Seq(50.0f).toDF("value"))
    val p = IcebergTable.plan(spark, path)
    val del = p.deleteFiles.find(_.info.content == graft.manifest.FileContent.EqualityDeletes).get
    assert(del.info.nanValueCounts.get(del.info.equalityIds.head).contains(0L),
      "NaN-free float eq-delete must record nan_value_count = 0 for pruning to engage")
    val t0 = IcebergRead.deleteFileReads.get()
    assert(IcebergTable.load(spark, path).count() == 10)
    assert(IcebergRead.deleteFileReads.get() - t0 == 0,
      "float eq-delete with disjoint bounds should be pruned")

    // A NaN delete key sits outside Iceberg bounds: pruning must stay off
    // and the NaN row must actually be deleted (null-safe join semantics
    // don't cover NaN; Spark's = matches NaN = NaN like Iceberg eq-deletes).
    val path2 = tmpDir("graft_eqprune_nan")
    IcebergTable.write(Seq(0.0f, 1.0f, Float.NaN).toDF("value").coalesce(1), path2)
    IcebergTable.deleteEquality(spark, path2, Seq(50.0f, Float.NaN).toDF("value"))
    val p2 = IcebergTable.plan(spark, path2)
    val del2 = p2.deleteFiles.find(_.info.content == graft.manifest.FileContent.EqualityDeletes).get
    assert(!del2.info.nanValueCounts.get(del2.info.equalityIds.head).contains(0L),
      "a NaN-containing key set must NOT record a zero NaN count")
    val t1 = IcebergRead.deleteFileReads.get()
    val got = IcebergTable.load(spark, path2).collect().map(_.getFloat(0)).sorted.toSeq
    assert(got == Seq(0.0f, 1.0f), s"NaN row must be equality-deleted, got $got")
    assert(IcebergRead.deleteFileReads.get() - t1 >= 1,
      "NaN delete keys must force the delete file to be read")
  }

  test("DELETE with pure-equality predicates routes to equality-delete writes when enabled (test_equality_delete_in_and_or)") {
    import spark.implicits._
    import graft.manifest.FileContent
    val path = tmpDir("graft_eqroute")
    IcebergTable.write((0 until 1000).map(i => (i.toLong, (i % 50).toLong))
      .toDF("a", "b").coalesce(1), path)
    def eqDeletes() = IcebergTable.plan(spark, path).deleteFiles
      .filter(_.info.content == FileContent.EqualityDeletes)
    def posDeletes() = IcebergTable.plan(spark, path).deleteFiles
      .filter(_.info.content == FileContent.PositionDeletes)

    spark.conf.set(graft.write.Dml.EnableEqualityDeleteWrites, "true")
    try {
      // Single-column IN: one equality-delete file, one row per IN value.
      IcebergTable.delete(spark, path, "a IN (1, 5, 7, 9)")
      assert(eqDeletes().map(_.info.recordCount).sum == 4 && posDeletes().isEmpty,
        s"IN-delete must write one 4-row equality delete, got eq=${eqDeletes().size} pos=${posDeletes().size}")
      assert(IcebergTable.load(spark, path).count() == 996)

      // OR-of-equals on one column: equality path too.
      IcebergTable.delete(spark, path, "a = 100 OR a = 200 OR a = 300")
      assert(eqDeletes().map(_.info.recordCount).sum == 7 && posDeletes().isEmpty)
      assert(IcebergTable.load(spark, path).count() == 993)

      // AND across two columns: ONE delete row keyed on both field ids.
      IcebergTable.delete(spark, path, "a = 450 AND b = 0")
      val multi = eqDeletes().filter(_.info.equalityIds.size == 2)
      assert(multi.nonEmpty && multi.map(_.info.recordCount).sum == 1,
        s"AND-of-equals must write a 1-row two-column equality delete")
      assert(IcebergTable.load(spark, path).count() == 992)

      // A range predicate disqualifies: falls back to positional deletes.
      IcebergTable.delete(spark, path, "a >= 990")
      assert(posDeletes().nonEmpty, "range DELETE must fall back to positional deletes")
      assert(IcebergTable.load(spark, path).count() == 982)
    } finally spark.conf.unset(graft.write.Dml.EnableEqualityDeleteWrites)

    // Gate off (default): even a pure-equality DELETE writes positional.
    val path2 = tmpDir("graft_eqroute_off")
    IcebergTable.write((0 until 10).map(i => (i.toLong, i.toLong)).toDF("a", "b").coalesce(1), path2)
    IcebergTable.delete(spark, path2, "a IN (1, 2)")
    val dels2 = IcebergTable.plan(spark, path2).deleteFiles
    assert(dels2.forall(_.info.content == FileContent.PositionDeletes),
      "with the gate off, IN-deletes must stay positional")
    assert(IcebergTable.load(spark, path2).count() == 8)
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
