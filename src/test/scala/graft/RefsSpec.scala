package graft

import graft.core.TableMetadata
import graft.read.ReadOptions
import org.apache.spark.sql.functions.col

/** Branches, tags, snapshot pointers, and write-audit-publish
  * (graft.write.Refs + branch-targeted appends). */
class RefsSpec extends SparkSpec {

  private def hconf = spark.sessionState.newHadoopConf()

  test("tags survive reload and pin a snapshot; refs/history metadata tables") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_refs_tag")
    IcebergTable.write(src, path)
    IcebergTable.createTag(spark, path, "v1")
    IcebergTable.append(src, path)

    // The tag still reads the one-copy state; a reload round-trips its type.
    assertSameResult(IcebergTable.load(spark, path, ReadOptions(refName = Some("v1"))), src)
    val meta = TableMetadata.load(path, hconf)
    assert(!meta.refs("v1").isBranch)
    assert(meta.refs("main").isBranch)

    val refs = IcebergTable.refs(spark, path).collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(refs == Map("main" -> "BRANCH", "v1" -> "TAG"))
    val hist = IcebergTable.history(spark, path).collect()
    assert(hist.length == 2 && hist.forall(_.getBoolean(3)), "both snapshots are current ancestors")

    // Unknown ref fails cleanly; duplicate create without replace fails.
    intercept[Exception](IcebergTable.load(spark, path, ReadOptions(refName = Some("nope"))).count())
    intercept[Exception](IcebergTable.createTag(spark, path, "v1"))
    IcebergTable.createTag(spark, path, "v1", replace = true) // moves to current
    assertSameResult(IcebergTable.load(spark, path, ReadOptions(refName = Some("v1"))),
      src.union(src))
  }

  test("write-audit-publish: branch append isolates main, fast_forward publishes") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val open = src.filter(col("o_orderstatus") === "O")
    val fin = src.filter(col("o_orderstatus") === "F")
    val path = tmpDir("graft_refs_wap")
    IcebergTable.write(open, path)
    IcebergTable.createBranch(spark, path, "audit")
    IcebergTable.appendToBranch(fin, path, "audit")

    // Main is untouched; the branch sees both; snapshot-log has no branch entry.
    assertSameResult(IcebergTable.load(spark, path), open)
    assertSameResult(IcebergTable.load(spark, path, ReadOptions(refName = Some("audit"))),
      open.union(fin))
    val metaBefore = TableMetadata.load(path, hconf)
    assert(metaBefore.snapshotLog.size == 1, "branch commits don't enter main's snapshot-log")
    assert(metaBefore.snapshots.size == 2)
    // The branch snapshot's parent is the branch base (== main's head here).
    val branchSnap = metaBefore.snapshots.find(
      _.snapshotId == metaBefore.refs("audit").snapshotId).get
    assert(branchSnap.parentSnapshotId == metaBefore.currentSnapshotId)

    // Publish: fast-forward main onto the audited branch.
    IcebergTable.fastForward(spark, path, "main", "audit")
    assertSameResult(IcebergTable.load(spark, path), open.union(fin))
    val metaAfter = TableMetadata.load(path, hconf)
    assert(metaAfter.currentSnapshotId == metaAfter.refs.get("audit").map(_.snapshotId))

    // A diverged branch refuses to fast-forward.
    IcebergTable.createBranch(spark, path, "divergent",
      snapshotId = Some(metaBefore.snapshotLog.head._2))
    IcebergTable.appendToBranch(fin, path, "divergent")
    val e = intercept[Exception](IcebergTable.fastForward(spark, path, "main", "divergent"))
    assert(e.getMessage.contains("diverged"))

    // Appending to a tag is refused; to a missing branch is refused.
    IcebergTable.createTag(spark, path, "pin")
    intercept[Exception](IcebergTable.appendToBranch(fin, path, "pin"))
    intercept[Exception](IcebergTable.appendToBranch(fin, path, "ghost"))
  }

  test("rollback_to_snapshot restores an ancestor state; set_current_snapshot jumps anywhere") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_refs_rollback")
    IcebergTable.write(src, path)
    val first = TableMetadata.load(path, hconf).currentSnapshotId.get
    IcebergTable.append(src, path)
    val second = TableMetadata.load(path, hconf).currentSnapshotId.get

    IcebergTable.rollbackTo(spark, path, first)
    assertSameResult(IcebergTable.load(spark, path), src)
    // TIMESTAMP AS OF "now" resolves to the rolled-back state.
    assertSameResult(IcebergTable.load(spark, path,
      ReadOptions(asOfTimestampMs = Some(System.currentTimeMillis() + 1000))), src)
    // The rolled-past snapshot is orphaned in history but still addressable.
    val hist = IcebergTable.history(spark, path).collect()
      .map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(!hist(second), "rolled-past snapshot is no longer a current ancestor")
    assertSameResult(IcebergTable.load(spark, path, ReadOptions(snapshotId = Some(second))),
      src.union(src))

    // Rolling back to a NON-ancestor is refused; set_current_snapshot allows it.
    val e = intercept[Exception](IcebergTable.rollbackTo(spark, path, second))
    assert(e.getMessage.contains("not an ancestor"))
    IcebergTable.setCurrentSnapshot(spark, path, second)
    assertSameResult(IcebergTable.load(spark, path), src.union(src))
  }

  test("expire_snapshots retains ref targets and their files") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_refs_expire")
    IcebergTable.write(src.repartition(2), path)
    IcebergTable.createTag(spark, path, "keepme")
    IcebergTable.rewriteDataFiles(spark, path, rewriteAll = true)

    // retain_last=1 would normally expire the pre-compaction snapshot and
    // delete its files — the tag must protect both.
    val r = IcebergTable.expireSnapshots(spark, path, retainLast = 1)
    assert(r.expiredSnapshots == 0, "tagged snapshot cannot expire")
    assertSameResult(IcebergTable.load(spark, path, ReadOptions(refName = Some("keepme"))), src)

    // Drop the tag: now it expires and the compacted-away files go.
    IcebergTable.dropRef(spark, path, "keepme")
    val r2 = IcebergTable.expireSnapshots(spark, path, retainLast = 1)
    assert(r2.expiredSnapshots == 1 && r2.deletedDataFiles == 2)
    assertSameResult(IcebergTable.load(spark, path), src)
  }

  test("SQL: VERSION AS OF ref name, refs table, and the five ref procedures") {
    val wh = tmpDir("graft_refs_wh")
    spark.conf.set("spark.sql.catalog.refcat", classOf[graft.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.refcat.warehouse", wh)
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val open = src.filter(col("o_orderstatus") === "O")
    val fin = src.filter(col("o_orderstatus") === "F")
    val path = s"$wh/db/orders_r"
    IcebergTable.write(open, path)

    spark.sql("CALL refcat.system.create_ref(table => 'db.orders_r', name => 'audit')")
    IcebergTable.appendToBranch(fin, path, "audit")
    assertSameResult(
      spark.sql("SELECT * FROM refcat.db.orders_r VERSION AS OF 'audit'"), open.union(fin))
    assertSameResult(spark.sql("SELECT * FROM refcat.db.orders_r"), open)
    assert(spark.sql("SELECT * FROM refcat.db.orders_r.refs").count() == 2)

    val ff = spark.sql(
      "CALL refcat.system.fast_forward(table => 'db.orders_r', branch => 'main', to => 'audit')")
      .collect()(0)
    assert(ff.getString(0) == "main")
    assertSameResult(spark.sql("SELECT * FROM refcat.db.orders_r"), open.union(fin))

    val prev = spark.sql("SELECT * FROM refcat.db.orders_r.history").collect()
    // rollback through SQL to the first snapshot.
    val firstId = prev.minBy(_.getTimestamp(0).getTime).getLong(1)
    val rb = spark.sql(
      s"CALL refcat.system.rollback_to_snapshot(table => 'db.orders_r', snapshot_id => $firstId)")
      .collect()(0)
    assert(rb.getLong(1) == firstId)
    assertSameResult(spark.sql("SELECT * FROM refcat.db.orders_r"), open)
    // set_current_snapshot forward again, then drop the branch.
    val headId = rb.getLong(0)
    spark.sql(s"CALL refcat.system.set_current_snapshot(table => 'db.orders_r', snapshot_id => $headId)")
    assertSameResult(spark.sql("SELECT * FROM refcat.db.orders_r"), open.union(fin))
    spark.sql("CALL refcat.system.drop_ref(table => 'db.orders_r', name => 'audit')")
    assert(spark.sql("SELECT * FROM refcat.db.orders_r.refs").count() == 1)
  }
}
