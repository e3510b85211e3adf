package graft

import graft.read.ReadOptions
import graft.write.TableWriteOptions
import org.apache.spark.sql.functions._

/** v3 deletion-vector writes, equality-delete writes, and top-k scan-order
  * pruning. */
class DeleteFormatsSpec extends SparkSpec {

  test("v3 table DELETE writes Puffin deletion vectors; roundtrip read applies them") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val path = tmpDir("graft_dv_v3")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3))
    IcebergTable.delete(spark, path, "o_orderstatus = 'F'")
    val p = IcebergTable.plan(spark, path)
    assert(p.deleteFiles.nonEmpty)
    assert(p.deleteFiles.forall(_.info.contentOffset.isDefined), "expected DV entries with content offsets")
    assert(p.deleteFiles.forall(_.info.fileFormat == "puffin"))
    assert(p.deleteFiles.forall(_.info.referencedDataFile.isDefined))
    assertSameResult(src.filter("o_orderstatus <> 'F'"), IcebergTable.load(spark, path))
  }

  test("v2->v3 upgrade: null row ids before, retroactive file-position ids on first v3 write (test_upgrade_format_version_2_to_3.test)") {
    import spark.implicits._
    val path = tmpDir("graft_v2v3_upgrade")
    // v2 phase: 10 rows in one file, delete the even ids (positional deletes)
    val ten = (0 until 10).map(i => (i, s"row_$i")).toDF("id", "val").coalesce(1)
    IcebergTable.write(ten, path, TableWriteOptions(formatVersion = 2))
    IcebergTable.delete(spark, path, "id % 2 = 0")
    val v2Rows = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
    assert(v2Rows.map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 5, 7, 9))
    assert(v2Rows.forall(_.isNullAt(1)), "v2 rows must have NULL _row_id")

    // upgrade: metadata-only; row ids still NULL
    graft.write.Evolution.upgradeFormatVersion(spark, path, 3)
    val afterUpgrade = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
    assert(afterUpgrade.collect().forall(_.isNullAt(afterUpgrade.columns.indexOf("_row_id"))))

    // first v3 write retroactively assigns: surviving v2 rows get their file
    // positions (1,3,5,7,9); new rows continue from 10
    val five = (0 until 5).map(i => (10 + i, s"new_row_$i")).toDF("id", "val").coalesce(1)
    IcebergTable.append(five, path)
    val lineage = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
      .select("id", "_row_id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(lineage == Map(1 -> 1L, 3 -> 3L, 5 -> 5L, 7 -> 7L, 9 -> 9L,
      10 -> 10L, 11 -> 11L, 12 -> 12L, 13 -> 13L, 14 -> 14L), s"got $lineage")
    val meta = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    assert(meta.formatVersion == 3)
    assert(meta.nextRowId.contains(15L))

    // v3 DELETE by _row_id writes a deletion vector; v2 positional file remains
    IcebergTable.delete(spark, path, "_row_id IN (10, 13)")
    val after = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
    assert(after.select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 3, 5, 7, 9, 11, 12, 14))
  }

  test("repeated v3 DELETEs keep exactly one live DV per data file") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val path = tmpDir("graft_dv_merge")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3))
    IcebergTable.delete(spark, path, "o_orderstatus = 'F'")
    IcebergTable.delete(spark, path, "o_orderstatus = 'P'")
    val p = IcebergTable.plan(spark, path)
    val dvsByRef = p.deleteFiles.filter(_.info.contentOffset.isDefined)
      .groupBy(_.info.referencedDataFile.get)
    assert(dvsByRef.nonEmpty)
    dvsByRef.foreach { case (ref, dvs) =>
      assert(dvs.size == 1, s"expected one live DV for $ref, got ${dvs.size}")
    }
    // The surviving DV is the union of both deletes (old bitmap OR-ed in).
    assertSameResult(src.filter("o_orderstatus NOT IN ('F', 'P')"), IcebergTable.load(spark, path))
  }

  test("v3 UPDATE and MERGE write deletion vectors, never position-delete parquet") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_dv_update")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3))
    IcebergTable.update(spark, path, "r_regionkey < 2", Map("r_name" -> "upper(r_name)"))
    import spark.implicits._
    IcebergTable.merge(spark, path, Seq((3, "MERGED")).toDF("key", "name"),
      "t.r_regionkey = s.key",
      graft.write.Dml.MergeActions(matchedUpdate = Some(Map("r_name" -> "s.name"))))
    val p = IcebergTable.plan(spark, path)
    val dels = p.deleteFiles
    assert(dels.nonEmpty)
    assert(dels.forall(_.info.fileFormat == "puffin"),
      s"v3 row-level deletes must be DVs, got formats ${dels.map(_.info.fileFormat).distinct}")
    assert(dels.forall(_.info.contentOffset.isDefined))
    val expected = src.withColumn("r_name",
      when(col("r_regionkey") < 2, upper(col("r_name")))
        .when(col("r_regionkey") === 3, lit("MERGED")).otherwise(col("r_name")))
    assertSameResult(expected, IcebergTable.load(spark, path))
  }

  test("v3 DELETE across partitions writes per-group Puffin files on executors") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val path = tmpDir("graft_dv_multigroup")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3,
      partitionBy = Seq(("o_orderstatus", graft.core.Transforms.Identity))))
    IcebergTable.delete(spark, path, "o_orderkey % 7 = 0")
    val p = IcebergTable.plan(spark, path)
    val puffins = p.deleteFiles.filter(_.info.contentOffset.isDefined).map(_.recordedPath).distinct
    assert(puffins.size > 1,
      s"expected one Puffin file per (partition, salt) group, got ${puffins.size}")
    assertSameResult(src.filter("o_orderkey % 7 <> 0"), IcebergTable.load(spark, path))
  }

  test("v3 row lineage survives UPDATE and compaction via materialized _row_id") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_lineage_preserve")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3))
    val before = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
      .select("r_regionkey", "_row_id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    IcebergTable.update(spark, path, "r_regionkey = 2", Map("r_name" -> "'UPDATED'"))
    val afterUpdate = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
      .select("r_regionkey", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val upd = afterUpdate.find(_._1 == 2).get
    assert(upd._2 == before(2), s"updated row must keep _row_id ${before(2)}, got ${upd._2}")
    assert(upd._3 == 2L, s"updated row's _last_updated must be the update seq, got ${upd._3}")
    afterUpdate.filter(_._1 != 2).foreach { case (k, rid, seq) =>
      assert(rid == before(k) && seq == 1L, s"untouched row $k changed lineage: ($rid, $seq)")
    }

    // Compaction must preserve BOTH _row_id and _last_updated_sequence_number.
    IcebergTable.rewriteDataFiles(spark, path, rewriteAll = true)
    val afterRewrite = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
      .select("r_regionkey", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(afterRewrite.toSet == afterUpdate.toSet,
      s"rewrite changed lineage:\n before=$afterUpdate\n after=$afterRewrite")

    // v3 manifest list carries first_row_id (field 520) for data manifests.
    val meta = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    val manifests = graft.manifest.ManifestIO.manifestsOf(meta, meta.currentSnapshot.get,
      spark.sessionState.newHadoopConf())
    assert(manifests.filter(_.content == 0).forall(_.firstRowId.isDefined),
      "v3 data manifests must carry first_row_id in the manifest list")
  }

  test("equality-delete write: keys removed across the whole table") {
    val src = spark.read.parquet(s"$sfDir/customer.parquet")
    val path = tmpDir("graft_eqdel")
    IcebergTable.write(src, path)
    import spark.implicits._
    val keys = src.filter(col("c_custkey") % 10 === 0).select("c_custkey")
    IcebergTable.deleteEquality(spark, path, keys)
    val p = IcebergTable.plan(spark, path)
    assert(p.deleteFiles.exists(_.info.content == graft.manifest.FileContent.EqualityDeletes))
    assert(p.deleteFiles.exists(_.info.equalityIds.nonEmpty))
    assertSameResult(src.filter(col("c_custkey") % 10 =!= 0), IcebergTable.load(spark, path))
  }

  test("nested struct leaves carry footer stats; nested predicates prune files") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    def mk(lo: Int, hi: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize((lo to hi).map(i =>
        Row(i.toLong, Row(i, s"label-$i"))), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("payload", StructType(Seq(
          StructField("key", IntegerType),
          StructField("label", StringType)))))))
    val path = tmpDir("graft_nested_stats")
    IcebergTable.write(mk(0, 99), path)
    IcebergTable.append(mk(1000, 1099), path)

    val hconf = spark.sessionState.newHadoopConf()
    val meta = graft.core.TableMetadata.load(path, hconf)
    val keyId = meta.currentSchema.fieldByPath("payload.key").id
    val plan = IcebergTable.plan(spark, path)
    assert(plan.dataFiles.size == 2)
    // Manifests carry bounds + counts for the nested leaf.
    plan.dataFiles.foreach { f =>
      assert(f.info.lowerBounds.contains(keyId) && f.info.upperBounds.contains(keyId),
        s"nested leaf $keyId missing bounds in ${f.recordedPath}")
      assert(f.info.valueCounts.get(keyId).contains(100L))
      assert(f.info.nullValueCounts.get(keyId).contains(0L))
    }
    // A nested predicate prunes to the matching file and stays exact.
    val pruned = IcebergTable.plan(spark, path,
      graft.read.ReadOptions(filterSql = Some("payload.key > 1000")))
    assert(pruned.dataFiles.size == 1,
      s"expected nested-bound pruning to keep 1 of 2 files, kept ${pruned.dataFiles.size}")
    val got = IcebergTable.load(spark, path,
      graft.read.ReadOptions(filterSql = Some("payload.key > 1000"))).count()
    assert(got == 99, s"expected 99 rows with payload.key > 1000, got $got")
    // And the column_stats table surfaces the nested column by name.
    val cs = IcebergTable.columnStats(spark, path)
      .filter(org.apache.spark.sql.functions.col("column_name") === "key")
    assert(cs.count() >= 2, "nested leaf absent from iceberg_column_stats")
  }

  test("equality delete on a NESTED struct field is applied during reads (reference test_equality_delete_struct_field)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // Table: id, payload struct<deepest struct<key int, label string>>, marker.
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Row(Row(1, "one")), "keep-1"),
        Row(2L, Row(Row(2, "two-a")), "delete-2a"),
        Row(3L, Row(Row(2, "two-b")), "delete-2b"),
        Row(4L, Row(Row(3, "three")), "keep-3"),
        Row(5L, null, "keep-null-struct"),
        Row(6L, Row(Row(null, "null-key")), "keep-null-key")), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("payload", StructType(Seq(
          StructField("deepest", StructType(Seq(
            StructField("key", IntegerType),
            StructField("label", StringType))))))),
        StructField("marker", StringType))))
    val path = tmpDir("graft_eqdel_nested")
    IcebergTable.write(src, path)
    val hconf = spark.sessionState.newHadoopConf()
    val meta = graft.core.TableMetadata.load(path, hconf)
    // Resolve the nested leaf ids from the committed schema.
    def chainIds(names: Seq[String]): Seq[Int] = {
      var cur: graft.core.IcebergType = meta.currentSchema.struct
      names.map { n =>
        val f = cur.asInstanceOf[graft.core.IcebergTypes.StructT].fields.find(_.name == n).get
        cur = f.fieldType; f.id
      }
    }
    val Seq(payloadId, deepestId, keyId) = chainIds(Seq("payload", "deepest", "key"))
    def m(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()

    // Hand-write the equality-delete parquet mirroring the struct down to
    // `key` (how Flink-style writers shape nested equality deletes).
    val delPath = s"$path/data/eqdel-nested"
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row(Row(2)))), 1),
      StructType(Seq(StructField("payload", StructType(Seq(
        StructField("deepest", StructType(Seq(
          StructField("key", IntegerType, nullable = true, m(keyId)))),
          nullable = true, m(deepestId)))),
        nullable = true, m(payloadId)))))
      .write.parquet(delPath)
    val file = graft.core.TableMetadata.fs(delPath, hconf)
      .listStatus(new org.apache.hadoop.fs.Path(delPath))
      .find(_.getPath.getName.endsWith(".parquet")).get
    val entry = graft.manifest.ManifestEntry(graft.manifest.EntryStatus.Added, None, None, None,
      graft.manifest.DataFileInfo(
        content = graft.manifest.FileContent.EqualityDeletes,
        filePath = file.getPath.toString, fileFormat = "parquet", partitionValues = Nil,
        recordCount = 1L, fileSizeInBytes = file.getLen,
        columnSizes = Map.empty, valueCounts = Map.empty, nullValueCounts = Map.empty,
        nanValueCounts = Map.empty, lowerBounds = Map.empty, upperBounds = Map.empty,
        splitOffsets = Nil, equalityIds = Seq(keyId), sortOrderId = None))
    graft.write.IcebergWrite.commitSnapshot(meta, Nil, Seq(entry), "delete", hconf)

    val back = IcebergTable.load(spark, path)
    val markers = back.select("marker").collect().map(_.getString(0)).toSet
    assert(markers == Set("keep-1", "keep-3", "keep-null-struct", "keep-null-key"),
      s"nested equality delete must remove key=2 rows only, got $markers")
  }

  test("equality-delete on partitioned table applies globally") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val path = tmpDir("graft_eqdel_part")
    IcebergTable.write(src, path, TableWriteOptions(
      partitionBy = Seq(("o_orderstatus", graft.core.Transforms.Identity))))
    val keys = src.filter(col("o_orderkey") < 100).select("o_orderkey")
    IcebergTable.deleteEquality(spark, path, keys)
    // Global equality deletes must be recorded under an UNPARTITIONED spec
    // (an all-null tuple under the partitioned spec would scope the delete
    // to the null partition per the Iceberg spec).
    val p = IcebergTable.plan(spark, path)
    val eq = p.deleteFiles.filter(_.info.content == graft.manifest.FileContent.EqualityDeletes)
    assert(eq.nonEmpty)
    eq.foreach(d => assert(p.meta.spec(d.specId).isUnpartitioned,
      s"global equality delete written under partitioned spec ${d.specId}"))
    assertSameResult(src.filter(col("o_orderkey") >= 100), IcebergTable.load(spark, path))
  }

  test("v3 row lineage: _row_id from committed first-row-ids, _last_updated_sequence_number from data seq") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val path = tmpDir("graft_lineage")
    IcebergTable.write(src, path, TableWriteOptions(formatVersion = 3))
    IcebergTable.append(src, path)
    val df = IcebergTable.load(spark, path, ReadOptions(withRowLineage = true))
    val n = 2 * src.count()
    assert(df.count() == n)
    val ids = df.select("_row_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until n).toSeq, s"expected dense row ids 0..${n - 1}, got $ids")
    val seqs = df.select("_last_updated_sequence_number").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == Seq(1L, 2L))
  }

  test("topK reads fewer files via bound-ordered selection and matches full sort") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .orderBy("o_orderkey").repartitionByRange(6, col("o_orderkey"))
    val path = tmpDir("graft_topk")
    IcebergTable.write(src, path)
    val p = IcebergTable.plan(spark, path)
    assert(p.dataFiles.size >= 4)
    val got = IcebergTable.topK(spark, path, "o_orderkey", 5, descending = true)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = src.orderBy(col("o_orderkey").desc).limit(5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    val gotAsc = IcebergTable.topK(spark, path, "o_orderkey", 5, descending = false)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val wantAsc = src.orderBy(col("o_orderkey").asc).limit(5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(gotAsc == wantAsc)
  }
}
