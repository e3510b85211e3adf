package graft

import org.apache.spark.sql.functions._

/** Schema evolution details beyond the oracle query: type widening, NOT
  * NULL, property functions, drop-column guards, MERGE delete action. */
class EvolutionSpec extends SparkSpec {

  test("SET PARTITIONED BY: replace, revert (spec-id reuse), reset to unpartitioned") {
    // Reference test_partition_revert_to_previous / reset_then_repartition:
    // inserts under three successive specs all stay readable, and reverting
    // to a previous layout reuses the ORIGINAL spec id and field ids.
    import spark.implicits._
    import graft.write.Evolution
    import graft.core.Transforms
    val path = tmpDir("graft_set_pspec")
    def rows(off: Int) = (0 until 25).map(i => (i % 5, off + i)).toDF("a", "b")
    IcebergTable.write(rows(0), path, graft.write.TableWriteOptions(
      partitionBy = Seq(("a", Transforms.Identity))))
    val conf = spark.sessionState.newHadoopConf()
    val spec0 = graft.core.TableMetadata.load(path, conf).defaultSpec

    Evolution.setPartitionSpec(spark, path, Evolution.parsePartitionSpecString("b"))
    IcebergTable.append(rows(100), path)
    val m1 = graft.core.TableMetadata.load(path, conf)
    assert(m1.defaultSpec.fields.map(_.name) == Seq("b"))
    assert(m1.defaultSpecId != spec0.specId)

    // Revert to partitioning by a: the ORIGINAL spec id + field id return.
    Evolution.setPartitionSpec(spark, path, Evolution.parsePartitionSpecString("a"))
    IcebergTable.append(rows(200), path)
    val m2 = graft.core.TableMetadata.load(path, conf)
    assert(m2.defaultSpecId == spec0.specId, "revert must reuse the original spec id")
    assert(m2.defaultSpec.fields == spec0.fields)

    // All 75 rows remain readable across the three specs; pruning on `a`
    // still works for the files written under specs 0 and 2.
    val all = IcebergTable.load(spark, path)
    assert(all.count() == 75)
    assert(all.filter("a = 3").count() == 15)

    // RESET to unpartitioned.
    Evolution.setPartitionSpec(spark, path, Nil)
    assert(graft.core.TableMetadata.load(path, conf).defaultSpec.isUnpartitioned)
    IcebergTable.append(rows(300), path)
    assert(IcebergTable.load(spark, path).count() == 100)

    // Transform spec strings parse the CREATE surface.
    assert(Evolution.parsePartitionSpecString("a, bucket(8, b), months(ts), truncate(4, s)")
      .map { case (c, t) => (c, t.toString) } ==
      Seq(("a", "identity"), ("b", "bucket[8]"), ("ts", "month"), ("s", "truncate[4]")))
  }

  test("DELETE and UPDATE after partition-spec evolution hit rows in old-spec files") {
    // Reference delete_after_partition_spec_evolution /
    // update_after_partition_spec_evolution: row-level DML after SET
    // PARTITIONED BY must delete/update rows in files written under the
    // PREVIOUS spec (positional deletes are path-matched, spec-agnostic).
    import spark.implicits._
    import graft.write.Evolution
    val path = tmpDir("graft_dml_after_pspec")
    IcebergTable.write((0 until 20).map(i => (i % 4, i)).toDF("a", "b"), path,
      graft.write.TableWriteOptions(partitionBy = Seq(("a", graft.core.Transforms.Identity))))
    Evolution.setPartitionSpec(spark, path, Evolution.parsePartitionSpecString("b"))
    IcebergTable.append((100 until 110).map(i => (i % 4, i)).toDF("a", "b"), path)

    // Deletes rows from BOTH old-spec and new-spec files.
    IcebergTable.delete(spark, path, "b % 2 = 0")
    val left = IcebergTable.load(spark, path)
    assert(left.count() == 15, s"10 old + 5 new odd rows expected, got ${left.count()}")
    assert(left.filter("b % 2 = 0").count() == 0)

    IcebergTable.update(spark, path, "b = 1", Map("a" -> "99"))
    assert(IcebergTable.load(spark, path).filter("a = 99").count() == 1)
  }

  test("time travel before a schema change reads the snapshot-bound OLD schema") {
    import spark.implicits._
    val path = tmpDir("graft_evo_tt")
    IcebergTable.write(Seq((1, "x"), (2, "y")).toDF("id", "v"), path)
    val conf = spark.sessionState.newHadoopConf()
    val snap1 = graft.core.TableMetadata.load(path, conf).currentSnapshot.get.snapshotId
    IcebergTable.addColumn(spark, path, "extra", "long")
    IcebergTable.append(Seq((3, "z", 30L)).toDF("id", "v", "extra"), path)

    val old = IcebergTable.load(spark, path,
      graft.read.ReadOptions(snapshotId = Some(snap1)))
    assert(old.columns.toSeq == Seq("id", "v"), s"old snapshot must use its schema: ${old.columns.toSeq}")
    assert(old.count() == 2)
    val now = IcebergTable.load(spark, path)
    assert(now.columns.toSeq == Seq("id", "v", "extra") && now.count() == 3)
    // DSv2 route infers the snapshot-bound schema too.
    val dsv2Old = spark.read.format("graft").option("snapshot-id", snap1.toString).load(path)
    assert(dsv2Old.columns.toSeq == Seq("id", "v") && dsv2Old.count() == 2)
  }

  test("type widening int->long and float->double reads old files correctly") {
    import spark.implicits._
    val path = tmpDir("graft_widen")
    val src = Seq((1, 1.5f, "a"), (2, 2.5f, "b"), (3, 3.5f, "c")).toDF("i", "f", "s")
    IcebergTable.write(src, path)
    graft.write.Evolution.updateColumnType(spark, path, "i", "long")
    graft.write.Evolution.updateColumnType(spark, path, "f", "double")
    val back = IcebergTable.load(spark, path)
    assert(back.schema("i").dataType.typeName == "long")
    assert(back.schema("f").dataType.typeName == "double")
    val rows = back.orderBy("i").collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 1.5d, "a"), (2L, 2.5d, "b"), (3L, 3.5d, "c")))
    // appends after widening interleave with old files
    val more = Seq((4000000000L, 4.5d, "d")).toDF("i", "f", "s")
    IcebergTable.append(more, path)
    assert(IcebergTable.load(spark, path).count() == 4)
    assert(IcebergTable.load(spark, path).agg(max("i")).collect()(0).getLong(0) == 4000000000L)
  }

  test("illegal promotions are rejected; drop blocked for partition source") {
    import spark.implicits._
    val path = tmpDir("graft_widen_guard")
    IcebergTable.write(Seq((1L, "x")).toDF("k", "v"), path,
      graft.write.TableWriteOptions(partitionBy = Seq(("k", graft.core.Transforms.Identity))))
    intercept[IllegalArgumentException] {
      graft.write.Evolution.updateColumnType(spark, path, "k", "int") // narrowing
    }
    intercept[IllegalArgumentException] {
      IcebergTable.dropColumn(spark, path, "k") // partition source
    }
  }

  test("table property set/remove round-trips through metadata versions") {
    import spark.implicits._
    val path = tmpDir("graft_props")
    IcebergTable.write(Seq((1, "a")).toDF("id", "v"), path)
    IcebergTable.setTableProperties(spark, path, Map("owner" -> "graft", "x" -> "1"))
    val props1 = IcebergTable.tableProperties(spark, path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props1.get("owner").contains("graft") && props1.get("x").contains("1"))
    IcebergTable.removeTableProperties(spark, path, Seq("x"))
    val props2 = IcebergTable.tableProperties(spark, path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props2.contains("x") && props2.get("owner").contains("graft"))
  }

  test("MERGE with matchedDelete removes matched rows") {
    import spark.implicits._
    val path = tmpDir("graft_merge_del")
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    IcebergTable.write(src, path)
    val toDelete = Seq(0, 2).toDF("key")
    IcebergTable.merge(spark, path, toDelete, "t.r_regionkey = s.key",
      graft.write.Dml.MergeActions(matchedDelete = true))
    val keys = IcebergTable.load(spark, path).select("r_regionkey")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(keys == Seq(1, 3, 4))
  }

  test("partition evolution: add month field, new files prune, old files survive") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val half1 = src.filter(col("o_orderdate") < "1998-01-01")
    val half2 = src.filter(col("o_orderdate") >= "1998-01-01")
    val path = tmpDir("graft_part_evolve")
    // Unpartitioned write, then evolve to month(o_orderdate), then append.
    IcebergTable.write(half1, path)
    IcebergTable.addPartitionField(spark, path, "o_orderdate", "month")
    IcebergTable.append(half2, path)

    val meta = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    assert(meta.specs.map(_.specId).sorted == Seq(0, 1))
    assert(meta.defaultSpecId == 1)
    assert(meta.defaultSpec.fields.map(_.name) == Seq("o_orderdate_month"))

    // Full read = union of both halves, across specs.
    assertSameResult(IcebergTable.load(spark, path), src)

    // Pruning a month in the NEW half: spec-1 narrows to that month's file
    // via partition values; the spec-0 file (all rows < 1998) is pruned by
    // column STATS — evolution doesn't lose pruning on old files.
    val p = IcebergTable.plan(spark, path,
      graft.read.ReadOptions(filterSql = Some(
        "o_orderdate >= timestamp'1998-03-01 00:00:00' AND o_orderdate < timestamp'1998-04-01 00:00:00'")))
    val bySpec = p.dataFiles.groupBy(_.specId).view.mapValues(_.size).toMap
    assert(bySpec.getOrElse(1, 0) == 1, s"expected 1 month-partitioned file, got $bySpec")
    assert(bySpec.getOrElse(0, 0) == 0, "old-half file should stats-prune for a 1998 month")
    // A month in the OLD half: the unpartitioned file survives (stats
    // overlap), and every month-partitioned 1998+ file partition-prunes.
    val pOld = IcebergTable.plan(spark, path,
      graft.read.ReadOptions(filterSql = Some(
        "o_orderdate >= timestamp'1996-03-01 00:00:00' AND o_orderdate < timestamp'1996-04-01 00:00:00'")))
    val bySpecOld = pOld.dataFiles.groupBy(_.specId).view.mapValues(_.size).toMap
    assert(bySpecOld.getOrElse(0, 0) >= 1, s"unpartitioned file must survive, got $bySpecOld")
    assert(bySpecOld.getOrElse(1, 0) == 0, s"1998+ month files must prune, got $bySpecOld")
    assertSameResult(
      IcebergTable.load(spark, path).filter(
        col("o_orderdate") >= "1998-03-01" && col("o_orderdate") < "1998-04-01"),
      src.filter(col("o_orderdate") >= "1998-03-01" && col("o_orderdate") < "1998-04-01"))

    // Drop the field: appends go back to unpartitioned under spec 2.
    IcebergTable.dropPartitionField(spark, path, "o_orderdate_month")
    IcebergTable.append(half2, path)
    assertSameResult(IcebergTable.load(spark, path), src.union(half2))
    val meta2 = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    assert(meta2.defaultSpecId == 2 && meta2.defaultSpec.fields.isEmpty)

    // Errors: unknown column; duplicate transform on the default spec.
    intercept[Exception](IcebergTable.addPartitionField(spark, path, "nope"))
    IcebergTable.addPartitionField(spark, path, "o_custkey", "bucket[4]")
    intercept[Exception](IcebergTable.addPartitionField(spark, path, "o_custkey", "bucket[4]"))
  }

  test("column doc comments: surfaced as Spark comments, settable via ALTER, persisted in metadata") {
    import org.apache.spark.sql.types._
    val path = tmpDir("graft_doc_comment")
    // Create with a commented column (Spark comment -> Iceberg doc).
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putString("comment", "Primary identifier").build()),
      StructField("name", StringType)))
    graft.write.IcebergWrite.createTable(spark, path, schema)
    val hconf = spark.sessionState.newHadoopConf()
    def docs(): Map[String, Option[String]] =
      graft.core.TableMetadata.load(path, hconf).currentSchema.fields
        .map(f => f.name -> f.doc).toMap
    assert(docs() == Map("id" -> Some("Primary identifier"), "name" -> None))

    // ALTER sets and the loaded Spark schema carries the comment metadata.
    graft.write.Evolution.setColumnDoc(spark, path, "name", Some("Resident name"))
    assert(docs()("name").contains("Resident name"))
    import spark.implicits._
    graft.write.IcebergWrite.append(Seq((1L, "x")).toDF("id", "name"), path)
    val loaded = IcebergTable.load(spark, path)
    assert(loaded.schema("id").metadata.getString("comment") == "Primary identifier")
    assert(loaded.schema("name").metadata.getString("comment") == "Resident name")

    // SQL surface: ALTER TABLE ... ALTER COLUMN ... COMMENT through the catalog.
    val wh = tmpDir("graft_doc_wh")
    spark.conf.set("spark.sql.catalog.doccat", classOf[graft.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.doccat.warehouse", wh)
    spark.sql("CREATE TABLE doccat.db.t (id BIGINT, name STRING)")
    spark.sql("ALTER TABLE doccat.db.t ALTER COLUMN id COMMENT 'the key'")
    val m2 = graft.core.TableMetadata.load(s"$wh/db/t", hconf)
    assert(m2.currentSchema.fields.find(_.name == "id").get.doc.contains("the key"))
    // DESCRIBE surfaces it.
    val desc = spark.sql("DESCRIBE doccat.db.t").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(desc("id") == "the key", s"DESCRIBE comment mismatch: $desc")
  }

  test("partition values survive type promotion of the partition source (reference test_read_partitioned_table_type_promotion)") {
    import spark.implicits._
    val path = tmpDir("graft_part_promote")
    val a = (0 until 50).map(i => (i % 5, s"r$i")).toDF("k", "v")
    IcebergTable.write(a, path, graft.write.TableWriteOptions(
      partitionBy = Seq(("k", graft.core.Transforms.Identity))))
    // Widen the partition SOURCE int -> long, then append long-typed data.
    graft.write.Evolution.updateColumnType(spark, path, "k", "long")
    val b = (0 until 50).map(i => ((i % 5).toLong + 10L, s"n$i")).toDF("k", "v")
    IcebergTable.append(b, path)
    val all = IcebergTable.load(spark, path)
    assert(all.count() == 100)
    // Pruning must be sound across files whose partition values were
    // written as INT (old spec binding) and LONG (post-promotion).
    for (pred <- Seq("k = 2", "k = 12", "k >= 10", "k < 5")) {
      val got = IcebergTable.load(spark, path,
        graft.read.ReadOptions(filterSql = Some(pred))).count()
      val want = all.where(pred).count()
      assert(got == want, s"[$pred] pruned scan $got rows, expected $want")
    }
    // And old-file pruning still skips: k=12 can't be in the int-era files.
    val plan = IcebergTable.plan(spark, path,
      graft.read.ReadOptions(filterSql = Some("k = 12")))
    assert(plan.dataFiles.size == 1,
      s"expected 1 file for k=12, kept ${plan.dataFiles.size}")
  }

  test("equality deletes written before a type promotion still apply (reference test_equality_delete_schema_evolution_*)") {
    import spark.implicits._
    val path = tmpDir("graft_eqdel_promote")
    val src = (0 until 40).map(i => (i, s"v$i")).toDF("k", "v")
    IcebergTable.write(src, path)
    // Equality delete under the INT schema...
    IcebergTable.deleteEquality(spark, path, (0 until 40 by 4).map(i => Tuple1(i)).toDF("k"))
    // ...then promote k to LONG and append long-typed rows.
    graft.write.Evolution.updateColumnType(spark, path, "k", "long")
    IcebergTable.append((100L until 110L).map(i => (i, s"n$i")).toDF("k", "v"), path)
    val got = IcebergTable.load(spark, path).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = ((0 until 40).filter(_ % 4 != 0).map(_.toLong) ++ (100L until 110L)).sorted
    assert(got == want, s"eq-delete after promotion lost/kept wrong rows: got ${got.size}, want ${want.size}")
  }

  test("equality deletes keep applying after their column is dropped (reference ..._drop_columns)") {
    import spark.implicits._
    val path = tmpDir("graft_eqdel_dropcol")
    val src = Seq(
      (1, 10, "delete-me"), (2, 11, "keep-a"), (3, 10, "keep-b-diff-id"),
      (4, 20, "delete-me-too"), (5, 30, "keep-c")).toDF("id", "number_key", "marker")
    IcebergTable.write(src, path)
    // Two-column equality delete: (id, number_key).
    IcebergTable.deleteEquality(spark, path,
      Seq((1, 10), (4, 20)).toDF("id", "number_key"))
    assert(IcebergTable.load(spark, path).select("marker").collect().map(_.getString(0)).toSet
      == Set("keep-a", "keep-b-diff-id", "keep-c"))

    // Drop one equality column; the delete must STILL apply (the dropped
    // field is read privately by field id from old data files).
    graft.write.Evolution.dropColumn(spark, path, "number_key")
    val afterDrop = IcebergTable.load(spark, path)
    assert(afterDrop.columns.toSeq == Seq("id", "marker"))
    assert(afterDrop.select("marker").collect().map(_.getString(0)).toSet
      == Set("keep-a", "keep-b-diff-id", "keep-c"),
      "rows deleted before the column drop must stay deleted")

    // New rows (written without the dropped column) are unaffected.
    IcebergTable.append(Seq((10, "new-row")).toDF("id", "marker"), path)
    assert(IcebergTable.load(spark, path).select("marker").collect().map(_.getString(0)).toSet
      == Set("keep-a", "keep-b-diff-id", "keep-c", "new-row"))
  }

  test("nested-collection evolution: widen/add/rename/drop a struct field inside a LIST element " +
      "(schema_evolve_struct_in_list.test:14-21)") {
    import spark.implicits._
    import graft.write.Evolution
    val path = tmpDir("graft_evolve_struct_in_list")
    def row(sql: String) = spark.sql(s"SELECT $sql AS tags")
    IcebergTable.write(row(
      "array(named_struct('first_name','Alice','age',43)," +
        "named_struct('first_name','Bob','age',35))"), path)
    Evolution.updateColumnType(spark, path, "tags.element.age", "long")
    IcebergTable.append(row(
      "array(named_struct('first_name','Ancient Being','age',9223372036854775807L)," +
        "named_struct('first_name','Bobby Droptables','age',2147483649L))"), path)
    Evolution.addColumn(spark, path, "tags.element.last_name", "string")
    IcebergTable.append(row(
      "array(named_struct('first_name','Hello','age',9223372036854775807L,'last_name','World'))"), path)
    Evolution.renameColumn(spark, path, "tags.element.first_name", "given_name")
    IcebergTable.append(row(
      "array(named_struct('given_name','Duck','age',5L,'last_name','DB'))"), path)
    Evolution.dropColumn(spark, path, "tags.element.last_name")

    // One scan over pre- and post-evolution files: field-id resolution
    // renames + widens inside the list element; the dropped field is gone.
    val df = IcebergTable.load(spark, path)
    val elemType = df.schema("tags").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elemType.fieldNames.toSeq == Seq("given_name", "age"))
    assert(elemType("age").dataType == org.apache.spark.sql.types.LongType)
    val got = df.selectExpr("array_join(transform(tags, t -> concat(t.given_name, ':', t.age)), ',')")
      .as[String].collect().sorted.toSeq
    // Reference expectations, schema_evolve_struct_in_list.test:17-21.
    assert(got == Seq(
      "Alice:43,Bob:35",
      "Ancient Being:9223372036854775807,Bobby Droptables:2147483649",
      "Duck:5",
      "Hello:9223372036854775807").sorted)
  }

  test("nested-collection evolution: widen/add/rename/drop a struct field inside a MAP value " +
      "(schema_evolve_struct_in_map.test)") {
    import spark.implicits._
    import graft.write.Evolution
    val path = tmpDir("graft_evolve_struct_in_map")
    def row(sql: String) = spark.sql(s"SELECT $sql AS preferences")
    IcebergTable.write(row(
      "map('first',named_struct('first_name','Alice','age',43)," +
        "'second',named_struct('first_name','Bob','age',35))"), path)
    Evolution.updateColumnType(spark, path, "preferences.value.age", "long")
    IcebergTable.append(row(
      "map('third',named_struct('first_name','Ancient Being','age',9223372036854775807L)," +
        "'fourth',named_struct('first_name','Bobby Droptables','age',2147483649L))"), path)
    Evolution.addColumn(spark, path, "preferences.value.last_name", "string")
    IcebergTable.append(row(
      "map('fifth',named_struct('first_name','Hello','age',9223372036854775807L,'last_name','World'))"), path)
    Evolution.renameColumn(spark, path, "preferences.value.first_name", "given_name")
    IcebergTable.append(row(
      "map('sixth',named_struct('given_name','Duck','age',5L,'last_name','DB'))"), path)
    Evolution.dropColumn(spark, path, "preferences.value.last_name")

    val df = IcebergTable.load(spark, path)
    val valType = df.schema("preferences").dataType
      .asInstanceOf[org.apache.spark.sql.types.MapType].valueType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(valType.fieldNames.toSeq == Seq("given_name", "age"))
    assert(valType("age").dataType == org.apache.spark.sql.types.LongType)
    val got = df.selectExpr(
      "array_join(transform(map_entries(preferences), " +
        "e -> concat(e.key, '=', e.value.given_name, ':', e.value.age)), ',')")
      .as[String].collect().sorted.toSeq
    // Reference expectations, schema_evolve_struct_in_map.test:16-20.
    assert(got == Seq(
      "first=Alice:43,second=Bob:35",
      "third=Ancient Being:9223372036854775807,fourth=Bobby Droptables:2147483649",
      "fifth=Hello:9223372036854775807",
      "sixth=Duck:5").sorted)
  }
}
