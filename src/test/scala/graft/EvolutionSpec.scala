package graft

import org.apache.spark.sql.functions._

/** Schema evolution details beyond the oracle query: type widening, NOT
  * NULL, property functions, drop-column guards, MERGE delete action. */
class EvolutionSpec extends SparkSpec {

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
}
