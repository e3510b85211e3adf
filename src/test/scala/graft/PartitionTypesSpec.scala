package graft

import graft.read.ReadOptions
import org.apache.spark.sql.functions._

/**
 * Golden reads of the reference's per-type identity-partition fixtures —
 * partition values arrive through Avro manifests in each type's encoding
 * and (write.parquet.write-partition-values=false) must be materialized as
 * identity constants. Expectations from
 * test/sql/local/partitioning/identity/identity_*.test.
 */
class PartitionTypesSpec extends SparkSpec {
  private val P = "/root/reference/data/persistent"

  private def userIdsWhere(path: String, filter: String): Seq[Long] =
    IcebergTable.load(spark, path, ReadOptions(filterSql = Some(filter)))
      .select("user_id").collect().map(_.getAs[Number](0).longValue()).sorted.toSeq

  test("partition_integer / partition_bigint: values + pruned filter") {
    assert(IcebergTable.count(spark, s"$P/partition_integer") == 2)
    val vals = IcebergTable.load(spark, s"$P/partition_integer")
      .select("partition_col").collect().map(_.getInt(0)).sorted.toSeq
    assert(vals.size == 2 && vals.distinct.size == 2)
    assert(IcebergTable.count(spark, s"$P/partition_bigint") == 2)
  }

  test("partition_bool: identity constants for booleans (identity_bool.test:13-21)") {
    val df = IcebergTable.load(spark, s"$P/partition_bool")
    val rows = df.select("partition_col", "user_id").collect()
      .map(r => (r.getBoolean(0), r.getAs[Number](1).longValue())).toSet
    assert(rows == Set((true, 12345L), (false, 67890L)))
    assert(userIdsWhere(s"$P/partition_bool", "partition_col = true") == Seq(12345L))
  }

  test("partition_decimal_integer: decimal partition values (identity_decimal_integer.test:12-21)") {
    val df = IcebergTable.load(spark, s"$P/partition_decimal_integer")
    assert(df.count() == 3)
    val byUser = df.select("user_id", "partition_col").collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getDecimal(1).toPlainString).toMap
    assert(byUser(12345L) == "42.5630")
    assert(byUser(67890L) == "1.2300")
    assert(byUser(111213L) == "1234.5432")
    assert(userIdsWhere(s"$P/partition_decimal_integer", "partition_col = 42.5630") == Seq(12345L))
  }

  test("partition_timestamp: timestamp partition values (identity_timestamp.test:12-21)") {
    val path = s"$P/partition_timestamp/default.db/partition_timestamp/metadata/00001-0c9938a5-103e-4185-b46d-331368ae4db7.metadata.json"
    val df = IcebergTable.load(spark, path)
    assert(df.count() == 2)
    assert(userIdsWhere(path, "partition_col = TIMESTAMP '2023-05-15 14:30:45'") == Seq(12345L))
  }

  test("partition_float / partition_double / partition_timestamptz load and count") {
    for (t <- Seq(s"$P/partition_float", s"$P/partition_double",
        s"$P/partition_timestamptz/default.db/partition_timestamptz")) {
      val df = IcebergTable.load(spark, t)
      assert(df.count() >= 2, t)
      assert(df.select("partition_col").collect().forall(!_.isNullAt(0)), t)
    }
  }

  test("partition_decimal_bigint / smallint: wider decimal encodings") {
    for (t <- Seq("partition_decimal_bigint", "partition_decimal_smallint")) {
      val df = IcebergTable.load(spark, s"$P/$t")
      assert(df.count() >= 2, t)
      assert(df.select("partition_col").collect().forall(!_.isNullAt(0)), t)
    }
  }
}
